import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))


@pytest.fixture(scope="session")
def spark():
    from npm_extraction_server_spark.plans.session import get_spark

    spark = get_spark(app="pytest", master="local[8]", shuffle_partitions=8)
    yield spark
    spark.stop()
