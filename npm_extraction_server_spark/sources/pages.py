"""Pages source: distributed synthetic generation + parquet reader.

``pages_df(spark, n)`` is the Iceberg-table stand-in for the north-star
input (url, warc_ts, html, text, lang): fully distributed —
``spark.range(n)`` slices are expanded to pages inside ``mapInPandas``
(generation is a pure function of the row id, see sources/synth.py), so
there is no driver-side materialization and no shuffle.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), True),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
])

_GEN_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.LongType(), True),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
])


def _generate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from .synth import synth_page

    for pdf in batches:
        rows = [synth_page(int(i)) for i in pdf["id"]]
        yield pd.DataFrame(rows, columns=[f.name for f in _GEN_SCHEMA.fields])


def pages_df(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    partitions = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n, 1, partitions)
    raw = base.mapInPandas(_generate, schema=_GEN_SCHEMA)
    return raw.withColumn("warc_ts", F.timestamp_seconds("warc_ts"))


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(PAGES_SCHEMA).parquet(path)


def write_pages(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)
