#!/usr/bin/env python
"""One simulated executor for the scaling benchmark: a local[cores]
SparkSession processing a disjoint slice of the pages corpus.

Protocol (driven by bench.py): warm up, touch the ready file, spin on
the go file (barrier so all executors time the same window), run the
fused pipeline over the assigned files, print one JSON line.

Usage: scale_worker.py <cores> <cpuset> <ready_file> <go_file> <file> [...]

``cpuset`` ("0-3" or "4,5,6,7") pins this executor — JVM, python
workers and all — to its container's CPU budget, the way a cluster
manager (YARN/k8s cgroups) would. Without pinning, the single-executor
baseline's JVM overhead threads free-ride on the machine's idle cores
and the scaling ratio undercounts.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _parse_cpuset(spec: str) -> set[int]:
    cpus: set[int] = set()
    for part in spec.split(","):
        if "-" in part:
            lo, hi = part.split("-")
            cpus.update(range(int(lo), int(hi) + 1))
        else:
            cpus.add(int(part))
    return cpus


def main() -> None:
    cores = int(sys.argv[1])
    cpuset = sys.argv[2]
    ready_file, go_file = Path(sys.argv[3]), Path(sys.argv[4])
    files = sys.argv[5:]
    if cpuset != "-":
        # inherited by the JVM and every forked python worker
        os.sched_setaffinity(0, _parse_cpuset(cpuset))

    from npm_extraction_server_spark.plans.kg import run_pipeline
    from npm_extraction_server_spark.plans.session import get_spark
    from npm_extraction_server_spark.sources.pages import PAGES_SCHEMA

    spark = get_spark(app=f"scale-exec-{ready_file.name}",
                      master=f"local[{cores}]", shuffle_partitions=cores)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(2 * 1024 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", str(256 * 1024))
    pages = spark.read.schema(PAGES_SCHEMA).parquet(*files)
    n_pages = pages.count()

    # warm: 15% sample (JIT + all worker slots + page cache) — a full
    # warm pass would double each wave's runtime and the driver's bench
    # budget is finite
    run_pipeline(pages.sample(0.15, seed=1), include_engines=False)[
        "triples"].count()

    ready_file.touch()
    while not go_file.exists():
        time.sleep(0.05)

    # two measured passes, report the min (bench.py additionally runs
    # each wave twice, interleaved): host capacity wanders on the shared
    # sandbox, and the peak-capacity number is the stable one
    walls = []
    n_triples = 0
    for _ in range(2):
        t0 = time.monotonic()
        n_triples = run_pipeline(pages, include_engines=False)["triples"].count()
        walls.append(time.monotonic() - t0)
    print(json.dumps({"pages": n_pages, "triples": n_triples,
                      "sec": round(min(walls), 3),
                      "runs": [round(w, 3) for w in walls]}))
    spark.stop()


if __name__ == "__main__":
    main()
