#!/usr/bin/env python
"""One simulated executor for the scaling benchmark: a local[cores]
SparkSession processing a disjoint slice of the pages corpus, exactly
like a spark-submit-placed executor (own JVM, own python workers, own
CPU budget via cgroup-style pinning).

Protocol (driven by tools/scale_lib.py): build session, FULL warm pass
(JIT + codegen + every python worker slot + page cache), touch ready,
then for each measured pass spin on go_<tag>_<p> (a per-pass barrier so
every executor of a wave times the same wall-clock window) and touch
done_<tag>_<p>_<idx> when finished. The <tag> lets the orchestrator
interleave passes of two co-resident waves (the N fleet and the 4N
fleet live simultaneously on disjoint core pins; only one wave's pass
runs at a time). Prints one JSON line with the per-pass walls.

Usage: scale_worker.py <cores> <cpuset> <sync_dir> <tag> <idx> <n_passes> <warm_sec> <file> [...]

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
    sync_dir = Path(sys.argv[3])
    tag = sys.argv[4]
    idx = int(sys.argv[5])
    n_passes = int(sys.argv[6])
    warm_sec = float(sys.argv[7])
    files = sys.argv[8:]
    if cpuset != "-":
        # inherited by the JVM and every forked python worker
        os.sched_setaffinity(0, _parse_cpuset(cpuset))

    from npm_extraction_server_spark.plans.kg import run_pipeline
    from npm_extraction_server_spark.plans.session import get_spark
    from npm_extraction_server_spark.sources.pages import PAGES_SCHEMA

    # right-size the JVM to the pin: GC/JIT worker pools default to the
    # MACHINE's 32 cores, which thrash a 2-core cgroup-style budget; a
    # real cluster executor gets these from its container's cpu limit
    jopts = (f"-XX:ParallelGCThreads={max(2, cores)} "
             f"-XX:CICompilerCount=2 -XX:ActiveProcessorCount={cores}")
    spark = get_spark(app=f"scale-exec-{tag}-{idx}",
                      master=f"local[{cores}]", shuffle_partitions=cores,
                      java_opts=jopts, driver_mem="6g")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(2 * 1024 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", str(256 * 1024))
    pages = spark.read.schema(PAGES_SCHEMA).parquet(*files)
    n_pages = pages.count()

    # Plan ONCE, execute per pass: a production batch job analyzes /
    # optimizes its plan once and then executes for hours, so per-pass
    # Catalyst re-analysis (~0.7-1 s of single-threaded driver work on
    # a 2-core pin) is a sandbox artifact that taxes short (4N) passes
    # ~12% and long (N) passes ~3%, corrupting the ratio. Reusing the
    # DataFrame keeps the measured window = job execution only (Spark
    # re-runs the full job on every count(); nothing is cached).
    # SCALE_JOB selects the measured job: "kg" (default) = the fused
    # extract->triples pipeline (map-heavy); "dsir" = DSIR importance
    # weighting over the same pages (aggregation-heavy: two bucket-LM
    # aggregates + a broadcast-ratio join + per-doc agg) — a second
    # shape for the N->4N scaling evidence.
    if os.environ.get("SCALE_JOB") == "dsir":
        from pyspark.sql import functions as F

        from npm_extraction_server_spark.operators.text import (
            dsir_logweights)
        docs = pages.select(F.xxhash64("url").alias("doc_id"), "text")
        triples = dsir_logweights(docs,
                                  docs.filter(F.col("doc_id") % 7 == 0))
    else:
        triples = run_pipeline(pages, include_engines=False)["triples"]

    # Warm by WALL-TIME BUDGET, not pass count: C2 JIT compiles by
    # accumulated execution time, so "one warm pass" gives a 4N-fleet
    # executor (short passes) far less warmup than the N executor (long
    # passes) and its first measured pass reads ~25% slow. Every
    # executor runs FULL passes until ``warm_sec`` of cumulative wall
    # (at least one), reaching the same steady state before the barrier.
    t_warm = time.monotonic()
    while True:
        triples.count()
        if time.monotonic() - t_warm >= warm_sec:
            break

    (sync_dir / f"ready_{tag}_{idx}").touch()
    walls, n_triples = [], 0
    for p in range(n_passes):
        go = sync_dir / f"go_{tag}_{p}"
        while not go.exists():
            time.sleep(0.02)
        t0 = time.monotonic()
        n_triples = triples.count()
        wall = time.monotonic() - t0
        walls.append(round(wall, 3))
        (sync_dir / f"done_{tag}_{p}_{idx}").write_text(str(round(wall, 3)))
    print(json.dumps({"idx": idx, "tag": tag, "pages": n_pages,
                      "triples": n_triples, "walls": walls}))
    spark.stop()


if __name__ == "__main__":
    main()
