#!/usr/bin/env python
"""Round-4 scale probes (adversarial self-tests, not driver queries):

1. SSSP over a 2M-node / 8M-edge weighted hash graph — does the
   frontier Bellman-Ford stay wavefront-proportional at 4000x the
   driver-query graph, and how many rounds to fixpoint?
2. Dangling PageRank over the same graph with 1/7 of the nodes made
   sinks — what does the per-iteration dangling aggregate cost on
   top of round-3's measured pagerank?
3. HLL + Bloom over 10M rows / 1M distinct keys — is sketch state
   fixed-size and the build one map-combined pass?

Usage: python tools/probe_round4.py [nodes] [rows]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def main() -> None:
    nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000

    from npm_extraction_server_spark.operators.sketch import (
        bloom_bits,
        hll_distinct,
    )
    from npm_extraction_server_spark.plans.graph import pagerank, sssp
    from npm_extraction_server_spark.plans.session import get_spark

    spark = get_spark(app="probe_round4")

    n = spark.range(nodes)
    d = F.col("id")
    edges = None
    for mult, add in ((7, 3), (13, 5), (1, 1), (29, 11)):
        e = n.select(d.alias("src"), ((d * mult + add) % nodes).alias("dst"))
        edges = e if edges is None else edges.unionByName(e)
    edges = edges.repartition(32).localCheckpoint(eager=True)
    n_edges = edges.count()

    # -- SSSP probe -------------------------------------------------
    wedges = edges.withColumn(
        "w", (F.lit(1) + (F.col("src") * 3 + F.col("dst") * 5) % 7)
        .cast("long"))
    seeds = n.filter(d % 200_000 == 0).select(d.alias("node_id"))
    t0 = time.monotonic()
    sp = sssp(seeds, wedges, max_rounds=80)
    n_reached = sp.count()
    t_sssp = time.monotonic() - t0
    print(f"sssp: {nodes} nodes / {n_edges} edges: reached {n_reached} "
          f"in {t_sssp:.1f}s")

    # -- dangling PageRank probe -----------------------------------
    dang_edges = edges.filter(F.col("src") % 7 != 0) \
        .localCheckpoint(eager=True)
    t0 = time.monotonic()
    pr = pagerank(dang_edges, iterations=5)
    pr.count()
    t_pr = time.monotonic() - t0
    mass = pr.agg(F.round(F.sum("rank"), 6)).collect()[0][0]
    t0 = time.monotonic()
    pr0 = pagerank(edges, iterations=5)
    pr0.count()
    t_pr0 = time.monotonic() - t0
    print(f"pagerank dangling (~{nodes//7} sinks): {t_pr:.1f}s "
          f"(mass {mass}); sink-free same graph: {t_pr0:.1f}s")

    # -- sketch probes ---------------------------------------------
    ev = spark.range(rows).select(
        (F.col("id") % 16).cast("string").alias("grp"),
        (F.col("id") % 1_000_000).alias("v"))
    t0 = time.monotonic()
    h = hll_distinct(ev, "grp", "v", p=8)
    hrows = h.count()
    t_hll = time.monotonic() - t0
    est = h.agg(F.round(F.avg("distinct_est"), 1)).collect()[0][0]
    t0 = time.monotonic()
    b = bloom_bits(ev, "grp", "v", n_slots=6, k=4)
    brows = b.count()
    t_bloom = time.monotonic() - t0
    # per-group distinct: ids in group g are ≡ g (mod 16) and
    # v = id % 1e6 with 16 | 1e6, so each group sees 1e6/16 = 62500
    print(f"hll: {rows} rows -> {hrows} group rows in {t_hll:.1f}s "
          f"(avg est {est}, true 62500 per group); "
          f"bloom: {brows} slot rows in {t_bloom:.1f}s")

    spark.stop()


if __name__ == "__main__":
    main()
