#!/usr/bin/env python
"""Scale probes for the late round-5 graph primitives: LPA community
detection, greedy coloring, maximal matching (all md5-deterministic
round loops) plus characteristic sets over a wide triple table.

Graph: 2M nodes / 6M directed edges (the repo's standard probe shape —
two hash long-range edges + a ring edge per node), ~1000x the suite
graph. Characteristic sets: 10M triples over 1M subjects with
power-law predicate sets. Reports wall seconds + result shapes.
Run: python tools/probe_round5d.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def main() -> None:
    from npm_extraction_server_spark.plans.graph import (
        greedy_coloring,
        lpa_communities,
        maximal_matching,
    )
    from npm_extraction_server_spark.plans.session import get_spark
    from npm_extraction_server_spark.plans.warehouse import (
        characteristic_sets,
    )

    spark = get_spark(app="probe_round5d")

    n = 2_000_000
    base = spark.range(n)
    edges = (
        base.select(F.col("id").alias("src"),
                    ((F.col("id") * 7 + 3) % n).alias("dst"))
        .unionByName(base.select(
            F.col("id").alias("src"),
            ((F.col("id") * 13 + 5) % n).alias("dst")))
        .unionByName(base.select(
            F.col("id").alias("src"),
            ((F.col("id") + 1) % n).alias("dst")))
        .repartition(32)
        .persist()
    )
    print(f"edges: {edges.count():,}")

    t0 = time.time()
    lpa = lpa_communities(edges, rounds=3)
    n_nodes = lpa.count()
    n_comm = lpa.select("label").distinct().count()
    print(f"lpa_communities rounds=3: {time.time() - t0:.1f}s  "
          f"nodes={n_nodes:,} communities={n_comm:,}")

    t0 = time.time()
    col = greedy_coloring(edges)
    n_col = col.count()
    k = col.agg(F.max("color")).collect()[0][0] + 1
    print(f"greedy_coloring: {time.time() - t0:.1f}s  "
          f"nodes={n_col:,} colors={k}")
    # validity at scale: no monochromatic edge
    c1 = col.select(F.col("node_id").alias("src"),
                    F.col("color").alias("c_src"))
    c2 = col.select(F.col("node_id").alias("dst"),
                    F.col("color").alias("c_dst"))
    bad = (edges.filter(F.col("src") != F.col("dst"))
           .join(c1, "src").join(c2, "dst")
           .filter(F.col("c_src") == F.col("c_dst")).count())
    print(f"  monochromatic edges: {bad} (must be 0)")
    assert bad == 0

    t0 = time.time()
    mm = maximal_matching(edges)
    n_m = mm.count()
    print(f"maximal_matching: {time.time() - t0:.1f}s  matched={n_m:,}")
    # validity at scale: endpoints pairwise distinct
    ep = (mm.select(F.col("a").alias("x"))
          .unionByName(mm.select(F.col("b").alias("x"))))
    dup = ep.groupBy("x").count().filter(F.col("count") > 1).count()
    print(f"  shared endpoints: {dup} (must be 0)")
    assert dup == 0

    # --- core decomposition + temporal reachability ---------------------
    from npm_extraction_server_spark.plans.graph import (
        coreness,
        temporal_reach,
    )

    t0 = time.time()
    cn = coreness(edges)
    n_cn = cn.count()
    kmax = cn.agg(F.max("coreness")).collect()[0][0]
    print(f"coreness: {time.time() - t0:.1f}s  nodes={n_cn:,} kmax={kmax}")

    te = edges.select("src", "dst",
                      ((F.col("src") + 2 * F.col("dst")) % 50).alias("t"))
    seeds = spark.range(0, n, n // 100).select(F.col("id").alias("node_id"))
    t0 = time.time()
    tr = temporal_reach(seeds, te)
    n_tr = tr.count()
    print(f"temporal_reach: {time.time() - t0:.1f}s  reached={n_tr:,}")

    # --- Borůvka MSF over the same graph with grid weights --------------
    from npm_extraction_server_spark.plans.graph import boruvka_msf

    wedges = edges.select(
        "src", "dst",
        (1 + (3 * F.least("src", "dst")
              + 5 * F.greatest("src", "dst")) % 7).alias("w"))
    t0 = time.time()
    msf = boruvka_msf(wedges)
    n_f = msf.count()
    tw = msf.agg(F.sum("w")).collect()[0][0]
    print(f"boruvka_msf: {time.time() - t0:.1f}s  "
          f"forest_edges={n_f:,} total_weight={tw:,}")
    # the probe graph is connected (ring edge): spanning tree
    assert n_f == n - 1

    # --- characteristic sets: 10M triples / 1M subjects -----------------
    # Power-law predicate sets: subject s carries preds p0..p(k-1) with
    # k = 1 + (hash % 10), each pred with 1 + hash%2 occurrences.
    t = (
        spark.range(1_000_000)
        .select(
            F.concat(F.lit("s:"), F.col("id")).alias("subj"),
            F.explode(F.sequence(
                F.lit(0),
                F.pmod(F.xxhash64(F.col("id")), F.lit(10)))).alias("pi"),
            F.col("id"))
        .select(
            "subj",
            F.concat(F.lit("p:"), F.col("pi")).alias("pred"),
            F.explode(F.sequence(
                F.lit(0),
                F.pmod(F.xxhash64(F.col("id"), F.col("pi")),
                       F.lit(2)))).alias("oi"))
        .select("subj", "pred",
                F.concat(F.lit("o:"), F.col("oi")).alias("obj"))
        .repartition(32)
        .persist()
    )
    n_t = t.count()
    t0 = time.time()
    cs = characteristic_sets(t).collect()
    print(f"characteristic_sets: {time.time() - t0:.1f}s  "
          f"triples={n_t:,} shapes={len(cs)} "
          f"max_subjects={max(r.n_subjects for r in cs):,}")

    spark.stop()


if __name__ == "__main__":
    main()
