#!/usr/bin/env python
"""Scale probes for the final round-5 additions: 1-WL color
refinement, bipartite projection + butterfly counting, and DSIR
importance weighting.

WL: the repo's standard 2M-node / 6M-edge probe graph, 3 rounds.
Bipartite: 2M left x 500k right, 6M membership edges with a planted
hot right-node (50k degree) to prove the hub cap is what makes the
wedge join survivable — an uncapped hot hub implies C(50k,2) ~ 1.2B
wedges from ONE right node.
DSIR: 5M synthetic docs scored against a 1M-doc target split.
Run: python tools/probe_round5e.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def main() -> None:
    from npm_extraction_server_spark.operators.text import dsir_logweights
    from npm_extraction_server_spark.plans.graph import (
        bipartite_project,
        butterfly_counts,
        wl_refinement,
    )
    from npm_extraction_server_spark.plans.session import get_spark

    spark = get_spark(app="probe_round5e")

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
    print(f"wl edges: {edges.count():,}")

    t0 = time.time()
    wl = wl_refinement(edges, rounds=3)
    n_nodes = wl.count()
    n_colors = wl.select("wl_color").distinct().count()
    print(f"wl_refinement rounds=3: {time.time() - t0:.1f}s  "
          f"nodes={n_nodes:,} colors={n_colors:,}")
    edges.unpersist()

    # bipartite: u in [0, 2M), v in [0, 500k), 3 memberships per u,
    # plus a planted hot right node v=0 with 50k extra members
    nl, nr = 2_000_000, 500_000
    bu = spark.range(nl)
    be = (
        bu.select(F.col("id").alias("u"),
                  ((F.col("id") * 11 + 1) % nr).alias("v"))
        .unionByName(bu.select(F.col("id").alias("u"),
                               ((F.col("id") * 17 + 5) % nr).alias("v")))
        .unionByName(bu.select(F.col("id").alias("u"),
                               ((F.col("id") * 23 + 9) % nr).alias("v")))
        .unionByName(
            spark.range(50_000).select((F.col("id") * 40 + 7).alias("u"),
                                       F.lit(0).alias("v")))
        .repartition(32)
        .persist()
    )
    print(f"bipartite edges: {be.count():,}")

    t0 = time.time()
    pairs = bipartite_project(be, min_common=2, max_degree=1000)
    npairs = pairs.count()
    print(f"bipartite_project cap=1000: {time.time() - t0:.1f}s  "
          f"pairs(common>=2)={npairs:,}")

    t0 = time.time()
    bf = butterfly_counts(be, max_degree=1000)
    nbf = bf.count()
    tot = bf.agg(F.sum("butterflies")).first()[0]
    print(f"butterfly_counts cap=1000: {time.time() - t0:.1f}s  "
          f"vertices={nbf:,} global={int(tot or 0) // 2:,}")
    be.unpersist()

    # DSIR: 5M docs, each a deterministic 12-word sentence drawn from
    # two vocab pools; target = the wiki-like pool (doc_id % 5 == 0)
    nd = 5_000_000
    docs = spark.range(nd).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", *[
                F.concat(
                    F.when(F.col("id") % 5 == 0, F.lit("wiki"))
                    .otherwise(F.lit("web")),
                    ((F.col("id") * (3 + i) + i) % 5000).cast("string"))
                for i in range(12)
            ]).alias("text"))
    docs = docs.repartition(32).persist()
    print(f"dsir docs: {docs.count():,}")

    t0 = time.time()
    w = dsir_logweights(docs, docs.filter(F.col("doc_id") % 5 == 0))
    nw = w.count()
    hi = w.orderBy(F.col("logw").desc()).limit(3).collect()
    print(f"dsir_logweights: {time.time() - t0:.1f}s  scored={nw:,}  "
          f"top logw={[(r.doc_id % 5, round(r.logw, 2)) for r in hi]}")

    spark.stop()


if __name__ == "__main__":
    main()
