#!/usr/bin/env python
"""Scale probes for the batch-26/27/28 operators.

- louvain_levels: 2M-node planted-partition graph (200k blocks of 10:
  an intra-block ring + one inter-block bridge each, |E| = 2.2M) —
  level 1 must recover block-scale communities, level 2 merges along
  the bridge chain; per-round cost is the |E| label join.
- mutual-kNN + CC at 200k x 64 via the LSH path (the documented scale
  swap for sim_knn_components' brute baseline).
- ts_theilsen machinery at 50M events over a ~2.1k-hour span: the
  pairwise expansion runs on the dense GRID (|hours|^2 per type),
  never on events — wall must track grid size, not event count.

Run: python tools/probe_round5q.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def t(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time() - t0:.1f} s  {out}")


def main() -> None:
    from npm_extraction_server_spark.operators.similarity import lsh_topk
    from npm_extraction_server_spark.plans.graph import louvain_levels
    from npm_extraction_server_spark.plans.linking import (
        connected_components,
    )
    from npm_extraction_server_spark.plans.session import get_spark

    spark = get_spark(app="probe_round5q")

    # --- Louvain L2 at 2M nodes ------------------------------------------
    n = 2_000_000
    ids = spark.range(n)
    intra = ids.select(
        F.col("id").alias("src"),
        (F.col("id") - F.col("id") % 10
         + (F.col("id") % 10 + 1) % 10).alias("dst"))
    inter = (ids.filter(F.col("id") % 10 == 0)
             .select(F.col("id").alias("src"),
                     ((F.col("id") + 10) % n).alias("dst")))
    edges = intra.unionByName(inter)
    t("louvain_levels 2M nodes / 2.2M edges", lambda: louvain_levels(
        edges, rounds=3, levels=2)
      .agg(F.countDistinct("community"), F.count("*")).collect())

    # --- mutual-kNN + CC at 200k via LSH ---------------------------------
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda i: (F.pmod(F.xxhash64(F.col("id") * F.lit(1000) + i),
                          F.lit(2000)).cast("float") - 1000.0) / 1000.0)
    emb = spark.range(200_000).select(
        F.col("id").alias("vec_id"), vec.alias("embedding"))

    def knn_cc():
        # self-join regime: shuffle bucket join (no 200k-row query
        # broadcast) and 2^14 buckets so candidate volume is
        # ~sum n_i*n_q per bucket ~ 10M, not the bits=8 default's
        # 625M (which also carried vectors before the lsh_topk
        # score-before-dedup fix this probe drove — ~400 GB of spill)
        nn = lsh_topk(emb, emb, k=3, bits=14,
                      broadcast_queries=False).localCheckpoint(eager=True)
        a, b = nn.alias("a"), nn.alias("b")
        mutual = (a.join(b, (F.col("a.query_id") == F.col("b.item_id"))
                         & (F.col("a.item_id") == F.col("b.query_id")))
                  .filter(F.col("a.query_id") < F.col("a.item_id"))
                  .select(F.col("a.query_id").alias("x"),
                          F.col("a.item_id").alias("y")))
        nid = lambda c: F.lpad(c.cast("string"), 8, "0")
        cc = connected_components(
            emb.select(nid(F.col("vec_id")).alias("entity_iri")),
            mutual.select(nid(F.col("x")).alias("src"),
                          nid(F.col("y")).alias("dst")))
        return cc.agg(F.countDistinct("canonical_id")).collect()

    t("mutual-kNN(LSH) + CC 200k x 64", knn_cc)

    # --- Theil-Sen grid scaling at 50M events ----------------------------
    ev = spark.range(50_000_000).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(1500000000)
                            + (F.col("id") % 7_500_000)).alias("ts"),
        (F.col("id") % 1_000_000).alias("user_id"),
        F.concat(F.lit("t"), (F.col("id") % 8).cast("string"))
        .alias("event_type"),
        F.lit(0.0).alias("value"), F.lit("{}").alias("props"))

    def theilsen():
        import npm_extraction_server_spark.operators.suite as suite
        orig = suite._t
        suite._t = lambda spark, sf, name: ev
        try:
            return suite.ts_theilsen(spark, "probe").collect()[:2]
        finally:
            suite._t = orig

    t("ts_theilsen 50M events / 2084-hour grid", theilsen)


if __name__ == "__main__":
    main()
