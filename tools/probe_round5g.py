#!/usr/bin/env python
"""Scale probes for the last additions: IC cascade, Katz centrality,
domain KL, Markov transitions. Graph ops on the standard 2M-node / 6M-
edge probe graph; text/events on 5M synthetic rows.
Run: python tools/probe_round5g.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def main() -> None:
    from npm_extraction_server_spark.operators.text import domain_kl
    from npm_extraction_server_spark.plans.graph import ic_cascade, katz
    from npm_extraction_server_spark.plans.session import get_spark

    spark = get_spark(app="probe_round5g")

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

    seeds = spark.range(20).select((F.col("id") * 99991).alias("node_id"))
    t0 = time.time()
    ic = ic_cascade(edges, seeds, rounds=8, p_num=1, p_den=3)
    per_round = {r.round: r.c for r in
                 ic.groupBy("round").agg(F.count("*").alias("c"))
                 .collect()}
    print(f"ic_cascade p=1/3 rounds=8: {time.time() - t0:.1f}s  "
          f"activated={sum(per_round.values()):,}  "
          f"per_round={dict(sorted(per_round.items()))}")

    t0 = time.time()
    kz = katz(edges, iterations=4, decay_pow=1)
    nk = kz.count()
    top = kz.orderBy(F.col("katz").desc()).limit(3).collect()
    print(f"katz K=4: {time.time() - t0:.1f}s  nodes={nk:,}  "
          f"top={[(r.node_id, r.katz) for r in top]}")
    edges.unpersist()

    # domain KL: 5M docs across 8 domains with two vocab regimes
    nd = 5_000_000
    docs = spark.range(nd).select(
        F.concat(F.lit("dom"), (F.col("id") % 8).cast("string"))
        .alias("source"),
        F.concat_ws(" ", *[
            F.concat(
                F.when(F.col("id") % 8 < 4, F.lit("web"))
                .otherwise(F.lit("wiki")),
                ((F.col("id") * (3 + i) + i) % 3000).cast("string"))
            for i in range(10)]).alias("text")
    ).repartition(32).persist()
    print(f"kl docs: {docs.count():,}")

    t0 = time.time()
    kl = domain_kl(docs).collect()
    cross = [r for r in kl
             if (r.domain_a < "dom4") != (r.domain_b < "dom4")]
    within = [r for r in kl
              if (r.domain_a < "dom4") == (r.domain_b < "dom4")]
    print(f"domain_kl 8 domains: {time.time() - t0:.1f}s  "
          f"pairs={len(kl)}  "
          f"mean_cross={sum(r.kl_ab for r in cross) / len(cross):.3f}  "
          f"mean_within={sum(r.kl_ab for r in within) / len(within):.3f}")
    docs.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
