#!/usr/bin/env python
"""Scale probes for the last round-5 graph additions: trussness,
rich-club curve, power-law estimator, and the Broder bow-tie census.

Trussness/rich-club/powerlaw run on the repo's standard 2M-node / 6M-
edge probe graph, trussness with 100 planted 12-cliques so the
ascending peel exercises ten threshold bumps (trussness 12) above the
triangle-sparse bulk (trussness 2). Bow-tie runs on a 2M-node crawl
shape: a 500k-node core ring + HASH chords (an expander — SCC's
forward min-id coloring is diameter-bound, so a chord-13 ring would
cost ~38k rounds; the hash chords make it O(log)), layered IN/OUT
bands of depth 4, plus tube/tendril/disc structures.
Run: python tools/probe_round5f.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def main() -> None:
    from npm_extraction_server_spark.plans.graph import (
        bowtie,
        degree_powerlaw,
        rich_club,
        trussness,
    )
    from npm_extraction_server_spark.plans.session import get_spark

    spark = get_spark(app="probe_round5f")

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
    rc = rich_club(edges).collect()
    print(f"rich_club: {time.time() - t0:.1f}s  thresholds={len(rc)}  "
          f"curve={[(r.k, r.n_k, round(r.phi, 5)) for r in rc[:4]]}")

    t0 = time.time()
    pl = degree_powerlaw(edges, d_min=2).first()
    print(f"degree_powerlaw: {time.time() - t0:.1f}s  "
          f"n_tail={pl.n_tail:,} d_max={pl.d_max} alpha={pl.alpha}")

    # plant 100 12-cliques on fresh ids so the ascending peel climbs
    # to k=12 (clique-edge support 10) above the triangle-sparse bulk
    cl = spark.range(100 * 12).select(
        (F.col("id") / 12).cast("long").alias("c"),
        (F.col("id") + n).alias("m"))
    cl2 = cl.withColumnRenamed("m", "m2")
    cliques = (cl.join(cl2, "c")
               .filter(F.col("m") < F.col("m2"))
               .select(F.col("m").alias("src"), F.col("m2").alias("dst")))
    tr_edges = edges.unionByName(cliques).localCheckpoint(eager=True)

    t0 = time.time()
    tr = trussness(tr_edges)
    n_edges = tr.count()
    hist = {r.trussness: r.c for r in
            tr.groupBy("trussness").agg(F.count("*").alias("c")).collect()}
    print(f"trussness(+cliques): {time.time() - t0:.1f}s  "
          f"edges={n_edges:,}  hist={dict(sorted(hist.items()))}")
    edges.unpersist()

    # bow-tie-shaped crawl graph: 500k core (ring + every-5th chord),
    # IN/OUT as 4 layered 125k bands (depth 4, fan-in 1 + a skip), and
    # planted tube/tendril/disc structures
    m = 500_000
    core_ids = spark.range(m)
    core = (core_ids.select(F.col("id").alias("src"),
                            ((F.col("id") + 1) % m).alias("dst"))
            .unionByName(core_ids.filter(F.col("id") % 5 == 0)
                         .select(F.col("id").alias("src"),
                                 ((F.col("id") * 7 + 3) % m).alias("dst"))))
    lay = spark.range(m)
    inn = (lay.select((F.col("id") + m).alias("src"),
                      F.when(F.col("id") < 125_000, F.col("id"))
                      .otherwise(F.col("id") + m - 125_000).alias("dst")))
    out = (lay.select(
        F.when(F.col("id") < 125_000, F.col("id"))
        .otherwise(F.col("id") + 2 * m - 125_000).alias("src"),
        (F.col("id") + 2 * m).alias("dst")))
    extras = spark.range(100_000)
    tube = (extras.select((F.col("id") + m + 125_000).alias("src"),
                          (F.col("id") + 3 * m).alias("dst"))
            .unionByName(extras.select(
                (F.col("id") + 3 * m).alias("src"),
                (F.col("id") + 2 * m + 125_000).alias("dst"))))
    disc = extras.select((F.col("id") + 3 * m + 200_000).alias("src"),
                         (F.col("id") + 3 * m + 300_000).alias("dst"))
    bt_edges = (core.unionByName(inn).unionByName(out)
                .unionByName(tube).unionByName(disc)
                .repartition(32).persist())
    print(f"bowtie edges: {bt_edges.count():,}")

    t0 = time.time()
    bw = bowtie(bt_edges)
    sizes = {r.component: r.c for r in
             bw.groupBy("component").agg(F.count("*").alias("c")).collect()}
    print(f"bowtie: {time.time() - t0:.1f}s  sizes={dict(sorted(sizes.items()))}")

    spark.stop()


if __name__ == "__main__":
    main()
