#!/usr/bin/env python
"""Scale probes for the batch-17 operators.

- resolve_redirects: 5M-src redirect map with chains up to 1,023 hops
  (binary-carry structure), a 100k-member cycle, and feeders into it —
  pointer doubling must collapse everything in ceil(log2(2048)) = 11
  rounds, never chain-length rounds.
- spam_mass (TrustRank): the 2M-node / 6M-edge hash-expander family
  graph with a 1k-host trusted seed set.
- ifp_smush: 5M mentions x 2 IFP assertions over 100k mailboxes and
  80k homepages (star edges + CC; the supercritical regime where the
  equivalence closes into giant classes).
- simrank: the documented per-ER-block contract — 20k blocked
  entities with in-degree <= 3, 3 iterations; reports pair-frame
  growth per round.

Run: python tools/probe_round5m.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def main() -> None:
    from npm_extraction_server_spark.extract.links import resolve_redirects
    from npm_extraction_server_spark.plans.graph import simrank, spam_mass
    from npm_extraction_server_spark.plans.linking import ifp_smush
    from npm_extraction_server_spark.plans.session import get_spark

    spark = get_spark(app="probe_round5m")

    # --- redirect chains -------------------------------------------------
    # ids 0..5M: id -> id - lowbit(id) pattern gives chains whose hop
    # count is popcount(id) <= 23; to get LONG chains, ids < 2^20 use
    # id -> id-1 when id % 1024 != 0 (chains up to 1023); a 100k-cycle
    # on [5M, 5.1M); feeders 4.9M..5M -> cycle members.
    n = 5_000_000
    base = spark.range(n).select(F.col("id"))
    chain = base.filter((F.col("id") % 1024 != 0) & (F.col("id") > 0)) \
        .select(F.col("id").alias("s"), (F.col("id") - 1).alias("d"))
    cyc = spark.range(100_000).select(
        (F.col("id") + n).alias("s"),
        ((F.col("id") + 1) % 100_000 + n).alias("d"))
    feed = spark.range(100_000).select(
        (F.col("id") + n - 100_000).alias("s"),
        (F.col("id") + n).alias("d"))
    red = (chain.filter(F.col("s") < n - 100_000)
           .unionByName(cyc).unionByName(feed)
           .select(F.concat(F.lit("u"), F.col("s").cast("string"))
                   .alias("src_url"),
                   F.concat(F.lit("u"), F.col("d").cast("string"))
                   .alias("dst_url"))
           .repartition(32))
    red = red.localCheckpoint(eager=True)
    n_red = red.count()
    t0 = time.time()
    out = resolve_redirects(red, max_hops=2048)
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum(F.col("unresolved").cast("long")).alias("unres"),
        F.max("hops").alias("max_hops"),
        F.sum("hops").alias("tot_hops")).collect()[0]
    dt = time.time() - t0
    print(f"resolve_redirects {n_red:,} redirects: {dt:.1f}s  "
          f"rows={agg['n']:,} unresolved={agg['unres']:,} "
          f"max_hops={agg['max_hops']} (11 doubling rounds)")

    # --- TrustRank / spam mass -------------------------------------------
    nv = 2_000_000
    ids = spark.range(nv)
    ring = ids.select(F.col("id").alias("src"),
                      ((F.col("id") + 1) % nv).alias("dst"))
    chord1 = ids.select(F.col("id").alias("src"),
                        ((F.col("id") * 7 + 13) % nv).alias("dst"))
    chord2 = ids.select(F.col("id").alias("src"),
                        ((F.col("id") * 131 + 7) % nv).alias("dst"))
    e = ring.unionByName(chord1).unionByName(chord2)
    edges = (e.unionByName(e.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst")))
             .repartition(32).localCheckpoint(eager=True))
    ne = edges.count()
    seeds = spark.range(1000).select((F.col("id") * 1999).alias("node_id"))
    t0 = time.time()
    sm = spam_mass(edges, seeds, iterations=5)
    stats = sm.agg(F.count("*").alias("n"),
                   F.min("spam_mass").alias("lo"),
                   F.max("spam_mass").alias("hi")).collect()[0]
    dt = time.time() - t0
    print(f"spam_mass 2M nodes / {ne:,} directed edges, 1k seeds: "
          f"{dt:.1f}s  rows={stats['n']:,} "
          f"spam_mass=[{stats['lo']:.4f}, {stats['hi']:.4f}]")

    # --- IFP smushing ------------------------------------------------------
    nm = 5_000_000
    m = spark.range(nm).select(
        F.concat(F.lit("ent:m"), F.lpad(F.col("id").cast("string"),
                                        8, "0")).alias("subj"),
        (F.col("id") * 2654435761 % 100_000).alias("vm"),
        (F.col("id") * 40503 % 80_000).alias("vh"))
    trip = (m.select("subj", F.lit("foaf:mbox").alias("pred"),
                     F.concat(F.lit("mailto:u"),
                              F.col("vm").cast("string")).alias("obj"))
            .unionByName(
                m.select("subj", F.lit("foaf:homepage").alias("pred"),
                         F.concat(F.lit("http://h/"),
                                  F.col("vh").cast("string"))
                         .alias("obj")))
            .repartition(32).localCheckpoint(eager=True))
    trip.count()
    t0 = time.time()
    sm2 = ifp_smush(trip, ["foaf:mbox", "foaf:homepage"])
    cl = sm2.agg(F.count("*").alias("n"),
                 F.countDistinct("canonical_id").alias("classes")) \
        .collect()[0]
    dt = time.time() - t0
    print(f"ifp_smush 5M mentions / 180k IFP values: {dt:.1f}s  "
          f"entities={cl['n']:,} classes={cl['classes']:,}")

    # --- SimRank (per-block contract) --------------------------------------
    nb = 20_000
    blk = spark.range(nb).select(F.col("id"))
    eb = (blk.filter(F.col("id") % 5 != 0)
          .select(F.col("id").alias("src"),
                  (F.col("id") - F.col("id") % 5).alias("dst"))
          .unionByName(blk.select(
              F.col("id").alias("src"),
              ((F.col("id") * 13 + 1) % nb).alias("dst"))))
    t0 = time.time()
    sr = simrank(eb, iterations=3)
    cnt = sr.count()
    dt = time.time() - t0
    print(f"simrank 20k-entity ER block, 3 iters: {dt:.1f}s  "
          f"nonzero pairs (u<v) = {cnt:,}")


if __name__ == "__main__":
    main()
