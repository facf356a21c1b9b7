#!/usr/bin/env python
"""Scale probe for plans/fusion.truth_discovery (batch 34).

Shape contract: the assertion set is persisted hash-partitioned on
both join sides ONCE; each of the 4 iterations moves only the trust
vector (|sources|-sized, broadcast) and the belief vector
(|facts|-sized, co-partitioned with its groupBy output) — never the
assertions. So wall time should track |assertions| once per
half-step (the map-side partial aggregation scan) and stay far from
quadratic.

Corpus: 5M assertions — 10k sources x 200k entities, each entity
claimed by ~25 sources of which ~20% are spam cliques colluding on a
wrong value (the suite's planted structure at 10,000x entity count).

Run: python tools/probe_round5s.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def main():
    from npm_extraction_server_spark.plans.fusion import truth_discovery
    from npm_extraction_server_spark.plans.session import get_spark

    spark = get_spark(app="probe5s", shuffle_partitions=64)
    n = 5_000_000
    # source id mixed with a multiplier coprime to the entity modulus:
    # each entity's 25 docs land on 25 DISTINCT sources (a first cut
    # used nested moduli — every entity collapsed to one source and
    # the dedup ate 96% of the corpus before the fixpoint ever ran)
    base = spark.range(n).select(
        ((F.col("id") * 7) % 9_973).alias("s"),
        (F.col("id") % 200_000).alias("e"))
    spam = F.col("s") % 5 == 0
    claims = base.select(
        F.concat(F.lit("src-"), F.col("s")).alias("source"),
        F.concat(F.lit("ent-"), F.col("e")).alias("entity"),
        F.lit("a").alias("attr"),
        F.when(spam, F.concat(F.lit("W"), (F.col("e") % 3 +
                                           F.col("s") % 15).cast("string")))
        .otherwise(F.concat(F.lit("T"), (F.col("e") % 7).cast("string")))
        .alias("value"))

    t0 = time.time()
    fused = truth_discovery(claims, iterations=4)
    row = fused.agg(F.count("*").alias("n"),
                    F.sum(F.col("value").startswith("T").cast("long"))
                    .alias("n_truth")).collect()[0]
    print(f"truth_discovery 5M assertions / 200k entities / 10k sources, "
          f"4 iters: {time.time() - t0:.1f} s  fused={row['n']} "
          f"truth-valued={row['n_truth']}", flush=True)


if __name__ == "__main__":
    main()
