#!/usr/bin/env python
"""Scale probes for the batch-6/7 operators: Good-Turing tail,
inter-arrival burstiness, last-touch attribution. Same synthetic
shapes as probe_round5h (5M docs / 50M events).
Run: python tools/probe_round5i.py
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def main() -> None:
    from npm_extraction_server_spark.operators.suite import (
        events_attribution, events_burstiness)
    from npm_extraction_server_spark.operators.text import good_turing
    from npm_extraction_server_spark.plans.session import get_spark

    spark = get_spark(app="probe_round5i")

    nd = 5_000_000
    docs = spark.range(nd).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit("en")).otherwise(F.lit("es"))
        .alias("lang"),
        F.concat_ws(" ", *[
            F.concat(F.lit("t"),
                     ((F.col("id") * (7 + 3 * i) + i) % (50 * (i + 1)))
                     .cast("string"))
            for i in range(12)]).alias("text"),
    ).repartition(32).persist()
    print(f"docs: {docs.count():,}")

    t0 = time.time()
    gt = good_turing(docs, max_freq=10).collect()
    en = [r for r in gt if r.lang == "en"]
    print(f"good_turing 5M docs: {time.time() - t0:.1f}s  rows={len(gt)}  "
          f"en smallest r={en[0].r} n_r={en[0].n_r} "
          f"unseen={en[0].unseen_mass}")
    docs.unpersist()

    ne = 50_000_000
    ev = spark.range(ne).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1500000000)
            + (F.col("id") % 26280) * 3600
            + (F.col("id") * 37 % 3600)).alias("ts"),
        F.concat(F.lit("u"), (F.col("id") % 100000).cast("string"))
        .alias("user_id"),
        F.concat(F.lit("e"), (F.col("id") % 4).cast("string"))
        .alias("event_type"),
        F.lit(1.0).alias("value"), F.lit("{}").alias("props"),
    ).repartition(32)
    sfdir = tempfile.mkdtemp(prefix="probe5i_ev_")
    ev.write.mode("overwrite").parquet(f"{sfdir}/events.parquet")
    print(f"events: 50,000,000 written")

    t0 = time.time()
    b = events_burstiness(spark, sfdir).collect()
    print(f"events_burstiness 50M events / 100k users: "
          f"{time.time() - t0:.1f}s  "
          f"{[(r.event_type, r.burstiness) for r in sorted(b)[:2]]}")

    t0 = time.time()
    a = events_attribution(spark, sfdir, conversion="e0").collect()
    print(f"events_attribution 50M events: {time.time() - t0:.1f}s  "
          f"{sorted((r.touch_type, r.n_conversions) for r in a)}")

    spark.stop()


if __name__ == "__main__":
    main()
