#!/usr/bin/env python
"""Scale probes for the batch-14 operators: Kaplan-Meier survival
(events_survival) and Gini activity concentration (events_gini) on a
50M-event / 1M-user stream with a skewed per-user activity profile
(user u_k gets ~50/(1+k%97) events, so the count histogram is wide
and the Gini is far from 0). Run: python tools/probe_round5k.py
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
        events_gini, events_survival)
    from npm_extraction_server_spark.plans.session import get_spark

    spark = get_spark(app="probe_round5k")

    ne = 50_000_000
    # skewed user assignment: id -> user via a quadratic hash mod 1M,
    # biased so low user ids collect many more events (whales)
    ev = spark.range(ne).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1500000000)
            + (F.col("id") % 8760) * 3600
            + (F.col("id") * 37 % 3600)).alias("ts"),
        F.concat(F.lit("u"), ((F.col("id") * F.col("id") + F.col("id"))
                              % 1_000_000).cast("string"))
        .alias("user_id"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("signup"),
                    F.lit("purchase")),
            ((F.col("id") * 131) % F.when(F.col("id") % 11 == 0, 4)
             .otherwise(3)).cast("int") + 1).alias("event_type"),
        F.lit(1.0).alias("value"), F.lit("{}").alias("props"),
    ).repartition(32)
    sfdir = tempfile.mkdtemp(prefix="probe5k_ev_")
    ev.write.mode("overwrite").parquet(f"{sfdir}/events.parquet")
    print("events: 50,000,000 written (quadratic-hash skewed users)")

    t0 = time.time()
    rows = events_gini(spark, sfdir).collect()
    dt = time.time() - t0
    print(f"events_gini 50M events / ~1M users: {dt:.1f}s")
    for r in sorted(rows, key=lambda r: r.event_type):
        print(f"  {r.event_type:8s} n_users={r.n_users:,} "
              f"total={r.total_events:,} gini={r.gini:.6f}")

    t0 = time.time()
    n = events_survival(spark, sfdir, horizon_h=2000).count()
    dt = time.time() - t0
    print(f"events_survival 50M events / ~1M users / 2000h horizon: "
          f"{dt:.1f}s  curve_rows={n:,}")


if __name__ == "__main__":
    main()
