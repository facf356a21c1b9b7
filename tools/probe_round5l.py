#!/usr/bin/env python
"""Scale probes for the batch-15 operators: association-rule mining
(assoc_rules on 20M basket-item rows / 4M baskets with a zipf-ish
item head) and hourly autocorrelation (ts_autocorr on 50M events /
8,760-hour grid / 4 types). Run: python tools/probe_round5l.py
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def main() -> None:
    from npm_extraction_server_spark.operators.assoc import assoc_rules
    from npm_extraction_server_spark.operators.suite import ts_autocorr
    from npm_extraction_server_spark.plans.session import get_spark

    spark = get_spark(app="probe_round5l")

    # --- assoc_rules: 20M rows, 4M baskets, 5 items each ----------
    # two CORRELATED head items per basket (31-item head -> each head
    # pair co-occurs in ~4M/961 = 4k baskets, far past min_supp) plus
    # three ~unique tail items from a 100,003-item space that the
    # A-priori prune must kill before pair generation
    nr = 20_000_000
    b = F.col("id") % 4_000_000
    j = (F.col("id") / F.lit(4_000_000)).cast("bigint")
    rows = spark.range(nr).select(
        b.alias("basket"),
        F.when(j == 0, F.concat(F.lit("h"), (b % 31).cast("string")))
        .when(j == 1, F.concat(F.lit("h"), ((b * 7) % 31).cast("string")))
        .otherwise(F.concat(F.lit("t"), ((F.col("id") * 15485863)
                                         % 100_003).cast("string")))
        .alias("item"))
    t0 = time.time()
    got = assoc_rules(rows, min_supp=1000)
    n = got.count()
    dt = time.time() - t0
    print(f"assoc_rules 20M rows / 4M baskets / 100k+31 items "
          f"(min_supp=1000): {dt:.1f}s  rules={n:,}")

    # --- ts_autocorr: 50M events on an 8,760-hour grid -------------
    ne = 50_000_000
    ev = spark.range(ne).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1500000000)
            + (F.col("id") % 8760) * 3600
            + (F.col("id") * 37 % 3600)).alias("ts"),
        F.concat(F.lit("u"), (F.col("id") % 100000).cast("string"))
        .alias("user_id"),
        F.concat(F.lit("e"), (F.col("id") % 4).cast("string"))
        .alias("event_type"),
        F.lit(1.0).alias("value"), F.lit("{}").alias("props"),
    ).repartition(32)
    sfdir = tempfile.mkdtemp(prefix="probe5l_ev_")
    ev.write.mode("overwrite").parquet(f"{sfdir}/events.parquet")
    print("events: 50,000,000 written (8,760-hour grid, 4 types)")

    t0 = time.time()
    n = ts_autocorr(spark, sfdir).count()
    dt = time.time() - t0
    print(f"ts_autocorr 50M events / 8,760-hour grid x 24 lags: "
          f"{dt:.1f}s  rows={n:,}")

    from npm_extraction_server_spark.operators.suite import events_rfm

    t0 = time.time()
    n = events_rfm(spark, sfdir).count()
    dt = time.time() - t0
    print(f"events_rfm 50M events / 100k users: {dt:.1f}s  cells={n:,}")


if __name__ == "__main__":
    main()
