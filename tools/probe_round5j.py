#!/usr/bin/env python
"""Scale probes for the batch-9..12 operators: GROUPING SETS,
interval join, EWMA, char-bigram entropy, DAU/WAU. Events ops on the
probe_round5h 50M-event stream (reparameterized so users span types),
entropy on 5M docs, grouping sets on a 50M-row orders-like table.
Run: python tools/probe_round5j.py
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
        events_dau_wau, g4_grouping_sets, j13_interval_join,
        text_char_entropy, ts_ewma)
    from npm_extraction_server_spark.plans.session import get_spark

    spark = get_spark(app="probe_round5j")

    ne = 50_000_000
    ev = spark.range(ne).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1500000000)
            + (F.col("id") % 26280) * 3600
            + (F.col("id") * 37 % 3600)).alias("ts"),
        F.concat(F.lit("u"), ((F.col("id") * 13) % 100000)
                 .cast("string")).alias("user_id"),
        F.concat(F.lit("e"), (F.col("id") % 4).cast("string"))
        .alias("event_type"),
        F.lit(1.0).alias("value"), F.lit("{}").alias("props"),
    ).repartition(32)
    sfdir = tempfile.mkdtemp(prefix="probe5j_ev_")
    ev.write.mode("overwrite").parquet(f"{sfdir}/events.parquet")
    print("events: 50,000,000 written")

    t0 = time.time()
    n = ts_ewma(spark, sfdir).count()
    print(f"ts_ewma 50M events / 26k-hour grid x 24 lags: "
          f"{time.time() - t0:.1f}s  rows={n:,}")

    t0 = time.time()
    n = j13_interval_join(spark, sfdir).count()
    print(f"j13_interval_join 50M events x 2.4k windows: "
          f"{time.time() - t0:.1f}s  rows={n:,}")

    t0 = time.time()
    n = events_dau_wau(spark, sfdir).count()
    print(f"events_dau_wau 50M events / 100k users / ~1100 days: "
          f"{time.time() - t0:.1f}s  rows={n:,}")

    # orders-like table for grouping sets
    no = 50_000_000
    orders = spark.range(no).select(
        F.col("id").alias("o_orderkey"),
        F.concat(F.lit("S"), (F.col("id") % 3).cast("string"))
        .alias("o_orderstatus"),
        F.concat(F.lit("P"), (F.col("id") % 5).cast("string"))
        .alias("o_orderpriority"),
        ((F.col("id") % 100000) / 100.0).alias("o_totalprice"),
    ).repartition(32)
    odir = tempfile.mkdtemp(prefix="probe5j_ord_")
    orders.write.mode("overwrite").parquet(f"{odir}/orders.parquet")
    t0 = time.time()
    n = g4_grouping_sets(spark, odir).count()
    print(f"g4_grouping_sets 50M orders: {time.time() - t0:.1f}s  "
          f"rows={n:,}")

    nd = 5_000_000
    docs = spark.range(nd).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[
            F.concat(F.lit("t"),
                     ((F.col("id") * (7 + 3 * i) + i) % (50 * (i + 1)))
                     .cast("string"))
            for i in range(12)]).alias("text"),
    ).repartition(32)
    ddir = tempfile.mkdtemp(prefix="probe5j_doc_")
    docs.write.mode("overwrite").parquet(f"{ddir}/documents.parquet")
    t0 = time.time()
    n = text_char_entropy(spark, ddir).count()
    print(f"text_char_entropy 5M docs (~300M bigrams): "
          f"{time.time() - t0:.1f}s  rows={n:,}")

    spark.stop()


if __name__ == "__main__":
    main()
