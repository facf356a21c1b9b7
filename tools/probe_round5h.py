#!/usr/bin/env python
"""Scale probes for the final-session additions: Zipf fit, Heaps
curve (two-level prefix sum), KN bigram LM, MMR selection, CUSUM
changepoint, seasonal anomaly scan. Text ops on 5M synthetic docs
(zipfian-ish token mix), MMR on 1M 64-dim vectors, events ops on a
50M-event / 3-year hourly stream.
Run: python tools/probe_round5h.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def main() -> None:
    from npm_extraction_server_spark.operators.similarity import mmr_select
    from npm_extraction_server_spark.operators.text import (
        heaps_curve, kn_bigram_lm, zipf_fit)
    from npm_extraction_server_spark.plans.session import get_spark

    spark = get_spark(app="probe_round5h")

    # 5M docs, 2 langs, ~12 tokens each; token ids drawn from a
    # power-ish mix (id % k for several k) so counts are skewed like
    # real text and the top-64 window has real work to prune
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
    zf = zipf_fit(docs, top_ranks=64).collect()
    print(f"zipf_fit 5M docs: {time.time() - t0:.1f}s  "
          f"{[(r.lang, r.vocab_size, r.zipf_slope) for r in zf]}")

    t0 = time.time()
    hc = heaps_curve(docs, every=65536).orderBy("lang", "doc_rank")
    rows = hc.collect()
    last = [r for r in rows if r.lang == "en"][-1]
    print(f"heaps_curve 5M docs (bucketed prefix sum): "
          f"{time.time() - t0:.1f}s  checkpoints={len(rows)}  "
          f"en last: rank={last.doc_rank:,} N={last.cum_tokens:,} "
          f"V={last.cum_vocab:,} beta={last.heaps_beta}")

    t0 = time.time()
    kn = kn_bigram_lm(docs, top=100).collect()
    print(f"kn_bigram 5M docs: {time.time() - t0:.1f}s  "
          f"top c12={kn[0].c12:,} p_kn={kn[0].p_kn}")
    docs.unpersist()

    # MMR: 1M 64-dim deterministic vectors, 8 query vectors
    nv = 1_000_000
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: ((F.col("id") * (i + 3) + i * 17) % 1000)
        .cast("float") / 1000.0)
    emb = spark.range(nv).select(F.col("id").alias("vec_id"),
                                 vec.alias("embedding")) \
        .repartition(32).persist()
    print(f"vectors: {emb.count():,}")
    t0 = time.time()
    sel = mmr_select(emb, emb.filter(F.col("vec_id") < 8), k=4,
                     pool=12, lam=0.7).collect()
    print(f"mmr_select 1M vectors, 8 queries: {time.time() - t0:.1f}s  "
          f"rows={len(sel)}")
    emb.unpersist()

    # events: 50M events spread over ~3 years of hour slots, 4 types
    # (near-uniform rates: the probe measures grid/window throughput,
    # not detection semantics — those are pinned by pytest + oracles)
    ne = 50_000_000
    ev = spark.range(ne).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1500000000)
            + (F.col("id") % 26280) * 3600        # hour slot (3y)
            + (F.col("id") * 37 % 3600)).alias("ts"),
        F.concat(F.lit("u"), (F.col("id") % 100000).cast("string"))
        .alias("user_id"),
        F.concat(F.lit("e"), (F.col("id") % 4).cast("string"))
        .alias("event_type"),
        F.lit(1.0).alias("value"), F.lit("{}").alias("props"),
    ).repartition(32).persist()
    print(f"events: {ev.count():,}")

    import tempfile
    sfdir = tempfile.mkdtemp(prefix="probe5h_ev_")
    ev.write.mode("overwrite").parquet(f"{sfdir}/events.parquet")
    ev.unpersist()

    from npm_extraction_server_spark.operators.suite import (
        events_changepoint, events_seasonality)

    t0 = time.time()
    cp = events_changepoint(spark, sfdir).collect()
    print(f"events_changepoint 50M events / 26k-hour grid: "
          f"{time.time() - t0:.1f}s  rows={len(cp)}  "
          f"alarms={sum(1 for r in cp if r.alarm)}")

    t0 = time.time()
    se = events_seasonality(spark, sfdir).collect()
    print(f"events_seasonality 50M events: {time.time() - t0:.1f}s  "
          f"anomalous_hours={len(se)}")

    spark.stop()


if __name__ == "__main__":
    main()
