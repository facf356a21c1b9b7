#!/usr/bin/env python
"""Scale probes for the batch-32/33 operators.

- fastrp_embeddings: 2M nodes / 6M edges (the family's standard
  expander), 8 dims x 2 rounds — per-round cost must track the |E|
  label join times dims (the pagerank shape), never quadratic.
- sq8_topk / matryoshka_topk: 500k x 64 corpus, 20 planted queries —
  both are one broadcast-query scan + rerank window; SQ8's scan reads
  1 byte/dim codes, MRL's reads the 16-dim prefix.
- kg_text_mentions shape at 5M docs: regex explode + broadcast
  dictionary join (100k names).

Run: python tools/probe_round5r.py
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
    print(f"{label}: {time.time() - t0:.1f} s  {str(out)[:160]}", flush=True)


def main() -> None:
    from npm_extraction_server_spark.operators.similarity import (
        matryoshka_topk,
        sq8_topk,
    )
    from npm_extraction_server_spark.plans.graph import fastrp_embeddings
    from npm_extraction_server_spark.plans.session import get_spark

    spark = get_spark(app="probe_round5r")

    # --- FastRP at 2M nodes / 6M edges -----------------------------------
    n = 2_000_000
    ids = spark.range(n)
    e = (ids.select(F.col("id").alias("src"),
                    ((F.col("id") * 7 + 3) % n).alias("dst"))
         .unionByName(ids.select(
             F.col("id").alias("src"),
             ((F.col("id") * 13 + 5) % n).alias("dst")))
         .unionByName(ids.select(F.col("id").alias("src"),
                                 ((F.col("id") + 1) % n).alias("dst"))))
    t("fastrp 2M nodes / 6M edges, 8 dims x 2 rounds",
      lambda: fastrp_embeddings(e, dims=8, rounds=2)
      .agg(F.count("*"), F.round(F.sum(F.abs("f0")), 2)).collect())

    # --- SQ8 / MRL at 500k x 64 ------------------------------------------
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda i: (F.pmod(F.xxhash64(F.col("id") * F.lit(1000) + i),
                          F.lit(2000)).cast("float") - 1000.0) / 1000.0)
    emb = spark.range(500_000).select(
        F.col("id").alias("vec_id"), vec.alias("embedding"))
    q = (spark.range(20).select(
        (F.col("id") + 10_000_000).alias("vec_id"),
        F.transform(vec, lambda x, i: x + 0.001 * i.cast("float"))
        .alias("embedding")))
    t("sq8_topk 500k x 64, 20 queries",
      lambda: sq8_topk(emb, q, k=1, rerank=32).count())
    t("matryoshka_topk 500k x 64, 20 queries",
      lambda: matryoshka_topk(emb, q, k=1, prefix_dim=16,
                              rerank=32).count())

    # --- mention extraction shape at 5M docs ------------------------------
    docs = spark.range(5_000_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.md5(F.col("id").cast("string")),
                 F.lit(" see pkg-"), (F.col("id") % 200_000).cast("string"),
                 F.lit(" and hotpkg")).alias("text"))
    dict_df = spark.range(100_000).select(
        F.concat(F.lit("pkg-"), F.col("id").cast("string")).alias("name"))
    pat = r"(pkg-[0-9]+|hotpkg)"
    m = (docs.select("doc_id", F.explode(
        F.regexp_extract_all("text", F.lit(pat), 1)).alias("m"))
         .join(F.broadcast(dict_df), F.col("m") == F.col("name"))
         .groupBy("m").agg(F.count("*").alias("n")))
    t("text mentions 5M docs x 100k dict",
      lambda: m.agg(F.count("*"), F.sum("n")).collect())


if __name__ == "__main__":
    main()
