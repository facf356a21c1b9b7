#!/usr/bin/env python
"""Scale probes for the batch-24/25 operators.

- remove_template_lines: 5M pages over 20k hosts, each page 12 lines
  (3 host-boilerplate lines above the 30% threshold, 1 rare promo
  below it, 8 unique body lines) — the (host, line) count aggregate is
  the only corpus-sized shuffle; cleanup is a narrow array projection.
- lang_mix: 5M docs x 4 segments with deterministic code-switching.
- kcenter_select: 500k x 64-dim embedding corpus, k = 8 — per-round
  cost must be one corpus scan + TakeOrdered(1), never pairwise.
- wl_graph_hash: 500k 6-triple star graphs + 500k 6-triple chain
  graphs (3M triples total) — two structural classes must come out,
  each of size 500k, in 2 WL rounds.
- direct_mapping: one 50M-row fact table (3 literal cols + 1 FK) —
  ONE FileScan, ~250M triples out, no shuffle (count only).
- url_patterns: 50M synthetic URLs over 20k hosts, 5 templates/host.

Run: python tools/probe_round5p.py
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
    print(f"{label}: {time.time() - t0:.1f} s  {out}")


def main() -> None:
    from npm_extraction_server_spark.operators.similarity import (
        kcenter_select,
    )
    from npm_extraction_server_spark.operators.text import (
        lang_mix,
        remove_template_lines,
    )
    from npm_extraction_server_spark.plans.fingerprint import wl_graph_hash
    from npm_extraction_server_spark.plans.session import get_spark
    from npm_extraction_server_spark.plans.warehouse import direct_mapping

    spark = get_spark(app="probe_round5p")

    # --- template lines at 5M pages / 20k hosts -------------------------
    n = 5_000_000
    host = (F.col("id") % 20_000).cast("string")
    body = F.concat_ws(
        "\n", *[F.md5(F.concat(F.lit(f"b{k}:"), F.col("id").cast("string")))
                for k in range(8)])
    promo = F.when(F.col("id") % 17 == 0,
                   F.concat(F.lit("\nPROMO "), host)).otherwise(F.lit(""))
    pages = spark.range(n).select(
        F.col("id").alias("doc_id"), host.alias("source"),
        F.concat(F.lit("NAV "), host, F.lit("\n"), body,
                 F.lit("\nCookie "), host, promo,
                 F.lit("\nCopyright "), host).alias("text"))
    t("template_lines 5M x 20k hosts", lambda: remove_template_lines(
        pages).agg(F.sum("n_removed"), F.sum("n_lines")).collect())

    # --- lang_mix at 5M docs --------------------------------------------
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick row of the table\n"),
            F.when(F.col("id") % 3 == 0,
                   F.lit("el la de que y en\n")).otherwise(F.lit("")),
            F.md5(F.col("id").cast("string")),
            F.lit("\nwith is that for on")).alias("text"))
    t("lang_mix 5M docs", lambda: lang_mix(docs)
      .groupBy("majority_lang", "mixed").count().collect())

    # --- k-center at 500k x 64 ------------------------------------------
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda i: (F.pmod(F.xxhash64(F.col("id") * F.lit(1000) + i),
                          F.lit(2000)).cast("float") - 1000.0) / 1000.0)
    emb = spark.range(500_000).select(
        F.col("id").alias("vec_id"), vec.alias("embedding"))
    t("kcenter 500k x 64, k=8",
      lambda: kcenter_select(emb, k=8).collect())

    # --- WL graph hash at 1M graphs / 6M triples ------------------------
    g = F.concat(F.lit("g"), F.col("id").cast("string"))
    node = lambda k: F.concat(F.lit(f"n{k}-"), F.col("id").cast("string"))
    base = spark.range(500_000)
    star = base.select(
        g.alias("graph"),
        F.explode(F.array(*[
            F.struct(node(0).alias("subj"), F.lit("p").alias("pred"),
                     node(k).alias("obj")) for k in range(1, 7)]))
        .alias("e")).select("graph", "e.subj", "e.pred", "e.obj")
    chain = spark.range(500_000, 1_000_000).select(
        g.alias("graph"),
        F.explode(F.array(*[
            F.struct(node(k).alias("subj"), F.lit("p").alias("pred"),
                     node(k + 1).alias("obj")) for k in range(6)]))
        .alias("e")).select("graph", "e.subj", "e.pred", "e.obj")
    t("wl_graph_hash 1M graphs / 6M triples", lambda: wl_graph_hash(
        star.unionByName(chain), rounds=2)
      .groupBy("wl_hash").agg(F.count("*").alias("n"))
      .orderBy(F.desc("n")).limit(5).collect())

    # --- direct mapping at 50M rows -------------------------------------
    fact = spark.range(50_000_000).select(
        F.col("id"),
        F.md5(F.col("id").cast("string")).alias("a"),
        (F.col("id") % 97).cast("string").alias("b"),
        F.when(F.col("id") % 10 != 0, F.col("id") % 20_000).alias("ref"))
    t("direct_mapping 50M rows", lambda: direct_mapping(
        fact, "fact", ["id"], cols=["a", "b"],
        fks=[(["ref"], "dim", ["did"])]).count())

    # --- url patterns at 50M urls ---------------------------------------
    urls = spark.range(50_000_000).select(F.concat(
        F.lit("http://h"), (F.col("id") % 20_000).cast("string"),
        F.lit(".example.org/"),
        F.element_at(F.array(F.lit("p"), F.lit("item"), F.lit("a/b"),
                             F.lit("cat"), F.lit("u")),
                     (F.col("id") % 5 + 1).cast("int")),
        F.lit("/"), (F.col("id") % 100_000).cast("string")).alias("cu"))
    pat = urls.select(
        F.regexp_extract("cu", "^https?://([^/]+)", 1).alias("host"),
        F.regexp_replace(
            F.regexp_extract("cu", "^https?://[^/]+(/.*)?$", 1),
            "[0-9]+", "{N}").alias("path_template"), "cu")
    t("url_patterns 50M urls", lambda: pat
      .groupBy("host", "path_template")
      .agg(F.count("*").alias("n_links"),
           F.countDistinct("cu").alias("n_urls"))
      .agg(F.count("*"), F.sum("n_links")).collect())


if __name__ == "__main__":
    main()
