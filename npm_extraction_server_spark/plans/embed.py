"""KG-embedding link-prediction evaluation (TransE-style scoring).

A KG-construction pipeline at 10^12-triple scale needs an EVALUATION
plan for the graphs it builds: score every (test triple, candidate
object) pair with a translational distance and rank the true object
among the candidates (filtered ranking, Bordes et al., NIPS'13
"Translating Embeddings for Modeling Multi-relational Data").
Training real embeddings is an accelerator job outside this engine's
scope; the embeddings here are deterministic md5-grid vectors (a pure
function of the IRI, like the engine's other md5 draws in
plans/graph.py), so the whole evaluation is exact integer arithmetic —
bit-identical cross-engine — while the Spark plan is exactly the plan
a trained-embedding eval runs:

- candidate table = distinct (rel, dst) of the edge set with its
  embedding components materialized ONCE (cost ∝ entities, never ∝
  pairs) — per-relation candidate scoping, not a global cartesian;
- one equi-join test×candidates on the relation key;
- FILTERED ranking via a left anti join against the full edge set
  (known-true competitors never count — the standard protocol);
- the distance is whole-stage-codegen column arithmetic (dim×3 md5s
  per pair, no Python);
- rank = 1 + count of strictly-better competitors, ties broken by
  candidate IRI so the rank is deterministic cross-engine.

At 100 TB the candidate table is the thing to control: dim-table
sized candidate sets broadcast; huge per-relation object domains
must NOT (a forced broadcast hash relation with 50k-duplicate key
chains measured 23x slower than the sort-merge fan-out — see
link_pred_ranks). The anti join stays an equi-join on
(src, rel, cand) either way.

Reference semantics: the npm KG's dependency edges (NpmModule
dependency emit, lib/NpmModule.js) are the canonical link-prediction
target for this corpus.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["md5_component", "transe_score", "link_pred_ranks",
           "link_pred_metrics"]


def md5_component(col: Column, tag: str, i: int) -> Column:
    """Component ``i`` of the deterministic md5-grid embedding of a
    term: the first 8 hex digits of md5(term || '#<tag><i>') as a
    BIGINT in [0, 2^32). ``tag`` separates the entity space ('e')
    from the relation space ('r'). DuckDB replica:
    ``('0x' || substr(md5(x || '#e0'), 1, 8))::BIGINT``."""
    return F.conv(
        F.substring(F.md5(F.concat(col, F.lit(f"#{tag}{i}"))), 1, 8),
        16, 10,
    ).cast("long")


def transe_score(src: Column, rel: Column, cand: Column,
                 dim: int = 4) -> Column:
    """TransE L1 distance ||e(src) + r(rel) - e(cand)||_1 on the
    integer md5 grid — exact BIGINT arithmetic (components < 2^32,
    the sum of ``dim`` absolute differences < 2^35)."""
    return reduce(add, [
        F.abs(md5_component(src, "e", i) + md5_component(rel, "r", i)
              - md5_component(cand, "e", i))
        for i in range(dim)
    ])


def _test_split(edges: DataFrame, test_mod: int) -> DataFrame:
    """Deterministic test split: md5(src || '->' || dst) % test_mod
    == 0 (~1/test_mod of the distinct edges; same draw in DuckDB)."""
    coin = F.conv(
        F.substring(F.md5(F.concat(F.col("src"), F.lit("->"),
                                   F.col("dst"))), 1, 4),
        16, 10,
    ).cast("long")
    return edges.filter(coin % test_mod == 0)


def link_pred_ranks(edges: DataFrame, dim: int = 4, test_mod: int = 5,
                    broadcast_candidates: bool | None = None) -> DataFrame:
    """Filtered link-prediction ranks over an edge set.

    ``edges``: (src, rel, dst) string columns; treated as a SET
    (duplicates dropped). Test edges are the deterministic
    ``1/test_mod`` md5 split; candidates are the per-relation distinct
    object domains; competitors that are themselves true edges are
    excluded (filtered protocol), so a test edge whose every candidate
    is a known edge gets rank 1 with 0 competitors.

    Returns one row per test edge: (src, dst, rank, n_comp) where
    rank = 1 + |{c : (score_c, c) < (score_true, dst)}| — the strict
    lexicographic tie-break makes it engine-independent.
    """
    edges = edges.select("src", "rel", "dst").distinct()
    # Embedding components are materialized ∝ ENTITIES, never ∝ pairs:
    # the test side carries q_i = e(src)_i + r(rel)_i and its true
    # score; the candidate side carries c_i = e(cand)_i. The per-pair
    # work is then dim subtractions — no md5 inside the pair fan-out
    # (measured 15x on the 2M-edge probe vs per-pair hashing).
    test = _test_split(edges, test_mod)
    for i in range(dim):
        test = test.withColumn(
            f"q{i}", md5_component(F.col("src"), "e", i)
            + md5_component(F.col("rel"), "r", i))
    test = test.withColumn(
        "ts", transe_score(F.col("src"), F.col("rel"), F.col("dst"), dim))

    cands = edges.select("rel", F.col("dst").alias("cand")).distinct()
    for i in range(dim):
        cands = cands.withColumn(
            f"c{i}", md5_component(F.col("cand"), "e", i))
    # Join-strategy control (measured on the 2M-edge / 50k-objects-per-
    # relation probe): a FORCED broadcast builds a 4-key hashed relation
    # whose 50k-long duplicate chains probe ~23x slower than the sort-
    # merge fan-out (283s vs 12s), while at dim-table candidate sizes
    # (the suite corpus) broadcast wins. Default None lets Catalyst/AQE
    # pick from the observed candidate size; True/False force a side.
    if broadcast_candidates is True:
        cands = F.broadcast(cands)
    elif broadcast_candidates is False:
        cands = cands.hint("shuffle_merge")

    pairs = (
        test.join(cands, "rel")
        .join(edges.select("src", "rel", F.col("dst").alias("cand")),
              ["src", "rel", "cand"], "left_anti")
    )
    sc = reduce(add, [F.abs(F.col(f"q{i}") - F.col(f"c{i}"))
                      for i in range(dim)])
    better = (sc < F.col("ts")) | ((sc == F.col("ts"))
                                   & (F.col("cand") < F.col("dst")))
    grouped = pairs.groupBy("src", "rel", "dst").agg(
        (F.lit(1) + F.sum(better.cast("long"))).cast("long").alias("rank"),
        F.count(F.lit(1)).alias("n_comp"),
    )
    # A test edge may lose ALL competitors to the anti join; keep it
    # at rank 1 via a left join back from the test split.
    return (
        test.join(grouped, ["src", "rel", "dst"], "left")
        .select(
            "src", "dst",
            F.coalesce(F.col("rank"), F.lit(1)).cast("long").alias("rank"),
            F.coalesce(F.col("n_comp"), F.lit(0)).cast("long")
            .alias("n_comp"),
        )
    )


def link_pred_metrics(ranks: DataFrame, k: int = 10) -> DataFrame:
    """Aggregate eval scorecard over ``link_pred_ranks`` output:
    n, hits@1, hits@k, and the MRR numerator on an exact integer grid
    (sum of floor(1e8 / rank) — integer division in both engines, so
    the usual float-reciprocal drift can't appear)."""
    return ranks.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("rank") <= 1).cast("long")).alias("hits1"),
        F.sum((F.col("rank") <= k).cast("long")).alias(f"hits{k}"),
        F.sum(F.expr("100000000 DIV rank")).cast("long").alias("sum_rr_e8"),
    )
