"""plans/embed.py — TransE-style link-prediction eval on the md5 grid.

The Spark plan is pinned against an INDEPENDENT pure-Python
recomputation of the same deterministic embedding formulas (hashlib
md5, not Spark's), so a formula drift on either side fails the test.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from npm_extraction_server_spark.plans.embed import (
    link_pred_metrics,
    link_pred_ranks,
)

EDGES = [
    # rel "dep": a small two-relation multigraph with shared objects
    ("a", "dep", "x"), ("a", "dep", "y"), ("b", "dep", "x"),
    ("c", "dep", "z"), ("d", "dep", "y"), ("d", "dep", "z"),
    ("b", "dep", "w"),
    # rel "same": disjoint object domain — candidate scoping must keep
    # these out of "dep" ranks
    ("a", "same", "a2"), ("b", "same", "b2"), ("c", "same", "c2"),
]


def _h(x: str, tag: str, i: int) -> int:
    return int(hashlib.md5(f"{x}#{tag}{i}".encode()).hexdigest()[:8], 16)


def _score(s: str, r: str, c: str, dim: int = 4) -> int:
    return sum(abs(_h(s, "e", i) + _h(r, "r", i) - _h(c, "e", i))
               for i in range(dim))


def _py_ranks(edges, dim=4):
    edges = set(edges)
    cands = {}
    for _, r, d in edges:
        cands.setdefault(r, set()).add(d)
    out = {}
    for s, r, d in edges:  # test_mod=1: every edge is a test edge
        ts = _score(s, r, d, dim)
        comp = [c for c in cands[r] if (s, r, c) not in edges]
        better = sum(1 for c in comp
                     if (_score(s, r, c, dim), c) < (ts, d))
        out[(s, d)] = (1 + better, len(comp))
    return out


@pytest.fixture(scope="module")
def ranks_df(spark):
    edges = spark.createDataFrame(EDGES, ["src", "rel", "dst"])
    return link_pred_ranks(edges, test_mod=1).cache()


def test_ranks_match_pure_python(ranks_df):
    got = {(r["src"], r["dst"]): (r["rank"], r["n_comp"])
           for r in ranks_df.collect()}
    assert got == _py_ranks(EDGES)


def test_every_test_edge_ranked_even_with_zero_competitors(spark):
    # single-edge relation: the only candidate IS the true edge, so the
    # anti join removes every competitor -> rank 1 with n_comp 0 must
    # still come back (the left-join-back contract).
    edges = spark.createDataFrame([("p", "solo", "q")],
                                  ["src", "rel", "dst"])
    rows = link_pred_ranks(edges, test_mod=1).collect()
    assert [(r["src"], r["dst"], r["rank"], r["n_comp"])
            for r in rows] == [("p", "q", 1, 0)]


def test_metrics_integer_grid(ranks_df):
    py = _py_ranks(EDGES)
    m = link_pred_metrics(ranks_df, k=10).collect()[0]
    assert m["n"] == len(py)
    assert m["hits1"] == sum(1 for rk, _ in py.values() if rk <= 1)
    assert m["hits10"] == sum(1 for rk, _ in py.values() if rk <= 10)
    assert m["sum_rr_e8"] == sum(100000000 // rk for rk, _ in py.values())


def test_forced_join_strategies(spark):
    edges = spark.createDataFrame(EDGES, ["src", "rel", "dst"])
    forced_b = link_pred_ranks(edges, test_mod=1,
                               broadcast_candidates=True)
    plan = forced_b._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # candidate side never shuffles
    forced_s = link_pred_ranks(edges, test_mod=1,
                               broadcast_candidates=False)
    plan_s = forced_s._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan_s  # the huge-domain path
    # all three strategies agree on the answer
    assert (sorted(map(tuple, forced_b.collect()))
            == sorted(map(tuple, forced_s.collect()))
            == sorted(map(tuple,
                          link_pred_ranks(edges, test_mod=1).collect())))


def test_deterministic_test_split(spark):
    edges = spark.createDataFrame(EDGES, ["src", "rel", "dst"])
    a = sorted(map(tuple, link_pred_ranks(edges, test_mod=2).collect()))
    b = sorted(map(tuple, link_pred_ranks(edges, test_mod=2).collect()))
    assert a == b and 0 < len(a) < len(EDGES)


def test_sq8_and_mrl_recall_on_separated_corpus(spark):
    """SQ8 and Matryoshka preselection both recover the exact top-1
    on a corpus with a clearly separated nearest neighbor."""
    from npm_extraction_server_spark.operators.similarity import (
        cosine_topk,
        matryoshka_topk,
        sq8_topk,
    )

    import math
    rows = []
    for i in range(40):
        a = 2 * math.pi * i / 40
        rows.append((i, [math.cos(a), math.sin(a)] * 32))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = spark.createDataFrame(
        [(1000, [math.cos(0.05), math.sin(0.05)] * 32)],
        "vec_id long, embedding array<float>")

    exact = cosine_topk(emb, q, k=1).collect()[0]
    s = sq8_topk(emb, q, k=1, rerank=8).collect()[0]
    m = matryoshka_topk(emb, q, k=1, prefix_dim=16, rerank=8).collect()[0]
    assert s.item_id == exact.item_id == m.item_id
    assert s.cosine == exact.cosine == m.cosine
