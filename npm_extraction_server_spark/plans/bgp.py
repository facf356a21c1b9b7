"""Basic-graph-pattern (BGP) matching over the materialized triples
table — the SPARQL-SELECT core a knowledge graph exists to answer.

The reference serves per-package RDF documents (JSON-LD / N-Triples /
TriG; lib/npm/NpmModule.js + the serializers); the queries its
consumers then run over that RDF are conjunctive triple patterns.
This module expresses them directly over the engine's (subj, pred,
obj) triple table as ordinary Catalyst equi-joins, so the KG is
queryable WITHOUT a separate SPARQL engine.

Semantics: a pattern is a (s, p, o) string triple; terms starting
with ``?`` are variables, everything else is a constant matched
against the column. The result is one row per variable binding that
satisfies EVERY pattern (set semantics — duplicates collapsed), with
one column per variable.

Shape at 100 TB (10^11-triple tables):

- Constant terms become scan-level filters — a pattern with a bound
  predicate reads only that predicate's rows (PushedFilters on the
  parquet scan; on a table bucketed/partitioned by ``pred`` the scan
  prunes to one partition, the triple-store layout this engine's
  warehouse writes).
- Each pattern is one filtered projection; patterns chain with
  hash-joins on their shared variables. A star pattern (same subject
  variable) joins k filtered scans on ``subj`` — co-partitioned after
  the first shuffle, so k-1 joins reuse one exchange.
- Highly selective patterns shrink under AQE into broadcast sides at
  runtime; callers should still order patterns most-selective-first
  (the classic BGP heuristic) since join order follows list order.
- No cartesian products unless the caller writes disconnected
  patterns (then crossJoin is explicit and intentional).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bgp_join"]


def bgp_join(triples: DataFrame, patterns: list[tuple[str, str, str]],
             select: list[str] | None = None) -> DataFrame:
    """Conjunctive triple-pattern join over ``triples`` (columns
    subj, pred, obj). ``patterns``: list of (s, p, o) terms —
    ``"?x"``-style variables bind, other strings filter. ``select``
    optionally projects/orders the output variable columns.

    Returns one row per distinct satisfying binding, one column per
    variable (no ``?`` prefix). Repeated variables within one pattern
    express equality (``("?x", P, "?x")`` keeps self-loops only).
    """
    if not patterns:
        raise ValueError("bgp_join: empty pattern list")
    t = triples.select("subj", "pred", "obj")
    bound: DataFrame | None = None
    for s, p, o in patterns:
        cur = t
        out_cols: list = []
        seen: dict[str, str] = {}
        for col, term in (("subj", s), ("pred", p), ("obj", o)):
            if term.startswith("?"):
                var = term[1:]
                if not var:
                    raise ValueError(f"bare '?' in pattern {(s, p, o)}")
                if var in seen:  # repeated var: intra-pattern equality
                    cur = cur.filter(F.col(col) == F.col(seen[var]))
                else:
                    seen[var] = col
                    out_cols.append(F.col(col).alias(var))
            else:
                cur = cur.filter(F.col(col) == term)
        cur = cur.select(*out_cols)
        if bound is None:
            bound = cur
        else:
            shared = [c for c in cur.columns if c in bound.columns]
            if shared:
                bound = bound.join(cur, shared)
            else:  # disconnected pattern groups: explicit product
                bound = bound.crossJoin(cur)
    assert bound is not None
    if select:
        bound = bound.select(*select)
    return bound.distinct()
