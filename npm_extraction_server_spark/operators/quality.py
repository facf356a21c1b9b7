"""Data-quality expectations over DataFrames — the audit step of
write-audit-publish made concrete (the public Great-Expectations /
dbt-test / Delta-constraints shape, re-expressed as one Catalyst
plan per table).

A check suite is a list of rule tuples; ``validate`` returns one
VIOLATIONS row per (rule, offending row sample) plus per-rule counts,
so the WAP gate is ``violations.isEmpty()`` and the lineage of a
failed audit is inspectable. Rules:

- ``("not_null", col)`` — col must never be NULL.
- ``("unique", col)`` — col must be globally unique (NULLs exempt —
  SQL UNIQUE semantics).
- ``("range", col, lo, hi)`` — lo <= col <= hi (NULLs exempt; pair
  with not_null to forbid them).
- ``("accepted", col, [v1, v2, ...])`` — col ∈ the literal set
  (NULLs exempt).
- ``("expr", name, sql)`` — arbitrary boolean SQL over the row; rows
  where it is false or NULL violate.
- ``("fk", col, dim_df, dim_col)`` — referential: every non-null col
  value exists in ``dim_df[dim_col]`` (an anti-join; broadcast when
  the dim is small, exactly like every other dimension join here).

Scale shape: all row-local rules fuse into ONE projection + filter
pass over the table (a single scan, no shuffle); ``unique`` is one
groupBy on the checked column; each ``fk`` is one anti-join. Counts
are per-rule aggregates of the violation stream.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["validate", "violation_counts"]


def _row_rule_cond(rule) -> "tuple[str, F.Column]":
    """(rule_name, violation_condition) for the row-local rules."""
    kind = rule[0]
    if kind == "not_null":
        col = rule[1]
        return f"not_null({col})", F.col(col).isNull()
    if kind == "range":
        col, lo, hi = rule[1], rule[2], rule[3]
        c = F.col(col)
        return (f"range({col},{lo},{hi})",
                c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))))
    if kind == "accepted":
        col, vals = rule[1], rule[2]
        c = F.col(col)
        return (f"accepted({col})",
                c.isNotNull() & ~c.isin(list(vals)))
    if kind == "expr":
        name, sql = rule[1], rule[2]
        ok = F.expr(sql)
        return f"expr({name})", ~F.coalesce(ok, F.lit(False))
    raise ValueError(f"unknown rule {rule!r}")


def validate(df: DataFrame, rules: list, key_col: str) -> DataFrame:
    """Run the rule suite; returns (rule, key, detail) — one row per
    violation, ``key`` = the offending row's ``key_col`` (cast to
    string), ``detail`` = the offending value rendered as a string
    (for ``unique``: the duplicated value; for ``fk``: the dangling
    reference). Empty result == audit passed."""
    parts: list[DataFrame] = []
    row_rules = [r for r in rules if r[0] in ("not_null", "range",
                                              "accepted", "expr")]
    if row_rules:
        named = [(_row_rule_cond(r), r) for r in row_rules]
        # ONE pass: array of (rule, violated, detail) structs, filtered
        entries = [
            F.struct(F.lit(name).alias("rule"),
                     cond.alias("bad"),
                     F.col(r[1]).cast("string").alias("detail")
                     if r[0] != "expr" else
                     F.lit(r[2]).alias("detail"))
            for (name, cond), r in named
        ]
        exploded = (df.select(F.col(key_col).cast("string").alias("key"),
                              F.explode(F.array(*entries)).alias("v"))
                    .filter(F.col("v.bad"))
                    .select(F.col("v.rule").alias("rule"), "key",
                            F.col("v.detail").alias("detail")))
        parts.append(exploded)
    for r in rules:
        if r[0] == "unique":
            col = r[1]
            dup_vals = (df.filter(F.col(col).isNotNull())
                        .groupBy(col).agg(F.count("*").alias("_n"))
                        .filter(F.col("_n") > 1).select(col))
            parts.append(
                df.join(dup_vals, col, "left_semi")
                .select(F.lit(f"unique({col})").alias("rule"),
                        F.col(key_col).cast("string").alias("key"),
                        F.col(col).cast("string").alias("detail")))
        elif r[0] == "fk":
            col, dim, dim_col = r[1], r[2], r[3]
            ref = dim.select(F.col(dim_col).alias(col)).distinct()
            parts.append(
                df.filter(F.col(col).isNotNull())
                .join(ref, col, "left_anti")
                .select(F.lit(f"fk({col}->{dim_col})").alias("rule"),
                        F.col(key_col).cast("string").alias("key"),
                        F.col(col).cast("string").alias("detail")))
        elif r[0] not in ("not_null", "range", "accepted", "expr"):
            raise ValueError(f"unknown rule {r!r}")
    if not parts:
        raise ValueError("validate: empty rule suite")
    return functools.reduce(lambda a, b: a.unionByName(b), parts)


def violation_counts(violations: DataFrame) -> DataFrame:
    """(rule, n_violations) — the audit summary."""
    return violations.groupBy("rule").agg(F.count("*").alias("n_violations"))
