"""As-of (point-in-time) join — the custom temporal operator Spark's
DataFrame API lacks (BASELINE brief names it explicitly).

Semantics: for every left row, attach the LATEST right row of the same
``by`` key whose time is <= the left row's time (the market-data /
point-in-time-features join).

Implementation is the scalable union+window form, NOT a range join:
tag both sides, union, and take ``last(struct(value_cols),
ignorenulls=True)`` over a window partitioned by the key and ordered by
(time, is_left) — right rows sort BEFORE left rows at equal times, so
an exact-time match is attached; the single-struct fill guarantees all
attached values come from the SAME right row (a null field in the
matched row stays null instead of back-filling from an older row). One shuffle on the key, linear in
rows; a naive range join (l.t >= r.t) explodes quadratically per key
and a per-key collect would not distribute at all. DuckDB's native
ASOF JOIN is the driver oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, by: str, left_time: str,
              right_time: str, value_cols: list[str]) -> DataFrame:
    """Left as-of join: every ``left`` row + the ``value_cols`` of the
    latest ``right`` row with ``right_time <= left_time`` for the same
    ``by`` key (nulls when none exists).

    ``right`` must be unique per (by, right_time) — pre-reduce it
    (deterministically) if it is not; ties inside the right side would
    make any as-of semantics ambiguous."""
    from pyspark.sql import types as T

    lcols = left.columns
    # ALL value columns travel in ONE struct, filled with ONE
    # last(ignorenulls) — so the attached values always come from the
    # same (latest) right row. Filling each column independently would
    # back-fill a null field from an OLDER right row and mix columns of
    # different right rows (deviating from true as-of semantics and
    # DuckDB's ASOF JOIN whenever right values contain nulls).
    r_struct_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in value_cols])
    l_tagged = left.select(
        F.col(by), F.col(left_time).alias("_t"), F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols if c not in (by,)],
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r_tagged = right.select(
        F.col(by), F.col(right_time).cast(
            left.schema[left_time].dataType).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in (by,)],
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("_r"),
    )
    w = (
        Window.partitionBy(by)
        .orderBy(F.col("_t"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_f"))
    return (
        filled.filter(F.col("_is_left") == 1)
        .select(by,
                *[F.col(c) for c in lcols if c not in (by,)],
                *[F.col(f"_f.{c}").alias(c) for c in value_cols])
    )
