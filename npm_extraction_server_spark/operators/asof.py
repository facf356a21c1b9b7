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
              right_time: str, value_cols: list[str],
              direction: str = "backward") -> DataFrame:
    """Left as-of join: every ``left`` row + the ``value_cols`` of the
    matched ``right`` row for the same ``by`` key (nulls when none).
    ``direction`` (pandas merge_asof semantics):

    - ``"backward"`` (default): latest right with rt <= lt.
    - ``"forward"``: earliest right with rt >= lt.
    - ``"nearest"``: whichever of the two is closer in time;
      exact ties (including rt == lt) prefer the backward match.

    ``right`` must be unique per (by, right_time) — pre-reduce it
    (deterministically) if it is not; ties inside the right side would
    make any as-of semantics ambiguous."""
    from pyspark.sql import types as T

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    lcols = left.columns
    t_type = left.schema[left_time].dataType
    # ALL value columns travel in ONE struct (plus the matched row's
    # own time for the nearest tie-break), filled with ONE
    # last/first(ignorenulls) — so the attached values always come
    # from the same right row. Filling each column independently would
    # back-fill a null field from an OLDER right row and mix columns of
    # different right rows (deviating from true as-of semantics and
    # DuckDB's ASOF JOIN whenever right values contain nulls).
    r_struct_type = T.StructType(
        [T.StructField("_rt", t_type)]
        + [T.StructField(c, right.schema[c].dataType) for c in value_cols])
    l_tagged = left.select(
        F.col(by), F.col(left_time).alias("_t"), F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols if c not in (by,)],
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    rt = F.col(right_time).cast(t_type)
    r_tagged = right.select(
        F.col(by), rt.alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in (by,)],
        F.struct(rt.alias("_rt"),
                 *[F.col(c).alias(c) for c in value_cols]).alias("_r"),
    )
    # Tie handling at rt == lt: the backward fill orders right rows
    # BEFORE left (its [unbounded, current] window sees the coincident
    # right — pandas'/DuckDB's equality convention), while the pure
    # FORWARD fill orders left first so its [current, unbounded]
    # window includes the coincident right too (forward also counts
    # equality). "nearest" reuses the backward-friendly order for both
    # windows: the coincident match arrives via the backward fill at
    # delta 0, which wins its tie by contract.
    base = (Window.partitionBy(by)
            .orderBy(F.col("_t"), F.col("_is_left")))
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    u = l_tagged.unionByName(r_tagged)
    if direction == "backward":
        u = u.select("*", F.last("_r", ignorenulls=True).over(wb).alias("_f"))
    elif direction == "forward":
        wf_eq = (Window.partitionBy(by)
                 .orderBy(F.col("_t"), F.col("_is_left").desc())
                 .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        u = u.select("*",
                     F.first("_r", ignorenulls=True).over(wf_eq).alias("_f"))
    else:
        u = u.select("*",
                     F.last("_r", ignorenulls=True).over(wb).alias("_b"),
                     F.first("_r", ignorenulls=True).over(wf).alias("_ff"))

        def _num(c):
            if isinstance(t_type, T.NumericType):
                return c.cast("double")
            return c.cast("timestamp").cast("double")

        db = _num(F.col("_t")) - _num(F.col("_b._rt"))
        df_ = _num(F.col("_ff._rt")) - _num(F.col("_t"))
        u = u.select(
            "*",
            F.when(F.col("_b").isNull(), F.col("_ff"))
             .when(F.col("_ff").isNull(), F.col("_b"))
             .when(df_ < db, F.col("_ff"))
             .otherwise(F.col("_b")).alias("_f"))
    # a left row with a NULL time has no defined as-of position: every
    # direction yields a null match (backward gets this for free from
    # nulls-first ordering; forward/nearest must not let the following
    # window hand the null-time row the earliest right value)
    fill = F.when(F.col("_t").isNull(),
                  F.lit(None).cast(r_struct_type)).otherwise(F.col("_f"))
    return (
        u.filter(F.col("_is_left") == 1)
        .select(by,
                *[F.col(c) for c in lcols if c not in (by,)],
                *[fill[c].alias(c) for c in value_cols])
    )


def resample_linear(df: DataFrame, key: str, ts: str, value: str,
                    step_s: int = 300, method: str = "linear") -> DataFrame:
    """Time-series RESAMPLE with linear interpolation: per ``key``,
    emit a regular ``step_s``-second grid spanning the series'
    observed range, with the value at each grid point linearly
    interpolated between the surrounding observations (exact hits
    pass through untouched). The gap-fill every monitoring /
    feature-engineering pipeline needs before windowed models.

    Same scalable shape as asof_join: observations (collapsed to one
    per (key, instant) via order-free MIN) and grid points union into
    one stream, ONE shuffle on the key, and two windows (forward
    last-non-null, backward first-non-null, both ignorenulls) attach
    the bracketing observations — never a range join, never per-key
    collects. Ties at coincident instants order observations first,
    and the exact-hit guard short-circuits before the slope division.

    ``method="linear"`` interpolates between the bracketing
    observations; ``method="locf"`` (last observation carried forward
    — the step-function fill monitoring pipelines use for gauges)
    holds the previous observation, falling back to the next one only
    before the first observation of a key.

    Returns (key, grid_ts timestamp, value double, rounded 6dp so the
    DuckDB oracle's identical IEEE expression matches bit-for-bit).
    """
    if method not in ("linear", "locf"):
        raise ValueError(f"resample_linear: unknown method {method!r}")
    # session TZ is pinned UTC (plans/session.py), so the NTZ->TZ cast
    # is the identity epoch mapping DuckDB's epoch_us performs
    k = F.col(key)
    t_us = F.unix_micros(F.col(ts).cast("timestamp"))
    step_us = step_s * 1_000_000
    obs = (df.select(k.alias("k"), t_us.alias("t"),
                     F.col(value).alias("v"))
           .groupBy("k", "t").agg(F.min("v").alias("v"))
           .withColumn("is_obs", F.lit(1)))
    bounds = obs.groupBy("k").agg(F.min("t").alias("lo"),
                                  F.max("t").alias("hi"))
    # a key whose observed range straddles no grid instant (start > hi)
    # yields an EMPTY grid, not a crash: Spark's sequence() throws on
    # start > stop with a positive step, so guard it (explode of the
    # empty array drops the key, matching generate_series semantics)
    start = (F.ceil(F.col("lo") / step_us) * step_us).cast("long")
    grid = bounds.select(
        "k",
        F.explode(F.when(start <= F.col("hi"),
                         F.sequence(start, F.col("hi"), F.lit(step_us)))
                  .otherwise(F.array().cast("array<long>"))).alias("t"),
        F.lit(None).cast("double").alias("v"),
        F.lit(0).alias("is_obs"))
    u = obs.unionByName(grid)
    fwd = (Window.partitionBy("k")
           .orderBy(F.col("t"), F.col("is_obs").desc())
           .rowsBetween(Window.unboundedPreceding, 0))
    bwd = (Window.partitionBy("k")
           .orderBy(F.col("t"), F.col("is_obs").desc())
           .rowsBetween(0, Window.unboundedFollowing))
    t_obs = F.when(F.col("is_obs") == 1, F.col("t"))
    u = (u.withColumn("pv", F.last("v", ignorenulls=True).over(fwd))
          .withColumn("pt", F.last(t_obs, ignorenulls=True).over(fwd))
          .withColumn("nv", F.first("v", ignorenulls=True).over(bwd))
          .withColumn("nt", F.first(t_obs, ignorenulls=True).over(bwd)))
    if method == "locf":
        interp = F.when(F.col("pt").isNull(), F.col("nv")) \
            .otherwise(F.col("pv"))
    else:
        interp = (
            F.when(F.col("pt") == F.col("t"), F.col("pv"))
            .when(F.col("pt").isNull(), F.col("nv"))
            .when(F.col("nt").isNull(), F.col("pv"))
            .otherwise(
                F.col("pv") + (F.col("nv") - F.col("pv"))
                * ((F.col("t") - F.col("pt")).cast("double")
                   / (F.col("nt") - F.col("pt")).cast("double"))))
    return (u.filter(F.col("is_obs") == 0)
            .select(F.col("k").alias(key),
                    F.timestamp_micros(F.col("t")).cast("timestamp_ntz")
                    .alias("grid_ts"),
                    F.round(interp, 6).alias("value")))
