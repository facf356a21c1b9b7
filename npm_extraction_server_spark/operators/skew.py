"""Explicit skew controls: salted joins + head-key split.

AQE's skew-join splitting (on session-wide) handles most hot keys at
runtime, but two patterns need the explicit form at 10^12 scale
(BASELINE.json: "salted keys", "skew-hint joins on hot predicates"):

- ``salted_join``: replicate the build side R ways, scatter the probe
  side with a random-free deterministic salt (hash of a secondary
  column), join on (key, salt). For aggregate-after-join pipelines
  where one key holds >1 task's worth of rows even after AQE splits.
- ``split_head_join``: route the top-K hottest keys through a
  broadcast join and the long tail through a shuffle join, then union
  — the head-entity dictionary trick from the entity-linking stage,
  generalized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(probe: DataFrame, build: DataFrame, key: str,
                salt_buckets: int = 8, salt_source: str | None = None,
                how: str = "inner") -> DataFrame:
    """Equi-join on ``key`` with the build side replicated
    ``salt_buckets`` times. ``salt_source``: a probe column whose hash
    spreads the hot key's rows (deterministic — no rand(), keeps the
    plan resumable/replayable); defaults to the whole-row hash."""
    salt_cols = [F.col(c) for c in probe.columns] if salt_source is None \
        else [F.col(salt_source)]
    salted_probe = probe.withColumn(
        "_salt", F.pmod(F.xxhash64(*salt_cols), F.lit(salt_buckets)).cast("int"))
    salted_build = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])))
    out = salted_probe.join(salted_build, [key, "_salt"], how)
    return out.drop("_salt")


def head_keys(df: DataFrame, key: str, top_k: int = 100) -> DataFrame:
    """The K most frequent join keys (the broadcast-dictionary side)."""
    return (
        df.groupBy(key).agg(F.count("*").alias("_freq"))
        .orderBy(F.desc("_freq"), F.asc(key))
        .limit(top_k)
        .select(key)
    )


def split_head_join(probe: DataFrame, build: DataFrame, key: str,
                    top_k: int = 100, how: str = "inner") -> DataFrame:
    """Head/tail split: hot keys take a broadcast join (no shuffle of
    their heavy probe rows), the tail takes the normal shuffle join."""
    # eager localCheckpoint: head-key scan runs once for all four join
    # uses, and the blocks are auto-released when the result DataFrame
    # goes out of scope (persist() would pin a CacheManager entry for
    # the session lifetime)
    heads = head_keys(probe, key, top_k).localCheckpoint(eager=True)
    probe_head = probe.join(F.broadcast(heads), key, "left_semi")
    probe_tail = probe.join(F.broadcast(heads), key, "left_anti")
    build_head = build.join(F.broadcast(heads), key, "left_semi")
    hot = probe_head.join(F.broadcast(build_head), key, how)
    cold = probe_tail.join(build, key, how)
    return hot.unionByName(cold)


def auto_salted_join(probe: DataFrame, build: DataFrame, key: str,
                     hot_min_count: int = 100_000,
                     salt_buckets: int = 8,
                     salt_source: str | None = None,
                     how: str = "inner") -> DataFrame:
    """SELECTIVE salting driven by a sketch: detect the probe side's
    hot keys with count-min heavy hitters (fixed sketch state, one
    map-combined pass — never the exact full groupBy split_head_join
    pays), then salt ONLY those keys' join while the cold tail takes
    the plain shuffle join, and union.

    This is the production skew pattern at 10^12 rows: uniform
    salting (salted_join) replicates the ENTIRE build side
    ``salt_buckets`` times — a ``salt_buckets``x build-shuffle tax
    paid mostly for keys that never needed it — while selective
    salting replicates only the (tiny, broadcast) hot-key slice of
    the build side. CMS's one-sided error is exactly right here:
    every true heavy hitter is salted (no false negatives means no
    straggler task), and a collision-inflated extra key merely gets
    salted unnecessarily — a few spare rows of build replication,
    never a wrong answer. Results are identical to a plain join by
    construction (both paths are equi-joins over a disjoint key
    split)."""
    from .sketch import cms_heavy_hitters

    key_type = dict(probe.dtypes)[key]
    hot = (cms_heavy_hitters(probe, key, hot_min_count)
           .select(F.col(key).cast(key_type).alias(key))
           .localCheckpoint(eager=True))
    probe_hot = probe.join(F.broadcast(hot), key, "left_semi")
    probe_cold = probe.join(F.broadcast(hot), key, "left_anti")
    build_hot = build.join(F.broadcast(hot), key, "left_semi")
    salted = salted_join(probe_hot, build_hot, key,
                         salt_buckets=salt_buckets,
                         salt_source=salt_source, how=how)
    cold = probe_cold.join(build, key, how)
    return salted.unionByName(cold)
