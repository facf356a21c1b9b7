"""Incrementally-maintained materialized aggregate views over the
snapshot table format — the serving layer a KG/corpus warehouse puts
in front of its biggest tables ("docs per language", "triples per
predicate", "bytes per host") so dashboards never rescan the base.

The maintenance algebra is classic incremental view maintenance:
count and sum form Abelian GROUPS (every change has an inverse), so a
changelog of inserts and deletes folds into the stored aggregate as
``new = old + delta(inserts) - delta(deletes)`` — an update (delete +
insert pair from the snapshot changelog, sources/snapshots.
read_changes) nets out to its measure difference. The API offers
ONLY count and sum by design: non-invertible aggregates (min/max —
a deleted minimum cannot be retracted without rescanning its group)
cannot be maintained this way; recompute those, or keep a sketch
(operators/sketch.py's KMV/HLL/CMS are all mergeable).

Refresh cost follows the CHANGELOG, not the table: one groupBy over
the delta rows (bounded by what the merge/append touched) + one
full-outer merge join against the view keyed on the group-by columns
— at 10^12 base rows with a 0.01% daily churn, refresh touches ~10^8
delta rows and |groups| view rows where a recompute scans everything.

View state is a directory: VERSIONED data dirs
(``data-<snapshot>.parquet``) + ``view.json`` (spec + the base-table
snapshot the aggregate is AS OF + the data dir it names). The spec
swap (one atomic os.replace) is the only commit point — the same
single-host commit analog as sources/snapshots (object-store CAS in
production). ``refresh`` is idempotent: a second call at the same
base snapshot is a no-op, and a crash anywhere before the spec swap
leaves the old (spec, data) pair fully intact, so the restarted
refresh re-derives the same delta instead of double-applying it.

NULL measure values contribute 0 to sums (coalesce on ingest — same
rule applied in create and refresh, so the two paths agree exactly).
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.snapshots import current_snapshot_id, read_changes, read_snapshot

__all__ = ["create_agg_view", "read_view", "refresh_agg_view"]


def _spec_path(view: str) -> Path:
    return Path(view) / "view.json"


def _agg_cols(sums: dict[str, str]) -> list:
    return [F.count(F.lit(1)).alias("n_rows"),
            *[F.sum(F.coalesce(F.col(src), F.lit(0))).alias(alias)
              for alias, src in sums.items()]]


def _validate(group_by: list[str], sums: dict[str, str]) -> None:
    if not group_by:
        raise ValueError("agg view: empty group_by")
    reserved = {"n_rows", "_change_type", "_snapshot_id"}
    bad = reserved & set(sums) | reserved & set(group_by)
    if bad:
        raise ValueError(f"agg view: reserved column names {sorted(bad)}")


def _publish(df: DataFrame, view: str, state: dict) -> None:
    """Atomic publish via VERSIONED data directories: the aggregate is
    written completely to ``data-<as_of>.parquet``, then the spec —
    which names that directory — is swapped in with one atomic
    os.replace. The spec swap is the ONLY commit point: a crash at any
    earlier moment leaves the old spec still naming the old (intact)
    data dir, so a restarted refresh re-reads the old ``as_of`` and
    re-derives the same delta — never a half-published pair where new
    data sits under an old snapshot pointer (which would double-apply
    the changelog on the next refresh). Superseded data dirs are
    removed only after the swap. Single-writer by contract (like the
    snapshot commit lock's scope): the post-swap sweep assumes no
    concurrent publisher is mid-write in the same view directory."""
    import uuid

    view_p = Path(view)
    view_p.mkdir(parents=True, exist_ok=True)
    # unique per publish: a re-publish at the SAME base snapshot (e.g.
    # a restarted create_agg_view) must never overwrite the live data
    # dir in place — that would destroy the old state before the
    # commit point
    data_name = f"data-{state['as_of']}-{uuid.uuid4().hex[:8]}.parquet"
    df.write.parquet(str(view_p / data_name))
    state = {**state, "data": data_name}
    fd, tmp_json = tempfile.mkstemp(dir=view_p, suffix=".json")
    with os.fdopen(fd, "w") as f:
        json.dump(state, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp_json, _spec_path(view))
    # sweep EVERY data dir the committed spec does not name — also
    # collects strands from publishes that crashed between their swap
    # and their own sweep
    import shutil

    for p in view_p.glob("data*.parquet"):
        # data*.parquet also matches the legacy data.parquet layout,
        # which the spec fallback can supersede
        if p.name != data_name:
            shutil.rmtree(p, ignore_errors=True)
    for p in view_p.glob("*.json"):
        # orphaned mkstemp strands from crashed publishes
        if p.name != "view.json":
            p.unlink(missing_ok=True)


def create_agg_view(spark: SparkSession, table: str, view: str,
                    group_by: list[str],
                    sums: dict[str, str] | None = None) -> int:
    """Materialize ``SELECT group_by, count(*) AS n_rows, sum(src) AS
    alias... FROM table GROUP BY group_by`` at the table's CURRENT
    snapshot. ``sums``: {output_alias: source_column}. Returns the
    base snapshot id the view is AS OF."""
    sums = sums or {}
    _validate(group_by, sums)
    sid = current_snapshot_id(table)
    if sid is None:
        raise ValueError(f"{table}: empty table (no CURRENT)")
    base = read_snapshot(spark, table, snapshot_id=sid)
    agg = base.groupBy(*group_by).agg(*_agg_cols(sums))
    _publish(agg, view, {"table": table, "group_by": group_by,
                         "sums": sums, "as_of": sid})
    return sid


def read_view(spark: SparkSession, view: str) -> DataFrame:
    p = _spec_path(view)
    if not p.exists():
        raise ValueError(f"{view}: not an agg view (no view.json)")
    spec = json.loads(p.read_text())
    # .get fallback: specs written by the pre-versioned-dir format
    # named their data dir implicitly
    return spark.read.parquet(
        str(Path(view) / spec.get("data", "data.parquet")))


def refresh_agg_view(spark: SparkSession, table: str,
                     view: str) -> dict:
    """Fold the base table's changelog since the view's AS-OF snapshot
    into the stored aggregate. Returns refresh stats:
    {from, to, change_rows, groups_touched} (change_rows == 0 means
    the no-op fast path — the view file is not rewritten)."""
    spec = json.loads(_spec_path(view).read_text())
    if spec["table"] != table:
        raise ValueError(
            f"view {view} maintains {spec['table']}, not {table}")
    group_by, sums = spec["group_by"], spec["sums"]
    to_sid = current_snapshot_id(table)
    from_sid = spec["as_of"]
    if to_sid == from_sid:
        return {"from": from_sid, "to": to_sid, "change_rows": 0,
                "groups_touched": 0}
    changes = read_changes(spark, table, from_snapshot=from_sid,
                           to_snapshot=to_sid)
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)) \
        .otherwise(F.lit(-1))
    delta = (changes.groupBy(*group_by).agg(
        F.sum(sign).alias("_d_n"),
        *[F.sum(sign * F.coalesce(F.col(src), F.lit(0)))
          .alias(f"_d_{alias}") for alias, src in sums.items()])
        .localCheckpoint(eager=True))
    n_changes = changes.count()
    groups_touched = delta.count()
    old = read_view(spark, view).localCheckpoint(eager=True)
    # NULL-safe join on the group key: SQL GROUP BY puts all-NULL
    # keys in ONE group, so the merge must treat NULL = NULL as a
    # match or a NULL-keyed group would split into a stale row plus
    # a delta row instead of folding
    cond = None
    for c in group_by:
        eq = old[c].eqNullSafe(delta[c])
        cond = eq if cond is None else cond & eq
    merged = (old.join(delta, cond, "full")
              .select(*[F.coalesce(old[c], delta[c]).alias(c)
                        for c in group_by],
                      (F.coalesce(F.col("n_rows"), F.lit(0))
                       + F.coalesce(F.col("_d_n"), F.lit(0)))
                      .alias("n_rows"),
                      *[(F.coalesce(old[a], F.lit(0))
                         + F.coalesce(F.col(f"_d_{a}"), F.lit(0)))
                        .alias(a) for a in sums])
              .filter(F.col("n_rows") > 0))
    _publish(merged, view, {**spec, "as_of": to_sid})
    return {"from": from_sid, "to": to_sid, "change_rows": n_changes,
            "groups_touched": groups_touched}
