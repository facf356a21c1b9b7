"""SPARQL 1.1 Update over the lakehouse triple table.

The reference serves a READ view of the npm registry's RDF (every
query endpoint in the server is GET-shaped), but a KG-construction
pipeline's triple store needs the write verbs too: corrections,
retractions, enrichment passes. This module implements the SPARQL 1.1
Update operations (INSERT DATA / DELETE DATA / DELETE WHERE /
DELETE-INSERT-WHERE, https://www.w3.org/TR/sparql11-update/) against
a snapshot-table (sources/snapshots.py) holding the triples, i.e. the
engine's Iceberg-analog triple sink (SN1, ``plans/kg.py``).

Spark-first shape — one ATOMIC merge-on-read row-delta commit per
update:

- The WHERE clause is evaluated by the BGP layer (``plans/bgp.py``)
  over the CURRENT snapshot — one Catalyst plan, constants pushed to
  the scan.
- DELETE templates instantiate to concrete triples; the rows to
  remove are keyed by a content hash (``__tkey`` = sha2 of the
  unit-separated terms, written at load time) and committed as ONE
  equality-delete file — artifact size proportional to the DELETED
  triples, data files untouched (Iceberg v2 MOR semantics).
- INSERT templates instantiate and append in the SAME commit
  (``operation='rowdelta'`` carries both added rows and delete keys);
  the snapshot chain's sequence-number rule — an equality delete
  applies only to files STRICTLY OLDER than its commit — gives the
  SPARQL delete-before-insert evaluation order for free, so a triple
  both deleted and re-inserted survives, atomically, in one snapshot.
- RDF graphs are SETS: inserts are anti-joined against the
  post-delete state so a pre-existing triple is never duplicated, and
  deletes are semi-joined against the current state so retracting an
  absent triple is a no-op (and a fully no-op update commits NOTHING —
  the snapshot id does not move).

Scale shape: the only full-width scan is the WHERE evaluation (the
same cost as the equivalent SELECT); the delete/insert deltas are
template-instantiation projections over its bindings, and the commit
artifacts are proportional to the delta, never the store. Readers pay
one broadcast anti-join per un-compacted update (``compact`` folds
them away), exactly the MOR trade.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TKEY = "__tkey"
_TERM_COLS = ("subj", "pred", "obj")
# 0x1f unit separator: cannot occur in N-Triples-encoded terms, so the
# concatenation is injective and the sha2 key is a faithful triple id.
_SEP = "\x1f"


def triple_key() -> Column:
    """Content hash identifying one (subj, pred, obj) triple — the
    equality-delete key column. sha2-256 over the unit-separated
    terms; collision-free in practice and deterministic across
    engines (DuckDB: sha256(subj || chr(31) || ...))."""
    return F.sha2(F.concat_ws(_SEP, *[F.col(c) for c in _TERM_COLS]), 256)


def create_triple_table(spark: SparkSession, triples: DataFrame,
                        table: str, partitions: int = 8) -> int:
    """Load a triple DataFrame as the initial snapshot of an updatable
    triple table: distinct (set semantics), keyed, clustered on subj
    so DESCRIBE-shaped reads prune files."""
    from ..sources.snapshots import commit

    df = (triples.select(*_TERM_COLS).distinct()
          .withColumn(TKEY, triple_key()))
    return commit(df, table, partitions=partitions, cluster_by=["subj"])


def read_triple_table(spark: SparkSession, table: str,
                      snapshot_id: int | None = None) -> DataFrame:
    """Current (or time-travel) triple set, key column dropped."""
    from ..sources.snapshots import read_snapshot

    return read_snapshot(spark, table, snapshot_id).drop(TKEY)


def _is_var(term) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _instantiate(bindings: DataFrame, templates: list[tuple]) -> DataFrame:
    """Concrete triples from (s, p, o) templates over the WHERE
    bindings: variables substitute per solution, constants replicate;
    solutions leaving any template term unbound (OPTIONAL-null) drop
    that instantiation, per the SPARQL 1.1 Update spec. Pure
    projections + a union — no shuffle until the caller's distinct."""
    parts = []
    for t in templates:
        if len(t) != 3:
            raise ValueError(f"template must be (s, p, o): {t!r}")
        cols = []
        for term, name in zip(t, _TERM_COLS):
            if _is_var(term):
                v = term[1:]
                if v not in bindings.columns:
                    raise ValueError(
                        f"template variable ?{v} is not bound by the "
                        f"WHERE clause ({sorted(bindings.columns)})")
                cols.append(F.col(v).alias(name))
            else:
                cols.append(F.lit(term).alias(name))
        parts.append(bindings.select(*cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    crit = " AND ".join(f"{c} IS NOT NULL" for c in _TERM_COLS)
    return out.filter(crit).distinct()


def _constant_triples(spark: SparkSession, triples: list[tuple]) -> DataFrame:
    for t in triples:
        if any(_is_var(term) for term in t):
            raise ValueError(
                f"DATA forms take ground triples only (no variables): {t!r}")
    return spark.createDataFrame(
        [tuple(t) for t in triples], "subj string, pred string, obj string"
    ).distinct()


def sparql_update(spark: SparkSession, table: str,
                  delete: list[tuple] | None = None,
                  insert: list[tuple] | None = None,
                  where: list[tuple] | None = None,
                  filters: list | None = None) -> int:
    """DELETE { templates } INSERT { templates } WHERE { patterns }.

    Any of the three clauses may be omitted: DELETE WHERE passes
    ``delete=where`` patterns as templates (use :func:`delete_where`),
    the DATA forms omit WHERE with ground templates. Returns the new
    snapshot id (unchanged CURRENT id if the update is a no-op).
    """
    from ..sources.snapshots import commit, current_snapshot_id, read_snapshot

    if not delete and not insert:
        raise ValueError("sparql_update: need delete and/or insert templates")
    base = current_snapshot_id(table)
    if base is None:
        raise ValueError(f"{table}: empty table (no CURRENT)")
    cur = read_snapshot(spark, table, base)

    if where is not None:
        from .bgp import bgp_join

        bindings = bgp_join(cur.drop(TKEY), where, filters=filters)
    else:
        if filters:
            raise ValueError("filters need a WHERE clause")
        bindings = None

    def ground(templates):
        if bindings is None:
            return _constant_triples(spark, templates)
        return _instantiate(bindings, templates)

    dele = ground(delete) if delete else None
    ins = ground(insert) if insert else None

    # Effective delta under set semantics, evaluated once and pinned
    # (localCheckpoint) so the commit's delete keys and added rows are
    # consistent even if the table moves under a concurrent writer
    # (the commit CAS on expected_parent would then refuse anyway).
    del_keys = None
    if dele is not None:
        matched = cur.join(dele, list(_TERM_COLS), "left_semi")
        del_keys = (matched.select(TKEY).distinct()
                    .localCheckpoint(eager=True))
        if not del_keys.limit(1).count():
            del_keys = None
    if ins is not None:
        cur_after = cur
        if dele is not None:
            cur_after = cur.join(dele, list(_TERM_COLS), "left_anti")
        new_rows = (ins.join(cur_after, list(_TERM_COLS), "left_anti")
                    .withColumn(TKEY, triple_key())
                    .localCheckpoint(eager=True))
        if not new_rows.limit(1).count():
            new_rows = None
    else:
        new_rows = None

    if del_keys is None and new_rows is None:
        return base  # no-op update: CURRENT does not move
    if new_rows is None:
        new_rows = cur.limit(0).localCheckpoint(eager=True)
    if del_keys is not None:
        return commit(new_rows, table, operation="rowdelta",
                      delete_keys=del_keys, delete_key=TKEY,
                      expected_parent=base)
    return commit(new_rows, table, operation="append",
                  expected_parent=base)


def insert_data(spark: SparkSession, table: str,
                triples: list[tuple]) -> int:
    """INSERT DATA { ground triples } — set-semantics append."""
    return sparql_update(spark, table, insert=triples)


def delete_data(spark: SparkSession, table: str,
                triples: list[tuple]) -> int:
    """DELETE DATA { ground triples } — keyed retraction, no-op safe."""
    return sparql_update(spark, table, delete=triples)


def delete_where(spark: SparkSession, table: str,
                 patterns: list[tuple],
                 filters: list | None = None) -> int:
    """DELETE WHERE { patterns } — the patterns double as the delete
    templates, per the spec's shorthand."""
    return sparql_update(spark, table, delete=patterns, where=patterns,
                         filters=filters)
