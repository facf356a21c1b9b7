"""SPARQL 1.1 Update over the snapshot triple table (plans/update.py)."""

import tempfile

import pytest
from pyspark.sql import functions as F

from npm_extraction_server_spark.plans.update import (
    create_triple_table,
    delete_data,
    delete_where,
    insert_data,
    read_triple_table,
    sparql_update,
)
from npm_extraction_server_spark.sources.snapshots import (
    current_snapshot_id,
    snapshot_log,
)

EX = "http://example.org/"


def _mk(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _table(spark, rows):
    t = tempfile.mkdtemp(prefix="sparqlup_")
    create_triple_table(spark, _mk(spark, rows), t, partitions=2)
    return t


def _set(spark, table):
    return {tuple(r) for r in read_triple_table(spark, table).collect()}


BASE = [
    (EX + "a", EX + "p", '"1"'),
    (EX + "a", EX + "q", '"2"'),
    (EX + "b", EX + "p", '"1"'),
    (EX + "b", EX + "q", '"3"'),
]


def test_insert_data_set_semantics(spark):
    t = _table(spark, BASE)
    s0 = current_snapshot_id(t)
    insert_data(spark, t, [(EX + "c", EX + "p", '"9"'),
                           (EX + "a", EX + "p", '"1"')])  # second pre-exists
    got = _set(spark, t)
    assert got == set(BASE) | {(EX + "c", EX + "p", '"9"')}
    # one commit, and re-running the same insert is a no-op commit-wise
    s1 = current_snapshot_id(t)
    assert len(snapshot_log(t)) == 2
    assert insert_data(spark, t, [(EX + "c", EX + "p", '"9"')]) == s1
    assert current_snapshot_id(t) == s1 != s0


def test_delete_data_and_absent_noop(spark):
    t = _table(spark, BASE)
    delete_data(spark, t, [(EX + "a", EX + "q", '"2"')])
    assert _set(spark, t) == set(BASE) - {(EX + "a", EX + "q", '"2"')}
    sid = current_snapshot_id(t)
    # retracting an absent triple must not move CURRENT
    assert delete_data(spark, t, [(EX + "z", EX + "p", '"0"')]) == sid


def test_delete_where_with_filter(spark):
    t = _table(spark, BASE)
    delete_where(spark, t, [("?s", EX + "p", "?v")],
                 filters=[F.col("s") == EX + "a"])
    assert _set(spark, t) == set(BASE) - {(EX + "a", EX + "p", '"1"')}


def test_delete_insert_where_atomic(spark):
    t = _table(spark, BASE)
    n0 = len(snapshot_log(t))
    # rename predicate p -> r for every subject carrying it
    sparql_update(
        spark, t,
        delete=[("?s", EX + "p", "?v")],
        insert=[("?s", EX + "r", "?v")],
        where=[("?s", EX + "p", "?v")],
    )
    assert len(snapshot_log(t)) == n0 + 1  # ONE atomic commit
    assert _set(spark, t) == {
        (EX + "a", EX + "r", '"1"'), (EX + "b", EX + "r", '"1"'),
        (EX + "a", EX + "q", '"2"'), (EX + "b", EX + "q", '"3"'),
    }


def test_delete_and_reinsert_same_triple_survives(spark):
    t = _table(spark, BASE)
    # delete the whole p-slice but re-assert a's value: the SPARQL
    # delete-before-insert order means a keeps its triple
    sparql_update(
        spark, t,
        delete=[("?s", EX + "p", "?v")],
        insert=[(EX + "a", EX + "p", '"1"')],
        where=[("?s", EX + "p", "?v")],
    )
    assert _set(spark, t) == set(BASE) - {(EX + "b", EX + "p", '"1"')}


def test_time_travel_sees_pre_update_state(spark):
    t = _table(spark, BASE)
    s0 = current_snapshot_id(t)
    delete_where(spark, t, [("?s", EX + "q", "?v")])
    assert {tuple(r) for r in read_triple_table(spark, t, s0).collect()} \
        == set(BASE)
    assert _set(spark, t) == {r for r in BASE if r[1] != EX + "q"}


def test_optional_null_instantiation_dropped(spark):
    from npm_extraction_server_spark.plans.bgp import bgp_optional

    t = _table(spark, BASE + [(EX + "a", EX + "lbl", '"A"')])
    cur = read_triple_table(spark, t)
    # b has no label: the OPTIONAL leaves ?l null there, so the insert
    # template instantiates only for a (spec: unbound template -> skip)
    bindings = bgp_optional(cur, [("?s", EX + "p", "?v")],
                            [[("?s", EX + "lbl", "?l")]])
    from npm_extraction_server_spark.plans.update import _instantiate

    got = {tuple(r) for r in
           _instantiate(bindings, [("?s", EX + "hasLabel", "?l")],
                        ("subj", "pred", "obj"), None).collect()}
    assert got == {(EX + "a", EX + "hasLabel", '"A"')}


def test_validation_errors(spark):
    t = _table(spark, BASE)
    with pytest.raises(ValueError, match="ground triples"):
        insert_data(spark, t, [("?s", EX + "p", '"1"')])
    with pytest.raises(ValueError, match="not bound"):
        sparql_update(spark, t, delete=[("?s", EX + "p", "?nope")],
                      where=[("?s", EX + "p", "?v")])
    with pytest.raises(ValueError, match="delete and/or insert"):
        sparql_update(spark, t, where=[("?s", EX + "p", "?v")])


QBASE = [
    (EX + "a", EX + "p", '"1"', None),            # default graph
    (EX + "a", EX + "p", '"1"', EX + "g1"),       # same triple, named
    (EX + "b", EX + "p", '"2"', EX + "g1"),
    (EX + "c", EX + "p", '"3"', EX + "g2"),
]


def _qtable(spark, rows=None):
    t = tempfile.mkdtemp(prefix="sparqlupq_")
    df = spark.createDataFrame(
        rows or QBASE,
        "subj string, pred string, obj string, graph string")
    create_triple_table(spark, df, t, partitions=2)
    return t


def _qset(spark, table):
    return {tuple(r) for r in read_triple_table(spark, table).collect()}


def test_quad_insert_delete_exact_graph(spark):
    t = _qtable(spark)
    # 3-term DATA forms touch ONLY the default graph
    insert_data(spark, t, [(EX + "d", EX + "p", '"4"')])
    assert (EX + "d", EX + "p", '"4"', None) in _qset(spark, t)
    sid = current_snapshot_id(t)
    # same triple exists in g1 AND default: re-inserting the quad is a no-op
    assert insert_data(spark, t,
                       [(EX + "a", EX + "p", '"1"', EX + "g1")]) == sid
    # 3-term delete retracts from the default graph only — g1's copy stays
    delete_data(spark, t, [(EX + "a", EX + "p", '"1"')])
    got = _qset(spark, t)
    assert (EX + "a", EX + "p", '"1"', None) not in got
    assert (EX + "a", EX + "p", '"1"', EX + "g1") in got


def test_with_graph_scopes_update(spark):
    t = _qtable(spark)
    # WITH g1: the rename touches g1 only; g2 and default keep p
    sparql_update(spark, t,
                  delete=[("?s", EX + "p", "?v")],
                  insert=[("?s", EX + "r", "?v")],
                  where=[("?s", EX + "p", "?v")],
                  with_graph=EX + "g1")
    got = _qset(spark, t)
    assert (EX + "a", EX + "r", '"1"', EX + "g1") in got
    assert (EX + "b", EX + "r", '"2"', EX + "g1") in got
    assert (EX + "a", EX + "p", '"1"', EX + "g1") not in got
    assert (EX + "a", EX + "p", '"1"', None) in got            # default kept
    assert (EX + "c", EX + "p", '"3"', EX + "g2") in got       # g2 kept


def test_quad_template_graph_overrides_with(spark):
    t = _qtable(spark)
    # copy g2's triples into g3 via an explicit GRAPH term under WITH g2
    sparql_update(spark, t,
                  insert=[("?s", "?p", "?v", EX + "g3")],
                  where=[("?s", "?p", "?v")],
                  with_graph=EX + "g2")
    assert (EX + "c", EX + "p", '"3"', EX + "g3") in _qset(spark, t)


def test_clear_graph_scopes(spark):
    from npm_extraction_server_spark.plans.update import (
        ALL, NAMED, clear_graph)

    t = _qtable(spark)
    clear_graph(spark, t, EX + "g2")
    assert {g for *_, g in _qset(spark, t)} == {None, EX + "g1"}
    sid = clear_graph(spark, t, EX + "gz")      # absent graph: silent no-op
    assert sid == current_snapshot_id(t)
    clear_graph(spark, t)                        # CLEAR DEFAULT
    assert {g for *_, g in _qset(spark, t)} == {EX + "g1"}
    clear_graph(spark, t, NAMED)
    assert _qset(spark, t) == set()
    t2 = _qtable(spark)
    clear_graph(spark, t2, ALL)
    assert _qset(spark, t2) == set()


def test_copy_move_add_graph_atomic(spark):
    from npm_extraction_server_spark.plans.update import (
        add_graph, copy_graph, move_graph)

    t = _qtable(spark)
    n0 = len(snapshot_log(t))
    copy_graph(spark, t, EX + "g1", EX + "g2")   # g2 := g1 (old g2 gone)
    assert len(snapshot_log(t)) == n0 + 1        # ONE commit
    got = _qset(spark, t)
    assert (EX + "c", EX + "p", '"3"', EX + "g2") not in got
    assert (EX + "a", EX + "p", '"1"', EX + "g2") in got
    assert (EX + "b", EX + "p", '"2"', EX + "g2") in got
    move_graph(spark, t, EX + "g2", EX + "g3")
    got = _qset(spark, t)
    assert not any(g == EX + "g2" for *_, g in got)
    assert (EX + "b", EX + "p", '"2"', EX + "g3") in got
    # ADD keeps dst's existing rows; src==dst is a spec no-op
    add_graph(spark, t, EX + "g3", EX + "g1")
    got = _qset(spark, t)
    assert (EX + "a", EX + "p", '"1"', EX + "g1") in got
    assert (EX + "b", EX + "p", '"2"', EX + "g1") in got
    sid = current_snapshot_id(t)
    assert add_graph(spark, t, EX + "g1", EX + "g1") == sid
    # default graph as a management endpoint (null-safe joins)
    add_graph(spark, t, EX + "g1", None)
    assert (EX + "b", EX + "p", '"2"', None) in _qset(spark, t)


def test_quad_where_binds_graph_variable(spark):
    t = _qtable(spark)
    # retract every named-graph copy of value "1" wherever it lives,
    # binding ?g in WHERE and reusing it in the delete template
    sparql_update(spark, t,
                  delete=[("?s", EX + "p", '"1"', "?g")],
                  where=[("?s", EX + "p", '"1"', "?g")])
    got = _qset(spark, t)
    assert (EX + "a", EX + "p", '"1"', EX + "g1") not in got
    # our quad layer binds ?g = NULL on default-graph rows (the BGP
    # module's documented union view; strict SPARQL would skip them),
    # and the null-safe delta join retracts that copy too
    assert (EX + "a", EX + "p", '"1"', None) not in got
    assert (EX + "b", EX + "p", '"2"', EX + "g1") in got


def test_quad_table_validation(spark):
    t = _table(spark, BASE)   # plain triple table
    with pytest.raises(ValueError, match="triple table"):
        insert_data(spark, t, [(EX + "x", EX + "p", '"1"', EX + "g")])
    with pytest.raises(ValueError, match="WITH graph"):
        sparql_update(spark, t, insert=[(EX + "x", EX + "p", '"1"')],
                      with_graph=EX + "g")


def test_prepared_bindings_where_optional(spark):
    from npm_extraction_server_spark.plans.bgp import bgp_optional

    t = _table(spark, BASE + [(EX + "a", EX + "lbl", '"A"')])
    cur = read_triple_table(spark, t)
    # OPTIONAL-shaped WHERE: label every p-subject that HAS a label
    # (b's unbound ?l drops its insert instantiation, per spec)
    bindings = bgp_optional(cur, [("?s", EX + "p", "?v")],
                            [[("?s", EX + "lbl", "?l")]])
    sparql_update(spark, t,
                  insert=[("?s", EX + "hasLabel", "?l")],
                  where=bindings)
    got = _set(spark, t)
    assert (EX + "a", EX + "hasLabel", '"A"') in got
    assert not any(s == EX + "b" and p == EX + "hasLabel"
                   for s, p, _ in got)
    with pytest.raises(ValueError, match="filters"):
        sparql_update(spark, t, insert=[("?s", EX + "x", '"1"')],
                      where=bindings, filters=[F.col("v") == '"1"'])


def test_load_graph_formats_and_into(spark):
    from npm_extraction_server_spark.plans.update import load_graph

    nt = f'<{EX}x> <{EX}p> "9" .\n<{EX}a> <{EX}p> "1" .\n'
    t = _table(spark, BASE)
    load_graph(spark, t, nt, fmt="nt")
    assert _set(spark, t) == set(BASE) | {(EX + "x", EX + "p", '"9"')}
    sid = current_snapshot_id(t)
    assert load_graph(spark, t, nt, fmt="nt") == sid   # all dupes: no-op
    # quad data into a triple table must refuse
    nq = f'<{EX}y> <{EX}p> "2" <{EX}g1> .\n'
    with pytest.raises(ValueError, match="triple table"):
        load_graph(spark, t, nq, fmt="nq")
    # quad table: N-Quads keeps its graphs; INTO overrides them
    qt = _qtable(spark)
    load_graph(spark, qt, nq, fmt="nq")
    assert (EX + "y", EX + "p", '"2"', EX + "g1") in _qset(spark, qt)
    load_graph(spark, qt, nq, fmt="nq", into=EX + "g9")
    assert (EX + "y", EX + "p", '"2"', EX + "g9") in _qset(spark, qt)
    # empty document: no-op
    sid = current_snapshot_id(qt)
    assert load_graph(spark, qt, "# nothing\n", fmt="nq") == sid


def test_load_documents_distributed_equals_driver_parse(spark):
    from npm_extraction_server_spark.kernel.parse import parse_rdf
    from npm_extraction_server_spark.plans.update import load_documents

    docs = [
        f'<{EX}d1> <{EX}p> "1" <{EX}ga> .\n<{EX}d2> <{EX}p> "2" .\n',
        f'<{EX}d3> <{EX}p> "3" <{EX}gb> .\n',
        f'<{EX}d2> <{EX}p> "2" .\n',   # duplicate across documents
    ]
    qt = _qtable(spark, [(EX + "seed", EX + "p", '"0"', None)])
    df = spark.createDataFrame([(d,) for d in docs], "doc string") \
        .repartition(3)
    load_documents(spark, qt, df, "doc", fmt="nq")
    want = {(EX + "seed", EX + "p", '"0"', None)}
    for d in docs:
        for t in parse_rdf(d, "nq"):
            want.add((t.subj, t.pred, t.obj, t.graph))
    assert _qset(spark, qt) == want


def test_mor_artifacts_proportional_and_compactable(spark):
    from npm_extraction_server_spark.sources.snapshots import compact

    t = _table(spark, BASE)
    delete_where(spark, t, [("?s", EX + "q", "?v")])
    man = snapshot_log(t)[-1]
    assert man["operation"] == "rowdelta" and man.get("delete_files")
    assert man["added_rows"] == 0
    before = _set(spark, t)
    compact(spark, t)
    assert _set(spark, t) == before
