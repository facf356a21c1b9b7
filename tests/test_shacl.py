"""plans/shacl.py — SHACL-style shape validation on the triple table."""

import pytest

from npm_extraction_server_spark.plans.shacl import shacl_validate

T = [
    # (subj, pred, obj) — literals carry quotes (serialization contract)
    ("v1", "name", '"one"'), ("v1", "rev", '"1.0.0"'),
    ("v1", "dep", "http://m/a"), ("v1", "dep", "http://m/b"),
    ("v2", "name", '"two"'), ("v2", "rev", '"2.0.0"'),
    ("v3", "name", '"three"'), ("v3", "rev", '"1.1.0"'),
    ("v3", "rev", '"1.2.0"'),               # maxCount(rev)=1 violated
    ("v3", "dep", "http://m/a"),
    ("v3", "dep", "http://m/a"),             # duplicate: ONE value node
    ("v3", "dep", "skolem:genid1"),          # unqualified: never counts
    ("b1", "name", '"bundle"'),              # no rev -> not targeted
    ("x:genid1", "name", '"g"'), ("x:genid1", "rev", '"9"'),  # IRI filter
]

SHAPES = [{
    "id": "V",
    "target_pred": "name",
    "target_also_pred": "rev",
    "target_not_contains": "genid",
    "properties": [
        {"path": "rev", "min_count": 1, "max_count": 1,
         "pattern": '^"1\\.'},
        {"path": "dep", "qualified_prefix": "http://m/",
         "min_count": 1, "max_count": 1},
        {"path": "name", "node_kind": "Literal"},   # all conform
        {"path": "dep", "node_kind": "IRI"},        # all conform
    ],
}]


@pytest.fixture(scope="module")
def report(spark):
    t = spark.createDataFrame(T, ["subj", "pred", "obj"])
    return {(r["focus"], r["path"], r["component"]): r["n"]
            for r in shacl_validate(t, SHAPES).collect()}


def test_violations_exact(report):
    assert report == {
        ("v3", "rev", "sh:maxCount"): 2,     # two revisions
        ("v2", "rev", "sh:pattern"): 1,      # "2.0.0" fails ^"1\.
        ("v1", "dep", "sh:maxCount"): 2,     # two qualified deps
        ("v2", "dep", "sh:minCount"): 0,     # no deps at all
        # v3: one distinct qualified dep (dup row + skolem don't count)
        # b1 (no rev) and x:genid1 (IRI filter) never become focus
    }


def test_empty_shapes_rejected(spark):
    t = spark.createDataFrame(T, ["subj", "pred", "obj"])
    with pytest.raises(ValueError):
        shacl_validate(t, [{"id": "x", "target_pred": "name"}])


def test_conforming_graph_empty_report(spark):
    t = spark.createDataFrame(
        [("v", "name", '"n"'), ("v", "rev", '"1.0"')],
        ["subj", "pred", "obj"])
    shapes = [{"id": "V", "target_pred": "name", "properties": [
        {"path": "rev", "min_count": 1, "max_count": 1,
         "node_kind": "Literal", "pattern": '^"1'}]}]
    assert shacl_validate(t, shapes).count() == 0
