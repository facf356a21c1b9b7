"""SHACL-style shape validation over the triple table.

A KG-construction pipeline needs a declarative quality gate on the
graphs it emits — the RDF world's answer is W3C SHACL (shapes with
sh:minCount / sh:maxCount / sh:pattern / sh:nodeKind constraint
components, plus qualified value shapes that count only values
matching a node filter). This is the distributed validation plan for
the useful core of that vocabulary:

- focus nodes are "subjects of a target predicate" (the
  sh:targetSubjectsOf form — class-based targeting is the same plan
  with ``rdf:type`` as the target predicate);
- each cardinality constraint is one groupBy over the path's triples
  (distinct VALUES per focus, the SHACL value-node semantics) left-
  joined back to the focus set so absent paths count 0;
- pattern / nodeKind constraints are per-triple predicates semi-joined
  to the focus set — whole-stage codegen, no Python;
- the report is the union of per-constraint violation frames:
  (focus, shape, path, component, n).

At 10^12 triples every constraint keys its shuffle on the subject,
so a subject-bucketed triple layout validates with map-side joins;
the focus set is usually class-sized (broadcastable) while the path
scans are predicate-pruned — exactly the pred-partitioned layout
plans/bgp.py already exploits.

nodeKind uses the engine's serialization contract (kernel/serialize):
literal objects carry their double quotes in ``obj``, IRIs are bare —
so ``sh:nodeKind`` is a prefix test, not a Python parse.

Reference semantics: the shapes in the suite query validate the
pipeline's version modules (doap:name / doap:revision / npm:dependency
emitted per lib/NpmModule.js), the graph the reference would feed a
downstream consumer.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["shacl_validate"]

MIN_COUNT = "sh:minCount"
MAX_COUNT = "sh:maxCount"
PATTERN = "sh:pattern"
NODE_KIND = "sh:nodeKind"


def _row(focus_col, shape_id: str, path: str, component: str, n_col):
    return [
        focus_col.alias("focus"),
        F.lit(shape_id).alias("shape"),
        F.lit(path).alias("path"),
        F.lit(component).alias("component"),
        n_col.cast("long").alias("n"),
    ]


def shacl_validate(triples: DataFrame, shapes: list[dict]) -> DataFrame:
    """Validate ``triples`` (subj, pred, obj) against ``shapes`` and
    return the violation report (focus, shape, path, component, n).

    Each shape: ``{"id": str, "target_pred": str,
    "target_prefix": str?, "target_not_contains": str?,
    "target_also_pred": str?,
    "properties": [{"path": str, "min_count": int?, "max_count": int?,
    "pattern": str?, "node_kind": "IRI"|"Literal"?,
    "qualified_prefix": str?, "qualified_not_contains": str?}]}``.
    The target_* filters narrow the focus set — by IRI shape (e.g.
    keep skolemized blank nodes, /.well-known/genid/ IRIs, out of a
    shape aimed at real modules) or conjunctively by a second
    predicate the focus must also bear (the SHACL-AF SPARQL-target
    analog: version modules = subjects with doap:name AND
    doap:revision, which no single sh:targetSubjectsOf can say).
    Cardinalities count DISTINCT values per focus (SHACL value nodes);
    the qualified_* filters restrict which values count (the
    sh:qualifiedValueShape analog for IRI-prefix node shapes).
    ``n`` is the offending count: the actual cardinality for
    min/max violations, the number of nonconforming values for
    pattern/nodeKind.
    """
    frames: list[DataFrame] = []
    for shape in shapes:
        sid = shape["id"]
        focus = triples.filter(F.col("pred") == shape["target_pred"])
        if shape.get("target_prefix"):
            focus = focus.filter(
                F.col("subj").startswith(shape["target_prefix"]))
        if shape.get("target_not_contains"):
            focus = focus.filter(
                ~F.col("subj").contains(shape["target_not_contains"]))
        focus = focus.select("subj").distinct()
        if shape.get("target_also_pred"):
            focus = focus.join(
                triples.filter(F.col("pred") == shape["target_also_pred"])
                .select("subj").distinct(),
                "subj", "left_semi")
        for prop in shape.get("properties", []):
            path = prop["path"]
            vals = triples.filter(F.col("pred") == path).select("subj", "obj")

            lo = prop.get("min_count")
            hi = prop.get("max_count")
            if lo is not None or hi is not None:
                counted = vals
                if prop.get("qualified_prefix"):
                    counted = counted.filter(
                        F.col("obj").startswith(prop["qualified_prefix"]))
                if prop.get("qualified_not_contains"):
                    counted = counted.filter(
                        ~F.col("obj").contains(prop["qualified_not_contains"]))
                cnts = counted.groupBy("subj").agg(
                    F.countDistinct("obj").alias("n"))
                per_focus = focus.join(cnts, "subj", "left").select(
                    "subj", F.coalesce(F.col("n"), F.lit(0)).alias("n"))
                if lo is not None:
                    frames.append(per_focus.filter(F.col("n") < lo).select(
                        *_row(F.col("subj"), sid, path, MIN_COUNT,
                              F.col("n"))))
                if hi is not None:
                    frames.append(per_focus.filter(F.col("n") > hi).select(
                        *_row(F.col("subj"), sid, path, MAX_COUNT,
                              F.col("n"))))

            checks = []
            if prop.get("pattern"):
                checks.append((PATTERN, ~F.col("obj").rlike(prop["pattern"])))
            if prop.get("node_kind"):
                is_lit = F.col("obj").startswith('"')
                checks.append((NODE_KIND,
                               is_lit if prop["node_kind"] == "IRI"
                               else ~is_lit))
            for component, bad in checks:
                offenders = (
                    vals.join(focus, "subj", "left_semi")
                    .filter(bad)
                    .groupBy("subj")
                    .agg(F.countDistinct("obj").alias("n"))
                )
                frames.append(offenders.select(
                    *_row(F.col("subj"), sid, path, component, F.col("n"))))

    if not frames:
        raise ValueError("shacl_validate: no constraints in shapes")
    return reduce(lambda a, b: a.unionByName(b), frames)
