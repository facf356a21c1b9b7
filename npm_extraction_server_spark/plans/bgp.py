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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bgp_agg", "bgp_ask", "bgp_construct", "bgp_describe",
           "bgp_join", "bgp_minus",
           "bgp_optional", "bgp_path", "bgp_union", "materialize_rules",
           "reorder_patterns"]


def _match_patterns(triples: DataFrame,
                    patterns: list[tuple[str, str, str]]) -> DataFrame:
    """Inner-join a conjunctive pattern group (no distinct — callers
    decide set vs bag semantics after composing OPTIONAL/UNION)."""
    if not patterns:
        raise ValueError("bgp: empty pattern list")
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
    return bound


def _finish(bound: DataFrame, select: list[str] | None,
            filters: list[Column] | list[str] | None) -> DataFrame:
    """Shared FILTER -> SELECT -> DISTINCT tail of every BGP form.
    ``filters`` entries are Column expressions over the variable
    columns (SQL strings also accepted, evaluated via F.expr — an
    expression API by contract, not data interpolation)."""
    for flt in filters or []:
        bound = bound.filter(F.expr(flt) if isinstance(flt, str) else flt)
    if select:
        bound = bound.select(*select)
    return bound.distinct()


def bgp_join(triples: DataFrame, patterns: list[tuple[str, str, str]],
             select: list[str] | None = None,
             filters: list | None = None) -> DataFrame:
    """Conjunctive triple-pattern join over ``triples`` (columns
    subj, pred, obj). ``patterns``: list of (s, p, o) terms —
    ``"?x"``-style variables bind, other strings filter. ``select``
    optionally projects/orders the output variable columns;
    ``filters`` are SPARQL-FILTER-style Column expressions applied to
    the bindings before projection.

    Returns one row per distinct satisfying binding, one column per
    variable (no ``?`` prefix). Repeated variables within one pattern
    express equality (``("?x", P, "?x")`` keeps self-loops only).
    """
    return _finish(_match_patterns(triples, patterns), select, filters)


def bgp_optional(triples: DataFrame,
                 patterns: list[tuple[str, str, str]],
                 optional: list[list[tuple[str, str, str]]],
                 select: list[str] | None = None,
                 filters: list | None = None) -> DataFrame:
    """SPARQL OPTIONAL: the required ``patterns`` group left-joined
    with each group in ``optional`` on their shared variables —
    bindings that match extend the row, bindings that don't leave the
    optional group's variables NULL (never drop the required row).

    Each optional group must share at least one variable with the
    required group (a disconnected OPTIONAL would be a cartesian
    product hiding behind NULL semantics — rejected instead).

    Scale shape: each optional group is one more filtered scan +
    left hash-join on the shared variable — same exchange reuse as
    the inner-join star; NULL-extension is free. OPTIONAL groups
    whose filtered scans are small broadcast under AQE.
    """
    bound = _match_patterns(triples, patterns)
    for grp in optional:
        opt = _match_patterns(triples, grp)
        shared = [c for c in opt.columns if c in bound.columns]
        if not shared:
            raise ValueError(
                "bgp_optional: optional group shares no variable with "
                f"the required patterns: {grp}")
        bound = bound.join(opt, shared, "left")
    return _finish(bound, select, filters)


def bgp_union(triples: DataFrame,
              groups: list[list[tuple[str, str, str]]],
              select: list[str] | None = None,
              filters: list | None = None) -> DataFrame:
    """SPARQL UNION: alternative pattern groups, each matched
    independently, bindings unioned by variable NAME — variables
    absent from one branch come back NULL in that branch's rows
    (unionByName with null padding), exactly SPARQL's union of
    solution mappings over possibly-different domains.

    Scale shape: branches are independent filtered scans evaluated in
    parallel; the union is a zero-shuffle concatenation — only the
    final DISTINCT exchanges, on the (small) binding rows.
    """
    if not groups:
        raise ValueError("bgp_union: empty group list")
    out: DataFrame | None = None
    for grp in groups:
        cur = _match_patterns(triples, grp)
        out = cur if out is None else out.unionByName(
            cur, allowMissingColumns=True)
    assert out is not None
    return _finish(out, select, filters)


def bgp_path(triples: DataFrame, seeds: DataFrame, pred: str,
             max_hops: int = 30, include_seed: bool = False) -> DataFrame:
    """SPARQL property path ``pred+`` (``pred*`` with
    ``include_seed=True``) from a seed set: every node reachable from
    a seed over one-or-more ``pred`` edges, with the minimum hop
    count. ``seeds``: one column ``node_id`` (subject IRIs).

    This is the SPARQL construct the engine's frontier-BFS machinery
    exists for: the predicate filter becomes a pushed scan filter
    (one partition on a pred-partitioned triple layout), and the
    closure delegates to plans.graph.bfs_distances — per-round work
    follows the reachability wavefront, never |V| (the
    kg_transitive_deps driver query is exactly this operator composed
    with semver resolution; its recursive-CTE oracle covers the
    closure semantics end-to-end)."""
    from .graph import bfs_distances

    edges = (triples.filter(F.col("pred") == pred)
             .select(F.col("subj").alias("src"),
                     F.col("obj").alias("dst")))
    out = bfs_distances(seeds, edges, max_rounds=max_hops)
    if not include_seed:
        out = out.filter(F.col("dist") > 0)
    return out.select(F.col("node_id").alias("node"),
                      F.col("dist").alias("hops"))


def bgp_construct(triples: DataFrame,
                  patterns: list[tuple[str, str, str]],
                  template: list[tuple[str, str, str]],
                  filters: list | None = None) -> DataFrame:
    """SPARQL CONSTRUCT: match the WHERE ``patterns`` (conjunctive,
    same semantics as bgp_join) and instantiate each ``template``
    triple once per binding — ``?var`` terms substitute the bound
    value, other terms are constants. Returns a (subj, pred, obj)
    DataFrame, distinct (CONSTRUCT produces a GRAPH, a set of
    triples), ready to union into the warehouse.

    This is single-rule materialized inference: a rule like
    "every module with a name has that name as its rdfs label" runs
    as one Catalyst plan (pattern scans -> joins -> projection), and
    a rule SET is just a union of bgp_construct calls — fixpoint
    iteration on top of it gives RDFS-style closure when rules feed
    each other."""
    bound = _match_patterns(triples, patterns)
    for flt in filters or []:
        bound = bound.filter(F.expr(flt) if isinstance(flt, str) else flt)
    parts = []
    for s, p, o in template:
        def term(t):
            if t.startswith("?"):
                var = t[1:]
                if var not in bound.columns:
                    raise ValueError(
                        f"bgp_construct: template var ?{var} is not "
                        f"bound by the patterns {sorted(bound.columns)}")
                return F.col(var)
            return F.lit(t)

        parts.append(bound.select(term(s).alias("subj"),
                                  term(p).alias("pred"),
                                  term(o).alias("obj")))
    import functools

    return functools.reduce(lambda a, b: a.unionByName(b),
                            parts).distinct()


def materialize_rules(triples: DataFrame,
                      rules: list[tuple[list, list]],
                      max_rounds: int = 20) -> DataFrame:
    """Forward-chaining rule materialization to FIXPOINT: ``rules``
    is a list of (patterns, template) pairs — each a bgp_construct
    rule — applied repeatedly until no rule derives a new triple.
    Returns the closure (original triples + everything derived),
    distinct. This is RDFS-style entailment materialization
    (subClassOf/subPropertyOf transitivity, type inheritance,
    domain/range typing all fit the rule shape) done the warehouse
    way: materialize once, query with plain BGP forever.

    Scale shape: each round is |rules| Catalyst plans over the
    current closure + one anti-join against it (only genuinely NEW
    triples survive into the next round), checkpointed — rounds are
    bounded by the derivation depth (e.g. the subclass-chain length),
    and each round's cost follows the rule matches, not the closure
    size squared. Raises on non-convergence within ``max_rounds``
    (a rule set deriving fresh IRIs forever is a bug, not a
    workload)."""
    import functools

    closure = (triples.select("subj", "pred", "obj").distinct()
               .localCheckpoint(eager=True))
    for _ in range(max_rounds):
        derived = functools.reduce(
            lambda a, b: a.unionByName(b),
            [bgp_construct(closure, pats, tmpl) for pats, tmpl in rules])
        fresh = (derived.join(closure, ["subj", "pred", "obj"],
                              "left_anti")
                 .distinct().localCheckpoint(eager=True))
        if not fresh.limit(1).count():
            return closure
        closure = closure.unionByName(fresh).localCheckpoint(eager=True)
    raise RuntimeError(
        f"materialize_rules: no fixpoint in {max_rounds} rounds")


_AGG_FNS = {
    "count": F.count,
    "count_distinct": F.count_distinct,
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
}


def bgp_agg(triples: DataFrame,
            patterns: list[tuple[str, str, str]],
            group_by: list[str],
            aggs: list[tuple[str, str, str]],
            filters: list | None = None,
            having: list | None = None) -> DataFrame:
    """SPARQL GROUP BY + aggregates: match the conjunctive
    ``patterns``, apply FILTER, then aggregate the DISTINCT bindings
    (this module's uniform set-semantics contract — every BGP form
    here returns distinct solution mappings, and the aggregate
    operates over that same set) grouped by the ``group_by``
    variables. ``aggs``: (var, fn, alias) with fn one of count /
    count_distinct / min / max / sum. ``having``: Column expressions
    (or SQL strings) over the aggregated row — SPARQL HAVING.

    "How many dependencies does each version declare?", "how many
    versions per package?" — the KG dashboard queries. Runs as one
    Catalyst plan: filtered pattern scans -> joins -> distinct ->
    partial/final hash aggregate; the groupBy reuses the binding
    rows' existing hash partitioning when the group key was the last
    join key, and map-side partial aggregation bounds the shuffle by
    the group cardinality either way.
    """
    for var, fn, _ in aggs:
        if fn not in _AGG_FNS:
            raise ValueError(
                f"bgp_agg: unknown aggregate '{fn}' for ?{var} "
                f"(have {sorted(_AGG_FNS)})")
    bound = _match_patterns(triples, patterns)
    for flt in filters or []:
        bound = bound.filter(F.expr(flt) if isinstance(flt, str) else flt)
    bound = bound.distinct()
    missing = [v for v in group_by if v not in bound.columns]
    if missing:
        raise ValueError(f"bgp_agg: group_by vars {missing} not bound "
                         f"by the patterns {sorted(bound.columns)}")
    out = bound.groupBy(*group_by).agg(
        *[_AGG_FNS[fn](F.col(var)).alias(alias)
          for var, fn, alias in aggs])
    for h in having or []:
        out = out.filter(F.expr(h) if isinstance(h, str) else h)
    return out


def bgp_minus(triples: DataFrame,
              patterns: list[tuple[str, str, str]],
              minus: list[list[tuple[str, str, str]]],
              select: list[str] | None = None,
              filters: list | None = None) -> DataFrame:
    """SPARQL MINUS (and the equivalent FILTER NOT EXISTS for
    variable-connected groups): keep the bindings of ``patterns``
    that are NOT compatible with any binding of any ``minus`` group —
    compatibility = agreement on the shared variables, so each minus
    group becomes one LEFT ANTI join on its shared-variable
    projection. "Packages with no dependency edge", "entities never
    referenced" — the negation queries that find the KG's gaps.

    Each minus group must share at least one variable with the
    required group: SPARQL MINUS with disjoint domains removes
    NOTHING by definition, which silently returns the unfiltered
    input — rejected as a footgun instead.

    Scale shape: the anti-join's build side is the minus group's
    DISTINCT shared-variable projection (usually far smaller than its
    full binding set); both sides hash-partition on the shared
    variables, and a selective minus group broadcasts under AQE.
    """
    bound = _match_patterns(triples, patterns)
    for grp in minus:
        m = _match_patterns(triples, grp)
        shared = [c for c in m.columns if c in bound.columns]
        if not shared:
            raise ValueError(
                "bgp_minus: minus group shares no variable with the "
                f"required patterns (would remove nothing): {grp}")
        bound = bound.join(m.select(*shared).distinct(), shared,
                           "left_anti")
    return _finish(bound, select, filters)


def reorder_patterns(triples: DataFrame,
                     patterns: list[tuple[str, str, str]]
                     ) -> list[tuple[str, str, str]]:
    """Selectivity-based BGP join ordering — the classic SPARQL
    optimizer heuristic, measured instead of guessed: ONE aggregate
    pass over ``triples`` counts each pattern's constant-matching
    rows (a single job producing one row, every pattern's count as a
    conditional sum), then patterns are ordered greedily
    most-selective-first UNDER the connectivity constraint: the next
    pattern must share a variable with those already placed (else the
    join would degenerate into a cross product), falling back to the
    cheapest remaining pattern only when no connected one exists
    (i.e. the caller genuinely wrote disconnected groups).

    Pure plan optimization: the result set of ``bgp_join(triples,
    reorder_patterns(triples, ps))`` equals ``bgp_join(triples, ps)``
    — only the join tree changes. At 10^11 triples the count pass is
    one scan (cheap next to a misordered join whose first pattern
    binds half the table), and the counts can be cached per predicate
    by callers issuing many queries.
    """
    if not patterns:
        raise ValueError("bgp: empty pattern list")
    conds = []
    for idx, (s, p, o) in enumerate(patterns):
        cond = F.lit(True)
        for col, term in zip(("subj", "pred", "obj"), (s, p, o)):
            if not term.startswith("?"):
                cond = cond & (F.col(col) == term)
        conds.append(F.sum(cond.cast("long")).alias(f"c{idx}"))
    row = triples.select("subj", "pred", "obj").agg(*conds).collect()[0]
    counts = [int(row[f"c{i}"] or 0) for i in range(len(patterns))]

    def pat_vars(pat):
        return {t[1:] for t in pat if t.startswith("?") and len(t) > 1}

    remaining = list(range(len(patterns)))
    remaining.sort(key=lambda i: (counts[i], i))
    order: list[int] = []
    bound_vars: set[str] = set()
    while remaining:
        pick = next((i for i in remaining
                     if not order or pat_vars(patterns[i]) & bound_vars),
                    remaining[0])
        remaining.remove(pick)
        order.append(pick)
        bound_vars |= pat_vars(patterns[pick])
    return [patterns[i] for i in order]


def bgp_describe(triples: DataFrame, iri: str) -> DataFrame:
    """SPARQL DESCRIBE (symmetric concise-bounded form, depth 1):
    every triple in which ``iri`` appears as subject OR object — the
    "show me this entity" query the reference answers per-package
    over HTTP, expressed over the triples table. Two pushed scan
    filters unioned; on a pred-partitioned layout both sides still
    prune columns, and a subj-bucketed table serves the subject arm
    shuffle-free."""
    t = triples.select("subj", "pred", "obj")
    return (t.filter(F.col("subj") == iri)
            .unionByName(t.filter(F.col("obj") == iri))
            .distinct())


def bgp_ask(triples: DataFrame, patterns: list[tuple[str, str, str]],
            filters: list | None = None) -> DataFrame:
    """SPARQL ASK: does at least one binding satisfy the pattern
    group? Returns ONE row (ask: boolean). Planned as the pattern
    join under a LIMIT 1 — Catalyst stops the scan at the first
    surviving row, so a satisfiable ASK touches a sliver of the
    table."""
    bound = _match_patterns(triples, patterns)
    for flt in filters or []:
        bound = bound.filter(F.expr(flt) if isinstance(flt, str) else flt)
    spark = triples.sparkSession
    n = bound.limit(1).count()
    return spark.createDataFrame([(bool(n),)], "ask boolean")
