"""Truth discovery / conflicting-fact fusion.

When the pipeline's three extraction sources (embedded structured
metadata, manifest JSON blobs, prose text mentions — the reference
renders only curated registry JSON, `lib/npm/NpmCouchDb.js`, so it
never faces this) assert CONFLICTING values for the same
(entity, attribute), a plain majority vote is wrong whenever low-
quality sources outnumber good ones. ``truth_discovery`` runs the
classic fixpoint from the truth-discovery literature (Sums /
Hubs-and-Authorities over the source-claim bipartite graph, the
baseline of Pasternack & Roth COLING'10 and the TruthFinder family):

    belief(fact)   = sum of trust(source) over asserting sources
    trust(source)  = MEAN of belief(fact) over asserted facts

with max-normalization after each half-step so the vectors stay in
(0, 1].  Reliable sources are the ones that agree with other reliable
sources; their facts win even against a numerical majority of junk.
The trust half-step uses the mean, not the sum (the "Average"
operator of Pasternack & Roth), because plain Sums rewards sheer
claim volume — a prolific colluding spam clique out-scores a larger
but sparser set of honest sources, which is exactly the adversary a
web-crawl extraction pipeline faces.

Determinism protocol (identical to ``plans/graph.pagerank``): every
vector value lives on the 12-decimal grid — contributions are
``cast(round(x, 12) AS DECIMAL(28,12))``, summed exactly, cast back
to double, divided by the (exactly comparable) double max, and
re-rounded to 12 — so the belief/trust vectors match DuckDB's
unrolled CTE bit-for-bit at every iteration.

Scale shape: the (source, entity, attr, value) assertion set is
deduplicated once and persisted TWICE, hash-partitioned on each join
side — ``by source`` for the trust->belief half-step and ``by fact``
for the belief->trust half-step — so each iteration shuffles only the
trust vector (|sources|-sized, broadcast) and the belief vector
(|facts|-sized, co-partitioned with the fact-keyed copy), never the
assertion set itself.  Both normalizing maxima are 1-row aggregates
broadcast-cross-joined into the update, so each half-step stays a
single job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

_FACT = ["entity", "attr", "value"]
_DEC = "decimal(28,12)"


def _grid_sum(col):
    """Exact decimal accumulation of 12-dp-grid doubles, back to double."""
    return F.sum(F.round(col, 12).cast(_DEC)).cast("double")


def truth_discovery(claims: DataFrame, iterations: int = 4,
                    out_scale: int = 8,
                    return_trust: bool = False) -> DataFrame:
    """Fuse conflicting (source, entity, attr, value) claims.

    Returns one fused row per (entity, attr): the value with the
    highest final belief (ties broken toward the lexicographically
    smallest value — deterministic), its belief on the ``out_scale``
    grid, and the number of distinct asserting sources.  With
    ``return_trust=True`` returns the final per-source trust vector
    instead (source, trust).
    """
    a = (claims.select("source", *_FACT).distinct()
         .localCheckpoint(eager=True))
    a_by_src = a.repartition(F.col("source")).persist()
    a_by_fact = a.repartition(*[F.col(c) for c in _FACT]).persist()
    a_by_src.count(), a_by_fact.count()

    trust = (a.select("source").distinct()
             .withColumn("trust", F.lit(1.0)))
    belief = None
    for _ in range(iterations):
        # trust -> belief: the trust vector is |sources|-sized, so the
        # join broadcasts it; the groupBy's exchange carries map-side
        # decimal partials, never raw assertions.
        raw_b = (a_by_src.join(F.broadcast(trust), "source")
                 .groupBy(*_FACT).agg(_grid_sum("trust").alias("raw")))
        bmax = raw_b.agg(F.max("raw").alias("bmax"))
        belief = (raw_b.crossJoin(F.broadcast(bmax))
                  .select(*_FACT,
                          F.round(F.col("raw") / F.col("bmax"), 12)
                          .alias("belief"))
                  .localCheckpoint(eager=True))
        # belief -> trust: belief is |facts|-sized and arrives already
        # hash-partitioned on the fact key from its groupBy, matching
        # a_by_fact's persisted partitioning — the join adds no
        # assertion-sized exchange.
        raw_t = (a_by_fact.join(belief, _FACT)
                 .groupBy("source")
                 .agg((_grid_sum("belief") / F.count("*")).alias("raw")))
        tmax = raw_t.agg(F.max("raw").alias("tmax"))
        trust = (raw_t.crossJoin(F.broadcast(tmax))
                 .select("source",
                         F.round(F.col("raw") / F.col("tmax"), 12)
                         .alias("trust"))
                 .localCheckpoint(eager=True))
    a_by_src.unpersist()
    a_by_fact.unpersist()
    if return_trust:
        return trust.select("source", F.round("trust", out_scale)
                            .alias("trust"))
    n_src = a.groupBy(*_FACT).agg(
        F.countDistinct("source").alias("n_sources"))
    w = (belief.join(n_src, _FACT)
         .withColumn("_rk", F.row_number().over(
             Window.partitionBy("entity", "attr")
             .orderBy(F.col("belief").desc(), F.col("value").asc()))))
    return (w.filter(F.col("_rk") == 1)
            .select("entity", "attr", "value",
                    F.round("belief", out_scale).alias("belief"),
                    "n_sources"))
