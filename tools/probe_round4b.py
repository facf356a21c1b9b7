#!/usr/bin/env python
"""Round-4 continuation scale probes (adversarial self-tests, not
driver queries):

1. topo_layers over a 2M-node layered DAG (20 levels, 6M forward
   edges) with a planted 1000-node cycle — do the peel rounds track
   the layer count (not |V|), and how much does the cycle closure
   cost?
2. strongly_connected_components over the same graph — does the trim
   phase dispose of the ~2M acyclic nodes before coloring ever runs,
   leaving the coloring fixpoint to the 1000-node cycle + its
   closure?
3. dedup_against_corpus with a 5M-row corpus digest table and a
   500k-row batch (10% planted dupes) — is the per-batch cost batch-
   proportional (the corpus is only touched through the digest
   anti-join)?

Usage: python tools/probe_round4b.py [nodes] [corpus_rows]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def main() -> None:
    nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    corpus_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    levels = 20

    from npm_extraction_server_spark.operators.dedup import (
        dedup_against_corpus,
    )
    from npm_extraction_server_spark.plans.graph import (
        strongly_connected_components,
        topo_layers,
    )
    from npm_extraction_server_spark.plans.session import get_spark

    spark = get_spark(app="probe_round4b")
    d = F.col("id")

    # layered DAG: node level = id % levels; 3 forward edges per node
    n = spark.range(nodes)
    lvl = d % levels
    base = None
    for mult, add in ((7, 3), (13, 5), (29, 11)):
        e = (n.filter(lvl < levels - 1)
             .select(d.alias("src"),
                     (((d * mult + add) % (nodes // levels)) * levels
                      + lvl + 1).alias("dst")))
        base = e if base is None else base.unionByName(e)
    # planted 1000-node strongly connected cluster among level-1 nodes
    # (ids 1 + 20k): ring + chords at +10/+100, diameter ~27 — the
    # realistic shape of a web/dependency SCC (dense, small diameter).
    # A pure ring would be the coloring algorithm's documented worst
    # case: min-label propagation advances one hop per round, so
    # rounds ∝ SCC diameter (see strongly_connected_components
    # docstring) — real KG SCCs are chorded, not bare rings.
    ring = None
    for step in (1, 10, 100):
        e = (spark.range(1000)
             .select((d * levels + 1).alias("src"),
                     (((d + step) % 1000) * levels + 1).alias("dst")))
        ring = e if ring is None else ring.unionByName(e)
    edges = base.unionByName(ring).repartition(32) \
        .localCheckpoint(eager=True)
    n_edges = edges.count()
    print(f"graph: {nodes} nodes, {n_edges} edges, {levels} levels, "
          f"1000-node planted ring")

    t0 = time.time()
    tl = topo_layers(edges, max_rounds=levels + 5)
    dist = {r["layer"]: r["n"] for r in
            tl.groupBy("layer").agg(F.count("*").alias("n")).collect()}
    t_topo = time.time() - t0
    n_null = dist.get(None, 0)
    print(f"topo_layers: {t_topo:.1f}s, {len(dist) - (1 if None in dist else 0)} "
          f"layers, {n_null} cycle-closure nodes")

    t0 = time.time()
    scc = strongly_connected_components(edges, max_rounds=levels + 10)
    agg = (scc.groupBy("scc_id").agg(F.count("*").alias("n"))
           .groupBy("n").agg(F.count("*").alias("k")).collect())
    t_scc = time.time() - t0
    sizes = {r["n"]: r["k"] for r in agg}
    print(f"scc: {t_scc:.1f}s, component-size histogram {sizes} "
          f"(expect one 1000-size component, rest singletons)")

    # -- incremental corpus dedup ----------------------------------
    corpus = spark.range(corpus_rows).select(
        d.alias("doc_id"), F.concat(F.lit("corpus text "), d).alias("text"))
    digests = corpus.select(
        F.sha2(F.col("text"), 256).alias("digest")).localCheckpoint(True)
    batch_n = corpus_rows // 10
    batch = (spark.range(batch_n).select(
        (d + 10_000_000).alias("doc_id"),
        F.when(d % 10 == 0, F.concat(F.lit("corpus text "), d))  # 10% dupes
         .otherwise(F.concat(F.lit("fresh text "), d)).alias("text")))
    t0 = time.time()
    fresh = dedup_against_corpus(batch, digests)
    n_fresh = fresh.count()
    t_dedup = time.time() - t0
    print(f"dedup_against_corpus: {t_dedup:.1f}s, batch {batch_n} -> "
          f"{n_fresh} fresh ({batch_n - n_fresh} dropped as corpus dupes)")


if __name__ == "__main__":
    main()
