#!/usr/bin/env python
"""Connected-components scale probe (round-3 VERDICT item 7): run
connected_components + incremental_components on a 2M-node / ~8M-edge
hash graph INCLUDING the adversarial shape for min-label propagation —
a 100k-node pure path chain (diameter 100k), where naive label
flooding needs O(diameter) rounds and only pointer doubling keeps the
round count logarithmic.

Also probes closeness (multi-source BFS, 10 seeds) and random_walks
(1000 walks x 20 steps) over the same graph — the two new traversal
operators at 4000x their driver-query size.

Usage: python tools/probe_cc.py [nodes]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def main() -> None:
    nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    chain = 100_000

    from npm_extraction_server_spark.plans.graph import closeness, random_walks
    from npm_extraction_server_spark.plans.linking import (
        connected_components,
        incremental_components,
    )
    from npm_extraction_server_spark.plans.session import get_spark

    spark = get_spark(app="probe_cc")
    d = F.col("id")

    # bulk graph: 3 hash edges per node over ids [chain, nodes)
    bulk = spark.range(chain, nodes)
    base = None
    for mult, add in ((7, 3), (13, 5), (29, 11)):
        e = bulk.select(
            d.alias("src"),
            (chain + (d * mult + add) % (nodes - chain)).alias("dst"))
        base = e if base is None else base.unionByName(e)
    # adversarial 100k path chain on ids [0, chain): 0-1-2-...-99999,
    # connected to NOTHING else — one component of diameter 100k
    path = (spark.range(chain - 1)
            .select(d.alias("src"), (d + 1).alias("dst")))
    edges = base.unionByName(path).persist()
    n_edges = edges.count()
    print(f"graph: {nodes} nodes, {n_edges} edges "
          f"(incl. {chain}-node path chain)", flush=True)

    verts = (edges.select(F.col("src").alias("entity_iri"))
             .unionByName(edges.select(F.col("dst").alias("entity_iri")))
             .distinct())
    t0 = time.time()
    cc = connected_components(verts, edges, max_rounds=35).persist()
    n_comp = cc.select("canonical_id").distinct().count()
    t_cc = time.time() - t0
    chain_ids = (cc.filter(F.col("entity_iri") < chain)
                 .select("canonical_id").distinct().count())
    print(f"connected_components: {t_cc:.1f} s, {n_comp} components; "
          f"path chain collapsed to {chain_ids} id(s)", flush=True)

    # incremental: bridge the chain into the bulk with 10 new edges
    bridges = spark.createDataFrame(
        [(i * 9999, chain + i * 7) for i in range(1, 11)],
        "src long, dst long")
    t0 = time.time()
    inc = incremental_components(cc, bridges).persist()
    n_comp2 = inc.select("canonical_id").distinct().count()
    t_inc = time.time() - t0
    print(f"incremental_components (+10 bridge edges): {t_inc:.1f} s, "
          f"{n_comp2} components", flush=True)

    seeds = spark.range(10).select((F.col("id") * 199_999).alias("node_id"))
    t0 = time.time()
    cl = closeness(seeds, edges, max_rounds=40)
    n_cl = cl.count()
    print(f"closeness (10 seeds, 40 rounds cap): {time.time()-t0:.1f} s, "
          f"{n_cl} reached nodes", flush=True)

    starts = spark.range(1000).select(
        (chain + F.col("id") * 1_777).alias("node_id"))
    t0 = time.time()
    w = random_walks(edges, starts, length=20)
    n_w = w.count()
    print(f"random_walks (1000 starts x 20 steps): {time.time()-t0:.1f} s, "
          f"{n_w} walk rows", flush=True)


if __name__ == "__main__":
    main()
