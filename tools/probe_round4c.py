#!/usr/bin/env python
"""Third-session scale probes: the new graph operators at ~4000x their
driver-query size on a 2M-node / 6M-edge hash graph (local[32]).

1. ktruss (k=3): does per-round cost track the shrinking live set?
2. maximal_independent_set: geometric undecided shrink in few rounds?
3. node2vec_walks (1000 walks x 10 steps): the per-step adjacency
   probe join at full graph size.
4. neighbor_agg (2 rounds): two full-graph message-passing joins.
5. link_predict with max_degree cap on a hubby graph.

Usage: python tools/probe_round4c.py [nodes]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def main() -> None:
    nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000

    from npm_extraction_server_spark.plans.graph import (
        ktruss,
        link_predict,
        maximal_independent_set,
        neighbor_agg,
        node2vec_walks,
    )
    from npm_extraction_server_spark.plans.session import get_spark

    spark = get_spark(app="probe_round4c")
    d = F.col("id")
    n = spark.range(nodes)
    base = None
    for mult, add in ((7, 3), (13, 5), (29, 11)):
        e = n.select(d.alias("src"), ((d * mult + add) % nodes).alias("dst"))
        base = e if base is None else base.unionByName(e)
    # a clustered stratum so ktruss/MIS see triangles: ring+chords on
    # the first 200k ids
    ring = n.filter(d < 200_000).select(
        d.alias("src"), ((d + 1) % 200_000).alias("dst"))
    chord = n.filter(d < 200_000).select(
        d.alias("src"), ((d + 2) % 200_000).alias("dst"))
    edges = base.unionByName(ring).unionByName(chord).persist()
    print(f"graph: {nodes} nodes, {edges.count()} edges", flush=True)

    t0 = time.time()
    kt = ktruss(edges, k=3)
    n_kt = kt.count()
    print(f"ktruss k=3: {time.time()-t0:.1f} s, {n_kt} surviving edges",
          flush=True)

    t0 = time.time()
    mis = maximal_independent_set(edges)
    n_mis = mis.count()
    print(f"MIS: {time.time()-t0:.1f} s, {n_mis} nodes", flush=True)

    starts = spark.range(1000).select(((d * 1_999) % nodes).alias("node_id"))
    ew = edges.withColumn(
        "w", (F.lit(1) + (F.col("src") * 3 + F.col("dst") * 5) % 7)
        .cast("long"))
    t0 = time.time()
    wk = node2vec_walks(ew, starts, length=10)
    n_wk = wk.count()
    print(f"node2vec (1000x10): {time.time()-t0:.1f} s, {n_wk} rows",
          flush=True)

    feats = n.select(d.alias("node_id"), (d % 100).alias("h"))
    t0 = time.time()
    na = neighbor_agg(edges, feats, rounds=2)
    n_na = na.count()
    print(f"neighbor_agg (2 rounds): {time.time()-t0:.1f} s, {n_na} rows",
          flush=True)

    t0 = time.time()
    lp = link_predict(edges, min_common=3, max_degree=50)
    n_lp = lp.count()
    print(f"link_predict (min_common=3, cap 50): {time.time()-t0:.1f} s, "
          f"{n_lp} candidate pairs", flush=True)


if __name__ == "__main__":
    main()
