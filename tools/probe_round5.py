#!/usr/bin/env python
"""Round-5 scale probes: the new operators at ~4000x their driver-query
size on a 2M-node hash graph (local[32]).

1. pagerank_incremental: warm history + a 20-edge delta on a 2M-node /
   6M-edge sink-free graph — is the per-round affected set delta-
   proportional (<< |V|), and does the incremental pass beat the cold
   recompute wall?
2. betweenness (8 sampled sources): forward sigma sweep + backward
   dependency sweep at full graph size — state is |sources| x
   |reachable|, rounds ∝ diameter.
3. topo_layers on a 500-level layered DAG: the depth-adversarial shape
   (round-4 item 2) — per-round job count and wall.
4. path_edges seq/alt at 6M edges: the midpoint join.

Usage: python tools/probe_round5.py [nodes]
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
        betweenness,
        pagerank,
        pagerank_incremental,
        topo_layers,
    )
    from npm_extraction_server_spark.plans.session import get_spark

    spark = get_spark(app="probe_round5")
    sc = spark.sparkContext
    d = F.col("id")
    n = spark.range(nodes)
    # sink-free multigraph: every node has 3 out-edges
    base = None
    for mult, add in ((7, 3), (13, 5), (1, 1)):
        e = n.select(d.alias("src"), ((d * mult + add) % nodes).alias("dst"))
        base = e if base is None else base.unionByName(e)
    e_old = base.localCheckpoint(eager=True)
    print(f"graph: {nodes} nodes, {e_old.count()} edges", flush=True)

    # --- 1. incremental PageRank ------------------------------------
    t0 = time.time()
    hist = pagerank(e_old, iterations=5, return_history=True)
    hist = hist.localCheckpoint(eager=True)
    _ = hist.count()
    t_hist = time.time() - t0
    print(f"pagerank history (5 iters, cold): {t_hist:.1f}s", flush=True)

    delta_added = (n.filter(d % 100_000 == 7)
                   .select(d.alias("src"),
                           ((d * 31 + 17) % nodes).alias("dst"))
                   .localCheckpoint(eager=True))
    empty = delta_added.limit(0).localCheckpoint(eager=True)
    e_new = e_old.unionByName(delta_added)
    stats: dict = {}
    t0 = time.time()
    inc = pagerank_incremental(e_old, e_new, hist, iterations=5,
                               stats=stats, added=delta_added,
                               removed=empty)
    n_inc = inc.count()
    t_inc = time.time() - t0
    print(f"pagerank_incremental changelog path (+{delta_added.count()} "
          f"edges): {t_inc:.1f}s, rows={n_inc}, "
          f"affected/round={stats['affected']} of n={stats['n_nodes']}",
          flush=True)
    assert max(stats["affected"]) < nodes / 10, stats

    t0 = time.time()
    inc2 = pagerank_incremental(e_old, e_new, hist, iterations=5)
    inc2.count()
    print(f"pagerank_incremental exceptAll path: {time.time()-t0:.1f}s",
          flush=True)

    t0 = time.time()
    cold = pagerank(e_new, iterations=5)
    cold.count()
    t_cold = time.time() - t0
    print(f"pagerank cold recompute on new graph: {t_cold:.1f}s "
          f"(incremental was {t_inc:.1f}s)", flush=True)

    # --- 2. sampled betweenness --------------------------------------
    seeds = n.filter(d % (nodes // 8) == 3).select(d.alias("node_id"))
    t0 = time.time()
    bc = betweenness(e_old, sources=seeds, scale_to_n=True,
                     max_rounds=60)
    nb = bc.count()
    print(f"betweenness (8 sources, 2M nodes): {time.time()-t0:.1f}s, "
          f"rows={nb}", flush=True)

    # --- 3. deep topo DAG --------------------------------------------
    depth, width = 500, 2_000
    # node id = layer*width + pos; edge to the same pos one layer down
    dag = (spark.range((depth - 1) * width)
           .select(F.col("id").alias("src"),
                   (F.col("id") + width).alias("dst")))
    sc.setJobGroup("topo5", "topo deep probe")
    t0 = time.time()
    out = topo_layers(dag, max_rounds=depth + 5)
    n_out = out.count()
    sc.setJobGroup(None, None)
    jobs = len(sc.statusTracker().getJobIdsForGroup("topo5"))
    print(f"topo_layers (depth {depth}, {depth*width} nodes): "
          f"{time.time()-t0:.1f}s, rows={n_out}, jobs={jobs} "
          f"({jobs/depth:.1f}/round incl. AQE stage-jobs)", flush=True)

    # --- 4. path algebra at scale ------------------------------------
    from npm_extraction_server_spark.plans.bgp import path_edges

    triples = e_old.select(
        F.col("src").cast("string").alias("subj"),
        F.when(F.col("src") % 2 == 0, "p").otherwise("q").alias("pred"),
        F.col("dst").cast("string").alias("obj"))
    t0 = time.time()
    seq = path_edges(triples, ("seq", "p", "q"))
    n_seq = seq.count()
    print(f"path_edges p/q over {nodes*3} triples: "
          f"{time.time()-t0:.1f}s, rows={n_seq}", flush=True)


if __name__ == "__main__":
    main()
