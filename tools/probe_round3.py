#!/usr/bin/env python
"""Round-3 scale probes (adversarial self-tests, not driver queries):

1. graph probe: PageRank (5 iters) + BFS over a 2M-node / 8M-edge
   hash-derived graph — does the iterative plan survive 4000x the
   driver-query graph size?
2. lakehouse probe: a 10M-row range-clustered snapshot table;
   merge_upsert touching ~0.5% of the key space — is the rewrite
   proportional to the touched files, and is stats planning
   metadata-cheap?

Usage: python tools/probe_round3.py [nodes] [rows]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def main() -> None:
    nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000

    from npm_extraction_server_spark.plans.graph import bfs_distances, pagerank
    from npm_extraction_server_spark.plans.session import get_spark
    from npm_extraction_server_spark.sources.snapshots import (
        commit,
        merge_upsert,
        plan_scan,
        read_snapshot,
        snapshot_log,
    )

    spark = get_spark(app="probe_round3")

    # -- graph probe ------------------------------------------------
    n = spark.range(nodes)
    d = F.col("id")
    edges = None
    for mult, add in ((7, 3), (13, 5), (1, 1), (29, 11)):
        e = n.select(d.alias("src"), ((d * mult + add) % nodes).alias("dst"))
        edges = e if edges is None else edges.unionByName(e)
    edges = edges.repartition(32).localCheckpoint(eager=True)
    n_edges = edges.count()

    t0 = time.monotonic()
    pr = pagerank(edges, iterations=5)
    n_ranked = pr.count()
    t_pr = time.monotonic() - t0
    mass = pr.agg(F.sum("rank")).collect()[0][0]

    seeds = n.filter(d % 200_000 == 0).select(d.alias("node_id"))
    t0 = time.monotonic()
    bfs = bfs_distances(seeds, edges, max_rounds=40)
    n_reached = bfs.count()
    max_dist = bfs.agg(F.max("dist")).collect()[0][0]
    t_bfs = time.monotonic() - t0
    print(f"graph: {nodes} nodes / {n_edges} edges | "
          f"pagerank 5 iters {t_pr:.1f}s (ranked {n_ranked}, mass {mass:.6f}) | "
          f"bfs {t_bfs:.1f}s (reached {n_reached}, max_dist {max_dist})",
          flush=True)

    from npm_extraction_server_spark.plans.graph import kcore, propagate_labels

    lseeds = seeds.select(
        "node_id",
        F.concat(F.lit("L"), F.floor(F.col("node_id") / 200_000)
                 .cast("string")).alias("label"))
    t0 = time.monotonic()
    n_labeled = propagate_labels(lseeds, edges, max_rounds=40).count()
    t_lp = time.monotonic() - t0
    t0 = time.monotonic()
    n_core = kcore(edges, k=6).count()
    t_kc = time.monotonic() - t0
    print(f"graph2: labelprop {t_lp:.1f}s ({n_labeled} labeled) | "
          f"6-core {t_kc:.1f}s ({n_core} nodes)", flush=True)

    # -- lakehouse probe --------------------------------------------
    table = tempfile.mkdtemp(prefix="probe_merge_")
    base = spark.range(rows).select(
        F.col("id"), (F.col("id") % 1000).alias("v"))
    t0 = time.monotonic()
    commit(base, table, partitions=64, cluster_by=["id"])
    t_commit = time.monotonic() - t0

    lo, hi = rows // 2, rows // 2 + rows // 200  # 0.5% key slice
    ups = spark.range(lo, hi).select(F.col("id"), F.lit(-1).alias("v"))
    t0 = time.monotonic()
    merge_upsert(spark, table, ups, key="id")
    t_merge = time.monotonic() - t0
    man = snapshot_log(table)[-1]
    t0 = time.monotonic()
    kept, total = plan_scan(table, [("id", ">=", lo), ("id", "<", hi)])
    t_plan = time.monotonic() - t0
    n_after = read_snapshot(spark, table).count()
    changed = read_snapshot(spark, table).filter(F.col("v") == -1).count()
    print(f"lakehouse: {rows} rows, 64 files | commit {t_commit:.1f}s | "
          f"merge 0.5% keys {t_merge:.1f}s rewrote "
          f"{len(man['removed_files'])}/64 files | plan_scan {t_plan*1000:.0f}ms "
          f"kept {len(kept)}/{len(total)} | rows {n_after} changed {changed}",
          flush=True)


if __name__ == "__main__":
    main()
