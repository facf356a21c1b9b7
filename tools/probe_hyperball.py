#!/usr/bin/env python
"""HyperBall scale probe: the new operator at ~4000x its driver-query
size — 2M-node / 6M-edge sink-free hash graph, radius 4, p=4 and p=8.

What to look for (the scale contract from the docstring):
- state rows stay <= |V| * 2^p regardless of how big the balls get
  (at radius 4 the exact balls already average ~80 nodes; exact
  membership would be ~160M rows, the p=4 sketch state caps at 32M);
- per-round wall is flat across rounds (two node-keyed shuffles whose
  size is the register table, not the ball membership).

Usage: python tools/probe_hyperball.py [nodes] [radius]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def main() -> None:
    nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    radius = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from npm_extraction_server_spark.plans.graph import (
        hyperball, hyperball_stats)
    from npm_extraction_server_spark.plans.session import get_spark

    spark = get_spark(app="probe_hyperball")
    d = F.col("id")
    n = spark.range(nodes)
    base = None
    for mult, add in ((7, 3), (13, 5), (1, 1)):
        e = n.select(d.alias("src"), ((d * mult + add) % nodes).alias("dst"))
        base = e if base is None else base.unionByName(e)
    edges = base.localCheckpoint(eager=True)
    print(f"graph: {nodes} nodes, {edges.count()} edges", flush=True)

    for p in (4, 8):
        t0 = time.time()
        series = hyperball(edges, radius=radius, p=p)
        stats = hyperball_stats(series, radius=radius).collect()
        wall = time.time() - t0
        curve = ", ".join(
            f"t={r.t}: N={r.n_est:.0f} ({r.frac_reached:.3f})"
            for r in stats)
        print(f"hyperball p={p} radius={radius}: {wall:.1f}s | {curve}",
              flush=True)
        # ground truth at this synthetic graph: out-degree 3 regular,
        # so exact |B(v,t)| <= 1+3+9+... — report the implied mean ball
        mean_ball = stats[-1].n_est / nodes
        print(f"  mean ball at t={radius}: {mean_ball:.1f} "
              f"(exact upper bound {sum(3**i for i in range(radius+1))})",
              flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
