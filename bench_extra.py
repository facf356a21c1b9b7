#!/usr/bin/env python
"""Round-6 optimization measurement harness (bench.py stays FROZEN).

Per-query isolation at an arbitrary SF dir:
  python bench_extra.py [--sf DIR] [--queries a,b,c] [--passes N]
      [--explain-dir plans/r06] [--suffix _before] [--sink count|noop]

- times each query with the SAME methodology as bench.py (cold pass +
  min of N warm passes, .count() sink) so numbers are comparable, and
  optionally with the noop sink (guide §1.4: computes every column,
  no count-only column pruning) for plan-true isolation;
- captures .explain("formatted") per query into --explain-dir.
Prints one JSON line per query and a final summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "j1_range_pick", "a2_last_write_wins", "events_sessionize",
    "dedup_exact", "dedup_minhash", "text_quality", "text_fingerprint",
    "text_span_dedup", "sim_cosine_topk", "sim_lsh_topk", "graph_pagerank",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default=",".join(HEADLINE))
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--explain-dir", default="")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--sink", choices=["count", "noop"], default="count")
    args = ap.parse_args()

    from npm_extraction_server_spark.plans.session import get_spark

    import __spark_entry__ as entry

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="bench-extra", master=f"local[{cpus}]")
    queries = entry.queries()

    from pyspark.sql import functions as F
    spark.range(1000).select(F.sum("id")).collect()
    spark.read.parquet(f"{args.sf}/lineitem.parquet").limit(10).count()

    def run(df):
        if args.sink == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    names = [q.strip() for q in args.queries.split(",") if q.strip()]
    out = {}
    for name in names:
        fn = queries[name]
        if args.explain_dir:
            Path(args.explain_dir).mkdir(parents=True, exist_ok=True)
            txt = fn(spark, args.sf)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            (Path(args.explain_dir) / f"{name}{args.suffix}.txt").write_text(txt)
        spark.sparkContext.setJobDescription(f"{name} cold")
        t0 = time.monotonic()
        run(fn(spark, args.sf))
        cold = time.monotonic() - t0
        passes = []
        for i in range(args.passes):
            spark.sparkContext.setJobDescription(f"{name} warm{i}")
            t0 = time.monotonic()
            run(fn(spark, args.sf))
            passes.append(time.monotonic() - t0)
        out[name] = {"cold": round(cold, 3), "warm": round(min(passes), 3),
                     "passes": [round(p, 3) for p in passes]}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf": args.sf, "sink": args.sink, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
