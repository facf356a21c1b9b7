#!/usr/bin/env python
"""Plan-diamond audit: for every queries() entry, count how many times
each parquet source appears as a FileScan in the OPTIMIZED plan. A
source scanned k>1 times means Catalyst replanned the scan per branch
(a "plan diamond") — at 100 TB that is k corpus scans for one answer.

Driver-only for lazy plans (optimizedPlan never executes), but entries
whose operators eagerly localCheckpoint intermediate frames DO run that
prefix — keep sf small (default sf0.001).

Usage: python tools/audit_diamonds.py [sf_dir] [query ...]
Prints one line per query with >1 scan of any single source, worst
first; exit 0 always (informational).
"""

from __future__ import annotations

import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def scan_counts(df) -> Counter:
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    hits = re.findall(r"Relation.*?\[?file:[^\]\s,]*?/(\w+)\.parquet",
                      plan)
    c = Counter(hits)
    # eagerly checkpointed prefixes appear as ExistingRDD/LogicalRDD —
    # count them too so the audit shows what was cut off, not hidden
    c["<checkpointed>"] = plan.count("LogicalRDD")
    return c


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if args and "/" in args[0]:
        sf_dir, args = args[0], args[1:]

    import __spark_entry__ as entry
    from npm_extraction_server_spark.plans.session import get_spark

    spark = get_spark(app="audit_diamonds")
    qs = entry.queries()
    keys = args or list(qs)
    rows = []
    for k in keys:
        try:
            df = qs[k](spark, sf_dir)
            c = scan_counts(df)
        except Exception as ex:  # noqa: BLE001 — audit must survive any query
            print(f"err  {k}: {type(ex).__name__}: {ex}")
            continue
        ckpt = c.pop("<checkpointed>", 0)
        worst = max(c.values(), default=0)
        if worst > 1:
            rows.append((worst, k, dict(c), ckpt))
    rows.sort(reverse=True)
    for worst, k, c, ckpt in rows:
        extra = f" (+{ckpt} checkpointed)" if ckpt else ""
        print(f"{worst}x  {k}: {c}{extra}")
    n_multi = len(rows)
    print(f"\n{n_multi}/{len(keys)} queries scan some source more than "
          f"once in the optimized plan")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
