#!/usr/bin/env python
"""Snapshot / compare query RESULTS for optimization-equivalence proof.

  python tools/snapshot_results.py save /tmp/snap_dir [sf_dir] [q ...]
  python tools/snapshot_results.py diff /tmp/snap_dir [sf_dir] [q ...]

``save`` writes one sorted parquet per query (order-insensitive full
row content, via toPandas + lexicographic sort over stringified cells).
``diff`` recomputes and compares cell-for-cell, printing PASS/FAIL per
query. Used in round 6 to prove every optimized query still computes
the identical result (rows AND values) before/after a plan rewrite.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: repr(v))
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    mode, snap_dir = sys.argv[1], Path(sys.argv[2])
    rest = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.01"
    if rest and "/" in rest[0]:
        sf_dir, rest = rest[0], rest[1:]

    import __spark_entry__ as entry
    from npm_extraction_server_spark.plans.session import get_spark

    spark = get_spark(app="snapshot_results")
    queries = entry.queries()
    names = rest or list(queries)
    snap_dir.mkdir(parents=True, exist_ok=True)
    failed = []
    for name in names:
        try:
            pdf = canon(queries[name](spark, sf_dir).toPandas())
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {e}")
            failed.append(name)
            continue
        f = snap_dir / f"{name}.parquet"
        if mode == "save":
            pdf.to_parquet(f)
            print(f"{name}: saved {len(pdf)} rows")
        else:
            old = pd.read_parquet(f)
            ok = old.shape == pdf.shape and bool((old.values == pdf.values).all())
            print(f"{name}: {'PASS' if ok else 'FAIL'} ({len(pdf)} rows)")
            if not ok:
                failed.append(name)
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
