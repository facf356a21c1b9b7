#!/usr/bin/env python
"""spark-submit entrypoint for the KG-construction pipeline.

    spark-submit --master <cluster> \
        --py-files /tmp/nes_spark_<hash>.zip \
        tools/submit_pipeline.py \
        --pages <parquet dir> --out <dir> [--root IRI] [--no-linking] \
        [--chunks N]            # resumable chunked mode (SC7)
        [--since TS --until TS] # incremental window (SC5)
        [--synthetic N]         # generate N synthetic pages instead

The driver-side session factory ships the package zip automatically
when run without --py-files (local smoke); on a real cluster pass the
zip explicitly. Prints a one-line JSON summary.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="input pages parquet directory")
    ap.add_argument("--pages-table",
                    help="input pages SNAPSHOT table (sources/snapshots.py "
                         "layout); reads the CURRENT snapshot")
    ap.add_argument("--since-snapshot", type=int,
                    help="with --pages-table: incremental run over only "
                         "the pages committed after this snapshot id")
    ap.add_argument("--synthetic", type=int,
                    help="generate N synthetic pages instead of --pages")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--root", default="http://example.org/")
    ap.add_argument("--no-linking", action="store_true")
    ap.add_argument("--chunks", type=int,
                    help="resumable mode: process in N url-hash chunks")
    ap.add_argument("--since", help="incremental: warc_ts >= SINCE")
    ap.add_argument("--until", help="incremental: warc_ts < UNTIL")
    args = ap.parse_args()
    if not args.pages and not args.synthetic and not args.pages_table:
        ap.error("one of --pages / --pages-table / --synthetic is required")

    from npm_extraction_server_spark.plans.session import get_spark
    from npm_extraction_server_spark.sources.pages import pages_df, read_pages

    spark = get_spark(app="kg-pipeline")
    t0 = time.monotonic()
    if args.synthetic:
        pages = pages_df(spark, args.synthetic)
    elif args.pages_table:
        from npm_extraction_server_spark.sources.snapshots import (
            read_incremental,
            read_snapshot,
        )

        if args.since_snapshot is not None:
            pages = read_incremental(spark, args.pages_table,
                                     args.since_snapshot)
        else:
            pages = read_snapshot(spark, args.pages_table)
    else:
        pages = read_pages(spark, args.pages)

    if args.since or args.until:
        from npm_extraction_server_spark.streaming.incremental import changed_since

        pages = changed_since(pages, args.since or "1970-01-01", args.until)

    if args.chunks:
        from npm_extraction_server_spark.plans.resume import run_resumable

        summary = run_resumable(pages, args.out, n_chunks=args.chunks,
                                root=args.root)
    else:
        from npm_extraction_server_spark.plans.warehouse import materialize_graph

        summary = materialize_graph(pages, args.out, root=args.root,
                                    do_linking=not args.no_linking)
    summary["wall_sec"] = round(time.monotonic() - t0, 2)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
