#!/usr/bin/env python
"""Scale probe for the SPARQL Update layer (plans/update.py): a
20M-triple quad store on local[32], then delta-sized verbs.

Questions the probe answers (the claims ROUND5.md makes):
1. Is a small DELETE WHERE's commit artifact proportional to the
   DELETED rows (equality-delete keys), with data files untouched?
2. Is the update wall dominated by the WHERE evaluation (one scan),
   i.e. comparable to the equivalent SELECT — never a store rewrite?
3. What do readers pay per un-compacted update (MOR anti-join), and
   does compact() fold it away?
4. Does the distributed LOAD path (mapInPandas N-Quads parse) sustain
   corpus-scale parse throughput?

Usage: python tools/probe_update.py [triples]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000

    from npm_extraction_server_spark.plans.update import (
        clear_graph,
        create_triple_table,
        delete_where,
        load_documents,
        read_triple_table,
        sparql_update,
    )
    from npm_extraction_server_spark.plans.session import get_spark
    from npm_extraction_server_spark.sources.snapshots import (
        compact,
        snapshot_log,
    )

    spark = get_spark(app="probe_update")
    d = F.col("id")
    # n triples over n/10 subjects, 10 predicates, 64 named graphs
    base = spark.range(n).select(
        F.concat(F.lit("e:"), (d % (n // 10)).cast("string")).alias("subj"),
        F.concat(F.lit("p:"), (d % 10).cast("string")).alias("pred"),
        F.concat(F.lit('"v'), d.cast("string"), F.lit('"')).alias("obj"),
        F.concat(F.lit("g:"), (d % 64).cast("string")).alias("graph"))
    table = tempfile.mkdtemp(prefix="probe_upd_")
    t0 = time.time()
    create_triple_table(spark, base, table, partitions=64)
    t_load = time.time() - t0
    print(f"store: {n} quads committed in {t_load:.1f}s", flush=True)

    # --- 1+2: small DELETE WHERE ------------------------------------
    # one predicate within one graph: d%10==3 AND d%64==7 has
    # solutions mod lcm(10,64)=320 (both residues odd) -> n/320 rows
    t0 = time.time()
    delete_where(spark, table, [("?s", "p:3", "?v", "g:7")])
    t_del = time.time() - t0
    man = snapshot_log(table)[-1]
    t0 = time.time()
    sel = read_triple_table(spark, table).filter(
        (F.col("pred") == "p:4") & (F.col("graph") == "g:4")).count()
    t_sel = time.time() - t0
    print(f"DELETE WHERE ({n // 320} rows): {t_del:.1f}s, "
          f"manifest op={man['operation']} added_rows={man['added_rows']} "
          f"delete_files={len(man.get('delete_files') or [])}; "
          f"equivalent SELECT count={sel}: {t_sel:.1f}s", flush=True)

    # --- 2b: DELETE-INSERT-WHERE rewrite of one predicate slice ------
    t0 = time.time()
    sparql_update(
        spark, table,
        delete=[("?s", "p:5", "?v", "?g")],
        insert=[("?s", "p:5x", "?v", "?g")],
        where=[("?s", "p:5", "?v", "?g")])
    t_rw = time.time() - t0
    man = snapshot_log(table)[-1]
    print(f"DELETE-INSERT-WHERE (p:5 -> p:5x, ~{n // 10} rows): "
          f"{t_rw:.1f}s, added_rows={man['added_rows']}", flush=True)

    # --- 3: reader MOR overhead, then compact -----------------------
    t0 = time.time()
    c1 = read_triple_table(spark, table).count()
    t_read_mor = time.time() - t0
    t0 = time.time()
    compact(spark, table)
    t_compact = time.time() - t0
    t0 = time.time()
    c2 = read_triple_table(spark, table).count()
    t_read_flat = time.time() - t0
    assert c1 == c2, (c1, c2)
    print(f"read with 2 MOR deltas: {t_read_mor:.1f}s ({c1} rows); "
          f"compact: {t_compact:.1f}s; read after: {t_read_flat:.1f}s",
          flush=True)

    # --- 3b: CLEAR one graph on the compacted store ------------------
    t0 = time.time()
    clear_graph(spark, table, "g:11")
    t_clear = time.time() - t0
    man = snapshot_log(table)[-1]
    print(f"CLEAR g:11 ({n // 64} rows): {t_clear:.1f}s, "
          f"delete_files={len(man.get('delete_files') or [])}", flush=True)

    # --- 4: distributed LOAD throughput ------------------------------
    docs_n = 2_000
    lines_per = 500  # 1M quads total
    did = F.col("id")
    docs = spark.range(docs_n).select(
        F.concat_ws("\n", F.transform(
            F.sequence(F.lit(0), F.lit(lines_per - 1)),
            lambda i: F.concat(
                F.lit("<l:"), (did * lines_per + i).cast("string"),
                F.lit("> <p:l> \"x\" <g:load> .")))).alias("doc"))
    t0 = time.time()
    load_documents(spark, table, docs, "doc", fmt="nq")
    t_ld = time.time() - t0
    quads = docs_n * lines_per
    print(f"LOAD {docs_n} N-Quads docs ({quads} quads): {t_ld:.1f}s "
          f"({quads / t_ld:,.0f} quads/s)", flush=True)


if __name__ == "__main__":
    main()
