#!/usr/bin/env python
"""Scale probes for the final round-5 additions: embedding
link-prediction eval, SHACL validation, PROV-O emission.

Synthesizes edge/triple tables orders of magnitude beyond the suite's
(driver graphs are ~10^3 rows) and reports wall seconds + result
sizes. Run: python tools/probe_round5c.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def main() -> None:
    from npm_extraction_server_spark.plans.embed import (
        link_pred_metrics,
        link_pred_ranks,
    )
    from npm_extraction_server_spark.plans.kg import prov_triples
    from npm_extraction_server_spark.plans.shacl import shacl_validate
    from npm_extraction_server_spark.plans.session import get_spark

    spark = get_spark(app="probe_round5c")

    # --- link prediction: 2M edges, 4 relations, 50k-object domains ---
    # Three join strategies: engine-decided (None), forced sort-merge
    # (False), forced broadcast (True — the documented pathology: 4-key
    # hashed relation with 50k-duplicate chains; probed at a smaller
    # test split so the run stays bounded).
    n_edges = 2_000_000
    edges = (
        spark.range(n_edges)
        .select(
            F.concat(F.lit("e:"), (F.col("id") % 500_000)).alias("src"),
            F.concat(F.lit("r"), (F.col("id") % 4)).alias("rel"),
            F.concat(F.lit("e:"), F.pmod(
                F.xxhash64(F.col("id")), F.lit(50_000))).alias("dst"),
        )
        .repartition(32)
        .persist()
    )
    print(f"edges: {edges.count():,}")

    for bcast, mod in ((None, 4000), (False, 4000), (True, 20000)):
        t0 = time.time()
        ranks = link_pred_ranks(edges, test_mod=mod,
                                broadcast_candidates=bcast)
        m = link_pred_metrics(ranks).collect()[0]
        dt = time.time() - t0
        print(f"link_pred broadcast={bcast} test_mod={mod}: {dt:.1f}s  "
              f"n={m['n']} hits1={m['hits1']} hits10={m['hits10']} "
              f"sum_rr_e8={m['sum_rr_e8']}")

    # --- SHACL: 10M triples, 1M focus nodes ---
    t = (
        spark.range(10_000_000)
        .select(
            F.concat(F.lit("s:"), (F.col("id") % 1_000_000)).alias("subj"),
            F.element_at(
                F.array(F.lit("name"), F.lit("rev"), F.lit("dep")),
                ((F.col("id") % 3) + 1).cast("int")).alias("pred"),
            F.when(F.col("id") % 3 < 2,
                   F.concat(F.lit('"v'), F.col("id") % 7, F.lit('"')))
            .otherwise(F.concat(F.lit("http://m/"),
                                F.pmod(F.xxhash64("id"), F.lit(1000))))
            .alias("obj"),
        )
        .repartition(32)
        .persist()
    )
    print(f"triples: {t.count():,}")
    shapes = [{
        "id": "S", "target_pred": "name",
        "properties": [
            {"path": "rev", "min_count": 1, "max_count": 2,
             "pattern": '^"v[0-3]'},
            {"path": "dep", "qualified_prefix": "http://m/",
             "min_count": 1, "max_count": 3},
            {"path": "name", "node_kind": "Literal"},
        ],
    }]
    t0 = time.time()
    n = shacl_validate(t, shapes).count()
    print(f"shacl 10M triples / 1M focus: {time.time()-t0:.1f}s  "
          f"violations={n:,}")

    # --- PROV: 5M documents of src_url ---
    docs = spark.range(5_000_000).select(
        F.concat(F.lit("http://c/"), F.col("id")).alias("src_url"),
        F.lit("s").alias("subj"), F.lit("p").alias("pred"),
        F.lit("o").alias("obj"))
    t0 = time.time()
    n = prov_triples(docs).count()
    print(f"prov 5M docs: {time.time()-t0:.1f}s  triples={n:,}")

    spark.stop()


if __name__ == "__main__":
    main()
