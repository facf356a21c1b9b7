#!/usr/bin/env python
"""Scale probes for the batch-18..22 operators.

- owl_horst_closure: 1M nodes in 32-chains + inverse cross edges
  (closure pairs ~15.9M — the inherent output of materializing a
  transitive predicate) + a 1M-edge symmetric relation.
- rdfs_closure: 10M data triples under a 128-class / depth-7
  hierarchy with domains/ranges (broadcast-joined schema closures).
- triad_census: the 2M-node / 6M-directed-edge expander family.
- ppr_push: same graph, 20 seeds, 8 rounds, eps threshold — report
  wall time AND touched-node count (the locality contract).
- text_idf_drift at 5M docs; events_paths at 50M events.

Run: python tools/probe_round5n.py
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def main() -> None:
    from npm_extraction_server_spark.plans.entail import (
        owl_horst_closure,
        rdfs_closure,
    )
    from npm_extraction_server_spark.plans.graph import (
        ppr_push,
        triad_census,
    )
    from npm_extraction_server_spark.plans.session import get_spark

    spark = get_spark(app="probe_round5n")

    # --- OWL-Horst closure --------------------------------------------
    nv = 1_000_000
    ids = spark.range(nv)
    part = (ids.filter(F.col("id") % 32 != 31)
            .select(F.concat(F.lit("e"), F.col("id").cast("string"))
                    .alias("subj"),
                    F.lit("partOf").alias("pred"),
                    F.concat(F.lit("e"), (F.col("id") + 1).cast("string"))
                    .alias("obj")))
    hasp = (ids.filter(F.col("id") % 4096 == 0)
            .select(F.concat(F.lit("e"), F.col("id").cast("string"))
                    .alias("subj"),
                    F.lit("hasPart").alias("pred"),
                    F.concat(F.lit("e"),
                             ((F.col("id") + nv // 2) % nv).cast("string"))
                    .alias("obj")))
    conn = ids.select(
        F.concat(F.lit("e"), F.col("id").cast("string")).alias("subj"),
        F.lit("connectedTo").alias("pred"),
        F.concat(F.lit("e"), ((F.col("id") * 7 + 3) % nv).cast("string"))
        .alias("obj"))
    data = (part.unionByName(hasp).unionByName(conn)
            .repartition(32).localCheckpoint(eager=True))
    nd = data.count()
    schema = spark.createDataFrame(
        [("partOf", "rdf:type", "owl:TransitiveProperty"),
         ("hasPart", "owl:inverseOf", "partOf"),
         ("connectedTo", "rdf:type", "owl:SymmetricProperty")],
        "subj string, pred string, obj string")
    t0 = time.time()
    n = owl_horst_closure(data, schema).count()
    dt = time.time() - t0
    print(f"owl_horst_closure {nd:,} data triples (1M nodes, "
          f"32-chains + inverse splices + symmetric): {dt:.1f}s  "
          f"closure={n:,} triples")

    # --- RDFS closure ---------------------------------------------------
    nt = 5_000_000
    r = spark.range(nt)
    d2 = (r.select(F.concat(F.lit("x"), F.col("id").cast("string"))
                   .alias("subj"),
                   F.lit("rdf:type").alias("pred"),
                   F.concat(F.lit("C"), (F.col("id") % 128).cast("string"))
                   .alias("obj"))
          .unionByName(r.select(
              F.concat(F.lit("x"), F.col("id").cast("string"))
              .alias("subj"),
              F.concat(F.lit("P"), (F.col("id") % 16).cast("string"))
              .alias("pred"),
              F.concat(F.lit("x"), ((F.col("id") * 13 + 7) % nt)
                       .cast("string")).alias("obj")))
          .repartition(32).localCheckpoint(eager=True))
    nd2 = d2.count()
    sch_rows = ([("C%d" % i, "rdfs:subClassOf", "C%d" % (i // 2))
                 for i in range(1, 128)]
                + [("P%d" % i, "rdfs:subPropertyOf", "P%d" % (i // 2))
                   for i in range(1, 16)]
                + [("P0", "rdfs:domain", "C1"), ("P3", "rdfs:range", "C5")])
    sch = spark.createDataFrame(
        sch_rows, "subj string, pred string, obj string")
    t0 = time.time()
    n = rdfs_closure(d2, sch).count()
    dt = time.time() - t0
    print(f"rdfs_closure {nd2:,} data triples, 128-class/16-prop "
          f"hierarchies: {dt:.1f}s  closure={n:,} triples")

    # --- triad census + ppr_push on the 2M expander -----------------------
    nv = 2_000_000
    ids = spark.range(nv)
    e = (ids.select(F.col("id").alias("src"),
                    ((F.col("id") + 1) % nv).alias("dst"))
         .unionByName(ids.select(F.col("id").alias("src"),
                                 ((F.col("id") * 7 + 13) % nv).alias("dst")))
         .unionByName(ids.select(F.col("id").alias("src"),
                                 ((F.col("id") * 131 + 7) % nv)
                                 .alias("dst")))
         .repartition(32).localCheckpoint(eager=True))
    ne = e.count()
    t0 = time.time()
    rows = {r["triad"]: r["n"] for r in triad_census(e).collect()}
    dt = time.time() - t0
    top = sorted(rows.items(), key=lambda kv: -kv[1])[:4]
    print(f"triad_census 2M nodes / {ne:,} directed edges: {dt:.1f}s  "
          f"top classes: {top}")

    seeds = spark.range(20).select((F.col("id") * 99991).alias("node_id"))
    t0 = time.time()
    out = ppr_push(e, seeds, rounds=8, eps_thresh=10)
    agg = out.agg(F.count("*").alias("touched"),
                  F.sum("p_e12").alias("sp"),
                  F.sum("r_e12").alias("sr")).collect()[0]
    dt = time.time() - t0
    print(f"ppr_push 2M nodes, 20 seeds, 8 rounds, eps=10/1e12: "
          f"{dt:.1f}s  touched={agg['touched']:,} "
          f"mass p+r = {agg['sp'] + agg['sr']:,} (exact 1e12)")

    # --- text/events batch-19 probes ------------------------------------
    ndocs = 5_000_000
    docs = spark.range(ndocs).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), (F.col("id") % 997).cast("string"),
                 F.lit(" common text body "),
                 F.lit("t"), (F.col("id") % 31).cast("string"),
                 F.lit(" "),
                 F.when(F.col("id") % 2 == 0, F.lit("oldterm rare"))
                 .otherwise(F.lit("newterm fresh"))).alias("text"),
        F.lit("en").alias("lang"))
    sfdir = tempfile.mkdtemp(prefix="probe5n_docs_")
    docs.repartition(32).write.mode("overwrite") \
        .parquet(f"{sfdir}/documents.parquet")

    from npm_extraction_server_spark.operators.suite import (
        events_paths,
        text_idf_drift,
    )
    t0 = time.time()
    n = text_idf_drift(spark, sfdir).count()
    dt = time.time() - t0
    print(f"text_idf_drift 5M docs: {dt:.1f}s  movers={n}")

    ne_ = 50_000_000
    ev = spark.range(ne_).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(1500000000) + F.col("id") % 864000)
        .alias("ts"),
        F.concat(F.lit("u"), (F.col("id") % 1_000_000).cast("string"))
        .alias("user_id"),
        F.concat(F.lit("e"), ((F.col("id") * 131) % 5).cast("string"))
        .alias("event_type"),
        F.lit(1.0).alias("value"), F.lit("{}").alias("props"))
    evdir = tempfile.mkdtemp(prefix="probe5n_ev_")
    ev.repartition(32).write.mode("overwrite") \
        .parquet(f"{evdir}/events.parquet")
    t0 = time.time()
    n = events_paths(spark, evdir).count()
    dt = time.time() - t0
    print(f"events_paths 50M events / 1M users: {dt:.1f}s  paths={n}")


if __name__ == "__main__":
    main()
