"""SQL frontend: register the testdata tables and warehouse outputs as
temp views so every query in this engine is reachable from plain
``spark.sql`` — the relational surface users of the reference's HTTP
API would migrate to for ad-hoc queries."""

from __future__ import annotations

from pyspark.sql import SparkSession

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every parquet table under ``sf_dir`` as a temp view;
    returns the registered names."""
    out = []
    for name in TABLES:
        spark.read.parquet(f"{sf_dir}/{name}.parquet") \
            .createOrReplaceTempView(name)
        out.append(name)
    return out


def register_warehouse(spark: SparkSession, out_dir: str) -> list[str]:
    """Register a materialized warehouse (plans/warehouse.py layout)."""
    out = []
    for name in ("triples", "entities", "lineage", "errors"):
        try:
            spark.read.parquet(f"{out_dir}/{name}") \
                .createOrReplaceTempView(name)
            out.append(name)
        except Exception:
            continue  # optional tables (e.g. --no-linking)
    return out
