"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot products with ``F.zip_with`` + ``F.aggregate`` (JVM-side), top-k
  via window row_number. O(Q*N) — fine for a broadcast-able query set.
- ``lsh_topk``: the scale path — random-hyperplane LSH bucketing
  (deterministic xxhash64-derived hyperplanes), candidates restricted
  to same-bucket (multi-probe over H tables), then exact re-rank.
  At 100 TB the bucket join replaces the full cross product; buckets
  are the shuffle key.
- ``ivf_topk``: IVF-style alternative — k-means-lite centroids sampled
  deterministically, vectors assigned to nearest centroid partition,
  queries probe ``nprobe`` nearest centroids.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    ))


def with_norms(embeddings: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return embeddings.withColumn("norm", _norm(F.col(vec_col)))


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.
    ``queries`` is small -> broadcast; the big side streams."""
    base = with_norms(embeddings, vec_col).select(
        F.col(id_col).alias("item_id"), F.col(vec_col).alias("item_vec"), "norm")
    q = with_norms(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec"),
        F.col("norm").alias("qnorm"))
    joined = base.crossJoin(F.broadcast(q)).filter(F.col("item_id") != F.col("query_id"))
    sim = _dot(F.col("item_vec"), F.col("query_vec")) / (F.col("norm") * F.col("qnorm"))
    scored = joined.select("query_id", "item_id", F.round(sim, 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "item_id", "cosine", "rank")
    )


def _hyperplane(dim: int, table: int, bit: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from sha256 — same on every
    executor, no RNG state, no broadcast needed beyond the literal."""
    import hashlib
    import struct

    out = []
    for d in range(0, dim, 8):
        h = hashlib.sha256(f"lsh:{table}:{bit}:{d}".encode()).digest()
        for j in range(min(8, dim - d)):
            (v,) = struct.unpack_from(">i", h, j * 4)
            out.append((v / 2**31))
    return out


def lsh_bucket_col(vec_col, dim: int, table: int, bits: int = 12):
    """Bucket id = sign-bits against ``bits`` deterministic hyperplanes
    (expression form — kept for single-table uses; the multi-table path
    below uses the vectorized numpy variant instead)."""
    acc = F.lit(0).cast("long")
    for b in range(bits):
        plane = _hyperplane(dim, table, b)
        dot = F.aggregate(
            F.zip_with(vec_col, F.array(*[F.lit(p) for p in plane]),
                       lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda a, v: a + v,
        )
        acc = acc + F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0)).cast("long")
    return acc


def _lsh_buckets_udf(dim: int, tables: int, bits: int):
    """All table buckets in one Arrow batch: (N x dim) @ (dim x T*B)
    numpy matmul -> sign bits -> per-table bucket ids. One UDF call
    replaces tables*bits nested aggregate expressions (which blow up
    whole-stage codegen and ran ~10x slower)."""
    import numpy as np
    from pyspark.sql import types as T

    planes = np.array(
        [_hyperplane(dim, t, b) for t in range(tables) for b in range(bits)],
        dtype=np.float64,
    ).T  # dim x (tables*bits)
    weights = (1 << np.arange(bits, dtype=np.int64))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(mat) == 0:
            return pd.Series([], dtype=object)
        signs = (mat @ planes) > 0  # N x (tables*bits)
        per_table = signs.reshape(len(mat), tables, bits)
        ids = (per_table * weights).sum(axis=2)  # N x tables
        return pd.Series(list(ids))

    return buckets


def lsh_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5, dim: int = 64,
             tables: int = 4, bits: int = 8,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: same-bucket candidates over ``tables``
    hash tables, exact cosine re-rank. The candidate join is an
    equi-join on (table, bucket) — shuffle-friendly and AQE-splittable."""
    from .dedup import spread_partitions

    buckets_udf = _lsh_buckets_udf(dim, tables, bits)

    def bucketize(df, label):
        # norms computed ONCE per row here, not per candidate pair;
        # spread an under-parallel scan so the bucket UDF isn't serial
        df = spread_partitions(df, id_col)
        return df.select(
            F.col(id_col).alias(f"{label}_id"), F.col(vec_col).alias(f"{label}_vec"),
            _norm(F.col(vec_col)).alias(f"{label}_norm"),
            F.posexplode(buckets_udf(F.col(vec_col))).alias("table_id", "bucket"),
        )

    base = bucketize(embeddings, "item")
    q = bucketize(queries, "query")
    cand = (
        base.join(F.broadcast(q), ["table_id", "bucket"])
        .filter(F.col("item_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "item_id"])
    )
    sim = _dot(F.col("item_vec"), F.col("query_vec")) / (
        F.col("item_norm") * F.col("query_norm"))
    scored = cand.select("query_id", "item_id", F.round(sim, 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "item_id", "cosine", "rank")
    )


def _lloyd_refine(embeddings: DataFrame, cents: DataFrame, iters: int,
                  vec_col: str, id_col: str) -> DataFrame:
    """Deterministic Lloyd iterations: assign every vector to its
    nearest centroid (broadcast centroids, cent_id tiebreak), recompute
    each centroid as the elementwise mean (posexplode -> (cent_id, pos)
    avg -> re-assemble). Empty clusters keep their previous centroid.
    All steps deterministic -> same centroids every run."""
    sim_c = _dot(F.col(vec_col), F.col("cent_vec")) / (
        _norm(F.col(vec_col)) * _norm(F.col("cent_vec")))
    for _ in range(iters):
        assigned = (
            embeddings.crossJoin(F.broadcast(cents))
            .withColumn("csim", sim_c)
            .withColumn("crank", F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.desc("csim"),
                                                   F.asc("cent_id"))))
            .filter(F.col("crank") == 1)
            .select("cent_id", F.col(vec_col).alias("v"))
        )
        means = (
            assigned.select("cent_id", F.posexplode("v").alias("pos", "x"))
            .groupBy("cent_id", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("cent_id")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"]).alias("new_vec"))
        )
        cents = (
            cents.join(means, "cent_id", "left")
            .select("cent_id",
                    F.coalesce(F.col("new_vec"),
                               F.transform("cent_vec",
                                           lambda x: x.cast("double")))
                    .alias("cent_vec"))
        )
    return cents


def ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 16, nprobe: int = 4,
             vec_col: str = "embedding", id_col: str = "vec_id",
             kmeans_iters: int = 2) -> DataFrame:
    """IVF-style ANN: deterministic seed sample -> ``kmeans_iters``
    Lloyd refinements (broadcast centroids; elementwise-mean update),
    items assigned to nearest centroid, query probes the ``nprobe``
    nearest centroid lists. Centroids broadcast throughout."""
    # ORDER-STABLE deterministic sample: hash-order + id tiebreak, then
    # limit. orderBy+limit compiles to TakeOrderedAndProject (distributed
    # per-partition top-k + driver merge of n_centroids rows — no
    # single-partition funnel, no partition-order dependence the way a
    # bare limit() has).
    cents = (
        embeddings.orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(n_centroids)
        .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec"))
    )
    if kmeans_iters > 0:
        # localCheckpoint: the refined centroid table is tiny and reused
        # by both the assign and probe branches below
        cents = _lloyd_refine(embeddings, cents, kmeans_iters,
                              vec_col, id_col).localCheckpoint(eager=True)
    sim_c = _dot(F.col(vec_col), F.col("cent_vec")) / (
        _norm(F.col(vec_col)) * _norm(F.col("cent_vec")))

    assigned = (
        embeddings.crossJoin(F.broadcast(cents))
        .withColumn("csim", sim_c)
        .withColumn("crank", F.row_number().over(
            Window.partitionBy(id_col).orderBy(F.desc("csim"), F.asc("cent_id"))))
        .filter(F.col("crank") == 1)
        .select(F.col(id_col).alias("item_id"), F.col(vec_col).alias("item_vec"),
                "cent_id")
    )
    probes = (
        queries.crossJoin(F.broadcast(cents))
        .withColumn("csim", sim_c)
        .withColumn("crank", F.row_number().over(
            Window.partitionBy(id_col).orderBy(F.desc("csim"), F.asc("cent_id"))))
        .filter(F.col("crank") <= nprobe)
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec"),
                "cent_id")
    )
    cand = assigned.join(probes, "cent_id").filter(F.col("item_id") != F.col("query_id"))
    sim = _dot(F.col("item_vec"), F.col("query_vec")) / (
        _norm(F.col("item_vec")) * _norm(F.col("query_vec")))
    scored = cand.select("query_id", "item_id", F.round(sim, 6).alias("cosine")) \
        .dropDuplicates(["query_id", "item_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "item_id", "cosine", "rank")
    )
