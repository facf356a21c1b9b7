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


def _nearest_centroids_udf(cent_rows: list, nprobe: int):
    """Map-side nearest-centroid assignment: the centroid table (tiny —
    it is broadcast-sized by definition) is captured in the UDF closure,
    and each Arrow batch computes ONE (N x dim) @ (dim x C) numpy matmul
    -> cosine -> top-``nprobe`` centroid ids (desc similarity, asc
    cent_id tiebreak — same order the old window rank used). ZERO
    exchange: this replaces the crossJoin(N x C) + row_number window
    (an N*C-row shuffle) that was the plan's 100x-scale killer."""
    import numpy as np
    from pyspark.sql import types as T

    cent_ids = np.array([int(r[0]) for r in cent_rows], dtype=np.int64)
    cmat = np.array([np.asarray(r[1], dtype=np.float64) for r in cent_rows])
    cnorm = np.linalg.norm(cmat, axis=1)
    cnorm[cnorm == 0] = 1.0
    k = min(nprobe, len(cent_rows))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def nearest(vecs: pd.Series) -> pd.Series:
        import numpy as np

        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        vn = np.linalg.norm(mat, axis=1)
        vn[vn == 0] = 1.0
        sims = (mat @ cmat.T) / vn[:, None] / cnorm[None, :]  # N x C
        # per-row sort by (-sim, cent_id): lexsort keys are applied
        # last-key-primary along the last axis
        order = np.lexsort(
            (np.broadcast_to(cent_ids, sims.shape), -sims), axis=-1)
        top = cent_ids[order[:, :k]]
        return pd.Series(list(top))

    return nearest


def _lloyd_refine(embeddings: DataFrame, cents: DataFrame, iters: int,
                  vec_col: str, id_col: str) -> DataFrame:
    """Deterministic Lloyd iterations, all map-side: per Arrow batch,
    assign each vector to its nearest centroid with one numpy matmul
    (broadcast centroids in the UDF closure) AND accumulate per-centroid
    partial sums — each partition emits at most C partial rows
    (cent_id, psum, n). The only shuffle per iteration is the
    (partitions x C)-row partial reduce; the N x dim vectors never move
    (the old form crossJoined N x C rows through a row_number window —
    an N*C exchange per iteration). Empty clusters keep their previous
    centroid. All steps deterministic -> same centroids every run."""
    import numpy as np
    from pyspark.sql import types as T

    partial_schema = T.StructType([
        T.StructField("cent_id", T.LongType(), False),
        T.StructField("psum", T.ArrayType(T.DoubleType()), False),
        T.StructField("n", T.LongType(), False),
    ])
    src = embeddings.select(F.col(vec_col).alias("v"))

    for _ in range(iters):
        cent_rows = [(r["cent_id"], r["cent_vec"]) for r in cents.collect()]
        cent_ids = np.array([int(c) for c, _ in cent_rows], dtype=np.int64)
        cmat = np.array([np.asarray(v, dtype=np.float64)
                         for _, v in cent_rows])
        cnorm = np.linalg.norm(cmat, axis=1)
        cnorm[cnorm == 0] = 1.0

        def assign_partial(batches, _cids=cent_ids, _cmat=cmat, _cn=cnorm):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = np.asarray([np.asarray(v, dtype=np.float64)
                                  for v in pdf["v"]])
                vn = np.linalg.norm(mat, axis=1)
                vn[vn == 0] = 1.0
                sims = (mat @ _cmat.T) / vn[:, None] / _cn[None, :]
                order = np.lexsort(
                    (np.broadcast_to(_cids, sims.shape), -sims), axis=-1)
                assign = order[:, 0]  # positional index of the winner
                out = []
                for ci in np.unique(assign):
                    sel = mat[assign == ci]
                    out.append((int(_cids[ci]), sel.sum(axis=0),
                                int(len(sel))))
                yield pd.DataFrame(out, columns=["cent_id", "psum", "n"])

        partials = src.mapInPandas(assign_partial, schema=partial_schema)
        sums = (
            partials.select("cent_id", F.posexplode("psum").alias("pos", "x"))
            .groupBy("cent_id", "pos").agg(F.sum("x").alias("s"))
        )
        counts = partials.groupBy("cent_id").agg(F.sum("n").alias("cn"))
        means = {
            r["cent_id"]: r["new_vec"]
            for r in sums.join(counts, "cent_id")
            .groupBy("cent_id")
            .agg(F.transform(
                F.array_sort(F.collect_list(
                    F.struct("pos", (F.col("s") / F.col("cn")).alias("m")))),
                lambda s: s["m"]).alias("new_vec"))
            .collect()
        }
        new_rows = [
            (int(c), [float(x) for x in means[int(c)]] if int(c) in means
             else [float(x) for x in v])
            for c, v in cent_rows
        ]
        cents = embeddings.sparkSession.createDataFrame(
            new_rows, "cent_id long, cent_vec array<double>")
    return cents


def ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 16, nprobe: int = 4,
             vec_col: str = "embedding", id_col: str = "vec_id",
             kmeans_iters: int = 2) -> DataFrame:
    """IVF-style ANN: deterministic seed sample -> ``kmeans_iters``
    Lloyd refinements (map-side matmul assignment + per-partition
    partial sums; see _lloyd_refine), items assigned to their nearest
    centroid MAP-SIDE (closure-broadcast centroid matrix, one numpy
    matmul per Arrow batch — no crossJoin, no per-vector window),
    query probes the ``nprobe`` nearest centroid lists."""
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
        cents = _lloyd_refine(embeddings, cents, kmeans_iters, vec_col, id_col)
    # centroids are driver-known (tiny by construction) -> captured in
    # the assignment UDF closure: both assignment and probing are pure
    # map-side matmuls, no crossJoin, no per-vector window, no exchange
    # over the crossed set (the round-2 100x-scale killer).
    cent_rows = [(r["cent_id"], r["cent_vec"]) for r in cents.collect()]
    assign_udf = _nearest_centroids_udf(cent_rows, 1)
    probe_udf = _nearest_centroids_udf(cent_rows, nprobe)

    assigned = embeddings.select(
        F.col(id_col).alias("item_id"), F.col(vec_col).alias("item_vec"),
        assign_udf(F.col(vec_col)).getItem(0).alias("cent_id"),
    )
    probes = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec"),
        F.explode(probe_udf(F.col(vec_col))).alias("cent_id"),
    )
    cand = assigned.join(F.broadcast(probes), "cent_id") \
        .filter(F.col("item_id") != F.col("query_id"))
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
