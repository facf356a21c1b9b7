"""Training-data sampling operators: deterministic corpus splits and
token-budget sequence packing.

At 10^12 documents, train/val/test membership must be a PURE FUNCTION
of a stable key (re-runs, resumes and late-arriving shards must land
in the same split — no rand(), no row order). Packing for LLM
pretraining groups consecutive documents into fixed token budgets; the
streaming form (cumulative token count over a deterministic order,
bin = cumsum div budget) is a window expression, fully JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _split_hash(key_col, salt: str = "split"):
    """60-bit deterministic hash from sha256 — chosen over xxhash64 so
    external engines (the DuckDB oracle, a downstream pipeline in
    another stack) can reproduce split membership exactly."""
    hx = F.sha2(F.concat(F.lit(salt + ":"), key_col.cast("string")), 256)
    return F.conv(F.substring(hx, 1, 15), 16, 10).cast("bigint")


def stratified_split(documents: DataFrame, weights: dict[str, int],
                     key_col: str = "doc_id",
                     salt: str = "split") -> DataFrame:
    """Assign each row to a named split with the given integer percent
    weights (must sum to 100): bucket = sha-hash(key) % 100, split =
    the bucket's weight interval. Deterministic, order-independent,
    resume-safe; adding rows never moves existing rows between splits."""
    if sum(weights.values()) != 100:
        raise ValueError("weights must sum to 100")
    bucket = F.pmod(_split_hash(F.col(key_col), salt), F.lit(100))
    expr = None
    lo = 0
    for name, w in weights.items():
        cond = bucket < F.lit(lo + w)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
        lo += w
    return documents.withColumn("split", expr).withColumn("bucket",
                                                          bucket.cast("int"))


def pack_sequences(documents: DataFrame, budget: int = 2048,
                   key_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Streaming sequence packing: order by ``key_col`` (the stable
    corpus order), accumulate whitespace token counts, and cut a new
    bin every ``budget`` tokens (bin = floor((cumsum - tokens) /
    budget) over the running sum — a document straddling a boundary
    starts the next bin, the standard concat-and-chunk pretraining
    layout). Pure window expressions.

    Scale note: a single global ordering window is a one-partition
    funnel; at corpus scale, partition first (e.g. by url-hash shard)
    and pack per shard — ``partition_col`` does exactly that."""
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    w = Window.orderBy(F.col(key_col))
    running = F.sum("n_tokens").over(w)
    return (
        documents.select(key_col, toks.alias("n_tokens"))
        .withColumn("cum_tokens", running)
        .withColumn("bin_id",
                    F.floor((F.col("cum_tokens") - F.col("n_tokens"))
                            / F.lit(budget)).cast("bigint"))
        .select(key_col, "n_tokens", "cum_tokens", "bin_id")
    )


def pack_sequences_sharded(documents: DataFrame, budget: int = 2048,
                           key_col: str = "doc_id", text_col: str = "text",
                           n_shards: int = 64,
                           token_mode: str = "ws") -> DataFrame:
    """The scale form of pack_sequences: deterministic hash-sharding
    first, then an ordered window PER SHARD (partitionBy kills the
    single-partition funnel; each shard packs independently, which is
    how multi-file pretraining shards are actually laid out).

    ``token_mode``: 'ws' counts whitespace tokens (a JVM column
    expression); 'bpe' counts deterministic toy-BPE subwords
    (operators/text.bpe_token_counts — whitespace under-states real
    token budgets, so subword counts make the per-bin budget match
    what a trainer actually packs). Both stay one map stage + one
    shard window; 'bpe' requires ``key_col='doc_id'``."""
    if token_mode == "bpe":
        if key_col != "doc_id":
            raise ValueError("token_mode='bpe' requires key_col='doc_id'")
        from .text import bpe_token_counts

        toks_df = bpe_token_counts(documents, text_col).select(
            "doc_id", F.col("n_bpe_tokens").alias("n_tokens"))
    elif token_mode == "ws":
        toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
        toks_df = documents.select(key_col, toks.alias("n_tokens"))
    else:
        raise ValueError(f"unknown token_mode {token_mode!r}")
    shard = F.pmod(_split_hash(F.col(key_col), "shard"), F.lit(n_shards))
    w = Window.partitionBy("shard").orderBy(F.col(key_col))
    return (
        toks_df.withColumn("shard", shard.cast("int"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn("bin_id",
                    F.floor((F.col("cum_tokens") - F.col("n_tokens"))
                            / F.lit(budget)).cast("bigint"))
        .select(key_col, "shard", "n_tokens", "cum_tokens", "bin_id")
    )


def resample_to_mix(documents: DataFrame, targets: dict[str, float],
                    domain_col: str = "source",
                    id_col: str = "doc_id") -> DataFrame:
    """Deterministic DOMAIN-MIX resampling — the data-mixing op every
    LLM corpus recipe needs (web 60% / code 30% / papers 10%, ...):
    sample each domain at the rate that realizes the target
    proportions with MAXIMUM retention. T = min_s(n_s / t_s) is the
    largest achievable output size; the limiting domain keeps 100%
    and every other domain keeps rate t_s*T/n_s. Domains absent from
    ``targets`` are dropped (weight 0).

    Membership is a pure function of the row key (md5 threshold, the
    repo's standard no-RNG sampling): reproducible on any
    partitioning, stable under reruns, and cross-engine verifiable —
    the DuckDB oracle selects the IDENTICAL row set, not just the
    same counts. The per-domain rates come from one tiny aggregate
    broadcast back; the filter itself is a scan-level projection.

    Returns the kept (id_col, domain_col) rows."""
    spark = documents.sparkSession
    if not targets or any(t <= 0 for t in targets.values()):
        raise ValueError("targets must be a non-empty {domain: frac>0} map")
    tgt = spark.createDataFrame(
        [(d, float(t)) for d, t in targets.items()],
        f"{domain_col} string, t double")
    cnt = documents.groupBy(domain_col).agg(F.count("*").alias("n"))
    rates0 = (cnt.join(F.broadcast(tgt), domain_col)
              .withColumn("cap", F.col("n").cast("double") / F.col("t")))
    # every requested domain must exist in the corpus: the inner join
    # would otherwise silently DROP a missing domain from the rate
    # computation and return a mix with a whole domain absent and the
    # remaining proportions wrong. One tiny action (bounded by the
    # number of domains), worth the corruption it prevents.
    present = {r[domain_col] for r in rates0.select(domain_col).collect()}
    missing = set(targets) - present
    if missing:
        raise ValueError(
            f"resample_to_mix: target domains {sorted(missing)} have no "
            "rows in the corpus — the requested mix is unrealizable")
    return _mix_threshold_filter(documents, rates0, domain_col, id_col)


def _mix_threshold_filter(documents: DataFrame, rates0: DataFrame,
                          domain_col: str, id_col: str) -> DataFrame:
    """Shared tail of the mix resamplers: rates0 (domain, n, t, cap)
    -> T = min cap -> per-domain md5 thresholds -> scan-level filter.
    Membership stays a pure function of the row key."""
    tmin = rates0.agg(F.min("cap").alias("tcap"))
    rates = (rates0.crossJoin(F.broadcast(tmin))
             .select(domain_col,
                     F.floor(F.col("t") * F.col("tcap")
                             / F.col("n").cast("double")
                             * F.lit(float(1 << 48)))
                     .cast("long").alias("thr")))
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit("mix:"), F.col(id_col).cast("string"))),
        1, 12), 16, 10).cast("long")
    return (documents.join(F.broadcast(rates), domain_col)
            .filter(h < F.col("thr"))
            .select(id_col, domain_col))


def alpha_mix(documents: DataFrame, alpha: float = 0.5,
              domain_col: str = "source",
              id_col: str = "doc_id") -> DataFrame:
    """Temperature-based domain mixing — the alpha-sampling recipe of
    the published LLM corpus mixes (domain share proportional to
    n_s^alpha): alpha=1 keeps the natural distribution (every row),
    alpha -> 0 equalizes domains (each downsampled to the smallest),
    0.5 is the common square-root compromise. Unlike resample_to_mix
    the targets come from the corpus itself, so the whole computation
    stays in ONE plan: count per domain -> t = round(n^alpha, 6) (the
    6-dp grid absorbs libm pow ulp differences cross-engine) -> the
    shared max-retention threshold tail. Same determinism contract:
    membership is a pure md5 function of the row key, and the DuckDB
    oracle selects the IDENTICAL row set.
    """
    if not alpha > 0:
        raise ValueError("alpha_mix: alpha must be > 0")
    cnt = documents.groupBy(domain_col).agg(F.count("*").alias("n"))
    rates0 = (cnt.withColumn(
        "t", F.round(F.pow(F.col("n").cast("double"),
                           F.lit(float(alpha))), 6))
        .withColumn("cap", F.col("n").cast("double") / F.col("t")))
    return _mix_threshold_filter(documents, rates0, domain_col, id_col)


def sample_k_per_group(documents: DataFrame, k: int,
                       domain_col: str = "source",
                       id_col: str = "doc_id") -> DataFrame:
    """Exactly min(k, n_group) rows per group, chosen uniformly and
    DETERMINISTICALLY: rank each group's rows by md5 of the row key
    and keep the k smallest — the balanced-eval-set / per-domain-cap
    primitive. Unlike rate-based sampling the count is exact; unlike
    RAND() the pick is a pure function of the row keys (stable under
    reruns, partitioning, and corpus append order — adding rows can
    only displace ranks, never reshuffle the hash order).

    One exchange on the group key (the rank window); the md5 rank is
    computed scan-side. Returns (id_col, domain_col).
    """
    if k <= 0:
        raise ValueError("sample_k_per_group: k must be positive")
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit("kpg:"), F.col(id_col).cast("string"))),
        1, 15), 16, 10).cast("bigint")
    w = Window.partitionBy(domain_col).orderBy(h.asc(), F.col(id_col))
    return (documents.select(id_col, domain_col)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select(id_col, domain_col))


def weighted_sample_k(documents: DataFrame, k: int,
                      weight_col, group_col: str = "source",
                      id_col: str = "doc_id") -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per group, inclusion
    probability proportional to the row's weight — the
    quality-weighted subsampling step of a curation pipeline ("keep
    50k docs per language, preferring longer/higher-scoring ones,
    without going deterministic-top-k"). This is Efraimidis-Spirakis
    A-ES: draw u_i ~ U(0,1], rank by u_i^(1/w_i), keep the k largest
    — provably equivalent to sequential weighted draws.

    Determinism: u_i is the md5-derived 48-bit uniform (a pure
    function of the row key, the repo's no-RNG convention), and the
    rank key is compared in log space, ln(u)/w, with ln() rounded to
    the 8-dp grid (the suite's standard libm-ulp absorber) before the
    one exact double division — so the SELECTED ROW SET is
    cross-engine reproducible, not just the counts. Rows with
    non-positive weight are excluded (zero weight = zero inclusion
    probability; negative is undefined).

    One exchange on the group key (the rank window); the hash and
    key arithmetic are scan-side projections. Returns
    (id_col, group_col, w).
    """
    if k <= 0:
        raise ValueError("weighted_sample_k: k must be positive")
    w = (F.col(weight_col) if isinstance(weight_col, str)
         else weight_col).cast("double")
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit("ws:"), F.col(id_col).cast("string"))),
        1, 12), 16, 10).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 48))
    key = F.round(F.log(u), 8) / F.col("w")
    win = Window.partitionBy(group_col).orderBy(F.desc("key"),
                                                F.col(id_col))
    return (documents.select(id_col, group_col, w.alias("w"))
            .filter(F.col("w") > 0)
            .withColumn("key", key)
            .withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") <= k)
            .select(id_col, group_col, "w"))
