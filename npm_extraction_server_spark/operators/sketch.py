"""Deterministic distributed sketches.

``kmv_distinct`` is a K-Minimum-Values distinct-count sketch (the
classic mergeable estimator: keep the k smallest hash values of a set;
E[distinct] = (k-1) / u_k where u_k is the k-th smallest hash mapped to
(0,1]). Three properties make it the right sketch for this engine:

- **Deterministic**: the hash is md5 (first 48 bits), so the same data
  yields the same sketch and the same estimate on every run, on any
  partitioning — and DuckDB computes the identical value (md5 is
  portable; xxhash64 and Spark's built-in HLL++ are not), so the
  driver hard-oracles it.
- **Mergeable**: the k-min set of a union is the k-min of the merged
  k-min sets — shard sketches combine losslessly (pytest asserts
  shard-merge == global).
- **Distributed shape**: distinct + per-group top-k window — partial
  aggregation and a single group-key shuffle; the sketch state per
  group is k longs regardless of corpus size.

The same determinism/mergeability/fixed-state contract extends across
the whole family here: ``hll_*`` (HyperLogLog with md5 registers and
an integer-exact harmonic sum — the estimate itself cross-engine
bit-identical), ``cms_*`` (count-min heavy hitters),
``bloom_*`` (broadcastable membership prefilter), and
``hash_sample_quantiles`` (deterministic-sample quantiles). Every
sketch's STATE is a small table of longs, built by one map-combined
aggregation — the shape that stays fixed-size per group at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 48-bit hash space: first 12 hex chars of md5. Fits exactly in a
# double (2^48 < 2^53), so the estimate arithmetic is bit-identical
# across engines.
_HASH_SPACE = float(1 << 48)


def kmv_hash(col) -> "F.Column":
    """Deterministic 48-bit hash both Spark and DuckDB can compute:
    conv(substr(md5(cast(x as string)), 1, 12), 16, 10)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 12),
                  16, 10).cast("long")


def kmv_distinct(df: DataFrame, group_col: str, value_col: str,
                 k: int = 64) -> DataFrame:
    """Per-group KMV distinct-count estimate of ``value_col``.

    Returns (group, n_kept, kth_hash, distinct_est): when a group has
    fewer than k distinct values the estimate IS the exact count
    (kth_hash null); otherwise (k-1) * 2^48 / kth_hash rounded to 4.
    """
    hashes = (
        df.select(F.col(group_col).alias("grp"),
                  kmv_hash(F.col(value_col)).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("h")
    kmin = hashes.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    agg = kmin.groupBy("grp").agg(
        F.count("*").alias("n_kept"),
        F.max("h").alias("max_h"),
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.round(F.lit(float(k - 1)) * F.lit(_HASH_SPACE)
                        / F.col("max_h"), 4))
    return agg.select(
        F.col("grp").alias(group_col),
        "n_kept",
        F.when(F.col("n_kept") == k, F.col("max_h")).alias("kth_hash"),
        est.alias("distinct_est"),
    )


def hash_sample_quantiles(df: DataFrame, group_col: str, value_col: str,
                          key_col: str, rate_bits: int = 3,
                          probs: tuple = (0.25, 0.5, 0.75)) -> DataFrame:
    """Quantile estimates from a DETERMINISTIC hash sample: keep rows
    whose 48-bit md5(key) falls in the lowest 2^-rate_bits fraction of
    the hash space (a fixed, reproducible ~1/2^rate_bits sample — no
    RNG, no partition dependence), then take EXACT type-1 quantiles of
    the sample per group.

    Same engineering trade as kmv_distinct: approximate in accuracy,
    exact in reproducibility — Spark and DuckDB produce bit-identical
    results, so the driver hard-oracles the estimator itself
    (percentile_approx/KLL cannot be cross-engine-verified). Sample
    membership is a scan-level predicate (pushdown-friendly); state per
    group is the sample, ~n/2^rate_bits rows."""
    threshold = 1 << (48 - rate_bits)
    sample = df.filter(kmv_hash(F.col(key_col)) < threshold)
    # probs restricted to power-of-two fractions (.25/.5/.75) keep the
    # linear interpolation exact in binary floating point -> the same
    # bits from any engine's quantile_cont formula
    qcols = [
        F.round(F.percentile(F.col(value_col), F.lit(p)), 4)
        .alias(f"q{int(p * 100)}")
        for p in probs
    ]
    return (
        sample.groupBy(F.col(group_col))
        .agg(F.count("*").alias("n_sampled"), *qcols)
    )


def kmv_merge(sketches: DataFrame, group_col: str = "grp",
              hash_col: str = "h", k: int = 64) -> DataFrame:
    """Merge per-shard k-min hash sets into the global sketch: union ->
    distinct -> k-min again (the KMV merge is just re-sketching the
    concatenated sketch rows — lossless for the top-k property)."""
    w = Window.partitionBy(group_col).orderBy(hash_col)
    return (
        sketches.select(group_col, hash_col).distinct()
        .withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_set_ops(df: DataFrame, group_col: str, value_col: str,
                k: int = 64) -> DataFrame:
    """Pairwise distinct-set algebra over KMV sketches (Beyer et al.,
    SIGMOD'07 synopses-under-multiset-operations, public design): for
    every unordered pair of groups, estimate |A∪B|, Jaccard(A,B) and
    |A∩B| from the two k-min-hash sketches alone.

    Method: the combined sketch of a pair is the k smallest hashes of
    the UNION of the two sketch hash sets (lossless re-sketch); with
    K∩ = how many of those k appear in BOTH input sketches,
    Jaccard ≈ K∩/k and |A∩B| ≈ (K∩/k)·|A∪B|. When the union sketch
    holds < k hashes the union estimate is exact.

    Scale shape: the heavy distributed work is the per-group sketch
    build (one shuffle of DISTINCT (group, hash) rows, then a k-row
    window per group — exactly kmv_distinct's plan), run EXACTLY ONCE:
    the G·k sketch is eagerly localCheckpoint-ed because it feeds the
    group list and both pair sides (audited: 6 FileScans without the
    checkpoint, 0 downstream with). Everything pairwise runs on the
    G·k sketch rows, independent of table size — the whole reason
    sketch algebra exists at 100 TB. Deterministic md5 hashing keeps
    the estimates themselves cross-engine verifiable (same philosophy
    as kmv_distinct/hll_distinct).

    Returns (ga, gb, n_kept, k_cap, union_est, jaccard, inter_est).
    """
    rows = (
        df.select(F.col(group_col).alias("grp"),
                  kmv_hash(F.col(value_col)).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("h")
    sk = (rows.withColumn("rn", F.row_number().over(w))
          .filter(F.col("rn") <= k).drop("rn")
          .localCheckpoint(eager=True))
    groups = sk.select("grp").distinct()
    pairs = (groups.alias("x").join(groups.alias("y"),
                                    F.col("x.grp") < F.col("y.grp"))
             .select(F.col("x.grp").alias("ga"), F.col("y.grp").alias("gb")))
    ea = sk.select(F.col("grp").alias("ga"), "h")
    eb = sk.select(F.col("grp").alias("gb"), "h")
    ex = (pairs.join(ea, "ga")
          .select("ga", "gb", "h", F.lit(1).alias("ia"), F.lit(0).alias("ib"))
          .unionByName(
              pairs.join(eb, "gb")
              .select("ga", "gb", "h", F.lit(0).alias("ia"),
                      F.lit(1).alias("ib"))))
    u = (ex.groupBy("ga", "gb", "h")
         .agg(F.max("ia").alias("ia"), F.max("ib").alias("ib")))
    wp = Window.partitionBy("ga", "gb").orderBy("h")
    topk = (u.withColumn("rn", F.row_number().over(wp))
            .filter(F.col("rn") <= k))
    agg = topk.groupBy("ga", "gb").agg(
        F.count("*").alias("n_kept"),
        F.max("h").alias("h_k"),
        F.sum(F.col("ia") * F.col("ib")).alias("k_cap"),
    )
    union_est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.col("h_k"))
    jac = F.col("k_cap").cast("double") / F.col("n_kept").cast("double")
    return agg.select(
        "ga", "gb", "n_kept", "k_cap",
        F.round(union_est, 4).alias("union_est"),
        F.round(jac, 6).alias("jaccard"),
        F.round(jac * union_est, 4).alias("inter_est"),
    )


def hll_registers(df: DataFrame, group_col: str, value_col: str,
                  p: int = 8) -> DataFrame:
    """Per-group HyperLogLog register table: (grp, reg, mj) where
    ``reg`` is the top ``p`` bits of the 48-bit md5 hash and ``mj``
    the max rank (position of the leftmost 1-bit, 1-based) seen in
    the remaining 48-p bits. 2^p registers per group max — fixed-size
    mergeable state (``hll_merge`` is max per cell), the map-combine
    shape. Deterministic + portable (md5, like kmv/cms: a sketch you
    can cross-engine-verify beats a marginally tighter one you
    can't — Spark's own approx_count_distinct HLL++ hashes with
    xxhash64, which DuckDB can't replicate)."""
    suffix_bits = 48 - p
    h = kmv_hash(F.col(value_col))
    reg = F.shiftrightunsigned(h, suffix_bits)
    rest = h.bitwiseAND(F.lit((1 << suffix_bits) - 1))
    # leftmost-1 position via bin(): length(bin(x)) = floor(log2 x)+1,
    # so rank = suffix_bits - length + 1; all-zero suffix -> max+1
    rank = (F.when(rest == 0, F.lit(suffix_bits + 1))
            .otherwise(F.lit(suffix_bits + 1) - F.length(F.bin(rest))))
    return (df.select(F.col(group_col).alias("grp"), reg.alias("reg"),
                      rank.alias("rank"))
            .groupBy("grp", "reg").agg(F.max("rank").alias("mj")))


def hll_merge(registers: DataFrame) -> DataFrame:
    """Merge shard register tables (their union) cell-wise: HLL merge
    is max per (group, register)."""
    return registers.groupBy("grp", "reg").agg(F.max("mj").alias("mj"))


def hll_estimate(registers: DataFrame, group_col: str,
                 p: int = 8) -> DataFrame:
    """Distinct-count estimate from an HLL register table — the
    Flajolet et al. estimator with linear-counting small-range
    correction, arranged so BOTH engines compute identical bits:

    the harmonic sum Σ 2^-M_j is scaled by 2^(maxrank) into an EXACT
    integer sum (every term 2^(maxrank-M_j) is a long; the total is
    < 2^53, so the cast to double is exact), the one division happens
    once, and the result lands on a 4-dp grid. The correction branch
    compares the GRID-ROUNDED raw estimate against 2.5m, so the
    branch choice itself is deterministic cross-engine. ln() in the
    linear-counting arm is 8-dp-grid-rounded before scaling (the
    suite's standard libm-ulp absorber). No 64-bit-space correction:
    at 2^48 hash space it only matters past ~10^13 distincts
    (document-scale, not group-scale).

    Returns (group_col, n_registers_set, distinct_est)."""
    m = 1 << p
    maxrank = 48 - p + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    num = alpha * float(m) * float(m) * float(1 << maxrank)
    agg = registers.groupBy("grp").agg(
        F.count("*").alias("nset"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {maxrank} - mj)"))
        .alias("s_present"))
    v = (F.lit(m) - F.col("nset")).cast("long")
    s_all = (F.col("s_present") + v * F.lit(1 << maxrank)).cast("double")
    raw = F.round(F.lit(num) / s_all, 4)
    lin = F.round(
        F.lit(float(m))
        * F.round(F.log(F.lit(float(m)) / v.cast("double")), 8), 4)
    est = F.when((v > 0) & (raw <= F.lit(2.5 * m)), lin).otherwise(raw)
    return agg.select(F.col("grp").alias(group_col),
                      F.col("nset").alias("n_registers_set"),
                      est.alias("distinct_est"))


def hll_distinct(df: DataFrame, group_col: str, value_col: str,
                 p: int = 8) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate (registers +
    estimator in one Catalyst plan: two groupBy stages, the first
    map-combined to <= 2^p rows per group per partition)."""
    return hll_estimate(hll_registers(df, group_col, value_col, p),
                        group_col, p)


_BLOOM_SLOT_BITS = 48  # bits per long slot: max shift 47, so the mask
#                        stays positive in every engine (DuckDB raises
#                        on 1::BIGINT << 63; 48 also matches the md5
#                        hash-space convention used everywhere here)


def _bloom_positions(df: DataFrame, group_col: str, value_col: str,
                     n_slots: int, k: int) -> DataFrame:
    """Shared hash-position derivation for the Bloom build and probe
    (one definition, so the probe can never drift from its own bits):
    per (row, hash index i in 0..k-1) emit (grp, v, slot, mask) where
    the md5(i:value) 48-bit prefix mod m picks the bit. NULL values
    are dropped — NULL is not a set member (SQL set semantics;
    hashing it would also diverge between engines)."""
    m_bits = n_slots * _BLOOM_SLOT_BITS
    rows = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("string").alias("v"),
        F.explode(F.array([F.lit(i) for i in range(k)])).alias("i"))
    pos = (F.conv(F.substring(
        F.md5(F.concat_ws(":", F.col("i"), F.col("v"))), 1, 12), 16, 10)
        .cast("long") % m_bits)
    rows = rows.select(
        "grp", "v",
        (pos / _BLOOM_SLOT_BITS).cast("long").alias("slot"),
        (pos % _BLOOM_SLOT_BITS).cast("int").alias("bitpos"))
    # SQL shiftleft accepts a column shift amount (the functions API
    # binding is int-only); max shift 47 keeps the mask positive
    return rows.withColumn(
        "mask", F.expr("shiftleft(cast(1 as bigint), bitpos)"))


def bloom_bits(df: DataFrame, group_col: str, value_col: str,
               n_slots: int = 6, k: int = 4) -> DataFrame:
    """Per-group Bloom filter as a (grp, slot, bits) long table —
    n_slots x 48 usable bits, k md5-derived hash positions per value.
    NULL values are not members (dropped at build AND probe — see
    :func:`_bloom_positions`).

    The 100 TB use case: a decontamination / blocklist prefilter — the
    (tiny, fixed-size) bits table broadcasts and `bloom_might_contain`
    drops the guaranteed-absent rows before any expensive join; no
    false negatives for non-null members, false positives bounded by
    (1-e^{-kn/m})^k.

    Same portability contract as kmv/cms/hll: positions come from md5,
    the OR-fold is exact integer bit_or — DuckDB builds the IDENTICAL
    bits, so the driver hard-oracles the filter itself. Mergeable by
    cell-wise bit_or (``bloom_merge``); the groupBy is map-combined,
    so the shuffle carries <= n_slots rows per group per partition."""
    return (_bloom_positions(df, group_col, value_col, n_slots, k)
            .groupBy("grp", "slot")
            .agg(F.bit_or("mask").alias("bits")))


def bloom_merge(bits: DataFrame) -> DataFrame:
    """Merge shard filters (their union) cell-wise."""
    return bits.groupBy("grp", "slot").agg(F.bit_or("bits").alias("bits"))


def bloom_might_contain(bits: DataFrame, df: DataFrame, group_col: str,
                        value_col: str, n_slots: int = 6,
                        k: int = 4) -> DataFrame:
    """Membership probe: keeps rows of ``df`` whose value has ALL k
    bloom bits set in its group's filter (possibly-present; definite
    absences are dropped — the prefilter contract, no false negatives
    for any value the build saw). NULL-valued rows are dropped —
    NULLs are never members (same rule as the build, via the SHARED
    :func:`_bloom_positions` derivation, so probe and bits can't
    drift). The bits table broadcasts; the probe is k bit-tests
    folded into one join + min aggregate."""
    probes = _bloom_positions(df, group_col, value_col, n_slots, k)
    hit = (probes.join(F.broadcast(bits), ["grp", "slot"], "left")
           .withColumn("_ok", (F.coalesce(F.col("bits"), F.lit(0))
                               .bitwiseAND(F.col("mask"))
                               == F.col("mask")).cast("int"))
           .groupBy("grp", "v").agg(F.min("_ok").alias("_all")))
    # NOTE: `keep` is probe-sized (it shrinks with the filter's TRUE
    # REJECTION rate, not with the sketch) — on a saturated filter it
    # approaches the probe's full distinct-value set, so it must NOT
    # carry a broadcast hint; only the bits table above is guaranteed
    # sketch-sized. AQE will still broadcast `keep` at runtime when it
    # actually is small.
    keep = hit.filter(F.col("_all") == 1).select(
        F.col("grp").alias("_g"), F.col("v").alias("_v"))
    return (df.join(keep,
                    (df[group_col] == keep["_g"])
                    & (df[value_col].cast("string") == keep["_v"]))
            .drop("_g", "_v"))


def cms_counters(df: DataFrame, value_col: str, depth: int = 4,
                 width: int = 256) -> DataFrame:
    """Count-min sketch counter table for ``value_col``: (j, bucket,
    cnt) with depth x width cells total, independent of cardinality.

    Row j's hash is md5(f"{j}:{value}") truncated to 48 bits mod width
    — deterministic and portable, so DuckDB builds the identical
    counters and the driver can hard-oracle the ESTIMATES (the same
    reasoning as kmv_distinct: a sketch you can cross-engine-verify
    beats a marginally tighter one you can't).

    Mergeable by cell-wise addition (``cms_merge``): shard sketches
    sum losslessly, the map-side combine shape — the shuffle carries
    at most depth*width rows per shard whatever the input size."""
    rows = df.select(
        F.explode(F.array([F.lit(j) for j in range(depth)])).alias("j"),
        F.col(value_col).cast("string").alias("v"))
    bucket = (
        F.conv(F.substring(
            F.md5(F.concat_ws(":", F.col("j"), F.col("v"))), 1, 12), 16, 10)
        .cast("long") % width)
    return (rows.withColumn("bucket", bucket)
            .groupBy("j", "bucket").agg(F.count("*").alias("cnt")))


def cms_merge(counters: DataFrame) -> DataFrame:
    """Merge shard counter tables (their union) cell-wise."""
    return counters.groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(df: DataFrame, counters: DataFrame, value_col: str,
                 depth: int = 4, width: int = 256) -> DataFrame:
    """Point estimates for every distinct key: min over the depth rows
    of the key's counter cells — the classic one-sided CMS bound
    (estimate >= true count, overshoot bounded by collisions ~ n/width
    per row, min over depth rows). Returns (value_col, est_count)."""
    keys = (df.select(F.col(value_col).cast("string").alias("v")).distinct()
            .select("v", F.explode(
                F.array([F.lit(j) for j in range(depth)])).alias("j")))
    bucket = (
        F.conv(F.substring(
            F.md5(F.concat_ws(":", F.col("j"), F.col("v"))), 1, 12), 16, 10)
        .cast("long") % width)
    return (
        keys.withColumn("bucket", bucket)
        .join(counters, ["j", "bucket"], "left")
        .groupBy("v")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
        .select(F.col("v").alias(value_col), "est_count")
    )


def cms_heavy_hitters(df: DataFrame, value_col: str, min_count: int,
                      depth: int = 4, width: int = 256) -> DataFrame:
    """Keys whose CMS-estimated frequency is >= min_count. One-sided:
    every true heavy hitter is returned (no false negatives); a few
    collision-inflated keys may ride along — the standard CMS
    contract, resolved by an exact re-count over the (small) candidate
    set when exactness matters."""
    counters = cms_counters(df, value_col, depth, width)
    est = cms_estimate(df, counters, value_col, depth, width)
    return est.filter(F.col("est_count") >= min_count)
