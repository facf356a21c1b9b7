"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Scale shapes (the 100 TB story):
- exact: one hash-groupBy shuffle on a 64-char digest (not the text).
- n-gram Jaccard: shingle-explode -> self-join on shingle -> pair agg.
  Quadratic within a shingle bucket only; hot shingles are capped
  (``max_shingle_freq``) exactly like stop-shingle filtering in
  production dedup, which also bounds skew.
- MinHash-LSH: shingles -> 64 min-hashes -> band buckets -> join on
  (band, bucket-signature). Only bucket collisions are compared; the
  candidate join key is (band_id, band_hash) so head buckets can be
  salted/AQE-split.
- SimHash: 64-bit weighted-token signature, grouped by rotation bands
  for near-match candidates.

All heavy lifting uses built-in expressions (xxhash64/md5/explode/agg);
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def spread_partitions(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Hash-repartition to full parallelism ONLY when the source scan
    is under-parallel (e.g. one small parquet file -> one partition,
    which would serialize the shingle/signature stages onto one core).
    At production layouts (files >= cores) this is a no-op — same
    policy as plans/kg.maybe_repartition_pages.

    Round 6: the partition-count probe (``df.rdd.getNumPartitions()``
    compiles the plan to an RDD — ~0.3 s of driver work per call) is
    memoized per (session, semantic plan), so repeated invocations of
    the same query pay it once."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        cache_key = (sc.applicationId, df.semanticHash())
        nparts = _SPREAD_CACHE.get(cache_key)
        if nparts is None:
            nparts = df.rdd.getNumPartitions()
            if len(_SPREAD_CACHE) > 4096:
                _SPREAD_CACHE.clear()
            _SPREAD_CACHE[cache_key] = nparts
    except Exception:  # semanticHash unavailable -> direct probe
        nparts = df.rdd.getNumPartitions()
    if nparts >= target:
        return df
    return df.repartition(target, F.col(key))


_SPREAD_CACHE: dict = {}


def exact_duplicates(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup via sha2 groupBy: survivor = min doc_id per digest."""
    digest = F.sha2(F.col(text_col), 256).alias("text_sha")
    return (
        documents.select("doc_id", digest)
        .groupBy("text_sha")
        .agg(
            F.min("doc_id").alias("survivor_id"),
            F.count("*").alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
    )


def dedup_against_corpus(batch: DataFrame, seen_digests: DataFrame,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Incremental exact dedup of a NEW batch against the historical
    corpus — without rescanning the corpus. ``seen_digests`` is the
    maintained digest table (one ``digest`` column, sha2-256 of the
    content; a few % of corpus bytes). In-batch duplicates collapse
    to the min-id survivor first, then survivors whose digest the
    corpus has already seen are dropped. Returns the genuinely-new
    rows with their ``digest`` attached — the caller appends them to
    the corpus AND their digests to the digest table (one lakehouse
    commit each; see the snap_dedup_incr driver query).

    Scale shape: this is THE pattern that makes continuous crawl
    ingestion tractable at 10^12 documents — per-batch cost is
    one digest projection + one shuffle on digest (in-batch collapse)
    + one join against the digest table (bucketed/broadcast by size),
    never a corpus rescan. The digest table is itself a snapshot
    table, so the whole loop is resumable and exactly-once."""
    b = batch.withColumn("digest", F.sha2(F.col(text_col), 256))
    w = Window.partitionBy("digest").orderBy(id_col)
    firsts = (b.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1).drop("_rn"))
    return firsts.join(seen_digests.select("digest"), "digest", "left_anti")


def word_shingles(documents: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) — word k-shingles of the normalized text."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    words = F.split(norm, " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingles = F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, k), " "))
    return spread_partitions(documents.select("doc_id", text_col)).select(
        "doc_id", F.explode(F.array_distinct(shingles)).alias("shingle")
    )


def ngram_jaccard_pairs(documents: DataFrame, k: int = 3, threshold: float = 0.5,
                        text_col: str = "text",
                        max_shingle_freq: int = 1000) -> DataFrame:
    """Near-dup pairs by exact word-k-gram Jaccard >= threshold.

    shingle-join candidate generation + |A∩B| / (|A|+|B|-|A∩B|).
    ``max_shingle_freq`` drops stop-shingles that would otherwise
    produce quadratic hot buckets (skew control at scale).

    The shingle table feeds FOUR branches (stop-shingle frequencies,
    the anti-join, sizes, and both join sides), so it is eagerly
    localCheckpoint-ed — without it Catalyst replans the text scan +
    shingle explode per branch (audited: 8 FileScans of the heavy
    text column; with: 1). Trade documented: this materializes the
    exploded shingles (~k x text bytes) to executor-local disk; at
    cluster scale prefer the MinHash path (signatures are
    fixed-width) when that footprint exceeds local storage."""
    sh = word_shingles(documents, k, text_col).localCheckpoint(eager=True)
    freq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    # broadcast the SMALL side: the stop-shingles (df > cap) are a
    # bounded set at any corpus size, while the kept shingles grow with
    # the corpus — anti-join against the drop set, never broadcast the
    # keep set (mirrors minhash_lsh_pairs' oversized-bucket anti-join)
    sh = sh.join(
        F.broadcast(freq.filter(F.col("df") > max_shingle_freq)
                    .select("shingle")),
        "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("size_b"))
    return (
        pairs.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common")
                    / (F.col("size_a") + F.col("size_b") - F.col("n_common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


def minhash_signatures_agg(documents: DataFrame, num_hashes: int = 64, k: int = 3,
                           text_col: str = "text") -> DataFrame:
    """Expression-only minhash (kept as the reference formulation):
    ONE string hash per shingle (xxhash64), then ``num_hashes`` cheap
    long-input rehashes min-aggregated per doc. Correct and ANSI-safe,
    but the 64-column HashAggregate update path measured ~50x the raw
    hash arithmetic (4.7 s warm for 10k docs on 32 cores) — use
    ``minhash_signatures`` (the vectorized zero-shuffle form) on real
    corpora."""
    sh = word_shingles(documents, k, text_col).withColumn(
        "h", F.xxhash64("shingle"))
    mins = [
        F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id", F.array(*[F.col(f"h{s}") for s in range(num_hashes)]).alias("sig")
    )


def minhash_signatures(documents: DataFrame, num_hashes: int = 64, k: int = 3,
                       text_col: str = "text",
                       with_bands: int | None = None) -> DataFrame:
    """(doc_id, sig: array<bigint>) — shingle + minhash fused into ONE
    Arrow-batched ``mapInPandas`` stage: ZERO shuffle (the expression
    form explodes ~150 shingle rows/doc and feeds a 64-column
    HashAggregate — a full shuffle plus an agg-buffer update path that
    measured ~50x the raw hash arithmetic). Per batch: vectorized
    64-bit string hashing (``pd.util.hash_array``) then a numpy
    splitmix64 finalizer over (shingles x seeds), min along shingles.
    Deterministic (no RNG, no per-run state); signature VALUES differ
    from minhash_signatures_agg (different base hash family) but the
    minhash collision property — P(sig_a[i]==sig_b[i]) = Jaccard — is
    the same, and every downstream consumer is hash-family agnostic.

    ``with_bands`` (round 6): additionally emit ``bands`` —
    ``with_bands`` LSH band hashes per doc, each a splitmix64 chain
    over the band's signature slice, computed in the SAME numpy pass
    (nearly free next to the signature matmul). The JVM side then only
    posexplodes the array instead of evaluating a bands-wide
    hash-expression tree per row. Any injective-up-to-collision band
    keying yields identical buckets, so downstream pair sets are
    unchanged."""
    from pyspark.sql import types as T

    fields = [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sig", T.ArrayType(T.LongType()), False),
    ]
    if with_bands:
        fields.append(T.StructField("bands", T.ArrayType(T.LongType()), False))
    out_schema = T.StructType(fields)

    def fn(batches):
        import numpy as np
        import pandas as pd

        GOLD = np.uint64(0x9E3779B97F4A7C15)
        seeds = np.arange(1, num_hashes + 1, dtype=np.uint64)

        def _mix(z):
            # splitmix64 finalizer, vectorized (uint64 wraps by design)
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            return z ^ (z >> np.uint64(31))

        for pdf in batches:
            # whitespace-normalize + lowercase + split, batch-vectorized
            words_col = (pdf[text_col].fillna("").str.strip().str.lower()
                         .str.split(r"\s+", regex=True))
            ids = [int(d) for d in pdf["doc_id"]]
            if not ids:
                empty = {"doc_id": [], "sig": []}
                if with_bands:
                    empty["bands"] = []
                yield pd.DataFrame(empty)
                continue
            # Round-6 vectorization (guide §4.2): ONE hash_array call
            # over the batch's concatenated words + one rolling k-gram
            # combine over global window indices + one per-doc
            # minimum.reduceat — replaces the per-doc Python loop
            # (per-doc hash_array setup, np.unique sort, and the m x 64
            # outer alloc dominated at 50k docs). np.unique was only a
            # dedup before the min — min over the duplicate-bearing
            # multiset is identical, so it is dropped. Signature VALUES
            # are bit-identical to the loop form (same hashes, same
            # uint64 arithmetic, same window rule).
            lens = np.array([len(w) for w in words_col], dtype=np.int64)
            flat = np.concatenate(
                [np.asarray(w, dtype=object) for w in words_col])
            hw = pd.util.hash_array(flat).astype(np.uint64)
            offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
            # same window rule as word_shingles: windows i in
            # 0..max(n-k,0); a short doc yields ONE window of all n
            # words (keff = min(k, n) varies only for n < k)
            m = np.maximum(lens - k, 0) + 1
            starts = np.cumsum(m) - m
            tot = int(m.sum())
            doc_of = np.repeat(np.arange(len(ids)), m)
            within = np.arange(tot) - np.repeat(starts, m)
            g = offs[doc_of] + within          # global window start
            keff = np.minimum(lens, k)[doc_of]  # per-window word count
            acc = np.zeros(tot, dtype=np.uint64)
            with np.errstate(over="ignore"):
                for j in range(k):
                    live = keff > j
                    acc[live] = acc[live] * GOLD + hw[g[live] + j]
                mixed = _mix(_mix(acc)[:, None] + seeds[None, :] * GOLD)
            sig_mat = np.minimum.reduceat(mixed, starts, axis=0)
            out = {"doc_id": ids, "sig": list(sig_mat.astype(np.int64))}
            if with_bands:
                # band b covers sig positions [b*rpb, (b+1)*rpb);
                # sig_mat[:, j::rpb][:, b] is position b*rpb+j, so the
                # strided chain combines each band's contiguous slice
                rpb = num_hashes // with_bands
                with np.errstate(over="ignore"):
                    bacc = np.zeros((len(ids), with_bands), dtype=np.uint64)
                    for j in range(rpb):
                        bacc = bacc * GOLD + sig_mat[:, j::rpb]
                out["bands"] = list(_mix(bacc).astype(np.int64))
            yield pd.DataFrame(out)

    return spread_partitions(
        documents.select("doc_id", text_col)).mapInPandas(fn, schema=out_schema)


def minhash_lsh_pairs(documents: DataFrame, num_hashes: int = 64, bands: int = 16,
                      k: int = 3, threshold: float = 0.5,
                      text_col: str = "text",
                      max_bucket_size: int = 64) -> DataFrame:
    """MinHash+LSH near-dup pairs: band the signature, join on
    (band_id, band_signature) buckets, then estimate Jaccard as the
    fraction of agreeing min-hashes.

    ``max_bucket_size`` drops oversized LSH buckets before the
    quadratic within-bucket pairing — the skew guard for boilerplate
    clusters at scale (a bucket of B docs costs B^2 candidate pairs)."""
    # the signatures feed the band explode AND both pair join-backs:
    # localCheckpoint (eager) runs the shingle+agg pipeline once, and —
    # unlike persist(), whose CacheManager entry outlives the query —
    # its blocks are dropped by the ContextCleaner as soon as the
    # returned DataFrame is unreferenced (no cache leak across a
    # long-lived session; on a real cluster use reliable checkpoint)
    sigs = minhash_signatures(documents, num_hashes, k, text_col,
                              with_bands=bands).localCheckpoint(eager=True)
    # band rows carry ONLY (doc_id, band_id, band_hash) — 24 bytes —
    # through the explode and ONE bucket aggregation; the 64-long
    # signature (~0.5 KB) joins back onto the candidate PAIRS
    # afterwards, which are orders of magnitude fewer than band rows.
    # Carrying sig through the exploded shuffle measured ~60% of the
    # query's time. Band hashes come precomputed from the signature
    # kernel (with_bands — splitmix64 over each band's slice, computed
    # next to the signature matmul for ~free), so the JVM explode is a
    # plain posexplode: the old per-row bands-wide hash-expression tree
    # (stringified slices + xxhash64) was the explode stage's main
    # cost. Bucket membership is equality of the band's sig values
    # under ANY injective-up-to-collision keying, and a 64-bit
    # collision can only add a CANDIDATE, which the jaccard_est /
    # exact-Jaccard re-check filters — output pairs are unchanged
    # (snapshot-verified at sf0.01/sf0.1).
    banded = sigs.select(
        "doc_id", F.posexplode("bands").alias("band_id", "band_hash"))
    # Round-6 plan (guide §2.4 — remove shuffles outright): ONE
    # groupBy(bucket) with collect_list replaces the old three-branch
    # shape (bucket-size aggregate + broadcast anti-join + band-table
    # self-join, which planned a 1.6M-row broadcast hashed relation at
    # sf1.0 and 3 recomputes of the explode). Size cap and pair
    # generation happen INSIDE the bucket row: buckets over
    # ``max_bucket_size`` are dropped exactly as the anti-join did
    # (the boilerplate-cluster skew guard — a bucket of B docs costs
    # B^2 pairs), surviving buckets emit their sorted within-bucket
    # (doc_a < doc_b) pairs via nested transforms. Candidate set is
    # IDENTICAL to the self-join formulation; the shuffle carries each
    # bucket once (24-byte rows) instead of both join sides.
    ids_sorted = F.array_sort(F.collect_list("doc_id"))
    buckets = (
        banded.groupBy("band_id", "band_hash")
        .agg(ids_sorted.alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket_size))
    )
    pair_structs = F.flatten(F.transform(
        F.col("ids"),
        lambda x, i: F.transform(
            F.slice(F.col("ids"), i + F.lit(2),
                    F.greatest(F.size("ids") - i - 1, F.lit(0))),
            lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
        ),
    ))
    cand = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    cand = cand.join(sa, "doc_a").join(sb, "doc_b")
    # agreement count stays the higher-order zip_with/filter form: an
    # unrolled 64-term element_at chain was A/B-measured ~3x SLOWER
    # end-to-end here (8.9 s vs 2.9 s at sf1.0) — with two array
    # columns fresh out of a join, per-term element_at re-walks the
    # array offsets while the HOF iterates both arrays once.
    est = F.round(
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                        lambda v: v)) / F.lit(num_hashes), 6)
    return (
        cand.withColumn("jaccard_est", est)
        .filter(F.col("jaccard_est") >= threshold)
        .select("doc_a", "doc_b", "jaccard_est")
    )


def minhash_verified_pairs(documents: DataFrame, threshold: float = 0.5,
                           num_hashes: int = 64, bands: int = 32, k: int = 3,
                           text_col: str = "text",
                           max_bucket_size: int = 64) -> DataFrame:
    """The production MinHash-LSH dedup pattern end-to-end: LSH bucket
    collisions generate candidates, then the TRUE n-gram Jaccard is
    computed on candidate pairs only and filtered at ``threshold``.

    Every emitted pair is exactly correct (precision 1); recall is the
    LSH candidate recall, which at 64 hashes / 32 bands is ~1 for
    Jaccard >= ~0.5 (P(candidate) = 1-(1-s^2)^32, >0.9999 at s=0.5) —
    so on corpora in that regime the output EQUALS the exact-Jaccard
    pair set while the plan stays bucketed (candidates only, never
    all-pairs). This is the oracle-checkable form of dedup_minhash."""
    cand = minhash_lsh_pairs(documents, num_hashes, bands, k,
                             threshold=0.0, text_col=text_col,
                             max_bucket_size=max_bucket_size) \
        .select("doc_a", "doc_b")
    return _exact_jaccard_recheck(cand, documents, threshold, k, text_col)


def _exact_jaccard_recheck(cand: DataFrame, documents: DataFrame,
                           threshold: float, k: int,
                           text_col: str) -> DataFrame:
    """TRUE word-k-shingle Jaccard over candidate (doc_a, doc_b) pairs
    only, filtered at ``threshold`` — the re-rank stage shared by the
    verified MinHash and SimHash forms. Joins stay candidate-sized."""
    sh = word_shingles(documents, k, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n_shingles").alias("size_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n_shingles").alias("size_b"))
    return (
        common.join(za, "doc_a").join(zb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common")
                    / (F.col("size_a") + F.col("size_b") - F.col("n_common")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_signatures(documents: DataFrame, bits: int = 64,
                       text_col: str = "text") -> DataFrame:
    """64-bit SimHash: per token, xxhash64(token); per bit, sum of +1/-1
    weighted by token frequency; sign -> bit. Pure column ops: tokens ->
    explode -> per-bit contributions -> groupBy doc."""
    toks = spread_partitions(documents.select("doc_id", text_col)).select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.lower(F.col(text_col)),
                                       F.lit(r"[a-z0-9]+"), 0)).alias("token"),
    )
    h = F.xxhash64("token")
    bit_cols = [
        F.sum(F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1)
              .otherwise(-1)).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy("doc_id").agg(*bit_cols)
    sig = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        # shiftleft wraps at bit 63 (two's complement) — no literal overflow
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseOR(term)
    return agg.select("doc_id", sig.alias("simhash"))


def simhash_near_pairs(documents: DataFrame, max_hamming: int = 3,
                       text_col: str = "text", bands: int = 4,
                       probe_bits: int = 0) -> DataFrame:
    """Candidate pairs with Hamming distance <= max_hamming via band
    rotation blocking: ``bands`` equal slices of the 64-bit signature.

    Recall guarantee (pigeonhole): a pair within Hamming distance
    ``bands * (probe_bits + 1) - 1`` has some band with <= probe_bits
    flipped bits, and the probe side emits every <=probe_bits-flip
    variant of each band value — so with 4 bands and probe_bits=1 any
    pair at h <= 7 is guaranteed caught while the bucket keyspace stays
    2^16 per band. (The naive alternative — 8 bands of 8 bits — has the
    same h<=7 guarantee but only 256 bucket values: at 50k docs the
    average bucket held ~195 docs and within-bucket pairing went
    quadratic. Multi-probe trades a 17x row fan-out on ONE side for a
    256x larger keyspace — the scalable shape.)"""
    band_bits = 64 // bands
    band_mask = (1 << band_bits) - 1
    # eager localCheckpoint, not persist: computed once for both join
    # sides, blocks auto-released when the result is unreferenced
    sigs = simhash_signatures(documents, 64, text_col).localCheckpoint(eager=True)

    def banded(emit_probes: bool):
        # two small explodes (band ids x probe masks) instead of one
        # bands*(masks) struct array — keeps the Catalyst expression
        # tiny even at probe_bits=2 (137 masks)
        import itertools

        masks = [0]
        if emit_probes:
            for r in range(1, probe_bits + 1):
                for combo in itertools.combinations(range(band_bits), r):
                    masks.append(sum(1 << i for i in combo))
        base = F.expr(f"shiftrightunsigned(simhash, band_id * {band_bits})") \
            .bitwiseAND(F.lit(band_mask))
        return (
            sigs.select(
                "doc_id", "simhash",
                F.explode(F.array(*[F.lit(b) for b in range(bands)]))
                .alias("band_id"))
            .select("doc_id", "simhash", "band_id", base.alias("base_val"))
            .select("doc_id", "simhash", "band_id", "base_val",
                    F.explode(F.array(*[F.lit(m) for m in masks])).alias("m"))
            .select("doc_id", "simhash", "band_id",
                    F.col("base_val").bitwiseXOR(F.col("m")).alias("band_val"))
        )

    a = banded(emit_probes=True).alias("a")
    b = banded(emit_probes=False).alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
               & (F.col("a.band_val") == F.col("b.band_val"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
                hamming.alias("hamming"))
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_verified_pairs(documents: DataFrame, threshold: float = 0.9,
                           k: int = 3, text_col: str = "text") -> DataFrame:
    """The oracle-checkable SimHash dedup row, BOUNDED: blocking comes
    from MinHash-LSH bucket collisions (64 hashes / 32 bands — miss
    probability for a Jaccard >= 0.9 pair is (1-0.9^2)^32 ~ 1e-23, vast
    margin), exact word-k-shingle Jaccard re-checks every candidate, so
    the output EQUALS the exact all-pairs result in the near-dup
    regime. SimHash plays the SCORED-SIGNAL role and its recall
    contract is verified separately and ADAPTIVELY by
    ``simhash_recall_report`` over this true-pair set (per-pair Hamming
    histogram + band-catch flags), instead of betting the blocking on a
    fixed Hamming radius: the radius-11 multi-probe union this replaces
    took >10 min on the 50k dup-dense probe (radius guarantees with
    zero measured margin, ~8x candidate volume); this form is bounded
    by the minhash_verified cost (~23 s on the same probe)."""
    cand = minhash_lsh_pairs(documents, 64, 32, k, threshold=0.0,
                             text_col=text_col).select("doc_a", "doc_b")
    return _exact_jaccard_recheck(cand, documents, threshold, k, text_col)


def simhash_recall_report(documents: DataFrame, threshold: float = 0.9,
                          bands: int = 4, probe_bits: int = 1,
                          k: int = 3, text_col: str = "text") -> DataFrame:
    """The SimHash-specific correctness INSTRUMENT: for every TRUE
    near-dup pair (exact Jaccard >= threshold, found via the bounded
    minhash-blocked verified path), measure the 64-bit SimHash Hamming
    distance and whether ``bands``-band blocking with
    ``probe_bits``-bit multi-probe would catch it (caught iff some band
    differs in <= probe_bits bits — the pigeonhole criterion, evaluated
    EXACTLY per pair instead of assumed from a radius). Aggregating
    this gives the measured recall and Hamming histogram of the
    production ``simhash_near_pairs`` path on any corpus — the adaptive
    answer to 'what radius does THIS corpus need'. Output:
    (doc_a, doc_b, jaccard, hamming, caught)."""
    band_bits = 64 // bands
    band_mask = (1 << band_bits) - 1
    true_pairs = simhash_verified_pairs(documents, threshold, k, text_col)
    sigs = simhash_signatures(documents, 64, text_col).localCheckpoint(eager=True)
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"))
    x = F.col("sig_a").bitwiseXOR(F.col("sig_b"))
    band_pops = [
        F.bit_count(F.expr(f"shiftrightunsigned(sig_a ^ sig_b, {b * band_bits})")
                    .bitwiseAND(F.lit(band_mask)))
        for b in range(bands)
    ]
    caught = F.least(*band_pops) <= probe_bits
    return (
        true_pairs.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b", "jaccard",
                F.bit_count(x).alias("hamming"), caught.alias("caught"))
    )


def embedding_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                             vec_col: str = "embedding",
                             id_col: str = "vec_id",
                             mode: str = "lsh",
                             dim: int = 64, tables: int = 16,
                             bits: int | None = None,
                             approx_n: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a, b) with
    cosine >= threshold.

    ``mode='lsh'`` (the scale path): random-hyperplane LSH buckets
    (deterministic sha256 planes from operators/similarity.py) generate
    candidates via an equi-join on (table, bucket); exact cosine
    re-ranks the candidates, so every emitted pair is a TRUE pair
    (precision 1 by construction) and recall is the per-pair collision
    probability (1 - (1 - (1-θ/π)^bits)^tables — effectively 1.0 for
    near-dup thresholds >= ~0.9; at wide angles (threshold << 0.5) LSH
    blocking degenerates toward all-pairs and 'exact' is the honest
    engine).

    ``mode='exact'``: brute-force O(N^2) cross join — the correctness
    baseline / oracle for tests and small validation corpora only.
    """
    base = spread_partitions(
        embeddings.select(F.col(id_col).alias("id"),
                          F.col(vec_col).alias("vec")), "id")
    norm = F.sqrt(F.aggregate(
        F.transform("vec", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda a, v: a + v))
    base = base.withColumn("norm", norm)

    # cosine is computed IN the join projection (round 6 — same shape
    # as similarity.lsh_topk's round-5 fix): the dedup shuffle then
    # carries (id_a, id_b, cosine) — 3 scalars — instead of 2 x dim
    # float vectors per candidate pair. Cosine is deterministic per
    # pair, so deduplicating after scoring yields the identical result.
    dot = F.aggregate(
        F.zip_with(F.col("a.vec"), F.col("b.vec"),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)
    cos = F.round(dot / (F.col("a.norm") * F.col("b.norm")), 6)
    pair_cols = [
        F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
        cos.alias("cosine"),
    ]
    if mode == "lsh":
        from .similarity import _lsh_buckets_udf

        if bits is None:
            # scale-aware bucket width: fixed bits degenerate as the
            # corpus grows (8 bits = 256 buckets -> ~80 docs/bucket at
            # 20k vectors, quadratic within-bucket pairing; measured
            # 138 s -> ~35 s with adaptive bits). Target ~32 vectors
            # per bucket per table. ``approx_n`` (an estimate is fine —
            # bits only moves at powers of two) skips the count() job
            # when the caller already knows the corpus size.
            import math

            n = approx_n if approx_n is not None else embeddings.count()
            bits = min(16, max(8, math.ceil(math.log2(max(n, 1) / 32 + 1))))
        buckets_udf = _lsh_buckets_udf(dim, tables, bits)
        banded = base.select(
            "id", "vec", "norm",
            F.posexplode(buckets_udf(F.col("vec"))).alias("table_id", "bucket"),
        )
        a, b = banded.alias("a"), banded.alias("b")
        cand = (
            a.join(b, (F.col("a.table_id") == F.col("b.table_id"))
                   & (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(*pair_cols)
            .dropDuplicates(["id_a", "id_b"])
        )
    else:
        a, b = base.alias("a"), base.alias("b")
        cand = a.join(b, F.col("a.id") < F.col("b.id")).select(*pair_cols)

    return cand.filter(F.col("cosine") >= threshold)


def setsim_join(documents: DataFrame, threshold_num: int = 3,
                threshold_den: int = 5, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """EXACT set-similarity self-join (AllPairs/PPJoin prefix
    filtering): every document pair whose token-set Jaccard is >=
    threshold_num/threshold_den, with NO false negatives and NO
    hashing approximation — the exact complement to the MinHash
    family (use this when recall must be 1, MinHash when the corpus
    is too hot for exact work).

    Lossless prefix filter: tokens are globally ordered
    rarest-first; two sets at Jaccard >= t MUST share a token within
    each one's first ``n - ceil(t*n) + 1`` tokens, so only pairs
    co-occurring in a prefix are candidates — common tokens (the
    all-pairs blowup) never generate candidates because they sort
    last. Candidates are then verified by EXACT intersection and the
    integer threshold test
    ``(den + num) * inter >= num * (n_a + n_b)`` (equivalent to
    inter/union >= num/den with no float).

    Returns (id_a, id_b, inter, n_a, n_b) for satisfying pairs,
    id_a < id_b; exact Jaccard = inter / (n_a + n_b - inter).

    Scale shape: the frequency table is one token aggregate; per-doc
    sorting is scan-side (sort_array of (freq, token) structs, no
    global rank window); the candidate join is keyed on prefix
    tokens whose document frequency is LOW by construction;
    verification joins tokens through the candidate pairs, cost =
    sum over candidates of |tokens(a)|.
    """
    if not (0 < threshold_num <= threshold_den):
        raise ValueError("setsim_join: need 0 < num <= den")
    toks = (documents.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), F.lit(0))))
        .alias("token"))
        .localCheckpoint(eager=True))  # feeds 4 plan branches
    freq = toks.groupBy("token").agg(F.count("*").alias("tf"))
    ordered = (toks.join(freq, "token")
               .groupBy("doc")
               .agg(F.sort_array(F.collect_list(
                   F.struct("tf", "token"))).alias("sorted_toks")))
    n = F.size("sorted_toks")
    # ceil(num*n/den) in exact integer arithmetic
    ceil_tn = F.floor((F.lit(threshold_num) * n
                       + F.lit(threshold_den - 1)) / F.lit(threshold_den))
    prefix = (ordered
              .select("doc", n.alias("n"),
                      F.slice("sorted_toks", 1,
                              (n - ceil_tn + F.lit(1)).cast("int"))
                      .alias("prefix"))
              .select("doc", "n",
                      F.explode("prefix").alias("pt"))
              .select("doc", "n", F.col("pt.token").alias("token")))
    a = prefix.select(F.col("doc").alias("id_a"), F.col("n").alias("n_a"),
                      "token")
    b = prefix.select(F.col("doc").alias("id_b"), F.col("n").alias("n_b"),
                      "token")
    # AllPairs length prune: J >= num/den requires
    # min(n)/max(n) >= num/den — size-mismatched docs sharing a
    # prefix token never reach exact verification
    cand = (a.join(b, "token")
            .filter((F.col("id_a") < F.col("id_b"))
                    & (F.lit(threshold_den)
                       * F.least("n_a", "n_b")
                       >= F.lit(threshold_num)
                       * F.greatest("n_a", "n_b")))
            .select("id_a", "id_b", "n_a", "n_b")
            .distinct())
    ta = toks.select(F.col("doc").alias("id_a"), "token")
    tb = toks.select(F.col("doc").alias("id_b"), "token")
    inter = (cand.join(ta, "id_a")
             .join(tb, ["id_b", "token"])
             .groupBy("id_a", "id_b", "n_a", "n_b")
             .agg(F.count("*").alias("inter")))
    keep = (F.lit(threshold_den + threshold_num) * F.col("inter")
            >= F.lit(threshold_num) * (F.col("n_a") + F.col("n_b")))
    return inter.filter(keep).select("id_a", "id_b", "inter",
                                     "n_a", "n_b")


def containment_join(documents: DataFrame, threshold_num: int = 4,
                     threshold_den: int = 5, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """EXACT set-containment self-join: every DIRECTED pair (a, b)
    with ``|tokens(a) ∩ tokens(b)| / |tokens(a)| >= num/den`` — the
    asymmetric near-superset relation Jaccard misses (a short doc
    embedded in a long one scores high containment but low Jaccard;
    the C4/boilerplate-expansion dedup case). Recall 1, no hashing.

    Prefix filter (the containment form of AllPairs): order tokens
    globally rarest-first; if C(a→b) >= t then a MUST share a token
    within its first ``n_a - ceil(t*n_a) + 1`` tokens — so only the
    CONTAINED side is prefix-pruned, while the containing side
    indexes all its tokens (containment places no ceiling on where
    the shared tokens sit inside b). Size prune: ``n_b >=
    ceil(t * n_a)`` (b must hold at least the required intersection).
    Verification is the exact intersection count with the integer
    test ``den * inter >= num * n_a``.

    Returns (id_a, id_b, inter, n_a, n_b), id_a != id_b, directed:
    a is contained in b at inter/n_a >= t. Scale shape mirrors
    setsim_join: the candidate join is keyed on RARE prefix tokens of
    the contained side; the full-token side is the posting list an
    inverted index serves, and the verification join's cost follows
    the candidate set.
    """
    if not (0 < threshold_num <= threshold_den):
        raise ValueError("containment_join: need 0 < num <= den")
    toks = (documents.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), F.lit(0))))
        .alias("token"))
        .localCheckpoint(eager=True))
    freq = toks.groupBy("token").agg(F.count("*").alias("tf"))
    ordered = (toks.join(freq, "token")
               .groupBy("doc")
               .agg(F.sort_array(F.collect_list(
                   F.struct("tf", "token"))).alias("sorted_toks")))
    n = F.size("sorted_toks")
    ceil_tn = F.floor((F.lit(threshold_num) * n
                       + F.lit(threshold_den - 1)) / F.lit(threshold_den))
    prefix = (ordered
              .select("doc", n.alias("n"),
                      F.slice("sorted_toks", 1,
                              (n - ceil_tn + F.lit(1)).cast("int"))
                      .alias("prefix"))
              .select("doc", "n", F.explode("prefix").alias("pt"))
              .select("doc", "n", F.col("pt.token").alias("token")))
    sizes = toks.groupBy("doc").agg(F.count("*").alias("n"))
    a = prefix.select(F.col("doc").alias("id_a"),
                      F.col("n").alias("n_a"), "token")
    b = (toks.join(sizes, "doc")
         .select(F.col("doc").alias("id_b"), F.col("n").alias("n_b"),
                 "token"))
    cand = (a.join(b, "token")
            .filter((F.col("id_a") != F.col("id_b"))
                    # n_b >= ceil(t*n_a)  <=>  den*n_b >= num*n_a
                    & (F.lit(threshold_den) * F.col("n_b")
                       >= F.lit(threshold_num) * F.col("n_a")))
            .select("id_a", "id_b", "n_a", "n_b")
            .distinct())
    ta = toks.select(F.col("doc").alias("id_a"), "token")
    tb = toks.select(F.col("doc").alias("id_b"), "token")
    inter = (cand.join(ta, "id_a")
             .join(tb, ["id_b", "token"])
             .groupBy("id_a", "id_b", "n_a", "n_b")
             .agg(F.count("*").alias("inter")))
    keep = (F.lit(threshold_den) * F.col("inter")
            >= F.lit(threshold_num) * F.col("n_a"))
    return inter.filter(keep).select("id_a", "id_b", "inter",
                                     "n_a", "n_b")
