"""Training-data sampling: deterministic splits + sequence packing."""

from pyspark.sql import functions as F

from npm_extraction_server_spark.operators.sampling import (
    pack_sequences,
    pack_sequences_sharded,
    stratified_split,
)


def test_stratified_split_deterministic_and_stable(spark):
    docs = spark.range(2000).withColumnRenamed("id", "doc_id")
    s1 = {r["doc_id"]: r["split"]
          for r in stratified_split(docs, {"train": 80, "val": 10, "test": 10}).collect()}
    s2 = {r["doc_id"]: r["split"]
          for r in stratified_split(docs, {"train": 80, "val": 10, "test": 10}).collect()}
    assert s1 == s2  # pure function of the key
    # ratios roughly honored
    from collections import Counter
    c = Counter(s1.values())
    assert 0.75 < c["train"] / 2000 < 0.85
    assert 0.05 < c["val"] / 2000 < 0.15
    # growth stability: adding rows never moves existing rows
    bigger = spark.range(4000).withColumnRenamed("id", "doc_id")
    s3 = {r["doc_id"]: r["split"]
          for r in stratified_split(bigger, {"train": 80, "val": 10, "test": 10}).collect()}
    assert all(s3[k] == v for k, v in s1.items())


def test_pack_sequences_budget_property(spark):
    docs = spark.createDataFrame(
        [(i, "w " * (10 + i % 37)) for i in range(300)], "doc_id long, text string")
    packed = pack_sequences(docs, budget=100).collect()
    by_bin: dict[int, int] = {}
    for r in packed:
        by_bin[r["bin_id"]] = by_bin.get(r["bin_id"], 0) + r["n_tokens"]
    # every bin starts before the budget boundary: a document begins in
    # bin floor(prev_cum/budget), so bins exceed the budget by at most
    # one document (concat-and-chunk semantics), never start past it
    for r in packed:
        assert (r["cum_tokens"] - r["n_tokens"]) // 100 == r["bin_id"]
    assert len(by_bin) > 1
    # bins are contiguous 0..max
    assert sorted(by_bin) == list(range(len(by_bin)))


def test_pack_sharded_matches_single_within_shard(spark):
    docs = spark.createDataFrame(
        [(i, "tok " * (5 + i % 11)) for i in range(400)], "doc_id long, text string")
    sharded = pack_sequences_sharded(docs, budget=64, n_shards=4)
    rows = sharded.collect()
    assert {r["shard"] for r in rows} == {0, 1, 2, 3}
    # within each shard the running sum is consistent and ordered
    from collections import defaultdict
    per = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r["shard"], r["doc_id"])):
        per[r["shard"]].append(r)
    for shard_rows in per.values():
        cum = 0
        for r in shard_rows:
            cum += r["n_tokens"]
            assert r["cum_tokens"] == cum
            assert (r["cum_tokens"] - r["n_tokens"]) // 64 == r["bin_id"]


def test_bpe_token_counts_greedy_segmentation(spark):
    """Hand-checked greedy longest-match examples over the frozen
    vocab ('customer' -> custom+er, 'streaming' -> stream+in+g, full
    fallback 'xyz' -> x+y+z), plus empty/null text edge cases."""
    from npm_extraction_server_spark.operators.text import (
        BPE_PIECES,
        bpe_token_counts,
    )

    def ref_seg(word):
        pieces = sorted(BPE_PIECES, key=len, reverse=True)
        pos, out = 0, []
        while pos < len(word):
            for p in pieces:
                if word.startswith(p, pos):
                    out.append(p)
                    pos += len(p)
                    break
            else:
                out.append(word[pos])
                pos += 1
        return out

    assert ref_seg("customer") == ["custom", "er"]
    assert ref_seg("streaming") == ["stream", "in", "g"]
    assert ref_seg("xyz") == ["x", "y", "z"]
    docs = spark.createDataFrame(
        [(0, "Customer STREAMING xyz"), (1, ""), (2, None), (3, "table")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
           for r in bpe_token_counts(docs).collect()}
    assert got == {0: (3, 2 + 3 + 3), 1: (0, 0), 2: (0, 0), 3: (1, 1)}


def test_pack_sequences_bpe_mode(spark):
    """token_mode='bpe': n_tokens is the subword count and the window
    math is unchanged."""
    from npm_extraction_server_spark.operators.text import bpe_token_counts

    docs = spark.createDataFrame(
        [(i, "customer streaming value " * (1 + i % 3))
         for i in range(60)], "doc_id long, text string")
    packed = {r["doc_id"]: r for r in pack_sequences_sharded(
        docs, budget=32, n_shards=2, token_mode="bpe").collect()}
    counts = {r["doc_id"]: r["n_bpe_tokens"]
              for r in bpe_token_counts(docs).collect()}
    assert len(packed) == 60
    for did, r in packed.items():
        assert r["n_tokens"] == counts[did]
        assert (r["cum_tokens"] - r["n_tokens"]) // 32 == r["bin_id"]


def test_resample_to_mix_proportions_and_determinism(spark):
    """Domain-mix resampling: realized proportions approach the target
    (hash-exact, not RNG), the limiting domain keeps ~everything,
    unlisted domains drop entirely, and membership is stable across
    reruns/partitionings."""
    from pyspark.sql import functions as F

    from npm_extraction_server_spark.operators.sampling import resample_to_mix

    rows = [(i, f"d{i % 4}") for i in range(4000)]  # 1000 per domain
    df = spark.createDataFrame(rows, "doc_id long, source string")
    targets = {"d0": 0.5, "d1": 0.3, "d2": 0.2}
    out = resample_to_mix(df, targets)
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert "d3" not in got                      # unlisted -> dropped
    # T = min(1000/.5, 1000/.3, 1000/.2) = 2000; expected 1000/600/400
    assert got["d0"] > 950                      # limiting domain ~100%
    total = sum(got.values())
    for d, t in targets.items():
        assert abs(got[d] / total - t) < 0.05   # realized mix near target

    again = set(r["doc_id"] for r in
                resample_to_mix(df.repartition(13), targets).collect())
    assert again == set(r["doc_id"] for r in out.collect())

    import pytest

    with pytest.raises(ValueError, match="frac"):
        resample_to_mix(df, {"d0": 0.0})


def test_resample_to_mix_rejects_missing_domain(spark):
    """A target domain absent from the corpus must raise — the inner
    join would otherwise silently drop it and skew the whole mix."""
    import pytest

    from npm_extraction_server_spark.operators.sampling import resample_to_mix

    df = spark.createDataFrame([(1, "web"), (2, "code")],
                               "doc_id long, source string")
    with pytest.raises(ValueError, match="papers"):
        resample_to_mix(df, {"web": 0.5, "code": 0.3, "papers": 0.2})


def test_alpha_mix_semantics(spark):
    """alpha=1 keeps the natural distribution (every row); alpha->0
    equalizes domain sizes toward the smallest; membership is a pure
    function of the row key (subset stability across alphas is NOT
    required, but rerun determinism is); invalid alpha raises."""
    import pytest

    from npm_extraction_server_spark.operators.sampling import alpha_mix
    from pyspark.sql import functions as F

    rows = [(i, "big") for i in range(400)] + \
           [(400 + i, "mid") for i in range(100)] + \
           [(500 + i, "small") for i in range(25)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")

    # alpha=1: natural distribution, full retention
    assert alpha_mix(docs, alpha=1.0).count() == 525

    kept = alpha_mix(docs, alpha=0.5).groupBy("source").count()
    sizes = {r["source"]: r["count"] for r in kept.collect()}
    # sqrt temperature: ratios compress from 16:4:1 toward 4:2:1;
    # the smallest domain is limiting and keeps everything
    assert sizes["small"] == 25
    assert sizes["big"] < 400 and sizes["mid"] < 100
    assert sizes["big"] > sizes["mid"] > sizes["small"]

    again = {r["source"]: r["count"]
             for r in alpha_mix(docs, alpha=0.5)
             .groupBy("source").count().collect()}
    assert again == sizes

    with pytest.raises(ValueError, match="alpha"):
        alpha_mix(docs, alpha=0.0)


def test_weighted_sample_k_matches_python_twin(spark):
    """Efraimidis-Spirakis weighted sample equals an independent
    pure-Python implementation using the same md5 uniforms (exact
    row-set identity), prefers the dominant-weight row at k=1, keeps
    everything when k >= n, and drops non-positive weights."""
    import hashlib

    import pytest

    from npm_extraction_server_spark.operators.sampling import (
        weighted_sample_k)

    rows = [(i, "a", (i % 7) + 1) for i in range(60)] + \
           [(100, "b", 10**9)] + [(101 + j, "b", 1) for j in range(50)] + \
           [(200, "c", 0), (201, "c", -5), (202, "c", 3)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, wt long")

    def key(i, w):
        hv = int(hashlib.md5(f"ws:{i}".encode()).hexdigest()[:12], 16)
        import math
        return round(math.log((hv + 1) / float(1 << 48)), 8) / float(w)

    got = {(r.doc_id, r.source)
           for r in weighted_sample_k(docs, k=10,
                                      weight_col="wt").collect()}
    exp = set()
    for grp in ("a", "b", "c"):
        cand = [(i, w) for i, s, w in rows if s == grp and w > 0]
        ranked = sorted(cand, key=lambda t: (-key(t[0], t[1]), t[0]))
        exp |= {(i, grp) for i, _ in ranked[:10]}
    assert got == exp
    # dominant weight wins at k=1
    top_b = weighted_sample_k(docs.filter(F.col("source") == "b"),
                              k=1, weight_col="wt").collect()
    assert top_b[0].doc_id == 100
    # k >= n keeps every positive-weight row; zero/negative excluded
    all_c = weighted_sample_k(docs.filter(F.col("source") == "c"),
                              k=99, weight_col="wt").collect()
    assert [(r.doc_id, r.w) for r in all_c] == [(202, 3.0)]
    with pytest.raises(ValueError, match="positive"):
        weighted_sample_k(docs, k=0, weight_col="wt")
