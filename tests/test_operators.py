"""Operator-level Spark tests: dedup recall, ANN recall vs brute force,
semver join vs kernel oracle, engine resolution, multimodal plumbing."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from npm_extraction_server_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from npm_extraction_server_spark.operators.multimodal import (
    decode_features,
    resize_images,
    sample_frames,
    synth_media_df,
)
from npm_extraction_server_spark.operators.semver_join import (
    dependency_edges,
    dist_tag_rows,
    max_satisfying_triples,
    resolve_engine_ranges,
    resolve_ranges,
    version_rows,
)
from npm_extraction_server_spark.operators.similarity import cosine_topk, lsh_topk


@pytest.fixture(scope="module")
def dup_docs(spark):
    """Corpus with planted exact + near duplicates."""
    base = ("the quick brown fox jumps over the lazy dog while the spark "
            "engine shuffles partitions across the cluster every day")
    near = base.replace("lazy dog", "sleepy dog")  # 1-word change
    rows = [(0, base), (1, base), (2, near),
            (3, "completely different text about databases and queries"),
            (4, "another unrelated document mentioning vectors and joins")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_finds_planted(dup_docs):
    dups = exact_duplicates(dup_docs).collect()
    assert len(dups) == 1
    assert dups[0]["survivor_id"] == 0 and dups[0]["n_copies"] == 2


def test_ngram_jaccard_finds_near(dup_docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(dup_docs, k=3, threshold=0.3).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.5 < pairs[(0, 2)] < 1.0
    assert (3, 4) not in pairs


def test_ngram_jaccard_broadcasts_drop_set(dup_docs):
    """Skew guard shape: the stop-shingle filter must be a broadcast
    LEFT ANTI join against the small df>cap set — never a broadcast of
    the unbounded kept-shingle set."""
    plan = ngram_jaccard_pairs(dup_docs, k=3, threshold=0.3) \
        ._jdf.queryExecution().sparkPlan().toString()
    anti_lines = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
    assert anti_lines, plan
    assert any("BroadcastHashJoin" in ln and "BuildRight" in ln
               for ln in anti_lines), plan


def test_minhash_lsh_finds_near(dup_docs):
    pairs = {(r["doc_a"], r["doc_b"])
             for r in minhash_lsh_pairs(dup_docs, threshold=0.3).collect()}
    assert (0, 1) in pairs
    assert (0, 2) in pairs
    assert (3, 4) not in pairs


def test_embedding_near_dup_lsh_matches_exact(spark):
    """The LSH-bucketed near-dup path returns EXACTLY the brute-force
    pair set on planted near-dups (recall ~1 at near-dup angles with
    deterministic sha256 hyperplanes), and its plan has no cartesian
    product."""
    import numpy as np

    from npm_extraction_server_spark.operators.dedup import embedding_near_dup_pairs

    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    # planted: ids 1000+i are tiny perturbations of ids < 8
    for i in range(8):
        v = base[i] + 0.02 * rng.normal(size=64)
        rows.append((1000 + i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in embedding_near_dup_pairs(emb, 0.95, mode="exact").collect()}
    lsh_df = embedding_near_dup_pairs(emb, 0.95, mode="lsh")
    lsh = {(r["id_a"], r["id_b"]): r["cosine"] for r in lsh_df.collect()}
    assert len(exact) >= 8
    assert lsh == exact
    plan = lsh_df._jdf.queryExecution().sparkPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan


def test_simhash_near(dup_docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in simhash_near_pairs(dup_docs, max_hamming=10).collect()}
    assert pairs.get((0, 1)) == 0
    assert (0, 2) in pairs


def test_simhash_verified_equals_exact(spark):
    """simhash_verified_pairs (bounded minhash blocks + exact re-check)
    must EQUAL the exact all-pairs Jaccard set at 0.9 — the hard-oracle
    contract of the dedup_simhash_verified driver row."""
    from npm_extraction_server_spark.operators.dedup import (
        ngram_jaccard_pairs,
        simhash_verified_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, k=3, threshold=0.9,
                                          max_shingle_freq=10**9).collect()}
    verified = {(r["doc_a"], r["doc_b"]): r["jaccard"]
                for r in simhash_verified_pairs(docs, threshold=0.9).collect()}
    assert verified == exact and len(exact) > 0


def test_simhash_recall_report(spark):
    """The adaptive SimHash instrument: per TRUE pair, the measured
    Hamming distance and the exact band-catch flag. Pigeonhole theorem
    checked empirically (hamming <= bands*(probe_bits+1)-1 => caught),
    and the caught flags must agree with what simhash_near_pairs
    actually emits at the same (bands, probe_bits)."""
    from npm_extraction_server_spark.operators.dedup import (
        simhash_near_pairs,
        simhash_recall_report,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rep = simhash_recall_report(docs, threshold=0.9,
                                bands=4, probe_bits=1).collect()
    assert len(rep) > 0
    # pigeonhole: within radius 4*(1+1)-1 = 7 every pair MUST be caught
    for r in rep:
        if r["hamming"] <= 7:
            assert r["caught"], r
    # the flags are the ground truth of the production blocking path:
    # every caught true pair appears in simhash_near_pairs' output
    emitted = {(r["doc_a"], r["doc_b"]) for r in simhash_near_pairs(
        docs, max_hamming=64, bands=4, probe_bits=1).collect()}
    for r in rep:
        assert ((r["doc_a"], r["doc_b"]) in emitted) == r["caught"], r


def test_ann_verified_top1_hits_planted_source(spark):
    """sim_lsh_verified / sim_ivf_verified contract: each planted query
    (perturbed copy of vector v) retrieves exactly v as its top-1."""
    from npm_extraction_server_spark.operators.similarity import ivf_topk
    from npm_extraction_server_spark.operators.suite import _planted_ann_queries

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = _planted_ann_queries(emb, n=10)
    for result in (lsh_topk(emb, q, k=1, dim=64, tables=16, bits=8),
                   ivf_topk(emb, q, k=1, n_centroids=16, nprobe=4)):
        rows = result.collect()
        assert len(rows) == 10
        for r in rows:
            assert r["item_id"] == r["query_id"] - 200000
            assert r["cosine"] > 0.98


def test_ivfpq_verified_and_deterministic(spark):
    """IVF+PQ: planted queries retrieve their exact source as top-1
    through the 8-byte-code ADC preselection + exact re-rank; the whole
    pipeline (hash-ordered samples, fixed Lloyd rounds, first-index
    argmin ties) is deterministic — two runs produce identical rows."""
    from npm_extraction_server_spark.operators.similarity import ivfpq_topk
    from npm_extraction_server_spark.operators.suite import _planted_ann_queries

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = _planted_ann_queries(emb, n=10)
    a = ivfpq_topk(emb, q, k=1, n_centroids=16, nprobe=4,
                   m_sub=8, ksub=16, rerank=64).collect()
    assert len(a) == 10
    for r in a:
        assert r["item_id"] == r["query_id"] - 200000
        assert r["cosine"] > 0.98
    b = ivfpq_topk(emb, q, k=1, n_centroids=16, nprobe=4,
                   m_sub=8, ksub=16, rerank=64).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_ivfpq_validates_params(spark):
    from npm_extraction_server_spark.operators.similarity import ivfpq_topk
    from npm_extraction_server_spark.operators.suite import _planted_ann_queries

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = _planted_ann_queries(emb, n=2)
    with pytest.raises(ValueError, match="divisible"):
        ivfpq_topk(emb, q, m_sub=7)
    with pytest.raises(ValueError, match="one-byte"):
        ivfpq_topk(emb, q, ksub=512)


def test_graph_components_chains_and_bridges(spark):
    """graph_components: runs of 10 chained, bridged at multiples of
    37 — canonical label must be the min node over the merged runs."""
    from npm_extraction_server_spark.operators.suite import graph_components

    labels = {r["node_id"]: r["component_id"]
              for r in graph_components(spark, "/root/testdata/sf0.001").collect()}
    # doc 0..9 chained; doc 0 bridges to 100's run (0 % 37 == 0)
    assert labels["00000005"] == "00000000"
    assert labels["00000105"] == "00000000"  # via the 0 -> 100 bridge
    # run 10..19 has no inbound bridge from 0's component
    assert labels["00000015"] == "00000010"


def test_asof_join_semantics(spark):
    """As-of: latest right row at-or-before the left time per key;
    exact-time rows match; earlier-than-all rows get nulls; keys are
    isolated."""
    from npm_extraction_server_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("a", 10, "e1"), ("a", 20, "e2"), ("a", 5, "e0"), ("b", 15, "e3")],
        "k string, t long, ev string")
    right = spark.createDataFrame(
        [("a", 10, 100), ("a", 18, 180), ("b", 99, 990)],
        "k string, rt long, val long")
    out = {r["ev"]: r["val"] for r in asof_join(
        left, right, by="k", left_time="t", right_time="rt",
        value_cols=["val"]).collect()}
    assert out == {"e0": None,   # before any right row
                   "e1": 100,    # exact-time match
                   "e2": 180,    # latest <= 20
                   "e3": None}   # b's only right row is later


def test_asof_join_null_right_values_do_not_mix_rows(spark):
    """All attached values must come from the SAME matched right row: a
    null field in the latest right row stays null — it must NOT
    back-fill from an older right row while other fields come from the
    newer one (the per-column-fill bug)."""
    from npm_extraction_server_spark.operators.asof import asof_join

    left = spark.createDataFrame([("a", 30, "e1")], "k string, t long, ev string")
    right = spark.createDataFrame(
        [("a", 10, 100, 1000), ("a", 20, None, 2000)],
        "k string, rt long, x long, y long")
    row = asof_join(left, right, by="k", left_time="t", right_time="rt",
                    value_cols=["x", "y"]).collect()[0]
    # matched row is rt=20: x is null THERE, y=2000 — x must stay null
    assert row["x"] is None and row["y"] == 2000


def test_kmv_sketch_accuracy_and_merge(spark):
    """KMV distinct sketch: estimate within ~3 standard errors of the
    true distinct count, and shard-wise sketch merge reproduces the
    global sketch exactly (mergeability — the property that lets 1000
    executors sketch independently and combine k longs per group)."""
    from npm_extraction_server_spark.operators.sketch import (
        kmv_distinct,
        kmv_hash,
        kmv_merge,
    )

    n, k = 5000, 64
    df = spark.range(n).selectExpr("'g' AS grp", "concat('v', id) AS v")
    out = kmv_distinct(df, "grp", "v", k=k).collect()[0]
    # relative standard error of KMV ~ 1/sqrt(k-2); allow 3 sigma
    assert abs(out["distinct_est"] - n) / n < 3 / (k - 2) ** 0.5
    # mergeability: k-min of shard k-mins == global k-min set
    shards = [
        df.filter((F.col("v").substr(2, 10).cast("long") % 4) == i)
        .select("grp", kmv_hash(F.col("v")).alias("h"))
        .distinct()
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("grp").orderBy("h")))
        .filter(F.col("rn") <= k).drop("rn")
        for i in range(4)
    ]
    merged = kmv_merge(shards[0].unionByName(shards[1])
                       .unionByName(shards[2]).unionByName(shards[3]),
                       group_col="grp", k=k)
    global_sketch = (
        df.select("grp", kmv_hash(F.col("v")).alias("h")).distinct()
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("grp").orderBy("h")))
        .filter(F.col("rn") <= k).drop("rn")
    )
    assert {r["h"] for r in merged.collect()} == \
        {r["h"] for r in global_sketch.collect()}


def test_kmv_set_ops_exact_small_and_estimates_large(spark):
    """KMV set algebra: below k the union/intersection/Jaccard are
    EXACT (the sketch is exhaustive); at scale the estimates land
    within ~3 standard errors of the truth for a constructed 50%
    overlap."""
    from npm_extraction_server_spark.operators.sketch import kmv_set_ops

    # exact regime: |A|=20, |B|=20, |A∩B|=10 -> union 30, J=1/3
    a = spark.range(20).selectExpr("'A' AS grp", "concat('u', id) AS v")
    b = spark.range(10, 30).selectExpr("'B' AS grp", "concat('u', id) AS v")
    out = kmv_set_ops(a.unionByName(b), "grp", "v", k=64).collect()[0]
    assert (out["ga"], out["gb"]) == ("A", "B")
    assert out["n_kept"] == 30 and out["k_cap"] == 10
    assert out["union_est"] == 30.0 and out["inter_est"] == 10.0
    assert abs(out["jaccard"] - round(10 / 30, 6)) < 1e-12

    # estimate regime: |A|=|B|=4000, overlap 2000 -> union 6000, J=1/3
    k = 256
    a = spark.range(4000).selectExpr("'A' AS grp", "concat('u', id) AS v")
    b = spark.range(2000, 6000).selectExpr(
        "'B' AS grp", "concat('u', id) AS v")
    out = kmv_set_ops(a.unionByName(b), "grp", "v", k=k).collect()[0]
    se = 3 / (k - 2) ** 0.5
    assert abs(out["union_est"] - 6000) / 6000 < se
    assert abs(out["jaccard"] - 1 / 3) < se
    assert abs(out["inter_est"] - 2000) / 2000 < 2 * se


def test_scrub_pii_redacts_all_kinds(spark):
    from npm_extraction_server_spark.operators.text import scrub_pii

    docs = spark.createDataFrame(
        [(0, "mail a.b+c@x-y.co now, ping 10.255.0.1 or call +1-555-123-4567"),
         (1, "clean text, version 1.2 and year 2024 stay untouched")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    assert rows[0]["scrubbed_text"] == "mail <EMAIL> now, ping <IP> or call <PHONE>"
    assert (rows[0]["n_emails"], rows[0]["n_ips"], rows[0]["n_phones"]) == (1, 1, 1)
    assert rows[1]["scrubbed_text"] == \
        "clean text, version 1.2 and year 2024 stay untouched"
    assert rows[1]["n_emails"] + rows[1]["n_ips"] + rows[1]["n_phones"] == 0


def test_textrank_pairs_and_composition(spark):
    """textrank_keywords: adjacent-pair extraction (lowercased,
    self-pairs dropped, multiplicity counted) matches a hand count,
    and the ranks equal plans/graph.pagerank run directly on the
    hand-built weighted co-occurrence graph — the composition adds
    nothing beyond the two layers."""
    from npm_extraction_server_spark.operators.text import (
        textrank_keywords,
    )
    from npm_extraction_server_spark.plans.graph import pagerank

    docs = spark.createDataFrame(
        [(0, "Spark spark graph RANK graph spark"),
         (1, "rank graph rank"),
         (2, "solo")],                        # <2 tokens: contributes 0
        "doc_id long, text string")
    # hand-derived unordered adjacent pairs:
    # doc0: (spark,spark)x -> drop; (graph,spark) [spark graph],
    #       (graph,rank), (graph,rank), (graph,spark)
    # doc1: (graph,rank), (graph,rank)
    co = {("graph", "spark"): 2, ("graph", "rank"): 4}
    edges = spark.createDataFrame(
        [(a, b, w) for (a, b), w in co.items()]
        + [(b, a, w) for (a, b), w in co.items()],
        "src string, dst string, w long")
    exp = {r.node_id: r.rank
           for r in pagerank(edges, iterations=4, normalized=False,
                             weight_col="w").collect()}
    got = {r.word: r.rank
           for r in textrank_keywords(docs, iterations=4).collect()}
    assert got == exp
    # graph is the hub: strictly top-ranked
    assert got["graph"] > max(got["spark"], got["rank"])


def test_span_dedup_removes_shared_chunks(spark):
    """A 10-word chunk shared by two docs disappears from both; unique
    chunks survive in order; a fully-boilerplate doc keeps 0 chunks."""
    from npm_extraction_server_spark.operators.text import span_dedup

    boiler = " ".join(f"b{i}" for i in range(10))
    u1 = " ".join(f"u{i}" for i in range(10))
    u2 = " ".join(f"v{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(0, f"{boiler} {u1}"), (1, f"{boiler} {u2}"), (2, boiler)],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in span_dedup(docs).collect()}
    assert out[0]["kept_text"] == u1 and out[0]["n_kept_chunks"] == 1
    assert out[1]["kept_text"] == u2
    assert out[2]["kept_text"] == "" and out[2]["n_kept_chunks"] == 0


def test_lsh_topk_recall_vs_bruteforce(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    exact = {(r["query_id"], r["item_id"])
             for r in cosine_topk(emb, queries, k=5).collect()}
    # bits sized to the corpus: 2^4 buckets x 16 tables on ~500 vectors
    # (6-bit buckets starve the candidate sets at this scale)
    approx = {(r["query_id"], r["item_id"])
              for r in lsh_topk(emb, queries, k=5, dim=64,
                                tables=16, bits=4).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"LSH recall too low: {recall}"


def test_semver_join_matches_kernel(spark):
    """The distributed J1 must agree with the sequential reference
    semantics (resolve_module_version) edge by edge."""
    import json as jsonlib
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from fixtures import all_packages

    from npm_extraction_server_spark.kernel.pipeline import resolve_module_version

    pkgs = all_packages()
    docs = spark.createDataFrame(
        [("npm_manifest", jsonlib.dumps(p)) for p in pkgs],
        "doc_kind string, doc_json string")
    edges = dependency_edges(docs)
    versions = version_rows(docs)
    tags = dist_tag_rows(docs)
    resolved = {
        (r["src_bundle"], r["src_version"], r["dep_pkg"], r["dep_range"]):
            r["resolved_version"]
        for r in resolve_ranges(edges, versions, tags).collect()
    }
    by_name = {p["name"]: p for p in pkgs}
    assert len(resolved) > 0
    for (src, sver, pkg, rng), got in resolved.items():
        if pkg in by_name:
            expect = resolve_module_version(by_name[pkg], rng)
            assert got == expect, f"{pkg}@{rng}: spark={got} kernel={expect}"
        else:
            assert got is None


def test_dist_tag_chain_resolves_through_join(spark):
    """A 2-hop dist-tag chain ("next" -> "beta" -> concrete version)
    resolves through the DISTRIBUTED resolve_ranges path, matching the
    kernel's recursion (kernel/pipeline.py resolve_module_version,
    NpmBundle.js:53-57)."""
    import json as jsonlib

    from npm_extraction_server_spark.kernel.pipeline import resolve_module_version

    chained = {
        "name": "chained",
        "versions": {"1.0.0": {"name": "chained", "version": "1.0.0"},
                     "2.0.0-beta.1": {"name": "chained", "version": "2.0.0-beta.1"}},
        # "next" -> "beta" -> 2.0.0-beta.1 (two hops); "self" -> "self"
        # must terminate via the depth cap, not loop
        "dist-tags": {"latest": "1.0.0", "beta": "2.0.0-beta.1",
                      "next": "beta", "self": "self"},
    }
    # the dep range "next" is not a valid semver range, so it reaches
    # resolution only via the tag table — build the edge directly
    consumer = {
        "name": "consumer",
        "versions": {"1.0.0": {"name": "consumer", "version": "1.0.0",
                               "dependencies": {"chained": "^1.0.0"}}},
        "dist-tags": {"latest": "1.0.0"},
    }
    docs = spark.createDataFrame(
        [("npm_manifest", jsonlib.dumps(chained)),
         ("npm_manifest", jsonlib.dumps(consumer))],
        "doc_kind string, doc_json string")
    versions = version_rows(docs)
    tags = dist_tag_rows(docs)

    edges = spark.createDataFrame(
        [("consumer", "1.0.0", "dependencies", "chained", "next"),
         ("consumer", "1.0.0", "dependencies", "chained", "self"),
         ("consumer", "1.0.0", "dependencies", "chained", "^1.0.0")],
        "src_bundle string, src_version string, dep_type string, "
        "dep_pkg string, dep_range string")
    got = {r["dep_range"]: r["resolved_version"]
           for r in resolve_ranges(edges, versions, tags).collect()}
    assert got["next"] == "2.0.0-beta.1"  # two-hop chain followed
    assert got["next"] == resolve_module_version(chained, "next")
    assert got["self"] is None  # cyclic tag terminates as unresolved
    assert got["self"] == resolve_module_version(chained, "self")
    assert got["^1.0.0"] == "1.0.0"  # plain range path unaffected


def test_resolve_ranges_dedupes_pairs(spark):
    """The maxSatisfying UDF runs over distinct (dep_pkg, dep_range)
    pairs, not raw edges: the optimized plan aggregates the pair key
    before the python stage (head-range dedupe at scale)."""
    import json as jsonlib

    pkg = {"name": "p", "versions": {"1.0.0": {"name": "p", "version": "1.0.0"},
                                     "1.2.0": {"name": "p", "version": "1.2.0"}},
           "dist-tags": {"latest": "1.2.0"}}
    docs = spark.createDataFrame([("npm_manifest", jsonlib.dumps(pkg))],
                                 "doc_kind string, doc_json string")
    versions = version_rows(docs)
    # 40 edges, all the same (p, ^1.0.0) pair
    edges = spark.createDataFrame(
        [(f"src{i}", "1.0.0", "dependencies", "p", "^1.0.0") for i in range(40)],
        "src_bundle string, src_version string, dep_type string, "
        "dep_pkg string, dep_range string")
    out = resolve_ranges(edges, versions)
    rows = out.collect()
    assert len(rows) == 40
    assert all(r["resolved_version"] == "1.2.0" for r in rows)
    # the pair-dedupe aggregate sits below the python UDF in the plan
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "dep_pkg" in plan
    udf_pos = plan.find("_max_satisfying_udf")
    dedup_pos = plan.rfind("Aggregate", udf_pos)
    assert udf_pos >= 0 and dedup_pos > udf_pos, plan


def test_max_satisfying_triples(spark):
    resolved = spark.createDataFrame(
        [("a", "1.0.0", "dependencies", "hotpkg", "^1.0.0", "1.4.0"),
         ("a", "1.0.0", "dependencies", "gone", "^9", None)],
        "src_bundle string, src_version string, dep_type string, "
        "dep_pkg string, dep_range string, resolved_version string")
    triples = max_satisfying_triples(resolved).collect()
    assert len(triples) == 1
    t = triples[0]
    assert t["subj"].endswith("/hotpkg/%5E1.0.0")
    assert t["obj"].endswith("/hotpkg/1.4.0")
    assert t["pred"].endswith("maxSatisfying")


def test_engine_resolution_broadcast(spark):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from fixtures import ENGINE_INDEX

    edges = spark.createDataFrame(
        [("a", "1.0.0", "node", ">=4"), ("a", "1.0.0", "iojs", "^3.0.0"),
         ("b", "2.0.0", "node", ">=99"), ("b", "2.0.0", "weird", "*")],
        "src_bundle string, src_version string, engine string, "
        "engine_range string")
    got = {(r["engine"], r["engine_range"]): r["resolved_version"]
           for r in resolve_engine_ranges(edges, ENGINE_INDEX).collect()}
    assert got[("node", ">=4")] == "v8.0.0"
    assert got[("iojs", "^3.0.0")] == "v3.3.1"
    assert got[("node", ">=99")] is None
    assert got[("weird", "*")] is None


def test_multimodal_plumbing(spark):
    media = synth_media_df(spark, 40).cache()
    kinds = {r["media_kind"] for r in media.select("media_kind").distinct().collect()}
    assert {"image", "audio", "video", "unknown"} <= kinds

    feats = decode_features(media, dim=16).collect()
    assert len(feats) == 40
    assert all(len(r["features"]) == 16 for r in feats)
    # deterministic fake: same payload -> same features
    again = decode_features(media, dim=16).collect()
    assert {r["media_id"]: r["features"] for r in feats} == \
        {r["media_id"]: r["features"] for r in again}

    thumbs = resize_images(media, 64, 64).collect()
    assert len(thumbs) > 0 and all(r["width"] == 64 for r in thumbs)

    frames = sample_frames(media, every_n=5, max_frames=3).collect()
    n_videos = media.filter(F.col("media_kind") == "video").count()
    assert len(frames) == 3 * n_videos

    with pytest.raises(Exception, match="NotImplementedError|not available"):
        decode_features(media, dim=8, decode_backend="real").collect()


def test_audio_features_real_wav_decode(spark):
    """audio_features REALLY parses WAV containers (stdlib wave): header
    fields and PCM sample stats match the synthesis formula; malformed
    blobs yield ok=false rows, never task failures."""
    import wave as wave_mod

    from npm_extraction_server_spark.operators.multimodal import (
        audio_features,
        synth_wav,
    )

    media = synth_media_df(spark, 30)
    rows = {r["media_id"]: r for r in audio_features(media).collect()}
    assert len(rows) == media.filter(F.col("media_kind") == "audio").count() > 0
    for mid, r in rows.items():
        assert r["ok"] and r["sample_rate"] == 8000 and r["n_channels"] == 1
        expect_frames = 200 + (mid % 7) * 100
        assert r["n_frames"] == expect_frames
        assert r["duration_ms"] == expect_frames * 1000 // 8000
        samples = [((mid * 37 + j * 13) % 2048) - 1024 for j in range(expect_frames)]
        assert r["peak"] == max(abs(s) for s in samples)
        assert r["rms"] == int((sum(s * s for s in samples) / len(samples)) ** 0.5)

    # corrupted audio blob -> ok=false row
    bad = spark.createDataFrame(
        [(999, b"RIFFgarbage-not-a-wav", "audio")],
        "media_id long, payload binary, media_kind string")
    out = audio_features(bad).collect()
    assert len(out) == 1 and out[0]["ok"] is False

    # the synthesized blob is a real WAV by independent parse
    import io
    with wave_mod.open(io.BytesIO(synth_wav(7)), "rb") as wf:
        assert wf.getframerate() == 8000 and wf.getnframes() == 200 + (7 % 7) * 100


def test_ivf_topk_properties(spark):
    """IVF with Lloyd refinement: deterministic across runs, and with
    nprobe == n_centroids (probe everything) it EQUALS exact top-k —
    the approximation comes only from probing fewer lists."""
    from pyspark.sql import functions as F

    from npm_extraction_server_spark.operators.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    a = {(r["query_id"], r["item_id"], r["rank"])
         for r in ivf_topk(emb, q, k=5, n_centroids=8, nprobe=2).collect()}
    b = {(r["query_id"], r["item_id"], r["rank"])
         for r in ivf_topk(emb, q, k=5, n_centroids=8, nprobe=2).collect()}
    assert a == b and len(a) > 0  # deterministic (order-stable seeds + ties)

    full = {(r["query_id"], r["item_id"])
            for r in ivf_topk(emb, q, k=5, n_centroids=8, nprobe=8).collect()}
    exact = {(r["query_id"], r["item_id"])
             for r in cosine_topk(emb, q, k=5).collect()}
    assert full == exact


def test_salted_and_split_head_join(spark):
    from npm_extraction_server_spark.operators.skew import (
        head_keys,
        salted_join,
        split_head_join,
    )

    # skewed probe: key 'hot' holds 90% of rows
    probe = spark.createDataFrame(
        [("hot" if i % 10 < 9 else f"k{i}", i) for i in range(1000)],
        "key string, v long")
    build = spark.createDataFrame(
        [("hot", 1), ("k3", 2), ("k17", 3)], "key string, payload long")

    plain = probe.join(build, "key").select("key", "v", "payload")
    salted = salted_join(probe, build, "key", salt_buckets=4,
                         salt_source="v").select("key", "v", "payload")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0

    split = split_head_join(probe, build, "key", top_k=1) \
        .select("key", "v", "payload")
    assert split.count() == plain.count()
    assert split.exceptAll(plain).count() == 0

    hk = [r["key"] for r in head_keys(probe, "key", 1).collect()]
    assert hk == ["hot"]


def test_cms_one_sided_bound_and_merge(spark):
    """Count-min sketch: estimate >= true count for every key (one-
    sided error), near-exact at low load factor, and shard counter
    merge == global counters (the map-side-combine mergeability that
    caps the shuffle at depth*width rows per shard)."""
    from pyspark.sql import functions as F

    from npm_extraction_server_spark.operators.sketch import (
        cms_counters,
        cms_estimate,
        cms_heavy_hitters,
        cms_merge,
    )

    # 5000 rows, zipf-ish: key k appears 1000//(k+1) times
    rows = [(k,) for k in range(60) for _ in range(1000 // (k + 1))]
    df = spark.createDataFrame(rows, "item long").repartition(8)
    true = {str(k): 1000 // (k + 1) for k in range(60)}

    counters = cms_counters(df, "item")
    est = {r["item"]: r["est_count"]
           for r in cms_estimate(df, counters, "item").collect()}
    assert set(est) == set(true)
    assert all(est[k] >= true[k] for k in true)          # one-sided
    assert sum(est[k] - true[k] for k in true) <= 60 * 40  # low load

    hh = {r["item"] for r in cms_heavy_hitters(df, "item", 250).collect()}
    assert {k for k, n in true.items() if n >= 250} <= hh  # no false negatives

    # shard-wise merge equals global
    shard1 = cms_counters(df.filter(F.col("item") < 30), "item")
    shard2 = cms_counters(df.filter(F.col("item") >= 30), "item")
    merged = {(r["j"], r["bucket"]): r["cnt"]
              for r in cms_merge(shard1.unionByName(shard2)).collect()}
    glob = {(r["j"], r["bucket"]): r["cnt"] for r in counters.collect()}
    assert merged == glob


def test_tfidf_topk_ranking_semantics(spark):
    """TF-IDF: a doc stuffed with a rare query term outranks docs with
    common terms; ties break on doc_id; k bounds the output."""
    from npm_extraction_server_spark.operators.text import tfidf_topk

    rows = [(0, "rare rare rare common"),
            (1, "common common"),
            (2, "common common"),
            (3, "nothing relevant here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_topk(df, ["rare", "common"], k=3).collect()
    assert [r["doc_id"] for r in out] == [0, 1, 2]
    assert out[0]["score"] > out[1]["score"] == out[2]["score"]
    assert [r["rank"] for r in out] == [1, 2, 3]


def test_bm25_length_normalization_beats_stuffing(spark):
    """BM25 vs raw TF-IDF semantics: TF saturation (k1) caps the win
    from repeating a term, and length normalization (b) rewards the
    shorter of two docs with equal term counts."""
    from npm_extraction_server_spark.operators.text import bm25_topk

    filler = " filler" * 60
    rows = [(0, "query query query query query query query query" + filler),
            (1, "query answer"),
            (2, "query answer" + filler)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["score"] for r in bm25_topk(df, ["query"], k=3).collect()}
    # same tf -> shorter doc scores higher
    assert out[1] > out[2]
    # 8x the tf on a longer doc buys < 8x the score (saturation)
    assert out[0] < out[1] * 8


def test_bmp_codec_roundtrip_and_resize():
    """Pure-python BMP codec: encode->decode round-trips pixels
    exactly (incl. rows needing 4-byte padding); nearest-neighbor
    resize picks real source pixels; malformed blobs raise."""
    import pytest as _pytest

    from npm_extraction_server_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
        resize_bmp,
        synth_bmp,
    )

    px = [[(x * 10, y * 20, (x + y) % 256) for x in range(3)]
          for y in range(2)]  # width 3 -> row padding exercised
    w, h, out = decode_bmp(encode_bmp(3, 2, px))
    assert (w, h) == (3, 2) and out == px

    big = synth_bmp(11)
    w0, h0, rows0 = decode_bmp(big)
    w1, h1, rows1 = decode_bmp(resize_bmp(big, 2, 2))
    assert (w1, h1) == (2, 2)
    assert rows1[0][0] == rows0[0][0]  # nearest-neighbor anchors at origin

    for blob in (b"", b"BMshort", b"\x89PNG....", synth_bmp(3)[:-4]):
        with _pytest.raises(ValueError):
            decode_bmp(blob)


def test_image_features_real_bmp_and_stub_split(spark):
    """image_features decodes BMP rows for real and marks compressed
    formats (PNG magic, no codec in container) ok=false; the real
    resize backend yields actual BMP thumbnails for BMPs and null for
    others."""
    from npm_extraction_server_spark.operators.multimodal import (
        attach_media_metadata,
        decode_bmp,
        image_features,
        resize_images,
        synth_bmp,
    )

    rows = [(0, bytearray(synth_bmp(0))), (1, bytearray(synth_bmp(1))),
            (2, bytearray(b"\x89PNG\r\n" + b"x" * 40))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    media = attach_media_metadata(df)
    assert {r["media_kind"] for r in media.collect()} == {"image"}

    feats = {r["media_id"]: r for r in image_features(media).collect()}
    assert feats[0]["ok"] and feats[1]["ok"] and not feats[2]["ok"]
    assert feats[0]["width"] == 4 and feats[0]["height"] == 3
    # mean_r of blob 0: pixels (x*23+y*31)%256 over 4x3
    exp = sum((x * 23 + y * 31) % 256 for x in range(4) for y in range(3)) // 12
    assert feats[0]["mean_r"] == exp

    thumbs = {r["media_id"]: r for r in
              resize_images(media, 2, 2, decode_backend="real").collect()}
    assert decode_bmp(bytes(thumbs[0]["payload"]))[:2] == (2, 2)
    assert thumbs[2]["payload"] is None


def test_codec_capabilities_probe_and_honest_compressed_path():
    """The optional-codec probe reports what actually imports (all off
    in this container), and the PIL leg of image_features raises
    ImportError here — folding into ok=false rather than activating a
    codec that does not exist."""
    import pytest as _pytest

    from npm_extraction_server_spark.operators.multimodal import (
        _pil_image_stats,
        codec_capabilities,
    )

    caps = codec_capabilities()
    assert set(caps) == {"pil", "av", "soundfile"}
    assert caps == {k: False for k in caps}  # this container: all absent
    with _pytest.raises(ImportError):
        _pil_image_stats(b"\x89PNG\r\n" + b"x" * 40)


def test_y4m_codec_and_video_features(spark):
    """Real Y4M video decode: round-trip, per-frame luma means, the
    1->N frame expansion, and ok=false for compressed video."""
    from npm_extraction_server_spark.operators.multimodal import (
        attach_media_metadata,
        decode_y4m,
        encode_y4m,
        synth_y4m,
        video_features,
    )

    frames = [[10] * 16, [200] * 16]
    w, h, out = decode_y4m(encode_y4m(4, 4, frames))
    assert (w, h) == (4, 4) and [list(f) for f in out] == frames

    rows = [(0, bytearray(synth_y4m(0))),
            (1, bytearray(b"\x00\x00\x00\x18ftypmp42" + b"x" * 40))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    media = attach_media_metadata(df)
    assert {r["media_kind"] for r in media.collect()} == {"video"}
    got = video_features(media).collect()
    vid0 = sorted((r for r in got if r["media_id"] == 0),
                  key=lambda r: r["frame_idx"])
    assert len(vid0) == 2 and all(r["ok"] for r in vid0)  # i=0 -> 2 frames
    exp0 = sum((y * 13 + x * 5) % 256 for y in range(4) for x in range(4)) // 16
    assert vid0[0]["mean_y"] == exp0
    bad = [r for r in got if r["media_id"] == 1]
    assert len(bad) == 1 and not bad[0]["ok"]

    import pytest as _pytest
    for blob in (b"", b"YUV4MPEG2 W4\n", encode_y4m(4, 4, frames)[:-3]):
        with _pytest.raises(ValueError):
            decode_y4m(blob)


def test_retrieval_terms_are_data_not_sql(spark):
    """Query terms containing quotes/backslashes must be treated as
    data (column-API literals), never interpolated into SQL text —
    a term like "o'brien" or a lone backslash must neither crash the
    plan nor inject expressions."""
    from npm_extraction_server_spark.operators.text import bm25_topk, tfidf_topk

    df = spark.createDataFrame(
        [(1, "o'brien wrote code"), (2, "plain text here")],
        "doc_id long, text string")
    hostile = ["o'brien", "a\\b", "x) or (1=1"]
    out = tfidf_topk(df, hostile, k=5).collect()
    # tokenizer is [a-z0-9]+ so "o'brien" never matches a token; the
    # point is the plan builds and runs, returning only true matches
    assert all(r["doc_id"] in (1, 2) for r in out)
    out2 = bm25_topk(df, hostile, k=5).collect()
    assert all(r["doc_id"] in (1, 2) for r in out2)


def test_hll_accuracy_merge_and_small_range(spark):
    """HyperLogLog sketch: (a) estimate within the ~1.04/sqrt(m)
    standard error of truth in the raw regime, (b) shard-merge ==
    global sketch (mergeability is cell-wise max), (c) small
    cardinalities hit the linear-counting branch and stay near-exact,
    (d) the whole estimate is deterministic (re-run equal)."""
    from npm_extraction_server_spark.operators.sketch import (
        hll_distinct,
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    n = 20000
    df = spark.range(n).select(
        F.lit("g").alias("grp"), (F.col("id") * 7919).alias("v"))
    est = hll_distinct(df, "grp", "v", p=8).collect()[0]
    # m=256 -> stderr ~6.5%; allow 4 sigma
    assert abs(est["distinct_est"] - n) / n < 0.26
    assert est["n_registers_set"] == 256

    # mergeability: two shards' registers merged == global registers
    s1 = hll_registers(df.filter("id % 2 = 0"), "grp", "v", p=8)
    s2 = hll_registers(df.filter("id % 2 = 1"), "grp", "v", p=8)
    merged = hll_merge(s1.unionByName(s2))
    g = {(r["reg"]): r["mj"]
         for r in hll_registers(df, "grp", "v", p=8).collect()}
    m = {(r["reg"]): r["mj"] for r in merged.collect()}
    assert g == m
    e_merged = hll_estimate(merged, "grp", p=8).collect()[0]
    assert e_merged["distinct_est"] == est["distinct_est"]

    # small range: 40 distinct -> linear counting, near exact
    small = spark.range(40).select(F.lit("s").alias("grp"),
                                   F.col("id").alias("v"))
    es = hll_distinct(small, "grp", "v", p=8).collect()[0]
    assert es["n_registers_set"] < 256
    assert abs(es["distinct_est"] - 40) < 3

    # determinism
    again = hll_distinct(df, "grp", "v", p=8).collect()[0]
    assert again["distinct_est"] == est["distinct_est"]


def test_bloom_no_false_negatives_merge_and_prefilter(spark):
    """Bloom prefilter: every true member survives the probe (no false
    negatives — the prefilter contract), shard-merge == global filter,
    and a roomy filter actually drops most absent probes."""
    from npm_extraction_server_spark.operators.sketch import (
        bloom_bits,
        bloom_merge,
        bloom_might_contain,
    )

    members = spark.range(100).select(
        F.lit("g").alias("grp"), (F.col("id") * 31 + 7).alias("v"))
    bits = bloom_bits(members, "grp", "v", n_slots=24, k=4)  # roomy

    # (a) no false negatives
    kept = bloom_might_contain(bits, members, "grp", "v", n_slots=24, k=4)
    assert kept.count() == 100

    # (b) merge: two shards OR'd == global
    b1 = bloom_bits(members.filter("id < 50"), "grp", "v", n_slots=24, k=4)
    b2 = bloom_bits(members.filter("id >= 50"), "grp", "v", n_slots=24, k=4)
    merged = {(r["slot"]): r["bits"]
              for r in bloom_merge(b1.unionByName(b2)).collect()}
    glob = {(r["slot"]): r["bits"] for r in bits.collect()}
    assert merged == glob

    # (c) absent probes mostly drop (m=1152 bits, n=100, k=4 -> FP ~1e-3)
    absent = spark.range(1000).select(
        F.lit("g").alias("grp"), (F.col("id") + 1_000_000).alias("v"))
    fp = bloom_might_contain(bits, absent, "grp", "v",
                             n_slots=24, k=4).count()
    assert fp < 50


def test_sample_video_frames_roundtrip(spark):
    """Frame sampling re-encodes a VALID Y4M stream: decode -> keep
    every 2nd frame -> encode -> decode again yields exactly the even
    source frames; non-Y4M blobs degrade to ok=false."""
    from npm_extraction_server_spark.operators.multimodal import (
        attach_media_metadata,
        decode_y4m,
        encode_y4m,
        sample_video_frames,
    )

    frames = [[(f * 10 + j) % 256 for j in range(4 * 4)] for f in range(5)]
    blob = encode_y4m(4, 4, frames)
    # blob 2 sniffs as video (mp4 ftyp magic) but has no decodable codec
    mp4ish = b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 16
    media = attach_media_metadata(spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(mp4ish))],
        "media_id long, payload binary"))
    out = {r["media_id"]: r for r in
           sample_video_frames(media, every_n=2).collect()}
    assert out[1]["ok"] and out[1]["n_frames_in"] == 5 \
        and out[1]["n_frames_kept"] == 3
    w, h, kept = decode_y4m(bytes(out[1]["payload"]))
    assert (w, h) == (4, 4)
    assert [list(f) for f in kept] == [frames[0], frames[2], frames[4]]
    assert out[2]["ok"] is False and out[2]["payload"] is None


def test_bloom_null_values_are_not_members(spark):
    """NULL values are dropped at BOTH build and probe (shared
    position derivation): the filter neither crashes on nulls nor
    silently drops non-null members, and null probe rows never pass."""
    from npm_extraction_server_spark.operators.sketch import (
        bloom_bits,
        bloom_might_contain,
    )

    members = spark.createDataFrame(
        [("g", 1), ("g", None), ("g", 2)], "grp string, v long")
    bits = bloom_bits(members, "grp", "v", n_slots=24, k=4)
    kept = bloom_might_contain(bits, members, "grp", "v",
                               n_slots=24, k=4).collect()
    assert sorted(r["v"] for r in kept) == [1, 2]  # nulls out, members in


def test_unigram_logprob_ranks_gibberish_to_tail(spark):
    """LM quality scoring semantics: documents made of corpus-common
    words score higher mean log-prob than a gibberish document of
    hapax tokens; buckets follow the score order (1 = head)."""
    from npm_extraction_server_spark.operators.text import (
        unigram_logprob_scores,
    )

    common = "the quick brown fox jumps over the lazy dog again and again"
    docs = [(i, common) for i in range(8)]
    docs.append((100, "zqxv jkwp mblr ggyh qqzz wvnp"))  # hapax soup
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           unigram_logprob_scores(df, n_buckets=3).collect()}
    assert all(out[i]["avg_logprob"] > out[100]["avg_logprob"]
               for i in range(8))
    assert out[100]["bucket"] == 3 and out[0]["bucket"] == 1
    # deterministic across runs
    again = {r["doc_id"]: r["avg_logprob"] for r in
             unigram_logprob_scores(df, n_buckets=3).collect()}
    assert again == {k: v["avg_logprob"] for k, v in out.items()}


def test_bpe_train_matches_reference_implementation(spark):
    """The distributed BPE trainer must reproduce the reference
    algorithm (pure-Python Sennrich pair-merge over a word-frequency
    dict, written independently here) EXACTLY — merge sequence, ranks,
    and pair counts, including tie-breaks (count desc, pair asc) and
    chained merges through shared symbols."""
    import collections
    import re

    from npm_extraction_server_spark.operators.text import bpe_train

    texts = [
        "the cat sat on the mat",
        "the cats eat the fish",
        "low lower lowest low low",
        "newer newest new new news",
        "aaaa aaa aa a",          # overlapping-pair adversary
    ]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")

    # independent reference implementation
    freq = collections.Counter()
    for t in texts:
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            freq[w] += 1
    vocab = {tuple(w): c for w, c in freq.items()}
    expected = []
    for rank in range(30):
        pairs = collections.Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < 2:
            break
        new_vocab = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
        expected.append((rank, a, b, a + b, n))

    got = [(r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
           for r in bpe_train(docs, n_merges=30, min_freq=2)
           .orderBy("rank").collect()]
    assert got == expected
    assert len(got) > 5  # the corpus genuinely trains several merges


def test_dedup_against_corpus_in_batch_and_cross_batch(spark):
    """In-batch duplicates collapse to the min-id survivor; digests
    already in the corpus table drop the whole group; genuinely-new
    texts survive with their digest attached."""
    from npm_extraction_server_spark.operators.dedup import (
        dedup_against_corpus,
    )

    seen = spark.createDataFrame(
        [("old corpus text",)], "text string").select(
        F.sha2(F.col("text"), 256).alias("digest"))
    batch = spark.createDataFrame(
        [(10, "brand new"), (11, "brand new"),          # in-batch dup
         (12, "old corpus text"),                       # corpus dup
         (13, "also new")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["text"]
           for r in dedup_against_corpus(batch, seen).collect()}
    assert got == {10: "brand new", 13: "also new"}


def test_resample_linear_semantics(spark):
    """Grid covers [ceil(min), max]; exact hits pass through; interior
    points interpolate linearly; points past the last observation
    hold the last value; coincident duplicate observations collapse
    deterministically (MIN)."""
    import datetime as dt

    from npm_extraction_server_spark.operators.asof import resample_linear

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        ("a", at(0), 10.0),      # on-grid observation
        ("a", at(20), 30.0),     # off-grid anchor
        ("a", at(20), 99.0),     # coincident duplicate -> MIN wins
        ("a", at(45), 80.0),     # off-grid anchor past t=40
        ("b", at(7), 5.0),
        ("b", at(13), 11.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp_ntz, v double")
    out = {(r["k"], r["grid_ts"].second + r["grid_ts"].minute * 60):
           r["value"]
           for r in resample_linear(df, "k", "ts", "v",
                                    step_s=10).collect()}
    assert out[("a", 0)] == 10.0                      # exact hit
    assert out[("a", 10)] == 20.0                     # midpoint 10..30
    assert out[("a", 20)] == 30.0                     # MIN of duplicates
    assert out[("a", 30)] == 50.0                     # 30 + (80-30)*10/25
    assert out[("a", 40)] == 70.0                     # 30 + (80-30)*20/25
    assert ("a", 50) not in out                       # grid stops at max
    # b: grid = {10} only (ceil(7/10)*10=10 .. 13)
    assert out[("b", 10)] == 8.0 and ("b", 0) not in out
    assert len(out) == 6


def test_asof_join_directions_match_pandas_merge_asof(spark):
    """backward / forward / nearest pinned EXACTLY against pandas
    merge_asof on a deterministic numeric-time series with coincident
    timestamps and out-of-range edges."""
    import pandas as pd

    from npm_extraction_server_spark.operators.asof import asof_join

    lrows = [(k, t) for k in (1, 2) for t in (0, 5, 10, 15, 20, 25, 33)]
    rrows = [(1, 3, 30.0), (1, 10, 100.0), (1, 24, 240.0),
             (2, 7, 70.0), (2, 26, 260.0)]
    left = spark.createDataFrame(
        [(k, t, k * 100 + t) for k, t in lrows],
        "k long, lt long, payload long")
    right = spark.createDataFrame(rrows, "k long, rt long, v double")

    lpd = pd.DataFrame([(k, t, k * 100 + t) for k, t in lrows],
                       columns=["k", "lt", "payload"]).sort_values("lt")
    rpd = pd.DataFrame(rrows, columns=["k", "rt", "v"]).sort_values("rt")

    for direction in ("backward", "forward", "nearest"):
        want = pd.merge_asof(lpd, rpd, left_on="lt", right_on="rt",
                             by="k", direction=direction)
        want_map = {(r.k, r.lt): (None if pd.isna(r.v) else r.v)
                    for r in want.itertuples()}
        got = asof_join(left, right, by="k", left_time="lt",
                        right_time="rt", value_cols=["v"],
                        direction=direction).collect()
        got_map = {(r["k"], r["lt"]): r["v"] for r in got}
        assert got_map == want_map, direction


def test_resample_linear_key_with_no_grid_instant(spark):
    """A key whose observed range straddles no grid instant yields an
    empty grid (not a sequence crash); other keys are unaffected."""
    import datetime as dt

    from npm_extraction_server_spark.operators.asof import resample_linear

    t0 = dt.datetime(2024, 1, 1)
    rows = [("narrow", t0 + dt.timedelta(seconds=11), 1.0),
            ("narrow", t0 + dt.timedelta(seconds=19), 2.0),
            ("wide", t0, 5.0),
            ("wide", t0 + dt.timedelta(seconds=60), 6.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp_ntz, v double")
    out = resample_linear(df, "k", "ts", "v", step_s=30).collect()
    ks = {r["k"] for r in out}
    assert ks == {"wide"} and len(out) == 3  # 0s, 30s, 60s


def test_asof_join_null_left_time_never_matches(spark):
    from npm_extraction_server_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, None), (1, 7)],
                                 "k long, lt long")
    right = spark.createDataFrame([(1, 5, 50.0)], "k long, rt long, v double")
    for direction, want7 in (("backward", 50.0), ("forward", None),
                             ("nearest", 50.0)):
        got = {r["lt"]: r["v"]
               for r in asof_join(left, right, "k", "lt", "rt", ["v"],
                                  direction=direction).collect()}
        assert got[None] is None, direction
        assert got[7] == want7, direction


def test_resample_locf_step_function(spark):
    """method='locf' holds the previous observation (step function);
    only pre-first-observation grid points fall forward."""
    import datetime as dt

    import pytest as _pytest

    from npm_extraction_server_spark.operators.asof import resample_linear

    t0 = dt.datetime(2024, 1, 1)
    rows = [("a", t0 + dt.timedelta(seconds=5), 10.0),
            ("a", t0 + dt.timedelta(seconds=28), 40.0),
            ("a", t0 + dt.timedelta(seconds=41), 70.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp_ntz, v double")
    out = {r["grid_ts"].second: r["value"]
           for r in resample_linear(df, "k", "ts", "v", step_s=10,
                                    method="locf").collect()}
    assert out == {10: 10.0, 20: 10.0, 30: 40.0, 40: 40.0}
    with _pytest.raises(ValueError, match="unknown method"):
        resample_linear(df, "k", "ts", "v", method="zigzag")


def test_validate_expectations_all_rule_kinds(spark):
    """Every rule kind flags exactly its planted violations; passing
    rows produce nothing; the row-local rules run as ONE scan pass
    (no join/exchange for them); violation_counts summarizes."""
    from npm_extraction_server_spark.operators.quality import (
        validate,
        violation_counts,
    )

    rows = [
        (1, 10, "en", 5.0),      # clean
        (2, None, "en", 5.0),    # not_null(v)
        (3, 10, "xx", 5.0),      # accepted(lang)
        (4, 10, "en", 99.0),     # range(score)
        (5, 10, "en", 5.0),      # unique(v): 5 and 1 share v=10 with 3,4? no ->
        (6, 10, "en", -1.0),     # range(score) low side
    ]
    df = spark.createDataFrame(
        rows, "id long, v long, lang string, score double")
    dim = spark.createDataFrame([(1,), (3,), (4,), (5,), (6,)], "id long")
    out = validate(df, [
        ("not_null", "v"),
        ("accepted", "lang", ["en", "de"]),
        ("range", "score", 0.0, 50.0),
        ("unique", "v"),
        ("expr", "id_pos", "id > 0"),
        ("fk", "id", dim, "id"),
    ], key_col="id")
    got = {(r["rule"], r["key"]) for r in out.collect()}
    assert got == {
        ("not_null(v)", "2"),
        ("accepted(lang)", "3"),
        ("range(score,0.0,50.0)", "4"), ("range(score,0.0,50.0)", "6"),
        # v=10 shared by ids 1,3,4,5,6 -> all five flagged
        ("unique(v)", "1"), ("unique(v)", "3"), ("unique(v)", "4"),
        ("unique(v)", "5"), ("unique(v)", "6"),
        ("fk(id->id)", "2"),          # id 2 missing from the dim
    }
    counts = {r["rule"]: r["n_violations"]
              for r in violation_counts(out).collect()}
    assert counts["unique(v)"] == 5 and counts["not_null(v)"] == 1

    # row-local rules alone: single scan, no exchange/join
    row_only = validate(df, [("not_null", "v"),
                             ("range", "score", 0.0, 50.0)], key_col="id")
    plan = row_only._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_auto_salted_join_splits_paths_and_matches_plain(spark):
    """Selective salting: a planted hot key takes the salted path
    (build-side rows replicated salt_buckets times for it), the cold
    tail takes the plain join, and the union equals the plain join
    exactly."""
    from npm_extraction_server_spark.operators.skew import auto_salted_join

    # key 7 hot (600 rows), keys 0..5 cold (10 each)
    probe = spark.range(600).selectExpr("7 AS k", "id AS payload") \
        .unionByName(spark.range(60).selectExpr(
            "CAST(id % 6 AS LONG) AS k", "id + 1000 AS payload"))
    build = spark.createDataFrame([(i, f"dim{i}") for i in range(8)],
                                  "k long, name string")
    out = auto_salted_join(probe, build, "k", hot_min_count=100,
                           salt_buckets=4, salt_source="payload")
    plain = probe.join(build, "k")
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, plain.collect()))
    # row counts per key survive exactly (no loss, no double-count)
    counts = {r["k"]: r["n"] for r in
              out.groupBy("k").agg(F.count("*").alias("n")).collect()}
    assert counts[7] == 600 and all(counts[i] == 10 for i in range(6))


def test_inverted_index_positions_and_min_df(spark):
    """Postings carry ascending 0-based positions of the word-regex
    tokens; df counts documents (not occurrences); min_df prunes."""
    from npm_extraction_server_spark.operators.text import inverted_index

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha! gamma"), (2, "beta gamma gamma"),
         (3, "delta")],
        "doc_id long, text string")
    rows = {(r.term, r.doc_id): (r.df, r.tf, r.positions)
            for r in inverted_index(docs).collect()}
    assert rows[("alpha", 1)] == (1, 2, "0,2")
    assert rows[("beta", 1)] == (2, 1, "1")
    assert rows[("beta", 2)] == (2, 1, "0")
    assert rows[("gamma", 2)] == (2, 2, "1,2")
    assert rows[("delta", 3)] == (1, 1, "0")

    pruned = {r.term for r in inverted_index(docs, min_df=2).collect()}
    assert pruned == {"beta", "gamma"}


def test_hashed_features_signed_and_bigrams(spark):
    """Feature hashing: unigrams + bigrams land in the 2^n space with
    the md5 sign trick; identical docs get identical rows; zero-net
    buckets are dropped."""
    import hashlib

    from npm_extraction_server_spark.operators.text import hashed_features

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "alpha beta alpha"), (3, "")],
        "doc_id long, text string")
    rows = {}
    for r in hashed_features(docs, n_bits=6).collect():
        rows.setdefault(r.doc_id, {})[r.feat] = r.val
    assert rows.get(1) == rows.get(2)
    assert 3 not in rows

    def hx(term):
        return int(hashlib.md5(term.encode()).hexdigest()[:12], 16)

    exp = {}
    for term in ["alpha", "beta", "alpha", "alpha beta", "beta alpha"]:
        h = hx(term)
        exp[h % 64] = exp.get(h % 64, 0) + (1 if (h // 64) % 2 == 0 else -1)
    exp = {k: v for k, v in exp.items() if v != 0}
    assert rows[1] == exp


def test_sample_k_per_group_exact_and_stable(spark):
    """Exactly min(k, n) per group; the picked set is stable when
    unrelated rows are appended (hash order, not position)."""
    from npm_extraction_server_spark.operators.sampling import (
        sample_k_per_group,
    )

    rows = [(i, "a") for i in range(100)] + [(200 + i, "b") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    got = sample_k_per_group(docs, k=10).collect()
    by = {}
    for r in got:
        by.setdefault(r.source, set()).add(r.doc_id)
    assert len(by["a"]) == 10 and len(by["b"]) == 3

    docs2 = spark.createDataFrame(rows + [(500 + i, "c") for i in range(5)],
                                  "doc_id long, source string")
    got2 = {r.doc_id for r in sample_k_per_group(docs2, k=10).collect()
            if r.source == "a"}
    assert got2 == by["a"]

    import pytest

    with pytest.raises(ValueError, match="positive"):
        sample_k_per_group(docs, k=0)


def test_setsim_join_exact_vs_bruteforce(spark):
    """Prefix-filtered exact set-similarity join equals brute-force
    all-pairs Jaccard at several thresholds (losslessness), including
    pairs sharing only COMMON tokens (prefix must still catch them
    when Jaccard clears the bar) and empty docs."""
    from npm_extraction_server_spark.operators.dedup import setsim_join

    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox jumped over a lazy dog",
        3: "lorem ipsum dolor sit amet consectetur",
        4: "lorem ipsum dolor sit amet elit",
        5: "the the the the",
        6: "the",
        7: "",
        8: "quick brown fox",
    }
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")

    def brute(num, den):
        import re
        sets = {k: set(re.findall(r"[a-z0-9]+", v.lower()))
                for k, v in texts.items()}
        out = {}
        ks = sorted(sets)
        for i, a in enumerate(ks):
            for b in ks[i + 1:]:
                if not sets[a] or not sets[b]:
                    continue
                inter = len(sets[a] & sets[b])
                if (den + num) * inter >= num * (len(sets[a]) + len(sets[b])):
                    out[(a, b)] = (inter, len(sets[a]), len(sets[b]))
        return out

    for num, den in ((3, 5), (1, 2), (9, 10)):
        got = {(r.id_a, r.id_b): (r.inter, r.n_a, r.n_b)
               for r in setsim_join(docs, num, den).collect()}
        assert got == brute(num, den), (num, den)
    # (5, 6) share only 'the' yet Jaccard = 1 -> must be found
    assert (5, 6) in brute(1, 2)

    import pytest

    with pytest.raises(ValueError, match="num"):
        setsim_join(docs, 0, 5)


def test_ivfpq_recall_report_floor(spark):
    """The IVF+PQ recall instrument: per-query recall@k vs exact brute
    force. Floor: mean >= 0.7 on the driver corpus at nprobe=8 (the
    measured value is ~0.77 — near-uniform embeddings scatter true
    neighbors across IVF cells, so this is the honest regime, not a
    tuning failure); every hits count is within [0, k]."""
    from npm_extraction_server_spark.operators.similarity import (
        ivfpq_recall_report,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    rep = ivfpq_recall_report(emb, n_queries=20, k=10, n_centroids=16,
                              nprobe=8, m_sub=8, ksub=16,
                              rerank=256).collect()
    assert len(rep) == 20
    assert all(0 <= r.hits <= r.k for r in rep)
    mean = sum(r.recall for r in rep) / len(rep)
    assert mean >= 0.7, mean


def _encode_png_rgb(pixels):
    """Minimal pure-stdlib PNG encoder (8-bit RGB, filter 0) — builds
    a REAL spec-valid PNG so the compressed-image legs are exercised
    without any codec library in the fixture path."""
    import struct
    import zlib

    h = len(pixels)
    w = len(pixels[0])

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + b"".join(bytes(px) for px in row) for row in pixels)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_image_features_png_leg_honest_split(spark):
    """The compressed-image (PNG/JPEG) leg of image_features: with no
    PIL in the container the PNG row comes back ok=false (honest
    capability split, never a task failure); the codec_capabilities
    probe agrees with what the leg actually did."""
    from npm_extraction_server_spark.operators.multimodal import (
        codec_capabilities,
        image_features,
    )

    png = _encode_png_rgb([[(10, 20, 30), (10, 20, 30)],
                           [(50, 60, 70), (90, 100, 110)]])
    media = spark.createDataFrame([(1, "image", bytearray(png))],
                                  "media_id long, media_kind string, "
                                  "payload binary")
    row = image_features(media).collect()[0]
    caps = codec_capabilities()
    assert row["ok"] is bool(caps["pil"])
    if not caps["pil"]:
        assert row["width"] is None and row["mean_r"] is None


def test_image_features_pil_leg_exact_means():
    """Round-4 stretch item: when the driver image ever gains PIL,
    the compressed leg must auto-activate with the SAME integer-means
    contract as the BMP path. Skipped (not failed) while the
    container has no PIL — it runs unmodified the day the library
    appears."""
    import pytest

    pytest.importorskip("PIL.Image")
    from npm_extraction_server_spark.operators.multimodal import (
        _pil_image_stats,
    )

    png = _encode_png_rgb([[(10, 20, 30), (10, 20, 30)],
                           [(50, 60, 70), (90, 100, 110)]])
    w, h, mr, mg, mb = _pil_image_stats(png)
    # floor integer channel means over the 4 pixels — the BMP contract
    assert (w, h) == (2, 2)
    assert (mr, mg, mb) == ((10 + 10 + 50 + 90) // 4,
                            (20 + 20 + 60 + 100) // 4,
                            (30 + 30 + 70 + 110) // 4)


def test_containment_join_asymmetric_and_lossless(spark):
    """containment_join: directed — a short doc inside a long one
    scores containment 1 in one direction only (the pair Jaccard
    misses at the same threshold); prefix+size pruning loses nothing
    vs brute force on a corpus with common-token noise."""
    from npm_extraction_server_spark.operators.dedup import (
        containment_join,
        setsim_join,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"),
         (2, "alpha beta gamma delta epsilon zeta eta theta"),
         (3, "omega psi chi"),
         (4, "the of and to in is the of and to")],  # common-token noise
        "doc_id long, text string")
    got = {(r.id_a, r.id_b): (r.inter, r.n_a)
           for r in containment_join(docs, 4, 5).collect()}
    assert (1, 2) in got and got[(1, 2)] == (3, 3)  # containment 1.0
    assert (2, 1) not in got                         # 3/8 < 4/5
    assert all(a != b for a, b in got)
    # the same pair fails symmetric Jaccard at 4/5 (3/8)
    js = {(r.id_a, r.id_b) for r in setsim_join(docs, 4, 5).collect()}
    assert (1, 2) not in js

    # brute-force equivalence on the same corpus
    import itertools

    toksets = {r.doc_id: set(r.text.split())
               for r in docs.collect()}
    brute = {(a, b)
             for a, b in itertools.permutations(toksets, 2)
             if 5 * len(toksets[a] & toksets[b]) >= 4 * len(toksets[a])}
    assert set(got) == brute


def test_dsir_logweights_matches_pure_python(spark):
    import hashlib
    import math
    import re
    from decimal import Decimal

    from npm_extraction_server_spark.operators.text import dsir_logweights

    docs = [(0, "the quick brown fox jumps over the lazy dog"),
            (1, "spark shuffles the partitions across executors"),
            (2, "the the the the spam spam spam"),
            (3, "quick brown dog runs"),
            (4, "unrelated tokens entirely zebra quark")]
    raw = spark.createDataFrame(docs, "doc_id long, text string")
    target = raw.filter("doc_id IN (0, 3)")

    def grams(text):
        ws = re.findall(r"[a-z0-9]+", text.lower())
        return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    def bucket(term):
        return int(hashlib.md5(term.encode()).hexdigest()[:12], 16) % 4096

    rawb = {i: [bucket(g) for g in grams(t)] for i, t in docs}
    rc, tc = {}, {}
    for i, bs in rawb.items():
        for b in bs:
            rc[b] = rc.get(b, 0) + 1
            if i in (0, 3):
                tc[b] = tc.get(b, 0) + 1
    nr, nt = float(sum(rc.values())), float(sum(tc.values()))
    lr = {b: round(math.log((tc.get(b, 0) + 1.0) / (nt + 4096.0))
                   - math.log((c + 1.0) / (nr + 4096.0)), 8)
          for b, c in rc.items()}
    want = {}
    for i, bs in rawb.items():
        s = sum(Decimal(str(lr[b])) for b in bs)
        want[i] = (len(bs), round(float(s), 6))

    got = {r.doc_id: (r.n_grams, r.logw)
           for r in dsir_logweights(raw, target).collect()}
    assert got == want
    # target-like docs outrank the spam and the unrelated doc
    assert got[0][1] > got[2][1] and got[3][1] > got[4][1]


def test_duplicate_spans_exact_substr_criterion(spark):
    from npm_extraction_server_spark.operators.text import duplicate_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = [
        (0, f"unique opening words here {shared} and a unique tail x"),
        (1, f"totally different start {shared} different ending words"),
        # doc 2 repeats a 9-token run -> two overlapping duplicated
        # grams within ONE doc must merge into one span of n_grams=2
        (2, "p q r s t u v w x p q r s t u v w x"),
        (3, "no duplicated content anywhere in this document at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.doc_id, r.start_tok, r.end_tok, r.n_grams)
           for r in duplicate_spans(df, k=8).collect()}
    # docs 0/1: the shared 8-gram starts at token 4/3 respectively
    assert (0, 4, 11, 1) in got and (1, 3, 10, 1) in got
    # doc 2: tokens 0..17 = two copies of a 9-token pattern; every
    # 8-gram whose content repeats is duplicated; spans merge
    d2 = sorted(x for x in got if x[0] == 2)
    assert d2 and all(s[3] >= 1 for s in d2)
    assert not any(x[0] == 3 for x in got)

    # cross-check doc 2 against a pure-python recount
    toks = docs[2][1].split()
    from collections import Counter
    allgrams = []
    for i, t in docs:
        ws = t.lower().split()
        allgrams += [" ".join(ws[j:j + 8]) for j in range(len(ws) - 7)]
    cnt = Counter(allgrams)
    dup_pos = [j for j in range(len(toks) - 7)
               if cnt[" ".join(w.lower() for w in toks[j:j + 8])] > 1]
    spans, cur = [], None
    for p in dup_pos:
        if cur and p == cur[1] + 1:
            cur = (cur[0], p, cur[2] + 1)
        else:
            if cur:
                spans.append(cur)
            cur = (p, p, 1)
    if cur:
        spans.append(cur)
    want2 = {(2, s, e + 7, n) for s, e, n in spans}
    assert {x for x in got if x[0] == 2} == want2


def test_domain_kl_matches_pure_python(spark):
    import hashlib
    import math
    import re
    from decimal import Decimal

    from npm_extraction_server_spark.operators.text import domain_kl

    docs = [("web", "the cat sat on the mat"),
            ("web", "a cat and a dog"),
            ("wiki", "the encyclopedia of cats and dogs"),
            ("wiki", "feline canine taxonomy article"),
            ("mirror", "the cat sat on the mat"),
            ("mirror", "a cat and a dog")]
    df = spark.createDataFrame(docs, "source string, text string")

    B = 4096
    cnt, tot = {}, {}
    for dom, t in docs:
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            b = int(hashlib.md5(w.encode()).hexdigest()[:12], 16) % B
            cnt[(dom, b)] = cnt.get((dom, b), 0) + 1
            tot[dom] = tot.get(dom, 0) + 1

    def kl(a, b):
        s = Decimal(0)
        for t_ in range(B):
            pa = (cnt.get((a, t_), 0) + 1.0) / (tot[a] + B)
            pb = (cnt.get((b, t_), 0) + 1.0) / (tot[b] + B)
            la = round(math.log(pa), 8)
            lb = round(math.log(pb), 8)
            s += Decimal(str(round(pa * (la - lb), 12)))
        return round(float(s), 6)

    got = {(r.domain_a, r.domain_b): (r.kl_ab, r.kl_ba)
           for r in domain_kl(df).collect()}
    doms = sorted(tot)
    want = {(a, b): (kl(a, b), kl(b, a))
            for i, a in enumerate(doms) for b in doms[i + 1:]}
    assert got == want
    # mirror == web corpus exactly -> KL ~ 0 both ways; web vs wiki > 0
    assert abs(got[("mirror", "web")][0]) < 1e-9
    assert got[("web", "wiki")][0] > 0 and got[("web", "wiki")][1] > 0


def test_events_markov_transitions(spark):
    from datetime import datetime

    from npm_extraction_server_spark.operators.suite import ORACLE_SQL

    assert "events_markov" in ORACLE_SQL
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [
        (1, datetime(2024, 1, 1, 0, 0), 1, "view"),
        (2, datetime(2024, 1, 1, 0, 1), 1, "click"),
        (3, datetime(2024, 1, 1, 0, 2), 1, "view"),
        (4, datetime(2024, 1, 1, 0, 0), 2, "view"),
        (5, datetime(2024, 1, 1, 0, 5), 2, "click"),
        # user 3: single event -> contributes no transition
        (6, datetime(2024, 1, 1, 0, 0), 3, "error"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.select("user_id", "event_type",
                       F.lead("event_type").over(w).alias("next_type"))
             .filter(F.col("next_type").isNotNull()))
    cnt = (pairs.groupBy(F.col("event_type").alias("prev_type"),
                         "next_type").agg(F.count("*").alias("n")))
    wp = Window.partitionBy("prev_type")
    got = {(r.prev_type, r.next_type): (r.n, r.p)
           for r in cnt.select(
               "prev_type", "next_type", "n",
               F.round(F.col("n").cast("double")
                       / F.sum("n").over(wp).cast("double"), 6)
               .alias("p")).collect()}
    # view -> click twice (users 1 and 2), click -> view once; rows
    # normalize per prev_type; the lone error event adds nothing
    assert got == {("view", "click"): (2, 1.0),
                   ("click", "view"): (1, 1.0)}


def test_readability_scores_hand_computed(spark):
    from npm_extraction_server_spark.operators.text import (
        readability_scores)

    docs = [(0, "The cat sat. The dog ran! Did it?"),
            (1, "supercalifragilisticexpialidocious"),
            (2, "")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in readability_scores(df).collect()}

    # doc 0: 3 sentences, 8 words, syllables: the=1 cat=1 sat=1 the=1
    # dog=1 ran=1 did=1 it=1 -> 8; wps=8/3, spw=1
    r0 = got[0]
    assert (r0.n_words, r0.n_sentences, r0.n_syllables) == (8, 3, 8)
    wps, spw = 8 / 3, 1.0
    assert r0.flesch_ease == round(206.835 - 1.015 * wps - 84.6 * spw, 4)
    assert r0.fk_grade == round(0.39 * wps + 11.8 * spw - 15.59, 4)

    # doc 1: one word, vowel groups: u-e-a-i-a-i-i-i-e-ia-i-o-iou = 13
    r1 = got[1]
    assert (r1.n_words, r1.n_sentences, r1.n_syllables) == (1, 1, 13)

    # doc 2: empty -> zero counts, spw guarded to 0
    r2 = got[2]
    assert (r2.n_words, r2.n_sentences, r2.n_syllables) == (0, 0, 0)


def test_zipf_fit_hand_computed(spark):
    import math

    from npm_extraction_server_spark.operators.text import zipf_fit

    # one lang, engineered counts: aa x6, bb x3, cc x2, dd x1
    text = " ".join(["aa"] * 6 + ["bb"] * 3 + ["cc"] * 2 + ["dd"])
    df = spark.createDataFrame([(0, text, "en")],
                               "doc_id long, text string, lang string")
    rows = zipf_fit(df, top_ranks=64).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.lang, r.vocab_size, r.total_tokens, r.ranks_used) == \
        ("en", 4, 12, 4)
    # independent OLS on the same 8-dp ln grid
    pts = [(round(math.log(i + 1), 8), round(math.log(c), 8))
           for i, c in enumerate([6, 3, 2, 1])]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    slope = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    intercept = round((sy - slope * sx) / n, 6)
    assert r.zipf_slope == slope
    assert r.zipf_intercept == intercept


def test_heaps_curve_hand_computed(spark):
    import math

    from npm_extraction_server_spark.operators.text import heaps_curve

    # 32 docs: doc i contributes tokens (t0 .. t_{i%4}) so vocabulary
    # saturates at 4 while tokens keep growing — Heaps beta must FALL
    docs = [(i, " ".join(f"t{j}" for j in range(i % 4 + 1)), "en")
            for i in range(32)]
    df = spark.createDataFrame(docs,
                               "doc_id long, text string, lang string")
    rows = {r.doc_rank: r for r in heaps_curve(df, every=8).collect()}
    assert sorted(rows) == [8, 16, 24, 32]
    # brute-force cumulative walk
    seen, cum_tok, expect = set(), 0, {}
    for i in range(32):
        toks = [f"t{j}" for j in range(i % 4 + 1)]
        cum_tok += len(toks)
        seen.update(toks)
        expect[i + 1] = (cum_tok, len(seen))
    for rk in (8, 16, 24, 32):
        r = rows[rk]
        assert (r.cum_tokens, r.cum_vocab) == expect[rk]
        assert r.heaps_beta == round(
            math.log(expect[rk][1]) / math.log(expect[rk][0]), 6)
    assert rows[32].heaps_beta < rows[8].heaps_beta


def test_kn_bigram_hand_computed(spark):
    from collections import Counter

    from npm_extraction_server_spark.operators.text import kn_bigram_lm

    corpus = ["a b a b c", "b a b d", "a b"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)],
                               "doc_id long, text string")
    got = {(r.w1, r.w2): r for r in kn_bigram_lm(df, top=100).collect()}

    # independent pure-python interpolated KN
    bigrams = Counter()
    for t in corpus:
        ws = t.split()
        bigrams.update(zip(ws, ws[1:]))
    c1 = Counter()
    n1p_fwd = Counter()
    n1p_bwd = Counter()
    for (w1, w2), c in bigrams.items():
        c1[w1] += c
        n1p_fwd[w1] += 1
        n1p_bwd[w2] += 1
    B = len(bigrams)
    assert set(got) == set(bigrams)
    for (w1, w2), c in bigrams.items():
        r = got[(w1, w2)]
        pcont = round(n1p_bwd[w2] / B, 8)
        lam = round(0.75 * n1p_fwd[w1] / c1[w1], 8)
        r1 = round((c - 0.75) / c1[w1], 8)
        assert r.c12 == c and r.c1 == c1[w1]
        assert r.p_cont == pcont and r.lambda_w1 == lam
        assert r.p_kn == round(r1 + round(lam * pcont, 8), 8)


def test_mmr_select_diversity(spark):
    from npm_extraction_server_spark.operators.similarity import mmr_select

    # item 1 and item 2 are near-twins, both highly relevant; item 3
    # is less relevant but orthogonal. Pure relevance ranks 1,2,3 —
    # MMR at lam=0.5 must pick 1 then SKIP the twin for 3 (at
    # lam=0.7 relevance still dominates: twin floor 0.7*rel-0.3
    # beats item 3's ceiling 0.7*rel3 — so 0.5 is the regime where
    # the penalty term decides).
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),        # query
        (1, [0.99, 0.1, 0.0, 0.0]),       # best
        (2, [0.98, 0.12, 0.0, 0.0]),      # twin of 1
        (3, [0.5, 0.0, 0.8, 0.0]),        # diverse
        (4, [0.4, 0.0, 0.0, 0.9]),        # diverse, weaker
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>")
    got = mmr_select(df, df.filter("vec_id = 0"), k=3, pool=4,
                     lam=0.5).orderBy("round").collect()
    assert [r["round"] for r in got] == [1, 2, 3]
    assert got[0].item_id == 1
    assert got[1].item_id == 3          # NOT the twin
    assert got[2].item_id == 4

    # independent greedy recompute on the 6-dp grid
    import math

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return round(num / (math.sqrt(sum(x * x for x in a))
                            * math.sqrt(sum(x * x for x in b))), 6)

    vecs = {i: [float(x) for x in v] for i, v in rows}
    # replicate float32 storage: spark stores array<float>
    import struct
    vecs = {i: [struct.unpack('f', struct.pack('f', x))[0] for x in v]
            for i, v in vecs.items()}
    rel = {i: cos(vecs[i], vecs[0]) for i in (1, 2, 3, 4)}

    # the operator's score arithmetic is exact decimal + HALF_UP —
    # double round() here is the half-ulp trap the fix removed
    from decimal import ROUND_HALF_UP, Decimal

    def dscore(rel_v, ms_v):
        raw = (Decimal("0.500000") * Decimal(f"{rel_v:.6f}")
               - Decimal("0.500000") * Decimal(f"{ms_v:.6f}"))
        return float(raw.quantize(Decimal("0.000001"),
                                  rounding=ROUND_HALF_UP))

    sel, remaining = [], {1, 2, 3, 4}
    scores = {}
    for rnd in range(1, 4):
        best = None
        for i in sorted(remaining):
            ms = max((cos(vecs[i], vecs[s]) for s in sel), default=0.0)
            sc = dscore(rel[i], ms)
            if best is None or sc > best[1]:
                best = (i, sc)
        sel.append(best[0])
        scores[rnd] = best
        remaining.discard(best[0])
    for r in got:
        assert (r.item_id, r.score) == scores[r["round"]]


def test_events_changepoint_cusum(spark):
    import datetime as dt
    import math

    from npm_extraction_server_spark.operators.suite import (
        events_changepoint)

    # 40 quiet hours at rate 2, then 8 hours at rate 6: no single
    # hour is a 2-sigma outlier trigger at 4-sigma-CUSUM scale, but
    # the SUSTAINED shift accumulates — alarm must fire in the shift
    # window and the top hour must be the last shifted hour.
    base = dt.datetime(2020, 1, 1)
    evs, eid = [], 0
    rates = [2] * 40 + [6] * 8
    for h, rate in enumerate(rates):
        for j in range(rate):
            evs.append((eid, base + dt.timedelta(hours=h, minutes=j),
                        f"u{j}", "click", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        evs, "event_id long, ts timestamp, user_id string, "
             "event_type string, value double, props string")

    import tempfile
    sfdir = tempfile.mkdtemp(prefix="cusum_sf_")
    df.write.parquet(f"{sfdir}/events.parquet")
    got = events_changepoint(spark, sfdir).collect()
    assert all(r.event_type == "click" for r in got)
    assert len(got) == 5

    # independent CUSUM
    n = len(rates)
    mean = sum(rates) / n
    k = round(mean, 6)
    var = sum(x * x for x in rates) / n - (sum(rates) / n) ** 2
    hthr = round(4.0 * math.sqrt(var), 6)
    s, best = 0.0, []
    for h, x in enumerate(rates):
        s = max(0.0, s + (x - k))
        best.append((round(s, 6), h))
    top = sorted(best, key=lambda t: (-t[0], t[1]))[:5]
    got_sorted = sorted(got, key=lambda r: (-r.cusum, r.hour))
    assert [r.cusum for r in got_sorted] == [t[0] for t in top]
    # CUSUM grows through the shift: top-5 = the last 5 shifted hours
    # (absolute epoch-hours, so assert the relative offsets)
    assert top[0][1] == n - 1
    rel = [r.hour - got_sorted[0].hour for r in got_sorted]
    assert rel == [t[1] - top[0][1] for t in top]
    assert all(r.alarm for r in got)
    assert all(r.threshold == hthr for r in got)


def test_events_seasonality_diurnal(spark):
    import datetime as dt

    from npm_extraction_server_spark.operators.suite import (
        events_seasonality)

    # 10 days of a strong diurnal profile (rate = hod % 4, so the
    # GLOBAL-mean scan would flag every daily peak); one planted
    # anomaly (hod 2 of day 7 at rate 40). Seasonal adjustment must
    # flag ONLY the planted hour.
    base = dt.datetime(2020, 1, 1)
    evs, eid = [], 0
    for day in range(10):
        for hod in range(24):
            rate = 40 if (day == 7 and hod == 2) else hod % 4
            for j in range(rate):
                evs.append((eid, base + dt.timedelta(days=day,
                                                     hours=hod,
                                                     minutes=j % 60),
                            f"u{j}", "click", 1.0, "{}"))
                eid += 1
    df = spark.createDataFrame(
        evs, "event_id long, ts timestamp, user_id string, "
             "event_type string, value double, props string")
    import tempfile
    sfdir = tempfile.mkdtemp(prefix="seas_sf_")
    df.write.parquet(f"{sfdir}/events.parquet")
    got = events_seasonality(spark, sfdir).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.event_type, r.hod, r.n) == ("click", 2, 40)

    # independent recompute on the operator's ACTUAL span: the dense
    # grid runs from the first OBSERVED hour to the last — hod 0 has
    # rate 0, so day-0 hour-0 precedes the span (first event is day-0
    # hod-1, last is day-9 hod-23 -> absolute hours 1..239)
    def rate(h):
        d, hod = divmod(h, 24)
        return 40 if (d == 7 and hod == 2) else hod % 4

    hours = list(range(1, 240))
    from collections import defaultdict
    by_hod = defaultdict(list)
    for h in hours:
        by_hod[h % 24].append(rate(h))
    mus = {hod: round(sum(xs) / len(xs), 6)
           for hod, xs in by_hod.items()}
    resids = [rate(h) - mus[h % 24] for h in hours]
    thr = round(4.0 * sum(x * x for x in resids) / len(resids), 6)
    assert r.threshold == thr
    assert r.seasonal_mean == mus[2]
    assert r.resid == round(40 - mus[2], 6)


def test_langid_eval_confusion(spark):
    from npm_extraction_server_spark.operators.suite import (
        text_langid_eval)

    docs = [
        (0, "the cat and the dog of to in", "en"),     # en -> en
        (1, "el perro de la casa y los gatos", "es"),  # es -> es
        (2, "la de y los que con una el", "en"),       # en -> es (miss)
        (3, "zzz qqq www", "de"),                      # de -> und
    ]
    df = spark.createDataFrame(docs,
                               "doc_id long, text string, lang string")
    import tempfile
    sfdir = tempfile.mkdtemp(prefix="lid_sf_")
    df.write.parquet(f"{sfdir}/documents.parquet")
    got = {(r.gold, r.pred): r for r in
           text_langid_eval(spark, sfdir).collect()}
    assert set(got) == {("en", "en"), ("en", "es"), ("es", "es"),
                        ("de", "und")}
    # en row-normalizes over 2 gold-en docs; pred-es column has one
    # true es and one mislabeled en
    assert got[("en", "en")].recall_share == 0.5
    assert got[("en", "es")].recall_share == 0.5
    assert got[("en", "es")].precision_share == 0.5
    assert got[("es", "es")].precision_share == 0.5
    assert got[("de", "und")].recall_share == 1.0
    assert got[("de", "und")].precision_share == 1.0


def test_good_turing_hand_computed(spark):
    from npm_extraction_server_spark.operators.text import good_turing

    # counts: aa x1, bb x1, cc x2, dd x3, ee x3 -> n_1=2, n_2=1, n_3=2
    df = spark.createDataFrame(
        [(0, "aa bb cc dd ee", "en"), (1, "cc dd ee dd ee", "en")],
        "doc_id long, text string, lang string")
    rows = {r.r: r for r in good_turing(df, max_freq=10).collect()}
    assert sorted(rows) == [1, 2, 3]
    assert (rows[1].n_r, rows[2].n_r, rows[3].n_r) == (2, 1, 2)
    # r* = (r+1) n_{r+1} / n_r ; N = 10, n1 = 2 -> P0 = 0.2
    assert rows[1].r_star == round(2 * 1 / 2, 8)
    assert rows[2].r_star == round(3 * 2 / 1, 8)
    assert rows[3].r_star is None          # no n_4
    assert all(r.unseen_mass == 0.2 for r in rows.values())

    # rare-tail semantics: with max_freq=2 keep the two SMALLEST
    # observed frequencies even when they are not 1 and 2
    df2 = spark.createDataFrame(
        [(0, " ".join(["xx"] * 5 + ["yy"] * 5 + ["zz"] * 9), "en")],
        "doc_id long, text string, lang string")
    rows2 = {r.r: r for r in good_turing(df2, max_freq=2).collect()}
    assert sorted(rows2) == [5, 9]
    assert rows2[5].unseen_mass == 0.0     # no singletons


def test_events_burstiness_regimes(spark):
    import datetime as dt
    import math

    from npm_extraction_server_spark.operators.suite import (
        events_burstiness)

    base = dt.datetime(2020, 1, 1)
    evs, eid = [], 0
    # periodic: one user, constant 60 s gaps -> sigma=0 -> B = -1
    for i in range(50):
        evs.append((eid, base + dt.timedelta(seconds=60 * i),
                    "u0", "tick", 1.0, "{}"))
        eid += 1
    # bursty: gaps alternate 1 s within bursts, 3600 s between
    t = base
    gaps_b = []
    for burst in range(10):
        for j in range(5):
            g = 1 if j else 3600
            if burst == 0 and j == 0:
                g = 0
            t = t + dt.timedelta(seconds=g)
            if not (burst == 0 and j == 0):
                gaps_b.append(g)
            evs.append((eid, t, "u1", "spike", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        evs, "event_id long, ts timestamp, user_id string, "
             "event_type string, value double, props string")
    import tempfile
    sfdir = tempfile.mkdtemp(prefix="burst_sf_")
    df.write.parquet(f"{sfdir}/events.parquet")
    got = {r.event_type: r for r in events_burstiness(spark, sfdir)
           .collect()}
    assert got["tick"].burstiness == -1.0
    assert got["tick"].std_gap_s == 0.0
    # independent recompute for the bursty stream
    n = len(gaps_b)
    mu = sum(gaps_b) / n
    var = max(sum(g * g for g in gaps_b) / n - mu * mu, 0.0)
    sig = math.sqrt(var)
    b = round((sig - mu) / (sig + mu), 6)
    assert got["spike"].n_gaps == n
    assert got["spike"].burstiness == b
    assert b > 0.3                       # bursty regime (B > 0)


def test_events_attribution_last_touch(spark):
    import datetime as dt

    from npm_extraction_server_spark.operators.suite import (
        events_attribution)

    base = dt.datetime(2020, 1, 1)

    def ev(eid, secs, user, typ):
        return (eid, base + dt.timedelta(seconds=secs), user, typ,
                1.0, "{}")

    evs = [
        # u0: click -> email -> purchase  => credited to email (last)
        ev(0, 0, "u0", "click"), ev(1, 100, "u0", "email"),
        ev(2, 200, "u0", "purchase"),
        # u1: purchase with NO preceding touch => direct
        ev(3, 0, "u1", "purchase"),
        # u2: click 8 days before purchase => outside lookback, direct
        ev(4, 0, "u2", "click"),
        ev(5, 8 * 86400, "u2", "purchase"),
        # u3: two purchases, touch between => 1st direct, 2nd to click
        ev(6, 0, "u3", "purchase"), ev(7, 50, "u3", "click"),
        ev(8, 90, "u3", "purchase"),
        # u4: a purchase then click: earlier purchase never credited
        # to the LATER click (frame is strictly preceding)
        ev(9, 10, "u4", "purchase"), ev(10, 20, "u4", "click"),
    ]
    df = spark.createDataFrame(
        evs, "event_id long, ts timestamp, user_id string, "
             "event_type string, value double, props string")
    import tempfile
    sfdir = tempfile.mkdtemp(prefix="attr_sf_")
    df.write.parquet(f"{sfdir}/events.parquet")
    got = {r.touch_type: r for r in
           events_attribution(spark, sfdir).collect()}
    # 6 conversions: email 1, click 1, direct 4... wait: u0 email,
    # u1 direct, u2 direct, u3 direct + click, u4 direct -> 5 direct?
    # recount: conversions = 6 (ids 2,3,5,6,8,9): email 1, click 1,
    # direct 4
    assert got["email"].n_conversions == 1
    assert got["click"].n_conversions == 1
    assert got["direct"].n_conversions == 4
    assert got["email"].share == round(1 / 6, 6)
    assert got["direct"].share == round(4 / 6, 6)


def test_g4_grouping_sets_semantics(spark):
    import tempfile

    from npm_extraction_server_spark.operators.suite import (
        g4_grouping_sets)

    rows = [(i, "O" if i % 2 else "F", f"{i % 3}-PRIO", 10.0 + i)
            for i in range(12)]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderstatus string, "
              "o_orderpriority string, o_totalprice double")
    sfdir = tempfile.mkdtemp(prefix="g4_sf_")
    df.write.parquet(f"{sfdir}/orders.parquet")
    got = g4_grouping_sets(spark, sfdir).collect()
    # exactly three groupings: (), (status), (status, priority)
    grand = [r for r in got if (r.g_status, r.g_prio) == (1, 1)]
    per_s = [r for r in got if (r.g_status, r.g_prio) == (0, 1)]
    per_sp = [r for r in got if (r.g_status, r.g_prio) == (0, 0)]
    assert len(grand) == 1 and grand[0].n_orders == 12
    assert {r.o_orderstatus for r in per_s} == {"O", "F"}
    assert sum(r.n_orders for r in per_s) == 12
    assert len(per_sp) == 6 and sum(r.n_orders for r in per_sp) == 12
    # no priority-only grouping (that's what distinguishes this from
    # cube); every subtotal's sum ties out
    assert not [r for r in got if (r.g_status, r.g_prio) == (1, 0)]
    assert grand[0].total_price == round(sum(10.0 + i
                                             for i in range(12)), 2)


def test_j13_interval_join_plan_and_values(spark):
    from npm_extraction_server_spark.operators.suite import (
        j13_interval_join)

    df = j13_interval_join(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the fact side must stream through a broadcast join of the tiny
    # window dim — never a SortMergeJoin or unbroadcast cartesian
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    rows = df.collect()
    assert rows and all(r.n_events > 0 for r in rows)
    # brute-force recount for one (type, window)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    from pyspark.sql import functions as F
    hr = (F.unix_timestamp(F.date_trunc("hour", F.col("ts")))
          / 3600).cast("bigint")
    evh = ev.select("event_type", hr.alias("eh")).collect()
    r0 = rows[0]
    expect = sum(1 for e in evh
                 if e.event_type == r0.event_type
                 and r0.w_start <= e.eh <= r0.w_start + 2)
    assert r0.n_events == expect


def test_ts_ewma_hand_computed(spark):
    import datetime as dt

    from npm_extraction_server_spark.operators.suite import ts_ewma

    # 30 hours of known counts (one event per count unit)
    base = dt.datetime(2020, 1, 1)
    counts = [(i * 3) % 7 for i in range(30)]
    evs, eid = [], 0
    for h, c in enumerate(counts):
        for j in range(c):
            evs.append((eid, base + dt.timedelta(hours=h, minutes=j),
                        "u", "click", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        evs, "event_id long, ts timestamp, user_id string, "
             "event_type string, value double, props string")
    import tempfile
    sfdir = tempfile.mkdtemp(prefix="ewma_sf_")
    df.write.parquet(f"{sfdir}/events.parquet")
    got = {r.hour - 438288: r for r in ts_ewma(spark, sfdir).collect()}

    # grid starts at the first NON-EMPTY hour (counts[0] == 0), so
    # offsets are relative to hour 1
    first = min(got)
    wints = [int(round(0.3 * 0.7 ** i, 8) * 1e8 + 0.5)
             for i in range(24)]
    series = counts[1:] if counts[0] == 0 else counts
    for t in range(len(series)):
        s = sum(w * (series[t - i] if t - i >= 0 else 0)
                for i, w in enumerate(wints))
        assert got[first + t].ewma == s / 1e8
        assert got[first + t].n == series[t]
    # smoothing sanity: ewma variance < raw variance
    import statistics
    ew = [got[first + t].ewma for t in range(len(series))]
    assert statistics.pvariance(ew) < statistics.pvariance(
        [float(x) for x in series])


def test_text_char_entropy_hand_computed(spark):
    import math
    import tempfile

    from npm_extraction_server_spark.operators.suite import (
        text_char_entropy)

    docs = [
        (0, "aaaa"),       # bigrams aa,aa,aa -> H = 0
        (1, "abcd"),       # ab,bc,cd all distinct -> H = ln(3)
        (2, "ababab"),     # ab x3, ba x2
        (3, "x"),          # too short: excluded
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sfdir = tempfile.mkdtemp(prefix="ent_sf_")
    df.write.parquet(f"{sfdir}/documents.parquet")
    got = {r.doc_id: r for r in text_char_entropy(spark, sfdir).collect()}
    assert sorted(got) == [0, 1, 2]
    assert (got[0].n_bigrams, got[0].distinct_bigrams) == (3, 1)
    assert got[0].entropy == 0.0
    assert got[1].entropy == round(round(math.log(3), 8), 6)

    def h(counts):
        n = sum(counts)
        s = sum(round(c * round(math.log(c), 8), 8) for c in counts)
        return round(round(math.log(n), 8) - s / n, 6)

    assert got[2].entropy == h([3, 2])
    # repetitive text scores strictly below diverse text
    assert got[0].entropy < got[2].entropy < got[1].entropy


def test_events_dau_wau_sliding_distinct(spark):
    import datetime as dt
    import tempfile

    from npm_extraction_server_spark.operators.suite import events_dau_wau

    base = dt.datetime(2020, 1, 1)
    # u0 active days 0..9; u1 days 0 and 7 only; u2 day 3 only;
    # duplicate events same day must not double-count
    acts = [("u0", d) for d in range(10)] + \
           [("u1", 0), ("u1", 7), ("u2", 3), ("u2", 3)]
    evs = [(i, base + dt.timedelta(days=d, hours=1 + (i % 3)), u,
            "click", 1.0, "{}") for i, (u, d) in enumerate(acts)]
    df = spark.createDataFrame(
        evs, "event_id long, ts timestamp, user_id string, "
             "event_type string, value double, props string")
    sfdir = tempfile.mkdtemp(prefix="dau_sf_")
    df.write.parquet(f"{sfdir}/events.parquet")
    got = {r.day - 18262: r for r in events_dau_wau(spark, sfdir)
           .collect()}
    assert sorted(got) == list(range(10))

    # brute-force recount
    daily = {}
    for u, d in acts:
        daily.setdefault(d, set()).add(u)
    for d in range(10):
        dau = len(daily.get(d, set()))
        wau = len(set().union(*(daily.get(x, set())
                                for x in range(d - 6, d + 1))))
        r = got[d]
        assert (r.dau, r.wau) == (dau, wau)
        assert r.stickiness == round(dau / wau, 6)
    # day-6 window [0..6]: u0, u1 (day 0), u2 (day 3) all count
    assert got[6].wau == 3 and got[6].dau == 1
    # day 9 window [3..9]: u0, u1(day7), u2(day3)
    assert got[9].wau == 3
    # day 2 window [0..2] predates u2: only u0 and u1
    assert got[2].wau == 2


def test_events_survival_km_hand_computed(spark):
    import datetime as dt
    import tempfile

    from npm_extraction_server_spark.operators.suite import events_survival

    base = dt.datetime(2021, 6, 1)
    # horizon 10h from corpus start (hour 0) => cut = 10
    # u1 click@0  purchase@3   -> click cohort, death  t=3
    # u4 click@1  purchase@4   -> click cohort, death  t=3
    # u9 click@7  (none)       -> click cohort, censor t=3 (tie!)
    # u3 click@2  (none)       -> click cohort, censor t=8
    # u2 click@0  purchase@15  -> past cut: censor t=10
    # u5 view@0   purchase@0   -> view cohort, death t=0
    # u6 click@25 purchase@26  -> first_h > cut at BOTH horizons below
    evs = [("u1", "click", 0), ("u1", "purchase", 3),
           ("u4", "click", 1), ("u4", "purchase", 4),
           ("u9", "click", 7),
           ("u3", "click", 2),
           ("u2", "click", 0), ("u2", "purchase", 15),
           ("u5", "view", 0), ("u5", "purchase", 0),
           ("u6", "click", 25), ("u6", "purchase", 26)]
    rows = [(i, base + dt.timedelta(hours=h, minutes=7), u, et, 1.0, "{}")
            for i, (u, et, h) in enumerate(evs)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id string, "
              "event_type string, value double, props string")
    sfdir = tempfile.mkdtemp(prefix="surv_sf_")
    df.write.parquet(f"{sfdir}/events.parquet")

    got = {(r.cohort, r.t_hours): r
           for r in events_survival(spark, sfdir, horizon_h=10).collect()}
    # click cohort: 5 observations in-study; only death time t=3 with
    # d=2; the t=3 CENSORED exit (u9) stays at risk => n_risk=5, and
    # S = round_half_up(1e8 * 3/5) = 6e7
    assert set(got) == {("click", 3), ("view", 0)}
    c = got[("click", 3)]
    assert (c.n_risk, c.deaths, c.surv_e8) == (5, 2, 60_000_000)
    assert c.survival == 0.6
    # view cohort: single user converts at its first hour => S drops
    # to 0 at t=0 with n_risk=1
    v = got[("view", 0)]
    assert (v.n_risk, v.deaths, v.surv_e8, v.survival) == (1, 1, 0, 0.0)

    # sequential-product check on a 2-step curve: horizon wide enough
    # that u2's purchase@15 becomes a death at t=15 (n_risk=2 there:
    # u3 censors at t=cut-2=18 AFTER 15, u9 at t=13 BEFORE 15)
    got2 = {(r.cohort, r.t_hours): r
            for r in events_survival(spark, sfdir, horizon_h=20)
            .collect()}
    c2 = got2[("click", 15)]
    # S(3) = round(1e8*3/5) = 6e7; S(15) = round_half_up(6e7 * 1/2)
    assert (c2.n_risk, c2.deaths) == (2, 1)
    assert c2.surv_e8 == (2 * 60_000_000 * 1 + 2) // 4 == 30_000_000


def test_events_gini_hand_computed(spark):
    import datetime as dt
    import tempfile

    from npm_extraction_server_spark.operators.suite import events_gini

    base = dt.datetime(2022, 3, 1)
    # click: per-user counts [1, 1, 2, 4] -> ascending rank sum
    # t = 1+2+6+16 = 25, n=4, S=8: G = (50 - 5*8)/(4*8) = 10/32
    # view: 3 users x 2 events each -> G = 0
    # buy: counts [1, 2] -> G = 1/6 (HALF_UP rounding exercised:
    # 16666666.67 -> 16666667)
    per_user = {("a", "click"): 1, ("b", "click"): 1,
                ("c", "click"): 2, ("d", "click"): 4,
                ("a", "view"): 2, ("b", "view"): 2, ("c", "view"): 2,
                ("a", "buy"): 1, ("b", "buy"): 2}
    rows = []
    for (u, et), k in sorted(per_user.items()):
        for _ in range(k):
            rows.append((len(rows), base + dt.timedelta(minutes=len(rows)),
                         u, et, 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id string, "
              "event_type string, value double, props string")
    sfdir = tempfile.mkdtemp(prefix="gini_sf_")
    df.write.parquet(f"{sfdir}/events.parquet")

    got = {r.event_type: r for r in events_gini(spark, sfdir).collect()}
    assert set(got) == {"click", "view", "buy"}
    c = got["click"]
    assert (c.n_users, c.total_events) == (4, 8)
    assert c.gini_e8 == 31_250_000 and c.gini == 0.3125
    v = got["view"]
    assert (v.n_users, v.total_events, v.gini_e8, v.gini) == (3, 6, 0, 0.0)
    b = got["buy"]
    assert (b.n_users, b.total_events) == (2, 3)
    # 1/6 on the 1e-8 grid, HALF_UP: (2*1*1e8 + 6) div 12 = 16666667
    assert b.gini_e8 == 16_666_667


def test_events_rfm_hand_computed(spark):
    import datetime as dt
    import tempfile

    from npm_extraction_server_spark.operators.suite import events_rfm

    base = dt.datetime(2024, 2, 1)
    # (user, event hours): cut = 3
    # u1 [0,1,2] -> r=1 f=3 | u2 [2,2] -> r=1 f=2 | u3 [0] -> r=3 f=1
    # u4 [1,3] -> r=0 f=2   | u5 [3]   -> r=0 f=1
    # f thresholds (n=5, 5*cum>=q*n): [1,1,2,2] -> f 1/2/3 -> 1/3/5
    # r thresholds: [0,0,1,1] -> r 0/1/3 -> 5/3/1
    hours = {"u1": [0, 1, 2], "u2": [2, 2], "u3": [0],
             "u4": [1, 3], "u5": [3]}
    rows = []
    for u, hs in sorted(hours.items()):
        for hh in hs:
            rows.append((len(rows),
                         base + dt.timedelta(hours=hh, minutes=11),
                         u, "click", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id string, "
              "event_type string, value double, props string")
    sfdir = tempfile.mkdtemp(prefix="rfm_sf_")
    df.write.parquet(f"{sfdir}/events.parquet")

    got = {(r.r_score, r.f_score): (r.n_users, r.n_events)
           for r in events_rfm(spark, sfdir).collect()}
    assert got == {(3, 5): (1, 3),   # u1
                   (3, 3): (1, 2),   # u2
                   (1, 1): (1, 1),   # u3
                   (5, 3): (1, 2),   # u4
                   (5, 1): (1, 1)}   # u5


def test_ts_autocorr_hand_computed(spark):
    import datetime as dt
    import tempfile

    from npm_extraction_server_spark.operators.suite import ts_autocorr

    base = dt.datetime(2023, 1, 1)
    # type a: hourly counts [1, 2, 3] -> d = 3x-6 = [-3, 0, 3],
    #   den 18; lag1 num = 0, lag2 num = -9 -> r = [0, -0.5]
    # type b: counts [2, 0, 0] on the SAME global grid (zero-fill) ->
    #   d = [4, -2, -2], den 24; lag1 num = -4 -> -1/6 (HALF_UP on
    #   |num|, sign applied outside); lag2 num = -8 -> -1/3
    counts = {("a", 0): 1, ("a", 1): 2, ("a", 2): 3, ("b", 0): 2}
    rows = []
    for (et, hh), k in sorted(counts.items()):
        for _ in range(k):
            rows.append((len(rows),
                         base + dt.timedelta(hours=hh, minutes=9),
                         f"u{len(rows)}", et, 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id string, "
              "event_type string, value double, props string")
    sfdir = tempfile.mkdtemp(prefix="acf_sf_")
    df.write.parquet(f"{sfdir}/events.parquet")

    got = {(r.event_type, r.lag): r
           for r in ts_autocorr(spark, sfdir).collect()}
    # grid length 3 -> only lags 1 and 2 have overlapping pairs
    assert set(got) == {("a", 1), ("a", 2), ("b", 1), ("b", 2)}
    assert all(r.n_hours == 3 for r in got.values())
    assert (got[("a", 1)].r_e8, got[("a", 2)].r_e8) == (0, -50_000_000)
    assert got[("a", 2)].r == -0.5
    # -1/6 and -1/3: HALF_UP magnitudes 16666667 / 33333333
    assert (got[("b", 1)].r_e8, got[("b", 2)].r_e8) == (-16_666_667,
                                                        -33_333_333)


def test_assoc_rules_hand_computed(spark):
    from npm_extraction_server_spark.operators.assoc import assoc_rules

    baskets = spark.createDataFrame(
        [("b1", "A"), ("b1", "B"), ("b1", "C"),
         ("b2", "A"), ("b2", "B"),
         ("b3", "A"), ("b3", "C"),
         ("b4", "A"),
         ("b5", "B"), ("b5", "D"),
         ("b5", "D")],  # duplicate (basket, item) must not inflate
        "basket string, item string")
    got = {(r.antecedent, r.consequent): r
           for r in assoc_rules(baskets, min_supp=2).collect()}
    # D (support 1) pruned by A-priori; (B,C) pair support 1 pruned
    assert set(got) == {("A", "B"), ("B", "A"), ("A", "C"), ("C", "A")}
    ab = got[("A", "B")]
    assert (ab.n_baskets, ab.supp_a, ab.supp_c, ab.supp_both) == (5, 4, 3, 2)
    # conf 2/4; lift 5*2/(4*3) = 10/12 -> HALF_UP 83333333
    assert (ab.conf_e8, ab.lift_e8) == (50_000_000, 83_333_333)
    assert ab.confidence == 0.5
    ba = got[("B", "A")]
    # conf 2/3 -> HALF_UP 66666667; lift symmetric
    assert (ba.conf_e8, ba.lift_e8) == (66_666_667, 83_333_333)
    ac, ca = got[("A", "C")], got[("C", "A")]
    assert (ac.conf_e8, ac.lift_e8) == (50_000_000, 125_000_000)
    assert (ca.conf_e8, ca.lift_e8) == (100_000_000, 125_000_000)
    assert ca.lift == 1.25


def test_graph_clustering_hand_computed(spark, tmp_path):
    import importlib

    import npm_extraction_server_spark.operators.suite as suite

    # build a tiny documents table so _kg_graph_edges derives a known
    # graph? No — instead validate against graph_triangles directly
    # on the driver corpus and recompute C(v) from (degree, T)
    sf = "/root/testdata/sf0.001"
    rows = suite.graph_clustering(spark, sf).collect()
    assert rows
    for r in rows:
        if r.degree < 2:
            assert r.local_cc is None
            continue
        den = r.degree * (r.degree - 1)
        c6 = (2 * (2_000_000 * r.n_triangles) + den) // (2 * den)
        assert r.local_cc == c6 / 1e6
        assert 0.0 <= r.local_cc <= 1.0
    # triangle counts agree with the dedicated query
    tri = {t.node_id: t.n_triangles
           for t in suite.graph_triangles(spark, sf).collect()}
    for r in rows:
        assert r.n_triangles == tri.get(r.node_id, 0)


def test_encoding_noise_hand_computed(spark):
    from npm_extraction_server_spark.operators.text import encoding_noise

    moji = "caf\u00c3\u00a9 menu \u00e2\u0080\u009chi\u00e2\u0080\u0099 \ufffd"
    ctrl = "a\u0007b\u0001c\td"  # tab is whitespace, not counted
    docs = spark.createDataFrame(
        [(0, "perfectly clean ascii text"), (1, moji), (2, ctrl), (3, "")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in encoding_noise(docs).collect()}

    assert (got[0].n_moji, got[0].n_repl, got[0].n_ctrl,
            got[0].noise_ppm, got[0].flag) == (0, 0, 0, 0, False)
    # moji doc: one e-acute pair, one left-quote, one right-quote,
    # one replacement char; length counted in codepoints
    r1 = got[1]
    assert (r1.n_moji, r1.n_repl, r1.n_ctrl) == (3, 1, 0)
    n = len(moji)
    assert r1.noise_ppm == (2 * 4 * 1000000 + n) // (2 * n)
    assert r1.flag
    r2 = got[2]
    assert (r2.n_moji, r2.n_repl, r2.n_ctrl) == (0, 0, 2)
    assert got[3].noise_ppm == 0 and not got[3].flag


def test_rake_keywords_hand_computed(spark):
    from npm_extraction_server_spark.operators.text import rake_keywords

    # doc 0: phrases [quick brown fox runs], [river], [hides]
    # doc 1: [quick brown fox] (then "the the" double stopword),
    #        a 5-word run dropped by max_phrase_len
    docs = spark.createDataFrame(
        [(0, "the quick brown fox runs to the river and hides"),
         (1, "a quick brown fox the the alpha beta gamma delta eps"),
         (2, "")],
        "doc_id long, text string")
    rows = rake_keywords(docs, top=10).collect()
    by_phrase = {r.phrase: r for r in rows}

    # word stats: quick/brown/fox freq 2, deg 4+3=7 -> 3.5
    #             runs freq 1 deg 4 -> 4.0
    # phrase [quick brown fox runs] = 3*3.5 + 4 = 14.5
    top = rows[0]
    assert top.phrase == "quick brown fox runs"
    assert top.score_e8 == 3 * 350000000 + 400000000
    assert by_phrase["quick brown fox"].score_e8 == 3 * 350000000
    assert by_phrase["quick brown fox"].n_occ == 1
    # single-word phrases score deg/freq = 1
    assert by_phrase["river"].score_e8 == 100000000
    # the 5-word run was dropped
    assert "alpha beta gamma delta eps" not in by_phrase
    # HALF_UP rounding path: word in one 2-phrase and one 3-phrase
    # (deg 5, freq 2 -> 2.5 exactly) exercised via a fresh corpus
    docs2 = spark.createDataFrame(
        [(0, "red car"), (1, "red car tyre the red")],
        "doc_id long, text string")
    rows2 = {r.phrase: r for r in rake_keywords(docs2).collect()}
    # red: deg 2+3+1=6, freq 3 -> 2.0; car: deg 5, freq 2 -> 2.5
    assert rows2["red car"].score_e8 == 200000000 + 250000000
    assert rows2["red"].score_e8 == 200000000


def test_text_idf_drift_hand_computed(spark):
    import math

    from npm_extraction_server_spark.operators.suite import text_idf_drift

    # old split (even ids): 4 docs; new split (odd ids): 4 docs
    # 'aa' df 4 -> 2 (rarer: idf rises), 'bb' df 2 -> 4 (commoner),
    # 'cc' df 2 -> 2 (stable), 'dd' only old (filtered by min_df)
    rows = [(0, "aa bb cc dd"), (2, "aa bb cc"), (4, "aa dd"), (6, "aa"),
            (1, "aa bb"), (3, "bb aa"), (5, "bb cc"), (7, "bb cc")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    import tempfile
    d = tempfile.mkdtemp(prefix="idfdrift_")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {r.term: r for r in text_idf_drift(spark, d).collect()}

    assert set(got) == {"aa", "bb", "cc"}
    idf = lambda n, df: round(math.log(n / df), 8)
    r = got["aa"]
    assert (r.df_old, r.df_new) == (4, 2)
    assert r.idf_old == idf(4, 4) and r.idf_new == idf(4, 2)
    assert r.shift == round(idf(4, 2) - idf(4, 4), 8)
    assert got["bb"].shift == round(idf(4, 4) - idf(4, 2), 8)
    assert got["cc"].shift == 0.0
    # ordering: |shift| desc then term — aa and bb tie, aa first
    ordered = [t for t in got]
    assert sorted(got, key=lambda t: (-abs(got[t].shift), t)) == \
        ["aa", "bb", "cc"]


def test_events_paths_hand_computed(spark):
    import tempfile

    from npm_extraction_server_spark.operators.suite import events_paths

    # user 1: a b c d -> paths a>b>c, b>c>d ; user 2: a b c -> a>b>c
    rows = [(1, 1, 100, "a"), (2, 1, 200, "b"), (3, 1, 300, "c"),
            (4, 1, 400, "d"),
            (5, 2, 100, "a"), (6, 2, 200, "b"), (7, 2, 300, "c"),
            # user 3 has only 2 events: no trigram
            (8, 3, 100, "a"), (9, 3, 200, "b")]
    ev = spark.createDataFrame(
        [(eid, f"u{u}", ts, t) for eid, u, ts, t in rows],
        "event_id long, user_id string, ts long, event_type string") \
        .selectExpr("event_id", "user_id",
                    "timestamp_seconds(ts) AS ts", "event_type")
    d = tempfile.mkdtemp(prefix="paths_")
    ev.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = [(r.path, r.n) for r in events_paths(spark, d).collect()]
    assert got == [("a>b>c", 2), ("b>c>d", 1)]


def test_bpe_fertility_passthrough_and_chars(spark):
    from npm_extraction_server_spark.operators.text import (
        BPE_PIECES,
        bpe_token_counts,
    )

    docs = spark.createDataFrame(
        [(0, "aaa bb", "en"), (1, "", "de")],
        "doc_id long, text string, lang string")
    got = {r.doc_id: r for r in
           bpe_token_counts(docs, passthrough=["lang"],
                            with_chars=True).collect()}
    assert got[0].lang == "en" and got[1].lang == "de"
    assert (got[0].n_words, got[0].n_word_chars) == (2, 5)
    assert (got[1].n_words, got[1].n_bpe_tokens,
            got[1].n_word_chars) == (0, 0, 0)

    # independent greedy segmentation for the token count
    pieces = sorted(BPE_PIECES, key=len, reverse=True)

    def seg(w):
        pos = n = 0
        while pos < len(w):
            for p in pieces:
                if w.startswith(p, pos):
                    pos += len(p)
                    break
            else:
                pos += 1
            n += 1
        return n

    assert got[0].n_bpe_tokens == seg("aaa") + seg("bb")


def test_events_entropy_rate_hand_computed(spark):
    import math
    import tempfile

    from npm_extraction_server_spark.operators.suite import (
        events_entropy_rate,
    )

    # user u1: a b a b a  -> transitions a>b, b>a, a>b, b>a
    # user u2: a a c      -> a>a, a>c
    rows = [(1, "u1", 10, "a"), (2, "u1", 20, "b"), (3, "u1", 30, "a"),
            (4, "u1", 40, "b"), (5, "u1", 50, "a"),
            (6, "u2", 10, "a"), (7, "u2", 20, "a"), (8, "u2", 30, "c")]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id string, ts long, event_type string") \
        .selectExpr("event_id", "user_id",
                    "timestamp_seconds(ts) AS ts", "event_type")
    d = tempfile.mkdtemp(prefix="entropy_")
    ev.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {r.prev_type: r for r in events_entropy_rate(spark, d).collect()}

    # from a: a>b x2, a>a x1, a>c x1 (n_from=4); from b: b>a x2
    assert got["a"].n_from == 4 and got["b"].n_from == 2
    term = lambda p: round(p * round(math.log(p), 8), 8)
    h_a = -(term(2 / 4) + term(1 / 4) + term(1 / 4))
    assert got["a"].h_cond == round(h_a, 8)
    assert got["b"].h_cond == 0.0  # deterministic: p=1, ln 1 = 0
    want_rate = round(round((4 / 6) * h_a, 8) + round((2 / 6) * 0.0, 8), 8)
    assert got["a"].rate == want_rate == got["b"].rate
    assert got["a"].share == round(4 / 6, 6)


def test_remove_template_lines_hand_computed(spark):
    from npm_extraction_server_spark.operators.text import (
        remove_template_lines,
    )

    rows = [
        # site A: 6 docs; HDR in all 6 (60 >= 18), AD in 2 (20 >= 18),
        # RARE in 1 (10 < 18)
        (0, "A", "HDR\nbody0\nAD\nHDR"),       # HDR twice: stats count once
        (1, "A", "HDR\nbody1\nAD"),
        (2, "A", "HDR"),                        # everything removed
        (3, "A", "HDR\nbody3"),
        (4, "A", "HDR\nbody4"),
        (5, "A", "HDR\nbody5\nRARE"),
        # site B: 2 docs < min_docs=5 -> nothing removed
        (6, "B", "SHARED\nx"),
        (7, "B", "SHARED\ny"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.doc_id: r for r in remove_template_lines(docs).collect()}

    assert (got[0].clean_text, got[0].n_lines, got[0].n_removed) == ("body0", 4, 3)
    assert (got[1].clean_text, got[1].n_removed) == ("body1", 2)
    assert (got[2].clean_text, got[2].n_lines, got[2].n_removed) == ("", 1, 1)
    assert got[5].clean_text == "body5\nRARE"      # order preserved, RARE kept
    assert got[6].clean_text == "SHARED\nx" and got[6].n_removed == 0
    assert got[7].n_removed == 0


def test_kcenter_select_hand_computed(spark):
    from npm_extraction_server_spark.operators.similarity import (
        kcenter_select,
    )

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.6, 0.8]), (3, [-1.0, 0.0])],
        "vec_id long, embedding array<float>")
    got = {r.sel_round: r for r in kcenter_select(emb, k=4).collect()}
    # c0 = min id; then greedy max-min cosine distance, ties by id
    assert (got[0].vec_id, got[0].sel_dist) == (0, None)
    assert (got[1].vec_id, got[1].sel_dist) == (3, 2.0)
    assert (got[2].vec_id, got[2].sel_dist) == (1, 1.0)
    assert (got[3].vec_id, round(got[3].sel_dist, 6)) == (2, 0.2)
    # radius curve is non-increasing
    assert got[1].sel_dist >= got[2].sel_dist >= got[3].sel_dist


def test_wl_graph_hash_isomorphism_classes(spark):
    from npm_extraction_server_spark.plans.fingerprint import wl_graph_hash

    rows = [
        # g1 and g2: isomorphic modulo node renaming + literal values
        ("g1", "a", "p", "b"), ("g1", "a", "q", '"x"'),
        ("g2", "n1", "p", "n2"), ("g2", "n1", "q", '"y"'),
        # g3: same size, different shape (chain, not star)
        ("g3", "a", "p", "b"), ("g3", "b", "q", "c"),
        # g4/g5: direction matters (p out+p2 out vs p out+p2 back)
        ("g4", "a", "p", "b"), ("g4", "a", "p2", "b"),
        ("g5", "a", "p", "b"), ("g5", "b", "p2", "a"),
    ]
    quads = spark.createDataFrame(
        rows, "graph string, subj string, pred string, obj string")
    got = {r.graph: r for r in wl_graph_hash(quads, rounds=2).collect()}

    assert got["g1"].wl_hash == got["g2"].wl_hash
    assert got["g1"].class_rep == "g1" and got["g1"].class_size == 2
    assert got["g3"].wl_hash != got["g1"].wl_hash
    assert got["g4"].wl_hash != got["g5"].wl_hash
    assert got["g1"].n_triples == 2

    # value mode: differing literals now separate g1 and g2
    val = {r.graph: r for r in
           wl_graph_hash(quads, rounds=2, structural=False).collect()}
    assert val["g1"].wl_hash != val["g2"].wl_hash


def test_lang_mix_hand_computed(spark):
    from npm_extraction_server_spark.operators.text import lang_mix

    rows = [
        # 3 segments: en, es, en -> majority en 2/3, off_ppm HALF_UP
        (0, "the cat is here\nel perro de la casa\nwith the dog"),
        # single segment
        (1, "the of and"),
        # tie 1-1 between en and es -> lexicographic: en
        (2, "the cat\nel perro la"),
        # CJK segment dominates by script ratio
        (3, "一二三四五\nthe end"),
        # no markers at all -> und
        (4, "zzz qqq\nrrr vvv"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in lang_mix(docs).collect()}

    r0 = got[0]
    assert (r0.majority_lang, r0.n_segments, r0.n_majority) == ("en", 3, 2)
    assert r0.off_ppm == (2 * 1 * 1000000 + 3) // (2 * 3)  # 333333
    assert r0.mixed
    assert (got[1].majority_lang, got[1].mixed) == ("en", False)
    assert got[1].off_ppm == 0
    assert got[2].majority_lang == "en" and got[2].n_majority == 1
    assert got[3].n_langs == 2 and got[3].majority_lang in ("cjk", "en")
    assert got[4].majority_lang == "und" and not got[4].mixed


def test_direct_mapping_hand_computed(spark):
    from npm_extraction_server_spark.plans.warehouse import direct_mapping

    df = spark.createDataFrame(
        [(1, 'say "hi"', 10), (2, None, None)],
        "id int, label string, ref int")
    out = direct_mapping(df, "t", ["id"], cols=["label"],
                         fks=[(["ref"], "u", ["uid"])])
    rows = {(r.subj, r.pred, r.obj) for r in out.collect()}
    base = "http://example.org/db/"
    s1 = base + "t/id=1"
    assert (s1, "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            base + "t") in rows
    assert (s1, base + "t#id", '"1"') in rows
    # N-Triples escaping of embedded quotes
    assert (s1, base + "t#label", '"say \\"hi\\""') in rows
    assert (s1, base + "t#ref-ref", base + "u/uid=10") in rows
    # NULLs emit no literal / FK triple
    s2 = base + "t/id=2"
    assert not any(p == base + "t#label" and s == s2 for s, p, _ in rows)
    assert not any(p == base + "t#ref-ref" and s == s2 for s, p, _ in rows)
    assert len(rows) == 4 + 2  # row1: type+id+label+fk; row2: type+id


def test_theilsen_median_machinery(spark):
    """The suite's Theil-Sen estimator on a hand-built series: exact
    pairwise-slope median, robust to one outlier spike, negative
    slopes HALF_UP on the magnitude (the div-vs-floor trap)."""
    from npm_extraction_server_spark.operators.suite import ts_theilsen
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    # type 'up': y = 2*t on hours 0..4 with an outlier spike at t=2
    for t, n in [(0, 1), (1, 3), (2, 40), (3, 7), (4, 9)]:
        for k in range(n):
            rows.append((len(rows), base + dt.timedelta(hours=t),
                         1, "up", 0.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")

    class SF:
        pass

    import npm_extraction_server_spark.operators.suite as suite
    orig = suite._t
    suite._t = lambda spark, sf, name: df
    try:
        got = {r.event_type: r for r in ts_theilsen(spark, "x").collect()}
    finally:
        suite._t = orig

    r = got["up"]
    # pairwise slopes of (1,3,40,7,9) at t=0..4:
    # 2,19.5,2,2 | 37,2,2 | -16.5,-15.5 | 2  -> sorted median = 2.0
    assert r.n_hours == 5
    assert r.slope == 2.0
    # residuals y - 2t = (1,1,36,1,1) -> median 1.0
    assert r.intercept == 1.0
