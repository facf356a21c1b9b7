"""Per-entity query surface (the reference HTTP routes as DataFrame
lookups, SURVEY.md §3.2/3.3) + content negotiation."""

import pytest
from pyspark.sql import functions as F

from npm_extraction_server_spark.plans.kg import extract_docs, run_pipeline
from npm_extraction_server_spark.plans.serving import (
    CONTENT_TYPES,
    bundle_triples,
    engine_triples_for,
    entity_triples,
    module_request,
    negotiate,
    user_triples,
)
from npm_extraction_server_spark.sources.pages import pages_df

ROOT = "http://example.org/"


@pytest.fixture(scope="module")
def graph(spark):
    pages = pages_df(spark, 50, partitions=4)
    result = run_pipeline(pages, root=ROOT)
    triples = result["triples"].cache()
    docs = result["docs"].cache()
    triples.count(), docs.count()
    return {"triples": triples, "docs": docs}


def test_negotiate():
    assert negotiate("application/n-triples") == "nt"
    assert negotiate("text/turtle;q=0.9, */*") == "ttl"
    assert negotiate("application/trig") == "trig"
    assert negotiate(None) == "nt"
    assert negotiate("application/weird") == "nt"
    # the reference's formatMap round-trips
    assert set(CONTENT_TYPES) == {"jsonld", "nt", "nq", "n3", "ttl", "trig"}


def test_negotiate_strict_406():
    """Strict mode replicates Express res.format: an Accept matching no
    supported type -> NotAcceptable (406), /root/reference/bin/index.js:140."""
    from npm_extraction_server_spark.plans.serving import NotAcceptable

    assert negotiate("text/turtle", strict=True) == "ttl"
    assert negotiate("*/*", strict=True) == "nt"
    assert negotiate(None, strict=True) == "nt"
    with pytest.raises(NotAcceptable):
        negotiate("application/weird", strict=True)
    with pytest.raises(NotAcceptable):
        negotiate("image/png, text/html", strict=True)


def test_split_format_ext():
    """The .ext override middleware (/root/reference/bin/index.js:40-55):
    a recognized trailing extension overrides conneg and is stripped
    from the canonical path; unknown extensions are untouched."""
    from npm_extraction_server_spark.plans.serving import split_format_ext

    assert split_format_ext("/bundles/npm/pkg-1.ttl") == ("/bundles/npm/pkg-1", "ttl")
    assert split_format_ext("/bundles/npm/pkg-1.jsonld") == ("/bundles/npm/pkg-1", "jsonld")
    assert split_format_ext("/bundles/npm/pkg-1/1.0.0.nt") == ("/bundles/npm/pkg-1/1.0.0", "nt")
    # version dots are NOT format extensions
    assert split_format_ext("/bundles/npm/pkg-1/1.0.0") == ("/bundles/npm/pkg-1/1.0.0", None)
    assert split_format_ext("/bundles/npm/pkg-1.weird") == ("/bundles/npm/pkg-1.weird", None)
    assert split_format_ext("/users/npm/dev1") == ("/users/npm/dev1", None)


def test_bundle_lookup(graph):
    t = bundle_triples(graph["triples"], "hotpkg", ROOT)
    rows = t.collect()
    assert len(rows) > 5
    assert all(r["subj"] == f"{ROOT}bundles/npm/hotpkg" for r in rows)
    preds = {r["pred"] for r in rows}
    assert any(p.endswith("#release") for p in preds)


def test_user_lookup(graph):
    # pick a maintainer that exists in the corpus
    DOAP = "http://usefulinc.com/ns/doap#"
    user_iri = (
        graph["triples"].filter(F.col("pred") == DOAP + "maintainer")
        .select("obj").filter(F.col("obj").contains("/users/npm/"))
        .first()["obj"]
    )
    name = user_iri.rsplit("/", 1)[1]
    t = user_triples(graph["triples"], name, ROOT)
    rows = t.collect()
    assert any(r["obj"] == user_iri for r in rows)  # maintains edges
    assert any(r["subj"] == user_iri for r in rows)  # identity triples


def test_module_request_exact(graph):
    import json as jsonlib

    doc = jsonlib.loads(
        graph["docs"].filter(F.col("doc_kind") == "npm_manifest")
        .filter(F.get_json_object("doc_json", "$.name") == "hotpkg")
        .first()["doc_json"])
    exact = list(doc["versions"])[0]
    r = module_request(graph["triples"], graph["docs"], "hotpkg", exact, ROOT)
    assert r["status"] == 200 and r["resolved_version"] == exact
    assert r["triples"].count() > 0


def test_module_request_range_redirect(graph):
    import json as jsonlib

    doc = jsonlib.loads(
        graph["docs"].filter(F.col("doc_kind") == "npm_manifest")
        .filter(F.get_json_object("doc_json", "$.name") == "hotpkg")
        .first()["doc_json"])
    rng = "^" + list(doc["versions"])[0]  # range string != any version key
    r = module_request(graph["triples"], graph["docs"], "hotpkg", rng, ROOT)
    assert r["status"] == 307
    row = r["triples"].collect()[0]
    assert "/hotpkg/%5E" in row["subj"]
    assert row["pred"].endswith("maxSatisfying")
    assert r["resolved_version"] in row["obj"]


def test_module_request_unresolvable(graph):
    r = module_request(graph["triples"], graph["docs"], "hotpkg", "^99.0.0", ROOT)
    assert r["status"] == 404
    r2 = module_request(graph["triples"], graph["docs"], "no-such-pkg", "*", ROOT)
    assert r2["status"] == 404


def test_engine_lookup(graph):
    t = engine_triples_for(graph["triples"], "node", None, ROOT)
    assert t.count() > 5
    tm = engine_triples_for(graph["triples"], "node", "v6.9.1", ROOT)
    assert tm.count() > 0


def test_bucket_pruned_lookup(graph, spark, tmp_path):
    """Point lookup over the bucketed warehouse table scans one bucket."""
    from npm_extraction_server_spark.plans.kg import write_triples

    out = str(tmp_path / "t")
    write_triples(graph["triples"], out, n_buckets=16)
    back = spark.read.parquet(out)
    iri = f"{ROOT}bundles/npm/hotpkg"
    pruned = entity_triples(back, iri, n_buckets=16)
    full = back.filter(F.col("subj") == iri)
    assert pruned.count() == full.count() > 0
    # the physical plan carries the bucket partition filter
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan


def test_route_dispatcher(graph):
    """The unified server-mode dispatcher: path parsing + .ext override
    + strict conneg + status codes, end-to-end."""
    import json as jsonlib

    from npm_extraction_server_spark.plans.serving import route

    t, d = graph["triples"], graph["docs"]

    # bundle route, Accept conneg
    r = route(t, d, "/bundles/npm/hotpkg", accept="text/turtle", root=ROOT)
    assert r["status"] == 200 and r["fmt"] == "ttl"
    assert r["triples"].count() > 0

    # .ext override beats Accept
    r = route(t, d, "/bundles/npm/hotpkg.nt", accept="text/turtle", root=ROOT)
    assert r["status"] == 200 and r["fmt"] == "nt"

    # unknown Accept -> 406
    r = route(t, d, "/bundles/npm/hotpkg", accept="image/png", root=ROOT)
    assert r["status"] == 406 and r["triples"] is None

    # module route: exact version 200, range 307-redirect
    doc = jsonlib.loads(
        d.filter(F.col("doc_kind") == "npm_manifest")
        .filter(F.get_json_object("doc_json", "$.name") == "hotpkg")
        .first()["doc_json"])
    exact = list(doc["versions"])[0]
    r = route(t, d, f"/bundles/npm/hotpkg/{exact}", root=ROOT)
    assert r["status"] == 200 and r["resolved_version"] == exact
    r = route(t, d, f"/bundles/npm/hotpkg/^{exact}", root=ROOT)
    assert r["status"] == 307
    assert r["triples"].first()["pred"].endswith("maxSatisfying")

    # user + engine routes
    user = t.filter(F.col("subj").contains("/users/npm/")).first()["subj"]
    uname = user.rsplit("/", 1)[1]
    r = route(t, d, f"/users/npm/{uname}", root=ROOT)
    assert r["status"] == 200 and r["triples"].count() > 0
    r = route(t, d, "/engines/node", root=ROOT)
    assert r["status"] == 200

    # scoped package: two path segments re-joined (the @org middleware)
    scoped = (d.filter(F.col("doc_kind") == "npm_manifest")
              .filter(F.get_json_object("doc_json", "$.name").startswith("@"))
              .select(F.get_json_object("doc_json", "$.name").alias("n"))
              .first())
    if scoped:
        r = route(t, d, f"/bundles/npm/{scoped['n']}", root=ROOT)
        assert r["status"] == 200 and r["triples"].count() > 0

    # unknown path -> 404
    r = route(t, d, "/nope/xyz", root=ROOT)
    assert r["status"] == 404
