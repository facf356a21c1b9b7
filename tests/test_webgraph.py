"""Web link-graph family (extract/links.py): extraction parity against
an independent pure-Python recompute, co-citation pair math against
brute force, unnormalized-PageRank mass conservation, and the
JVM-only-plan guarantee for the extraction hot path."""

import itertools
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from npm_extraction_server_spark.extract.links import (
    cocitation,
    host_degree,
    outlinks,
)
from npm_extraction_server_spark.sources.pages import pages_df, write_pages
from npm_extraction_server_spark.sources.synth import _h, synth_outlinks

N = 60


def _expected_links(i: int) -> list[str]:
    """Independent recompute of (href, anchor_text) pairs: nav footer
    links + the microdata anchor (pages_df gates it on
    _h(i,"page") % 4 — the driver-pages builder in __spark_entry__
    uses doc_id % 4 instead), which the generic href regex also
    captures."""
    out = []
    if _h(i, "page") % 4 == 0:
        out.append((f"http://people.example.org/{_h(i, 'md') % 1000}", "home"))
    out.extend(synth_outlinks(i))
    return out


def _expected_urls(i: int) -> list:
    return [u for u, _ in _expected_links(i)]


def _page_no(url: str) -> int:
    return int(re.search(r"page-(\d+)$", url).group(1))


def _canon_host(dst_url: str) -> str:
    """Independent recompute of the canonical host: lowercase, strip
    the http default port."""
    host = dst_url.split("/")[2].lower()
    return host[:-3] if host.endswith(":80") else host


def test_outlink_extraction_matches_recompute(spark):
    got = outlinks(pages_df(spark, N, partitions=4)).collect()
    by_page: dict[int, Counter] = {}
    for r in got:
        by_page.setdefault(_page_no(r.url), Counter())[r.dst_url] += 1
        assert r.dst_host == _canon_host(r.dst_url)
    for i in range(N):
        assert by_page.get(i, Counter()) == Counter(_expected_urls(i)), i


def test_host_degree_matches_brute_force(spark):
    links = outlinks(pages_df(spark, N, partitions=4))
    got = {r.dst_host: (r.n_links, r.n_pages)
           for r in host_degree(links).collect()}
    n_links: Counter = Counter()
    pages_per_host: dict[str, set] = {}
    for i in range(N):
        for u in _expected_urls(i):
            h = _canon_host(u)
            n_links[h] += 1
            pages_per_host.setdefault(h, set()).add(i)
    expected = {h: (n_links[h], len(pages_per_host[h])) for h in n_links}
    assert got == expected


def test_cocitation_matches_brute_force(spark):
    links = outlinks(pages_df(spark, N, partitions=4))
    got = {(r.host_a, r.host_b): r.weight for r in cocitation(links).collect()}
    expected: Counter = Counter()
    for i in range(N):
        hosts = sorted({_canon_host(u) for u in _expected_urls(i)})
        for a, b in itertools.combinations(hosts, 2):
            expected[(a, b)] += 1
    assert got == dict(expected)


def test_unnormalized_pagerank_conserves_mass(spark):
    """normalized=False on a symmetric (sink-free) graph: ranks sum to
    |V| within grid rounding, and the host ordering is sensible (hubs
    on top — they absorb ~60% of links)."""
    from npm_extraction_server_spark.plans.graph import pagerank

    co = cocitation(outlinks(pages_df(spark, N, partitions=4)))
    edges = (co.select(F.col("host_a").alias("src"), F.col("host_b").alias("dst"))
             .unionByName(co.select(F.col("host_b").alias("src"),
                                    F.col("host_a").alias("dst"))))
    ranks = pagerank(edges, iterations=5, normalized=False).collect()
    n = len(ranks)
    total = sum(r.rank for r in ranks)
    assert total == pytest.approx(n, abs=1e-4 * n)
    top = max(ranks, key=lambda r: r.rank).node_id
    assert top.startswith("hub")


def test_normalize_url_folds_messy_forms(spark):
    """Every messy href (uppercase scheme/host, :80, fragment) must
    canonicalize to exactly its clean twin; clean URLs are fixed
    points; non-http strings pass through."""
    from npm_extraction_server_spark.extract.links import normalize_url

    cases = [
        ("HTTP://HUB1.EXAMPLE.ORG:80/p/7#f3", "http://hub1.example.org/p/7"),
        ("http://hub1.example.org/p/7", "http://hub1.example.org/p/7"),
        ("HTTPS://A.Example.org:443/X?q=UP#frag", "https://a.example.org/X?q=UP"),
        ("https://a.example.org:8443/x", "https://a.example.org:8443/x"),
        ("mailto:dev@example.org", "mailto:dev@example.org"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["u"])
    got = {r.u: r.c for r in
           df.withColumn("c", normalize_url("u")).collect()}
    for raw, want in cases:
        assert got[raw] == want, raw
    # and over the real corpus: normalization is idempotent and every
    # canonical URL is lowercase-host with no fragment
    links = outlinks(pages_df(spark, N, partitions=4))
    norm = links.select(normalize_url("dst_url").alias("c")).collect()
    for r in norm:
        host = r.c.split("/")[2]
        assert host == host.lower() and not host.endswith(":80")
        assert "#" not in r.c


def test_hits_matches_integer_brute_force(spark):
    """Unnormalized HITS = exact integer path counts; verify 2 rounds
    against a pure-Python recompute over the page->canonical-url
    bipartite graph."""
    from npm_extraction_server_spark.extract.links import normalize_url
    from npm_extraction_server_spark.plans.graph import hits

    links = outlinks(pages_df(spark, N, partitions=4))
    edges_df = links.select(
        F.col("url").alias("src"), normalize_url("dst_url").alias("dst"))
    got = {r.node_id: (r.hub, r.auth) for r in
           hits(edges_df, iterations=2).collect()}

    def _canon(u):
        if "#" in u:
            u = u.split("#")[0]
        scheme, rest = u.split("://", 1)
        host, path = rest.split("/", 1)
        host = host.lower()
        if host.endswith(":80"):
            host = host[:-3]
        return f"{scheme.lower()}://{host}/{path}"

    url_of = {_page_no(r.url): r.url
              for r in links.select("url").distinct().collect()}
    edges = []  # multigraph, multiplicity kept
    for i in range(N):
        for u in _expected_urls(i):
            edges.append((url_of[i], _canon(u)))
    nodes = {a for a, _ in edges} | {b for _, b in edges}
    hub = {v: 1 for v in nodes}
    for _ in range(2):
        auth = Counter()
        for a, b in edges:
            auth[b] += hub.get(a, 0)
        hub = Counter()
        for a, b in edges:
            hub[a] += auth[b]
    expected = {v: (hub.get(v, 0), auth.get(v, 0)) for v in nodes}
    assert got == expected


def test_anchor_texts_match_recompute(spark):
    """(href, text) pairs out of the html must equal the generator's
    pairs — including the microdata anchor ('home') and the varied nav
    words."""
    from npm_extraction_server_spark.extract.links import anchor_texts

    got = anchor_texts(pages_df(spark, N, partitions=4)).collect()
    by_page: dict[int, Counter] = {}
    for r in got:
        by_page.setdefault(_page_no(r.url), Counter())[(r.dst_url, r.anchor)] += 1
    for i in range(N):
        assert by_page.get(i, Counter()) == Counter(_expected_links(i)), i


def test_stream_link_degrees_fold_to_batch_answer(spark, tmp_path):
    """Two crawl waves stream in (availableNow each time); folding the
    per-epoch degree partials must equal the one-shot batch aggregate
    over all pages — the disjoint-pages-per-batch invariant makes the
    per-batch countDistinct sums exact."""
    from npm_extraction_server_spark.streaming.incremental import (
        read_link_degrees,
        stream_link_degrees,
    )

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    all_pages = pages_df(spark, 30, partitions=3)
    all_pages.filter(F.col("url").rlike("page-[0-9]$")) \
        .write.mode("append").parquet(pages_dir)
    q = stream_link_degrees(spark, pages_dir, out_dir, ckpt)
    q.awaitTermination()
    all_pages.filter(~F.col("url").rlike("page-[0-9]$")) \
        .write.mode("append").parquet(pages_dir)
    q = stream_link_degrees(spark, pages_dir, out_dir, ckpt)
    q.awaitTermination()

    got = {r.dst_host: (r.n_links, r.n_pages)
           for r in read_link_degrees(spark, out_dir).collect()}
    want = {r.dst_host: (r.n_links, r.n_pages)
            for r in host_degree(outlinks(
                spark.read.parquet(pages_dir))).collect()}
    assert got == want
    # second wave produced additional epochs (incremental, not rescan)
    partials = spark.read.parquet(f"{out_dir}/degree_partials")
    assert partials.select("epoch").distinct().count() >= 2


def test_outlink_plan_is_jvm_only_and_prunes_text(spark, tmp_path):
    """The extraction hot path: no Python eval node anywhere (the html
    bytes stay JVM-side), and the parquet scan reads only (url, html)
    — text, the widest column, is pruned."""
    pages_dir = str(tmp_path / "pages")
    write_pages(pages_df(spark, 20, partitions=2), pages_dir)
    df = outlinks(spark.read.parquet(pages_dir))
    plan = df._jdf.queryExecution().executedPlan().toString()
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan
    read_schema = plan.split("ReadSchema")[1][:300]
    assert "html" in read_schema and "text" not in read_schema


# ---------------------------------------------------------------------------
# crawl frontier: robots rules + politeness schedule (extract/crawl.py)


def test_parse_robots_handles_spec_edge_cases(spark):
    """Multiple Disallow lines emit one rule each; an EMPTY Disallow
    ('Disallow:' = allow-all per the spec) emits no rule; missing
    Crawl-delay defaults to 1; bytes are parsed JVM-side."""
    from npm_extraction_server_spark.extract.crawl import parse_robots

    rows = [
        ("a.org", b"User-agent: *\nDisallow: /p/1\nDisallow: /admin\n"
                  b"Crawl-delay: 3\n"),
        ("b.org", b"User-agent: *\nDisallow:\n"),          # allow-all
        ("c.org", b"User-agent: *\nDisallow: /x\n"),       # no delay -> 1
    ]
    robots = spark.createDataFrame(rows, "host string, robots binary")
    rules = {(r["host"], r["disallow_prefix"], r["crawl_delay_s"])
             for r in parse_robots(robots).collect()}
    assert rules == {("a.org", "/p/1", 3), ("a.org", "/admin", 3),
                     ("c.org", "/x", 1)}
    plan = parse_robots(robots)._jdf.queryExecution().executedPlan().toString()
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_robots_filter_prefix_semantics(spark):
    """The filter drops exactly the URLs whose PATH starts with a
    disallow prefix of THEIR host — prefix match (not equality), query
    strings excluded from the path, other hosts untouched."""
    from npm_extraction_server_spark.extract.crawl import robots_filter

    frontier = spark.createDataFrame(
        [("http://a.org/p/1", "a.org"),
         ("http://a.org/p/12?q=1", "a.org"),   # prefix match incl. query url
         ("http://a.org/p/2", "a.org"),
         ("http://b.org/p/1", "b.org")],       # same path, unruled host
        "canon_url string, dst_host string")
    rules = spark.createDataFrame([("a.org", "/p/1", 1)],
                                  "host string, disallow_prefix string, "
                                  "crawl_delay_s int")
    kept = {r["canon_url"] for r in robots_filter(frontier, rules).collect()}
    assert kept == {"http://a.org/p/2", "http://b.org/p/1"}


def test_fetch_rounds_politeness_invariant(spark):
    """At most per_round URLs of one host share a round; rounds are
    dense from 0; the offset is round * the host's crawl-delay; the
    schedule is a pure function of the URL set (rerun-identical)."""
    from npm_extraction_server_spark.extract.crawl import fetch_rounds

    frontier = spark.createDataFrame(
        [(f"http://h{i % 2}.org/p/{i}", f"h{i % 2}.org") for i in range(10)],
        "canon_url string, dst_host string")
    rules = spark.createDataFrame(
        [("h0.org", "/zzz", 2), ("h1.org", "/zzz", 3)],
        "host string, disallow_prefix string, crawl_delay_s int")
    a = fetch_rounds(frontier, rules, per_round=2).collect()
    per = Counter((r["dst_host"], r["round"]) for r in a)
    assert max(per.values()) <= 2
    for host, delay in (("h0.org", 2), ("h1.org", 3)):
        rounds = sorted(r["round"] for r in a if r["dst_host"] == host)
        assert rounds == [0, 0, 1, 1, 2], rounds
        for r in a:
            if r["dst_host"] == host:
                assert r["fetch_offset_s"] == r["round"] * delay
    b = fetch_rounds(frontier, rules, per_round=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ---------------------------------------------------------------------------
# main-content extraction (extract/content.py)


def test_main_content_density_classification(spark):
    """Block classification: prose with a below-threshold inline link
    survives; title/short stubs fall to the length floor; nav falls to
    link density; scripts/styles vanish before segmentation (markup
    inside a script string must not leak blocks); all JVM-side."""
    from npm_extraction_server_spark.extract.content import (
        extract_main_content,
    )

    html = (
        "<!DOCTYPE html><html><head><title>Site Title</title>"
        "<style>p { color: red; }</style></head><body>"
        "<p>short</p>"
        "<p>this paragraph has plenty of prose with one "
        '<a href="x">link</a> inside it somewhere</p>'
        '<script type="application/json">{"a": "<p>fake block</p>"}'
        "</script>"
        "<article>the real article body with enough characters to pass"
        "</article>"
        '<nav><a href="a">one</a><a href="b">two</a>'
        '<a href="c">three four five six seven eight</a></nav>'
        "</body></html>")
    df = spark.createDataFrame([("u", html.encode())],
                               "url string, html binary")
    out = extract_main_content(df)
    r = out.collect()[0]
    assert r["main_text"] == (
        "this paragraph has plenty of prose with one link inside it "
        "somewherethe real article body with enough characters to pass")
    assert r["n_content_blocks"] == 2
    assert r["n_blocks"] == 5  # title, short, prose, article, nav
    plan = out._jdf.queryExecution().executedPlan().toString()
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_main_content_thresholds_are_tunable(spark):
    """min_len / max_link_density move the decision boundary."""
    from npm_extraction_server_spark.extract.content import (
        extract_main_content,
    )

    html = "<p>tiny</p><p>half of this block is <a href='x'>anchor text here</a></p>"
    df = spark.createDataFrame([("u", html.encode())],
                               "url string, html binary")
    strict = extract_main_content(df, min_len=1,
                                  max_link_density=0.1).collect()[0]
    lax = extract_main_content(df, min_len=1,
                               max_link_density=0.9).collect()[0]
    assert strict["n_content_blocks"] == 1          # only "tiny"
    assert lax["n_content_blocks"] == 2


# ---------------------------------------------------------------------------
# sitemap discovery (extract/crawl.py)


def test_parse_sitemap_handles_both_formats(spark):
    """Index files emit kind='index' rows whose loc is the child
    sitemap URL; urlsets emit one row per <url> entry with
    loc/lastmod/priority; JVM-side only."""
    from npm_extraction_server_spark.extract.crawl import parse_sitemap

    rows = [
        ("a.org", "http://a.org/sitemap.xml",
         b'<?xml version="1.0"?><sitemapindex>'
         b"<sitemap><loc>http://a.org/sitemap-0.xml</loc></sitemap>"
         b"</sitemapindex>"),
        ("b.org", "http://b.org/sitemap.xml",
         b'<?xml version="1.0"?><urlset>'
         b"<url><loc>http://b.org/s/1</loc><lastmod>2024-01-05</lastmod>"
         b"<priority>0.7</priority></url>"
         b"<url><loc>http://b.org/s/2</loc><lastmod>2024-01-06</lastmod>"
         b"<priority>0.2</priority></url></urlset>"),
    ]
    sm = spark.createDataFrame(
        rows, "host string, sitemap_url string, xml binary")
    got = {(r["host"], r["kind"], r["loc"], r["lastmod"], r["priority"])
           for r in parse_sitemap(sm).collect()}
    assert got == {
        ("a.org", "index", "http://a.org/sitemap-0.xml", None, None),
        ("b.org", "urlset", "http://b.org/s/1", "2024-01-05", "0.7"),
        ("b.org", "urlset", "http://b.org/s/2", "2024-01-06", "0.2"),
    }
    plan = parse_sitemap(sm)._jdf.queryExecution().executedPlan().toString()
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_sitemap_frontier_reachability_only(spark):
    """Frontier expansion follows root -> referenced children only: an
    unreferenced child sitemap contributes nothing; index hosts pull
    every referenced child's entries."""
    from npm_extraction_server_spark.extract.crawl import sitemap_frontier

    rows = [
        ("a.org", "http://a.org/sitemap.xml",
         b"<sitemapindex><sitemap><loc>http://a.org/sitemap-0.xml</loc>"
         b"</sitemap></sitemapindex>"),
        ("a.org", "http://a.org/sitemap-0.xml",
         b"<urlset><url><loc>http://a.org/s/1</loc>"
         b"<lastmod>2024-01-01</lastmod><priority>0.5</priority></url>"
         b"</urlset>"),
        # orphan: never referenced by the root index
        ("a.org", "http://a.org/sitemap-9.xml",
         b"<urlset><url><loc>http://a.org/s/999</loc>"
         b"<lastmod>2024-01-02</lastmod><priority>0.1</priority></url>"
         b"</urlset>"),
        ("b.org", "http://b.org/sitemap.xml",
         b"<urlset><url><loc>http://b.org/s/7</loc>"
         b"<lastmod>2024-01-03</lastmod><priority>0.9</priority></url>"
         b"</urlset>"),
    ]
    sm = spark.createDataFrame(
        rows, "host string, sitemap_url string, xml binary")
    got = {(r["host"], r["loc"]) for r in sitemap_frontier(sm).collect()}
    assert got == {("a.org", "http://a.org/s/1"), ("b.org", "http://b.org/s/7")}


def test_synth_sitemaps_roundtrip_through_parser(spark):
    """The synthesizer's XML is exactly what the parser expects: every
    generated urlset entry survives the parse, and index hosts emit
    1 index + 2 children."""
    from npm_extraction_server_spark.extract.crawl import (
        parse_sitemap,
        synth_sitemaps,
    )

    hosts = spark.createDataFrame(
        [(f"h{i}.org",) for i in range(12)], "host string")
    sm = synth_sitemaps(hosts)
    parsed = parse_sitemap(sm)
    per_host = {r["host"]: r["count"] for r in
                sm.groupBy("host").count().collect()}
    assert set(per_host.values()) <= {1, 3}
    assert 3 in set(per_host.values())  # some index host in 12 draws
    # every urlset row parses with complete fields
    bad = parsed.filter(
        (F.col("kind") == "urlset")
        & ((F.col("loc") == "") | (F.col("lastmod") == "")
           | (F.col("priority") == ""))).count()
    assert bad == 0


def test_resolve_redirects_chains_cycles_and_caps(spark):
    from npm_extraction_server_spark.extract.links import resolve_redirects

    # a->b->c->T (3 hops), d->T (1 hop), cycle x->y->x, feeder f->x,
    # and a 6-chain resolved only when max_hops allows it
    six = [(f"c{i}", f"c{i+1}") for i in range(6)]  # c0..c5 -> c6
    red = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "T"), ("d", "T"),
         ("x", "y"), ("y", "x"), ("f", "x")] + six,
        "src_url string, dst_url string")

    got = {r.src_url: r for r in resolve_redirects(red, max_hops=16)
           .collect()}
    assert (got["a"].final_url, got["a"].hops,
            got["a"].unresolved) == ("T", 3, False)
    assert (got["d"].final_url, got["d"].hops) == ("T", 1)
    # exact hop counts survive pointer doubling
    assert (got["c0"].final_url, got["c0"].hops) == ("c6", 6)
    assert (got["c4"].final_url, got["c4"].hops) == ("c6", 2)
    # cycle members AND the feeder into the cycle are unresolved
    for u in ("x", "y", "f"):
        assert got[u].unresolved and got[u].final_url is None \
            and got[u].hops is None

    # hop cap: with max_hops=4 the 6-chain head exceeds the budget
    got4 = {r.src_url: r for r in resolve_redirects(red, max_hops=4)
            .collect()}
    assert got4["c0"].unresolved
    assert (got4["c3"].final_url, got4["c3"].hops) == ("c6", 3)


def test_spam_mass_trust_separates_seeded_cluster(spark):
    from npm_extraction_server_spark.plans.graph import spam_mass

    # two symmetric triangles bridged by one edge; seeds in the left
    tri = lambda a, b, c: [(a, b), (b, c), (c, a),
                           (b, a), (c, b), (a, c)]
    edges = spark.createDataFrame(
        tri("h0", "h1", "h2") + tri("s0", "s1", "s2")
        + [("h2", "s0"), ("s0", "h2")], "src string, dst string")
    seeds = spark.createDataFrame([("h0",), ("h1",)], "node_id string")
    rows = {r.node_id: r for r in spam_mass(edges, seeds).collect()}

    assert len(rows) == 6
    # trusted cluster holds nearly all trust mass; spam cluster's
    # spam_mass is strictly higher than every trusted node's
    worst_trusted = max(rows[n].spam_mass for n in ("h0", "h1", "h2"))
    best_spam = min(rows[n].spam_mass for n in ("s0", "s1", "s2"))
    assert best_spam > worst_trusted
    # the quotient stage is pinned: recompute spam_mass from the
    # published 8-dp columns with exact sums
    from decimal import Decimal
    spr = float(sum(Decimal(str(r.pr)) for r in rows.values()))
    strn = float(sum(Decimal(str(r.tr)) for r in rows.values()))
    for r in rows.values():
        want = round(1.0 - (r.tr / strn) / (r.pr / spr), 8)
        assert r.spam_mass == want, r
