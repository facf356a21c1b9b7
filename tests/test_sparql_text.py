"""plans/sparql.py — SPARQL text front-end over the BGP algebra.

Every accepted query must return exactly what the corresponding
algebra call returns (same rows, same columns); unsupported syntax
must raise SparqlUnsupported, never mis-evaluate.
"""

import pytest

from npm_extraction_server_spark.plans.sparql import (
    SparqlUnsupported,
    sparql,
)

EX = "http://ex.org/"
T = [
    ("e:v1", EX + "name", '"one"'),
    ("e:v1", EX + "dep", "e:v2"),
    ("e:v1", EX + "dep", "e:v3"),
    ("e:v2", EX + "name", '"two"'),
    ("e:v2", EX + "dep", "e:v3"),
    ("e:v3", EX + "name", '"three"'),
    ("e:v1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
     EX + "Version"),
]


@pytest.fixture(scope="module")
def t(spark):
    return spark.createDataFrame(T, ["subj", "pred", "obj"]).cache()


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_select_join_prefix_and_a(t):
    out = sparql(t, """
        PREFIX ex: <http://ex.org/>
        SELECT ?n WHERE { ?v a ex:Version ; ex:name ?n . }
    """)
    assert out.columns == ["n"] and rows(out) == [('"one"',)]


def test_select_star_and_semicolon_comma(t):
    out = sparql(t, """PREFIX ex: <http://ex.org/>
        SELECT * WHERE { ?v ex:name ?n ; ex:dep ?d . }""")
    assert set(out.columns) == {"v", "n", "d"}
    assert len(rows(out)) == 3


def test_filter_regex_equality_and_contains(t):
    # REGEX patterns run against the STORED form (leading quote);
    # the pattern literal's own quotes are syntax
    out = sparql(t, """PREFIX ex: <http://ex.org/>
        SELECT ?v WHERE { ?v ex:name ?n . FILTER(REGEX(?n, "^.tw")) }""")
    assert rows(out) == [("e:v2",)]
    eq = sparql(t, """PREFIX ex: <http://ex.org/>
        SELECT ?v WHERE { ?v ex:name ?n . FILTER(?n = "one") }""")
    assert rows(eq) == [("e:v1",)]  # stored-form comparison
    c = sparql(t, """PREFIX ex: <http://ex.org/>
        SELECT ?v WHERE { ?v ex:name ?n .
            FILTER(CONTAINS(?n, "hre") || CONTAINS(?n, "ne")) }""")
    assert rows(c) == [("e:v1",), ("e:v3",)]


def test_optional_null_extension(t):
    out = sparql(t, """PREFIX ex: <http://ex.org/>
        SELECT ?v ?d WHERE { ?v ex:name ?n .
            OPTIONAL { ?v ex:dep ?d } }""")
    got = dict()
    for v, d in rows(out):
        got.setdefault(v, []).append(d)
    assert got["e:v3"] == [None]
    assert sorted(got["e:v1"]) == ["e:v2", "e:v3"]


def test_union_minus_exists_equivalence(t):
    u = sparql(t, """PREFIX ex: <http://ex.org/>
        SELECT ?x WHERE { { ?x ex:dep <e:v3> } UNION
                          { ?x a ex:Version } }""")
    assert rows(u) == [("e:v1",), ("e:v2",)]
    m = sparql(t, """PREFIX ex: <http://ex.org/>
        SELECT ?v WHERE { ?v ex:name ?n . MINUS { ?v ex:dep ?d } }""")
    assert rows(m) == [("e:v3",)]
    e = sparql(t, """PREFIX ex: <http://ex.org/>
        SELECT ?v WHERE { ?v ex:name ?n .
                          FILTER NOT EXISTS { ?v ex:dep ?d } }""")
    assert rows(e) == [("e:v3",)]


def test_aggregate_group_having_order_limit(t):
    out = sparql(t, """PREFIX ex: <http://ex.org/>
        SELECT ?v (COUNT(DISTINCT ?d) AS ?nd)
        WHERE { ?v ex:dep ?d }
        GROUP BY ?v HAVING (?nd >= 1)
        ORDER BY DESC(?nd) ?v LIMIT 2""")
    assert out.columns == ["v", "nd"]
    assert [tuple(r) for r in out.collect()] == [("e:v1", 2), ("e:v2", 1)]


def test_values_and_bind(t):
    out = sparql(t, """PREFIX ex: <http://ex.org/>
        SELECT ?v ?tag WHERE { ?v ex:name ?n .
            BIND(CONCAT(?v, "!") AS ?tag)
            VALUES ?v { <e:v1> <e:v3> } }""")
    assert rows(out) == [("e:v1", "e:v1!"), ("e:v3", "e:v3!")]


def test_ask_construct_describe(t):
    assert sparql(t, """PREFIX ex: <http://ex.org/>
        ASK { <e:v1> ex:dep <e:v2> }""").collect()[0]["ask"] is True
    assert sparql(t, """PREFIX ex: <http://ex.org/>
        ASK { <e:v3> ex:dep ?x }""").collect()[0]["ask"] is False
    c = sparql(t, """PREFIX ex: <http://ex.org/>
        PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
        CONSTRUCT { ?v rdfs:label ?n } WHERE { ?v ex:name ?n }""")
    assert len(rows(c)) == 3 and rows(c)[0][1].endswith("label")
    d = sparql(t, "DESCRIBE <e:v2>")
    # e:v2 as subject (2 triples) + as object (1)
    assert len(rows(d)) == 3


def test_graph_patterns_on_quads(spark):
    q = spark.createDataFrame(
        [("s", "p", "o", "g1"), ("s", "p", "o2", "g2")],
        ["subj", "pred", "obj", "graph"])
    out = sparql(q, 'SELECT ?g ?o WHERE { GRAPH ?g { <s> <p> ?o } }')
    assert rows(out) == [("g1", "o"), ("g2", "o2")]
    one = sparql(q, 'SELECT ?o WHERE { GRAPH <g2> { <s> <p> ?o } }')
    assert rows(one) == [("o2",)]


def test_unsupported_raises(t):
    for q in [
        "SELECT ?x WHERE { ?x <p>+ ?y }",          # property path
        """PREFIX ex: <http://ex.org/>
           SELECT ?v WHERE { ?v ex:name ?n .
             OPTIONAL { ?v ex:dep ?d } MINUS { ?v ex:dep ?d } }""",
        "INSERT DATA { <a> <b> <c> }",             # update via sparql()
        "SELECT ?v WHERE { ?v unknown:p ?n }",     # undeclared prefix
    ]:
        with pytest.raises(SparqlUnsupported):
            sparql(t, q)


def test_matches_direct_algebra_call(t):
    from npm_extraction_server_spark.plans.bgp import bgp_join

    via_text = sparql(t, """PREFIX ex: <http://ex.org/>
        SELECT ?v ?d WHERE { ?v ex:dep ?d . ?d ex:name ?n . }""")
    direct = bgp_join(t, [("?v", EX + "dep", "?d"),
                          ("?d", EX + "name", "?n")], select=["v", "d"])
    assert rows(via_text) == rows(direct)


def test_property_path_seq_alt_inv_neg(t):
    seq = sparql(t, """PREFIX ex: <http://ex.org/>
        SELECT ?s ?n WHERE { ?s ex:dep/ex:name ?n }""")
    assert rows(seq) == [("e:v1", '"three"'), ("e:v1", '"two"'),
                         ("e:v2", '"three"')]
    inv = sparql(t, """PREFIX ex: <http://ex.org/>
        SELECT ?d ?v WHERE { ?d ^ex:dep ?v }""")
    assert rows(inv) == [("e:v2", "e:v1"), ("e:v3", "e:v1"),
                         ("e:v3", "e:v2")]
    alt = sparql(t, """PREFIX ex: <http://ex.org/>
        SELECT ?x ?y WHERE { ?x ex:dep|ex:name ?y }""")
    assert len(rows(alt)) == 6
    neg = sparql(t, """PREFIX ex: <http://ex.org/>
        SELECT ?x ?y WHERE { ?x !(ex:dep|ex:name) ?y }""")
    assert rows(neg) == [("e:v1", EX + "Version")]  # only rdf:type


def test_property_path_joins_base_patterns(t):
    out = sparql(t, """PREFIX ex: <http://ex.org/>
        SELECT ?v ?dn WHERE {
            ?v ex:name ?n .
            ?v ex:dep/ex:name ?dn .
            FILTER(?n = "one") }""")
    assert rows(out) == [("e:v1", '"three"'), ("e:v1", '"two"')]


def test_property_path_constant_endpoint(t):
    out = sparql(t, """PREFIX ex: <http://ex.org/>
        SELECT ?n WHERE { <e:v1> ex:dep/ex:name ?n }""")
    assert rows(out) == [('"three"',), ('"two"',)]


def test_path_closure_raises(t):
    with pytest.raises(SparqlUnsupported):
        sparql(t, """PREFIX ex: <http://ex.org/>
            SELECT ?x ?y WHERE { ?x ex:dep+ ?y }""")


def test_path_matches_algebra(t):
    from npm_extraction_server_spark.plans.bgp import path_edges

    via_text = sparql(t, """PREFIX ex: <http://ex.org/>
        SELECT ?src ?dst WHERE { ?src (ex:dep/ex:name)|ex:name ?dst }""")
    direct = path_edges(
        t, ("alt", ("seq", EX + "dep", EX + "name"), EX + "name"))
    assert rows(via_text) == sorted(
        (r["src"], r["dst"]) for r in direct.collect())
