"""plans/kg.prov_triples — PROV-O provenance star per source document."""

import datetime

from npm_extraction_server_spark.plans.kg import PROV, prov_triples

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def test_star_shape_and_timestamps(spark):
    t = spark.createDataFrame(
        [("http://x/1", "s", "p", "o"), ("http://x/1", "s2", "p", "o"),
         ("http://x/2", "s", "p", "o")],
        ["src_url", "subj", "pred", "obj"])
    pages = spark.createDataFrame(
        [("http://x/1", datetime.datetime(2017, 6, 1, 0, 0, 7)),
         ("http://x/2", None)],  # null warc_ts: no generatedAtTime row
        ["url", "warc_ts"])
    rows = {(r["subj"], r["pred"], r["obj"])
            for r in prov_triples(t, pages=pages).collect()}
    u = "http://x/1"
    assert (u, RDF_TYPE, PROV + "Entity") in rows
    assert (u + "#graph", PROV + "wasDerivedFrom", u) in rows
    assert (u + "#graph", PROV + "wasGeneratedBy", u + "#extract") in rows
    assert (u + "#extract", RDF_TYPE, PROV + "Activity") in rows
    assert (u + "#extract", PROV + "used", u) in rows
    assert (u + "#graph", PROV + "generatedAtTime",
            '"2017-06-01T00:00:07.000Z"'
            '^^http://www.w3.org/2001/XMLSchema#dateTime') in rows
    # doc 2: full 6-row star but NO generatedAtTime (null warc_ts)
    two = [r for r in rows if r[0].startswith("http://x/2")]
    assert len(two) == 6
    assert not any(r[1] == PROV + "generatedAtTime" for r in two)
    # one star per DISTINCT document, regardless of triple count
    assert len(rows) == 7 + 6


def test_without_pages_no_time(spark):
    t = spark.createDataFrame([("http://x/1", "s", "p", "o")],
                              ["src_url", "subj", "pred", "obj"])
    out = prov_triples(t).collect()
    assert len(out) == 6
    assert not any(r["pred"] == PROV + "generatedAtTime" for r in out)
