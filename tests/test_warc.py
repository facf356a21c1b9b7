"""WARC / WET / WAT container format (sources/warc.py)."""

import gzip
import tempfile
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from npm_extraction_server_spark.extract.links import outlinks
from npm_extraction_server_spark.sources import warc as W
from npm_extraction_server_spark.sources.pages import pages_df


@pytest.fixture(scope="module")
def pages(spark):
    df = pages_df(spark, 40, partitions=3).cache()
    df.count()
    yield df
    df.unpersist()


def _roundtrip_mismatches(spark, pages, compress):
    d = tempfile.mkdtemp(prefix="warc_t_")
    summary = W.write_warc(pages, d, kind="response", compress=compress)
    assert sum(s["n_records"] for s in summary) == 40
    back = W.read_warc(spark, d)
    j = back.join(pages.select("url", "html", "warc_ts"), on="url")
    return back, j.filter(
        (F.col("payload") != F.col("html"))
        | (F.col("warc_date") != F.col("warc_ts"))
        | (F.col("http_status") != 200)
    ).count()


def test_response_roundtrip_gzip(spark, pages):
    back, bad = _roundtrip_mismatches(spark, pages, compress=True)
    assert bad == 0
    assert back.count() == 40


def test_response_roundtrip_plain(spark, pages):
    back, bad = _roundtrip_mismatches(spark, pages, compress=False)
    assert bad == 0
    assert back.count() == 40


def test_each_record_is_own_gzip_member(spark, pages):
    """The CC layout contract: the file is a concatenation of
    independent gzip members (record-seekable), not one stream."""
    d = tempfile.mkdtemp(prefix="warc_m_")
    summary = W.write_warc(pages, d, kind="response", compress=True)
    f = summary[0]["file"]
    buf = open(f, "rb").read()
    members = buf.count(b"\x1f\x8b\x08")
    # warcinfo + each response record = records + 1 members;
    # (magic can theoretically occur inside deflate data, so >=)
    assert members >= summary[0]["n_records"] + 1
    # and the first member alone inflates to exactly one whole record
    first = gzip.GzipFile(fileobj=__import__("io").BytesIO(buf))
    rec = next(W.parse_warc_bytes(buf))
    assert rec[0]["warc-type"] == "warcinfo"


def test_framing_survives_crlf_crlf_in_payload():
    """Content-Length framing: a payload full of blank lines must not
    split the record."""
    evil = b"a\r\n\r\nb\r\n\r\n" * 10 + b"WARC/1.0\r\n"
    rec = W._frame_record("response", "http://x.example/e", "2020-01-01T00:00:00Z",
                          evil)
    out = list(W.parse_warc_bytes(rec * 3))
    assert len(out) == 3
    assert all(p == evil for _, p in out)


def test_http_payload_split():
    status, body = W.split_http_payload(
        b"HTTP/1.1 404 Not Found\r\nX: y\r\n\r\n<html>\r\n\r\n</html>")
    assert status == 404 and body == b"<html>\r\n\r\n</html>"
    # non-HTTP payload passes through
    status, body = W.split_http_payload(b"plain")
    assert status is None and body == b"plain"


def test_wet_text_byte_identity(spark, pages):
    d = tempfile.mkdtemp(prefix="wet_t_")
    W.write_warc(W.wet_from_pages(pages), d, kind="conversion")
    wet = W.read_warc(spark, d, record_types=("conversion",))
    j = (wet.select("url", F.decode("payload", "UTF-8").alias("t"))
         .join(pages.select("url", "text"), on="url"))
    assert j.filter(F.col("t") != F.col("text")).count() == 0
    assert j.count() == 40


def test_wet_unicode_payload(spark):
    df = spark.createDataFrame(
        [("http://u.example/1", datetime(2020, 1, 1), "héllo wörld — 你好 🎉")],
        "url string, warc_ts timestamp, text string")
    d = tempfile.mkdtemp(prefix="wet_u_")
    W.write_warc(df, d, kind="conversion")
    back = W.read_warc(spark, d, record_types=("conversion",))
    row = back.collect()[0]
    assert bytes(row.payload).decode("utf-8") == "héllo wörld — 你好 🎉"


def test_wat_outlinks_match_direct_extraction(spark, pages):
    d = tempfile.mkdtemp(prefix="wat_t_")
    W.write_warc(W.wat_from_pages(pages), d, kind="metadata")
    got = W.wat_outlinks(W.read_warc(spark, d, record_types=("metadata",)))
    want = outlinks(pages).select("url", "dst_url")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_record_type_filter_skips_warcinfo_and_others(spark, pages):
    d = tempfile.mkdtemp(prefix="warc_f_")
    W.write_warc(pages, d, kind="response")
    assert W.read_warc(spark, d, record_types=("conversion",)).count() == 0


def test_malformed_inputs_raise():
    with pytest.raises(W.WarcFormatError, match="version"):
        list(W.parse_warc_bytes(b"NOT-WARC\r\nX: 1\r\n\r\n"))
    good = W._frame_record("response", "http://x/1", "2020-01-01T00:00:00Z", b"abc")
    with pytest.raises(W.WarcFormatError, match="truncated"):
        list(W.parse_warc_bytes(good[:-5]))  # cut into the payload
    nolen = good.replace(b"Content-Length: 3", b"Content-Length: x")
    with pytest.raises(W.WarcFormatError, match="Content-Length"):
        list(W.parse_warc_bytes(nolen))


def test_rewrite_is_idempotent(spark, pages):
    """Simulated task retry: writing the same partition twice publishes
    the same file once (tmp + atomic rename)."""
    d = tempfile.mkdtemp(prefix="warc_i_")
    s1 = W.write_warc(pages, d, kind="response")
    s2 = W.write_warc(pages, d, kind="response")
    assert sorted(x["file"] for x in s1) == sorted(x["file"] for x in s2)
    assert W.read_warc(spark, d).count() == 40


def test_empty_partitions_write_no_file(spark):
    df = (spark.createDataFrame(
        [("http://e.example/1", datetime(2020, 1, 1), b"<p>x</p>")],
        "url string, warc_ts timestamp, html binary")
        .repartition(4))
    d = tempfile.mkdtemp(prefix="warc_e_")
    summary = W.write_warc(df, d, kind="response")
    assert len(summary) <= 1 or sum(s["n_records"] for s in summary) == 1
    assert W.read_warc(spark, d).count() == 1


def test_cdx_spans_random_access_and_surt(spark, tmp_path):
    """CDX contract: file[offset : offset+length] gunzips to exactly
    the indexed record (digest of its payload matches the row), for
    both compressed and plain layouts; SURT keys normalize case and
    reverse host labels; warcinfo is not indexed."""
    import gzip as _gzip
    import hashlib

    from pyspark.sql import functions as F

    from npm_extraction_server_spark.sources.warc import (
        build_cdx,
        parse_warc_bytes,
        surt,
        write_warc,
    )

    assert surt("http://Crawl.Example.org/A/b?Q=1") == \
        "org,example,crawl)/a/b?q=1"
    assert surt("https://example.org") == "org,example)/"

    pages = spark.createDataFrame(
        [(f"http://h{i % 3}.example.org/p/{i}",
          __import__("datetime").datetime(2017, 6, 1, 0, 0, i),
          f"text body {i}") for i in range(12)],
        "url string, warc_ts timestamp, text string")

    for compress in (True, False):
        d = str(tmp_path / f"w_{compress}")
        write_warc(pages.repartition(3), d, kind="conversion",
                   compress=compress)
        rows = build_cdx(spark, d).collect()
        assert len(rows) == 12            # warcinfo rows excluded
        by_key = {}
        for r in rows:
            raw = open(f"{d}/{r.file}", "rb").read()
            member = raw[r.offset:r.offset + r.length]
            data = _gzip.decompress(member) if compress else member
            (headers, payload), = list(parse_warc_bytes(data))
            assert headers["warc-target-uri"].endswith(
                r.urlkey.split(")/", 1)[1].rsplit("/", 1)[-1])
            assert hashlib.sha256(payload).hexdigest() == r.digest
            by_key[r.urlkey] = payload.decode()
        assert by_key["org,example,h1)/p/1"] == "text body 1"


def test_consolidate_revisits_rule(spark):
    import datetime as dt

    from npm_extraction_server_spark.sources.warc import (
        consolidate_revisits,
    )

    t0 = dt.datetime(2020, 1, 1)
    rows = [
        # same urlkey+digest captured three times: earliest wins
        ("k1", t0 + dt.timedelta(days=1), "f", 10, 5, "d1"),
        ("k1", t0, "f", 0, 5, "d1"),
        ("k1", t0 + dt.timedelta(days=2), "f", 20, 5, "d1"),
        # same urlkey, DIFFERENT digest: its own response
        ("k1", t0 + dt.timedelta(days=3), "f", 30, 5, "d2"),
        # timestamp tie: offset breaks it
        ("k2", t0, "f", 100, 5, "d3"),
        ("k2", t0, "f", 50, 5, "d3"),
    ]
    cdx = spark.createDataFrame(
        rows, "urlkey string, warc_ts timestamp, file string, "
              "offset long, length long, digest string")
    rows_out = consolidate_revisits(cdx).collect()
    got = {(r.urlkey, r.warc_ts, r.digest): (r.kind, r.ref_ts)
           for r in rows_out if r.urlkey != "k2"}

    assert got[("k1", t0, "d1")] == ("response", None)
    assert got[("k1", t0 + dt.timedelta(days=1), "d1")] == ("revisit", t0)
    assert got[("k1", t0 + dt.timedelta(days=2), "d1")] == ("revisit", t0)
    assert got[("k1", t0 + dt.timedelta(days=3), "d2")][0] == "response"
    # timestamp tie: exactly one response (offset 50 canonical), one
    # revisit referencing the same instant
    k2 = sorted((r.kind, r.ref_ts) for r in rows_out if r.urlkey == "k2")
    assert k2 == [("response", None), ("revisit", t0)]
