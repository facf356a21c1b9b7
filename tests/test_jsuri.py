"""Char-table tests for the JS-compatible URI kernels (SURVEY.md hard part R2)."""

from npm_extraction_server_spark.functions.jsuri import (
    encode_uri,
    encode_uri_component,
    iri_is_valid,
    url_join,
    valid_url_is_uri,
)


def test_encode_uri_component_unreserved():
    s = "ABCxyz019-_.!~*'()"
    assert encode_uri_component(s) == s


def test_encode_uri_component_reserved():
    # JS: encodeURIComponent("@scope/pkg") === '%40scope%2Fpkg'
    assert encode_uri_component("@scope/pkg") == "%40scope%2Fpkg"
    assert encode_uri_component("a b") == "a%20b"
    assert encode_uri_component("1.0.0-beta+build") == "1.0.0-beta%2Bbuild"
    assert encode_uri_component("^1.0.0") == "%5E1.0.0"
    assert encode_uri_component(">=2 <3") == "%3E%3D2%20%3C3"
    assert encode_uri_component("a#b?c&d=e") == "a%23b%3Fc%26d%3De"
    assert encode_uri_component("a:b;c,d") == "a%3Ab%3Bc%2Cd"


def test_encode_uri_component_utf8():
    # JS: encodeURIComponent('é') === '%C3%A9'; '€' === '%E2%82%AC'
    assert encode_uri_component("é") == "%C3%A9"
    assert encode_uri_component("€") == "%E2%82%AC"
    assert encode_uri_component("héllo") == "h%C3%A9llo"


def test_encode_uri_keeps_reserved():
    assert encode_uri("mailto:a@b.c") == "mailto:a@b.c"
    assert encode_uri("http://x.org/a b?q=1&r#f") == "http://x.org/a%20b?q=1&r#f"
    assert encode_uri("a b;c,d/e") == "a%20b;c,d/e"


def test_valid_url():
    assert valid_url_is_uri("http://example.org/a/b")
    assert valid_url_is_uri("mailto:john@example.org")
    assert valid_url_is_uri("ssh://git@github.com/a/b.git")
    assert valid_url_is_uri("https://spdx.org/licenses/MIT.html")
    assert valid_url_is_uri("a@b.c") is None  # no scheme
    assert valid_url_is_uri("not a url") is None  # spaces illegal
    assert valid_url_is_uri("") is None
    assert valid_url_is_uri("http://ex.org/%zz") is None  # bad hex escape
    assert valid_url_is_uri("1http://x") is None  # scheme must start with letter


def test_iri_is_valid():
    # the fast regex path (JsonLdParser.js:131)
    assert iri_is_valid("http://example.org/bundles/npm/n3")
    assert iri_is_valid("_:b0")
    # regex fails on %40 but valid-url fallback accepts
    assert iri_is_valid("http://ex.org/bundles/npm/%40org%2Fpkg")
    assert not iri_is_valid("undefined/name")
    assert not iri_is_valid("just text")


def test_url_join():
    assert (
        url_join("http://ex.org/bundles/npm/n3/1.0.0", ".well-known/genid/", "abc0")
        == "http://ex.org/bundles/npm/n3/1.0.0/.well-known/genid/abc0"
    )
    assert url_join("http://ex.org/x/", ".well-known/genid/", "h1") == (
        "http://ex.org/x/.well-known/genid/h1"
    )
