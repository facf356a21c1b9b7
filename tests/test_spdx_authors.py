"""Unit tests for the SPDX and parse-author kernels (S3/S7)."""

import pytest

from npm_extraction_server_spark.functions.authors import parse_author
from npm_extraction_server_spark.functions.spdx import (
    SpdxError,
    correct,
    parse_spdx,
)


def test_parse_author_full():
    assert parse_author("Jane Doe <jane@example.org> (http://jane.example.org)") == {
        "name": "Jane Doe", "email": "jane@example.org",
        "url": "http://jane.example.org"}


def test_parse_author_partial():
    assert parse_author("Jane Doe") == {"name": "Jane Doe"}
    assert parse_author("Jane <j@e.org>") == {"name": "Jane", "email": "j@e.org"}
    assert parse_author("<j@e.org>") == {"email": "j@e.org"}
    assert parse_author("(http://x.org)") == {"url": "http://x.org"}


def test_parse_author_degenerate():
    assert parse_author("") == {}
    assert parse_author("   ") == {}
    with pytest.raises(TypeError):
        parse_author(None)


def test_spdx_single():
    assert parse_spdx("MIT") == {"license": "MIT"}
    assert parse_spdx("Apache-2.0") == {"license": "Apache-2.0"}


def test_spdx_expressions():
    node = parse_spdx("(MIT OR Apache-2.0)")
    assert node["conjunction"] == "or"
    assert node["left"] == {"license": "MIT"}
    assert node["right"] == {"license": "Apache-2.0"}
    node = parse_spdx("GPL-2.0 AND MIT")
    assert node["conjunction"] == "and"


def test_spdx_with_exception_and_plus():
    node = parse_spdx("GPL-2.0+ WITH Classpath-exception-2.0")
    assert node["license"] == "GPL-2.0"
    assert node["plus"] is True
    assert node["exception"] == "Classpath-exception-2.0"


def test_spdx_invalid():
    for bad in ["NotALicense", "MIT OR", "(MIT", "MIT AND (ISC OR)", ""]:
        with pytest.raises(SpdxError):
            parse_spdx(bad)


def test_spdx_correct():
    assert correct("BSD") == "BSD-2-Clause"
    assert correct("mit") == "MIT"
    assert correct("Apache 2.0") == "Apache-2.0"
    assert correct("MIT") == "MIT"  # already valid passes through
    with pytest.raises(SpdxError):
        correct("whatever custom license")
