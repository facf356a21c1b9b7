"""node-semver parity tests (J1/J2 range semantics)."""

from npm_extraction_server_spark.functions.semver import (
    max_satisfying,
    parse,
    satisfies,
    valid_range,
)


def test_parse_basic():
    v = parse("1.2.3")
    assert (v.major, v.minor, v.patch) == (1, 2, 3)
    assert parse("v1.2.3") is not None
    assert parse("=1.2.3") is not None
    assert parse("1.2") is None
    assert parse("latest") is None
    assert parse("1.2.3-beta.1").prerelease == ("beta", "1")


def test_ordering():
    order = ["1.0.0-alpha", "1.0.0-alpha.1", "1.0.0-alpha.beta", "1.0.0-beta",
             "1.0.0-beta.2", "1.0.0-beta.11", "1.0.0-rc.1", "1.0.0", "2.0.0"]
    parsed = [parse(v) for v in order]
    for a, b in zip(parsed, parsed[1:]):
        assert a < b, f"{a} should be < {b}"


def test_valid_range():
    for r in ["^1.0.0", "~2", "1.x", "*", "", "1.2.3", ">=1.2.3 <2",
              "1.2.3 - 2.0.0", "~1.2 || ^2.0.0", ">1.0.0", "<=2.1"]:
        assert valid_range(r), r
    for r in ["latest", "git://github.com/a/b", "not a range", "1.2.3.4.5"]:
        assert not valid_range(r), r


def test_satisfies_caret():
    assert satisfies("1.2.3", "^1.0.0")
    assert satisfies("1.9.9", "^1.0.0")
    assert not satisfies("2.0.0", "^1.0.0")
    assert satisfies("0.2.5", "^0.2.3")
    assert not satisfies("0.3.0", "^0.2.3")
    assert satisfies("0.0.3", "^0.0.3")
    assert not satisfies("0.0.4", "^0.0.3")


def test_satisfies_tilde():
    assert satisfies("1.2.9", "~1.2.3")
    assert not satisfies("1.3.0", "~1.2.3")
    assert satisfies("1.5.0", "~1")
    assert not satisfies("2.0.0", "~1")
    assert satisfies("1.2.0", "~1.2")
    assert not satisfies("1.3.0", "~1.2")


def test_satisfies_xrange():
    assert satisfies("1.5.2", "1.x")
    assert not satisfies("2.0.0", "1.x")
    assert satisfies("1.2.9", "1.2.x")
    assert satisfies("9.9.9", "*")
    assert satisfies("0.0.1", "")
    assert satisfies("1.5.0", "1")
    assert satisfies("1.2.5", "1.2")


def test_satisfies_hyphen_and_union():
    assert satisfies("1.5.0", "1.2.3 - 2.0.0")
    assert satisfies("2.0.0", "1.2.3 - 2.0.0")
    assert not satisfies("2.0.1", "1.2.3 - 2.0.0")
    assert satisfies("1.2.0", "1.2.3 - 2 || 1.2.0")
    assert satisfies("2.9.0", "1.2.3 - 2")  # partial hi: <3.0.0
    assert satisfies("1.0.0", "<1.2.3 || >2")
    assert satisfies("3.0.0", "<1.2.3 || >2")
    assert not satisfies("1.5.0", "<1.2.3 || >2")


def test_prerelease_exclusion():
    # prerelease only matches when a comparator pins the same tuple
    assert not satisfies("1.3.0-alpha", "^1.2.3")
    assert satisfies("1.2.4-alpha", "^1.2.4-0")
    assert satisfies("1.0.0-beta", ">=1.0.0-alpha")
    assert not satisfies("2.0.0-beta", ">=1.0.0-alpha")


def test_max_satisfying():
    versions = ["0.9.0", "1.0.0", "1.2.0", "1.2.3", "1.3.0-beta", "2.0.0"]
    assert max_satisfying(versions, "^1.0.0") == "1.2.3"
    assert max_satisfying(versions, "*") == "2.0.0"
    assert max_satisfying(versions, "~0.9") == "0.9.0"
    assert max_satisfying(versions, ">=3") is None
    assert max_satisfying(versions, "latest") is None
    assert max_satisfying([], "^1.0.0") is None


def test_operator_comparators():
    assert satisfies("1.2.3", ">=1.2.3")
    assert not satisfies("1.2.2", ">=1.2.3")
    assert satisfies("1.2.2", "<1.2.3")
    assert satisfies("1.2.3", "=1.2.3")
    assert satisfies("2.0.0", ">1.x")  # >1.x -> >=2.0.0
    assert not satisfies("1.9.0", ">1.x")
    assert satisfies("0.5.0", "<1.x")  # <1.x -> <1.0.0


def test_strict_mode_prerelease_hyphen_required():
    """node-semver 5 STRICT grammar (the reference uses default strict
    validRange): hyphen-less prereleases are invalid ranges, and
    pre/build attach only after a full M.m.p."""
    assert not valid_range("~1.2.3alpha")
    assert valid_range("~1.2.3-alpha")
    assert not valid_range("1.2-alpha")   # pre without patch
    assert not valid_range("1-alpha")
    assert valid_range("1.2.3-alpha.1+build.5")
    # sanity: plain partials still fine
    assert valid_range("~1.2") and valid_range("1.x") and valid_range("1")


def test_xrange_with_gt_lt_matches_nothing():
    """replaceXRange: '>*', '>x', '<*', '<x' all desugar to <0.0.0."""
    versions = ["0.0.1", "1.0.0", "2.0.0"]
    for rng in (">*", ">x", "<*", "<x", ">X"):
        assert valid_range(rng)
        assert max_satisfying(versions, rng) is None
        assert not satisfies("1.0.0", rng)
    # but '=*' / bare '*' still match everything
    assert max_satisfying(versions, "*") == "2.0.0"
