"""Property-based tests (SURVEY.md §5.4): hypothesis-generated package
docs asserting kernel invariants."""

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from npm_extraction_server_spark.functions.jsuri import iri_is_valid
from npm_extraction_server_spark.functions.semver import (
    max_satisfying,
    parse,
    satisfies,
    valid_range,
)
from npm_extraction_server_spark.kernel.pipeline import export_bundle

ROOT = "http://example.org/"

_name = st.text(alphabet=string.ascii_lowercase + "-", min_size=1, max_size=12)
_version = st.builds(
    lambda a, b, c: f"{a}.{b}.{c}", st.integers(0, 9), st.integers(0, 9),
    st.integers(0, 9))
_range = st.sampled_from(
    ["^1.0.0", "~2.1", "1.x", "*", ">=1 <3", "latest", "2.0.0",
     "https://x.org/t.tgz", "owner/repo"])
_scalar = st.one_of(st.text(max_size=20), st.integers(-1000, 1000),
                    st.booleans(), st.floats(allow_nan=False, allow_infinity=False,
                                             width=32))
_json_value = st.recursive(
    _scalar,
    lambda inner: st.one_of(
        st.lists(inner, max_size=3),
        st.dictionaries(_name, inner, max_size=3)),
    max_leaves=8)

_manifest = st.fixed_dictionaries(
    {},
    optional={
        "description": st.text(max_size=30),
        "license": st.sampled_from(["MIT", "BSD", "UNLICENSED", "bogus",
                                    "(MIT OR ISC)", "SEE LICENSE IN F"]),
        "repository": st.sampled_from(["a/b", "gist:xyz", "git://h.org/r",
                                       "gitlab:g/p"]),
        "dependencies": st.dictionaries(_name, _range, max_size=3),
        "scripts": st.dictionaries(_name, st.text(max_size=10), max_size=2),
        "engines": st.dictionaries(st.sampled_from(["node", "iojs", "other"]),
                                   st.sampled_from([">=4", "0.10.x"]), max_size=2),
        "author": st.one_of(st.text(max_size=30), st.fixed_dictionaries(
            {}, optional={"name": _name, "email": st.emails()})),
        "customKey": _json_value,
    })


@st.composite
def package_docs(draw):
    name = draw(_name)
    versions = draw(st.dictionaries(_version, _manifest, min_size=1, max_size=3))
    for ver, manifest in versions.items():
        manifest["name"] = name
        manifest["version"] = ver
    return {
        "_id": name,
        "name": name,
        "versions": versions,
        "dist-tags": {"latest": list(versions)[-1]},
        "time": {ver: "2017-01-01T00:00:00.000Z" for ver in versions},
    }


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(package_docs())
def test_every_component_valid_and_no_blanks(doc):
    r = export_bundle(doc, ROOT)
    if r.error is not None:
        assert r.triples == []  # atomicity
        return
    for t in r.triples:
        assert iri_is_valid(t.subj) and not t.subj.startswith("_:")
        assert iri_is_valid(t.pred) and not t.pred.startswith("_:")
        if not t.obj_is_literal:
            assert iri_is_valid(t.obj) and not t.obj.startswith("_:")


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(package_docs())
def test_deterministic(doc):
    import copy

    r1 = export_bundle(copy.deepcopy(doc), ROOT)
    r2 = export_bundle(copy.deepcopy(doc), ROOT)
    assert [(t.subj, t.pred, t.obj) for t in r1.triples] == [
        (t.subj, t.pred, t.obj) for t in r2.triples]
    assert r1.error == r2.error


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_json_value)
def test_arbitrary_json_never_crashes(doc):
    """Crash-safety contract: export_bundle over ANY JSON value — a
    manifest <script> can parse to arrays, scalars, or junk objects —
    returns an error row or triples, never raises (one bad page must
    not fail a Spark task)."""
    r = export_bundle(doc, ROOT)
    assert (r.error is None) or (r.triples == [])
    if not isinstance(doc, dict):
        assert r.error is not None


@settings(max_examples=100, deadline=None)
@given(st.lists(_version, min_size=0, max_size=10),
       st.sampled_from(["^1.0.0", "~2.1", "1.x", "*", ">=1 <3", "2.0.0",
                        "latest", "1.2.3 - 2", "<2 || >5"]))
def test_max_satisfying_consistent(versions, rng):
    result = max_satisfying(versions, rng)
    if result is not None:
        assert result in versions
        assert satisfies(result, rng)
        # maximality
        best = parse(result)
        for v in versions:
            if satisfies(v, rng):
                assert parse(v) <= best
    else:
        assert not valid_range(rng) or not any(satisfies(v, rng) for v in versions)


# --- multimodal codecs: round-trip properties --------------------------------

_pixel = st.tuples(st.integers(0, 255), st.integers(0, 255),
                   st.integers(0, 255))


@given(w=st.integers(1, 9), h=st.integers(1, 7), data=st.data())
@settings(max_examples=40, deadline=None)
def test_bmp_roundtrip_property(w, h, data):
    """encode_bmp -> decode_bmp is the identity on arbitrary pixel
    grids (any width, so every padding case)."""
    from npm_extraction_server_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    px = data.draw(st.lists(
        st.lists(_pixel, min_size=w, max_size=w), min_size=h, max_size=h))
    got_w, got_h, got = decode_bmp(encode_bmp(w, h, px))
    assert (got_w, got_h) == (w, h) and got == px


@given(w=st.integers(1, 6), h=st.integers(1, 5),
       tw=st.integers(1, 8), th=st.integers(1, 8), data=st.data())
@settings(max_examples=30, deadline=None)
def test_bmp_resize_pixels_come_from_source(w, h, tw, th, data):
    """Every pixel of a nearest-neighbor resize is some source pixel,
    and output dims are exactly the target."""
    from npm_extraction_server_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
        resize_bmp,
    )

    px = data.draw(st.lists(
        st.lists(_pixel, min_size=w, max_size=w), min_size=h, max_size=h))
    rw, rh, out = decode_bmp(resize_bmp(encode_bmp(w, h, px), tw, th))
    src = {p for row in px for p in row}
    assert (rw, rh) == (tw, th)
    assert all(p in src for row in out for p in row)


@given(w=st.integers(1, 5), h=st.integers(1, 4),
       n_frames=st.integers(1, 4), data=st.data())
@settings(max_examples=40, deadline=None)
def test_y4m_roundtrip_property(w, h, n_frames, data):
    """encode_y4m -> decode_y4m recovers every luma plane exactly
    (even dimensions per the 4:2:0 contract)."""
    from npm_extraction_server_spark.operators.multimodal import (
        decode_y4m,
        encode_y4m,
    )

    w, h = w * 2, h * 2  # 4:2:0 requires even dims
    frames = [data.draw(st.lists(st.integers(0, 255), min_size=w * h,
                                 max_size=w * h))
              for _ in range(n_frames)]
    gw, gh, got = decode_y4m(encode_y4m(w, h, frames))
    assert (gw, gh) == (w, h)
    assert [list(f) for f in got] == frames
