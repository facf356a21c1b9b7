"""SC9/SC10: tarball extract, path resolve, lsd component BFS
(/root/reference/lib/util/Tarball.js, NpmModule.js:216-250)."""

import gzip
import io
import json
import tarfile

import pytest


def test_corrupt_blobs_do_not_fail_tasks(spark):
    """One corrupt archive among good ones: members/components skip it,
    resolve emits found=false rows — the task never dies."""
    import pandas as pd

    from npm_extraction_server_spark.sources.tarballs import (
        lsd_component_closure,
        resolve_tar_paths,
        synth_tarballs,
        tarball_members,
    )

    good = synth_tarballs(spark, 3)
    bad = spark.createDataFrame(
        pd.DataFrame({"tar_id": ["bad-gzip", "bad-tar"],
                      "payload": [b"\x1f\x8b\x08junkjunk", b"not an archive"]}))
    tars = good.unionByName(bad)
    members = tarball_members(tars)
    assert members.filter("tar_id like 'bad-%'").count() == 0
    assert members.filter("tar_id like 'tar-%'").count() == 9
    res = resolve_tar_paths(tars, ["package.json"])
    bad_rows = {(r["tar_id"], r["found"]) for r in
                res.filter("tar_id like 'bad-%'").collect()}
    assert bad_rows == {("bad-gzip", False), ("bad-tar", False)}
    assert lsd_component_closure(tars).filter("tar_id like 'bad-%'").count() == 0

from npm_extraction_server_spark.functions.tarball import (
    component_closure,
    extract_tar,
    resolve_contexts,
    resolve_path,
)


def _tgz(files: dict[str, str], gzipped: bool = True) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:") as tf:
        # a directory entry, like real npm tarballs carry
        d = tarfile.TarInfo("package/")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        for name, body in files.items():
            data = body.encode()
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    raw = buf.getvalue()
    return gzip.compress(raw) if gzipped else raw


def test_extract_and_resolve():
    blob = _tgz({
        "package/package.json": '{"name":"x"}',
        "package/lib/a.json": '{"a":1}',
    })
    tree = extract_tar(blob)
    assert resolve_path("package.json", tree) == b'{"name":"x"}'
    assert resolve_path("lib/a.json", tree) == b'{"a":1}'
    with pytest.raises(KeyError):
        resolve_path("missing.json", tree)
    with pytest.raises(KeyError):
        resolve_path("lib", tree)  # a directory, not a file
    # plain (non-gzipped) tar also accepted
    tree2 = extract_tar(_tgz({"package/p.json": "{}"}, gzipped=False))
    assert resolve_path("p.json", tree2) == b"{}"


def test_component_closure_follows_imports_and_breaks_cycles():
    blob = _tgz({
        "package/components.jsonld": json.dumps({
            "@context": "ctx-main",
            "import": ["sub/extra.jsonld"],
            "components": [{"@id": "c-main"}],
        }),
        "package/sub/extra.jsonld": json.dumps({
            "@context": "ctx-sub",
            # self-import cycle — the handled set must break it ('../'
            # paths would KeyError, exactly like the reference's literal
            # dict-step resolvePath throwing on '..')
            "import": ["extra.jsonld", "deep.jsonld"],
            "components": [{"@id": "c-extra"}],
        }),
        "package/sub/deep.jsonld": json.dumps({
            "@context": "ctx-deep",
            "components": [{"@id": "c-deep"}],
        }),
    })
    tree = extract_tar(blob)
    comps = component_closure("components.jsonld", tree)
    got = {(c["@id"], c["@context"]) for c in comps}
    # each component carries ITS defining file's @context
    assert ("c-main", "ctx-main") in got
    assert ("c-extra", "ctx-sub") in got
    assert ("c-deep", "ctx-deep") in got
    # the self-import contributed no duplicate rows
    assert len(comps) == len(got) == 3


def test_resolve_contexts():
    blob = _tgz({"package/ctx/a.jsonld": '{"@context":{"x":"http://x/"}}'})
    tree = extract_tar(blob)
    out = resolve_contexts({"http://u/": "ctx/a.jsonld"}, tree)
    assert out == {"http://u/": {"@context": {"x": "http://x/"}}}


def test_spark_tar_operators(spark):
    from pyspark.sql import functions as F

    from npm_extraction_server_spark.sources.tarballs import (
        lsd_component_closure,
        resolve_tar_paths,
        synth_tarballs,
        tarball_members,
    )

    tars = synth_tarballs(spark, 6)
    members = tarball_members(tars)
    assert members.count() == 18  # 3 file members per tarball
    assert members.filter(F.col("member_path") == "package/package.json") \
        .count() == 6

    res = resolve_tar_paths(tars, ["package.json", "nope.json"])
    found = {(r["path"], r["found"]) for r in res.collect()}
    assert ("package.json", True) in found and ("nope.json", False) in found
    ok = res.filter(F.col("path") == "package.json").first()
    assert json.loads(bytes(ok["content"]))["name"].startswith("pkg-")

    comps = lsd_component_closure(tars)
    assert comps.count() == 12  # main + imported extra per tarball
    one = {json.loads(r["component_json"])["@id"]
           for r in comps.filter(F.col("tar_id") == "tar-0").collect()}
    assert one == {"http://example.org/c/0/main", "http://example.org/c/0/extra"}


def test_tar_roundtrip_property():
    """Property: for ANY file tree (names, nesting, contents), extract
    recovers exactly the files written, and resolve_path returns each
    file's bytes under the package/ root."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    name_seg = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789_-.", min_size=1, max_size=8
    ).filter(lambda s: s not in (".", "..") and not s.endswith("."))
    rel_path = st.lists(name_seg, min_size=1, max_size=3).map("/".join)
    content = st.binary(min_size=0, max_size=64)

    @settings(max_examples=25, deadline=None)
    @given(files=st.dictionaries(rel_path, content, min_size=1, max_size=6))
    def check(files):
        # drop paths where one file's path is a prefix-dir of another
        # (a file and a directory can't share a name in the dict tree)
        paths = sorted(files)
        pruned = {}
        for p in paths:
            if any(q != p and p.startswith(q + "/") for q in paths):
                continue
            if any(q != p and q.startswith(p + "/") for q in paths):
                continue
            pruned[p] = files[p]
        if not pruned:
            return
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w:") as t:
            for p, body in pruned.items():
                info = tarfile.TarInfo(f"package/{p}")
                info.size = len(body)
                t.addfile(info, io.BytesIO(body))
        tree = extract_tar(gzip.compress(buf.getvalue()))
        for p, body in pruned.items():
            assert resolve_path(p, tree) == body

    check()
