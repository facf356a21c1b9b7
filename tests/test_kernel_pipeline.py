"""Golden-fixture differential tests for the doc->triples kernel
(SURVEY.md §5.1): every operator branch asserted via triple-set
inclusion, plus the replicated reference bugs (R6)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

from fixtures import ENGINE_INDEX, ROOT, all_packages, pkg_scoped, pkg_simple, pkg_weird

from npm_extraction_server_spark.kernel.context import handle_repository
from npm_extraction_server_spark.kernel.pipeline import (
    export_bundle,
    export_engines,
    resolve_module_version,
)

DOAP = "http://usefulinc.com/ns/doap#"
NPM = "https://linkedsoftwaredependencies.org/vocabularies/npm#"
SPDX = "http://spdx.org/rdf/terms#"
FOAF = "http://xmlns.com/foaf/0.1/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
DCT = "http://purl.org/dc/terms/"


def tset(result):
    return {(t.subj, t.pred, t.obj) for t in result.triples}


def test_simple_bundle_core_triples():
    r = export_bundle(pkg_simple(), ROOT)
    assert r.error is None
    s = tset(r)
    b = "http://example.org/bundles/npm/alpha"
    m1 = f"{b}/1.0.0"
    assert (m1, DOAP + "name", '"alpha"') in s
    assert (m1, RDF_TYPE, DOAP + "Version") in s
    assert (b, RDF_TYPE, DOAP + "Project") in s
    assert (b, DOAP + "release", m1) in s  # versions map + bundle backlink
    assert (b, "http://www.w3.org/2002/07/owl#sameAs",
            "https://www.npmjs.com/package/alpha") in s
    # dependency edges: range-IRI module + its bundle backlink + revision
    dep = "http://example.org/bundles/npm/hotpkg/%5E1.0.0"
    assert (m1, NPM + "dependency", dep) in s
    assert ("http://example.org/bundles/npm/hotpkg", DOAP + "release", dep) in s
    assert (dep, DOAP + "revision", '"^1.0.0"') in s
    # person -> npm user URI (id from _npmUser/maintainers fold)
    u = "http://example.org/users/npm/annuser"
    assert (m1, NPM + "author", u) in s
    assert (u, FOAF + "name", '"Ann Author"') in s
    assert (u, FOAF + "mbox", "mailto:ann@example.org") in s
    assert (u, FOAF + "homepage", "http://ann.example.org") in s
    # license
    mit = "https://spdx.org/licenses/MIT.html"
    assert (m1, SPDX + "licenseDeclared", mit) in s
    assert (mit, SPDX + "name", '"MIT"') in s
    assert (m1, DCT + "license", mit) in s
    # scripts: data-dependent predicate
    assert (m1, "http://example.org/scripts/npm/test", f"{m1}/scripts/test") in s
    assert (f"{m1}/scripts/test", RDFS_LABEL, '"mocha test/"') in s
    # shasum reification
    assert (f"{m1}/shasum", SPDX + "checksumValue",
            '"deadbeefdeadbeefdeadbeefdeadbeefdeadbeef"') in s
    assert (f"{m1}/shasum", SPDX + "algorithm", SPDX + "checksumAlgorithm_sha1") in s
    # engines / _nodeVersion / _npmVersion
    assert (m1, NPM + "engine", "http://example.org/engines/node/%3E%3D4") in s
    assert (m1, NPM + "nodeVersion", "http://example.org/engines/node/6.9.1") in s
    assert (m1, NPM + "npmVersion", "http://example.org/bundles/npm/npm/3.10.3") in s
    # created from time map (module enrichment, NpmCouchDb.js:58-62)
    assert (m1, DCT + "created",
            '"2016-01-01T10:00:00.000Z"^^http://www.w3.org/2001/XMLSchema#dateTime') in s
    # dist-tags graph entries
    assert (f"{b}/1.1.0", NPM + "dist-tag", '"latest"') in s
    assert (f"{b}/2.0.0-beta.1", NPM + "dist-tag", '"beta"') in s
    # bundle created/modified renames (P4)
    assert (b, DCT + "created",
            '"2016-01-01T10:00:00.000Z"^^http://www.w3.org/2001/XMLSchema#dateTime') in s
    # readme (output mode: label carried)
    assert (f"{b}/README", RDFS_LABEL, '"# alpha\n\nA test package."') in s
    # dropped columns never appear (P1/P2)
    preds = {p for (_, p, _) in s}
    assert not any("readmeFilename" in p or "_rev" in p or "_from" in p for p in preds)


def test_url_and_git_deps_blank_nodes():
    r = export_bundle(pkg_simple(), ROOT)
    s = tset(r)
    # URL dep -> skolemized blank with dist/tarball
    tarball_edges = [t for t in r.triples
                    if t.pred == NPM + "tarball"
                    and t.obj == "https://example.org/tarballs/urldep-1.0.0.tgz"]
    assert len(tarball_edges) == 1
    assert "/.well-known/genid/" in tarball_edges[0].subj
    # git shorthand dep -> blank node w/ repository github-encoded
    assert any(t.pred == DOAP + "repository"
               and t.obj == "https://github.com/someuser%2Fgitdep" for t in r.triples)


def test_scoped_package_uris():
    r = export_bundle(pkg_scoped(), ROOT)
    assert r.error is None
    s = tset(r)
    b = "http://example.org/bundles/npm/@org/scoped-pkg"  # bundle: @ kept literal
    m = "http://example.org/bundles/npm/%40org%2Fscoped-pkg/0.1.0"  # module: full enc
    assert (b, RDF_TYPE, DOAP + "Project") in s
    assert (b, DOAP + "release", m) in s
    assert (m, RDF_TYPE, DOAP + "Version") in s


def test_see_license_in():
    r = export_bundle(pkg_scoped(), ROOT)
    s = tset(r)
    m = "http://example.org/bundles/npm/%40org%2Fscoped-pkg/0.1.0"
    lic = f"{m}/license"
    assert (lic, SPDX + "name", '"LICENSE.txt"') in s
    assert (m, SPDX + "licenseInfoFromFiles", lic) in s
    assert (lic, RDFS_LABEL, '"SEE LICENSE IN LICENSE.txt"') in s
    assert (m, DCT + "license", lic) in s


def test_spdx_correct_and_svn_repo():
    r = export_bundle(pkg_scoped(), ROOT)
    s = tset(r)
    m = "http://example.org/bundles/npm/%40org%2Fscoped-pkg/0.2.0"
    # 'BSD' corrected to BSD-2-Clause
    assert (m, SPDX + "licenseDeclared", "https://spdx.org/licenses/BSD-2-Clause.html") in s
    # svn repo on 0.1.0: ssh:// fixup + SVNRepository type
    m1 = "http://example.org/bundles/npm/%40org%2Fscoped-pkg/0.1.0"
    assert (m1, DOAP + "repository", "ssh://svn.example.org/repo") in s
    assert ("ssh://svn.example.org/repo", RDF_TYPE, DOAP + "SVNRepository") in s


def test_gitlab_org_quirk_and_always_git():
    # R6: gitlab shorthand expands to gitlab.ORG, returned type always git
    assert handle_repository("gitlab:org/x") == {
        "type": "git", "url": "https://gitlab.org/org%2Fx"}
    assert handle_repository("gist:abc") == {
        "type": "git", "url": "https://gist.github.com/abc"}
    assert handle_repository("bitbucket:t/r") == {
        "type": "git", "url": "https://bitbucket.org/t%2Fr"}
    assert handle_repository("plain/repo") == {
        "type": "git", "url": "https://github.com/plain%2Frepo"}
    assert handle_repository("git://x.org/y") == {"type": "git", "url": "git://x.org/y"}


def test_license_or_maps_to_conjunctive_set():
    # R6: (MIT OR Apache-2.0) -> spdx:ConjunctiveLicenseSet (reference bug)
    r = export_bundle(pkg_simple(), ROOT)
    s = tset(r)
    m = "http://example.org/bundles/npm/alpha/2.0.0-beta.1"
    set_types = [t for t in r.triples
                 if t.pred == RDF_TYPE and t.obj == SPDX + "ConjunctiveLicenseSet"]
    assert len(set_types) == 1
    set_node = set_types[0].subj
    assert (set_node, SPDX + "member", "https://spdx.org/licenses/MIT.html") in s
    assert (set_node, SPDX + "member", "https://spdx.org/licenses/Apache-2.0.html") in s
    assert (m, SPDX + "licenseDeclared", set_node) in s


def test_pre_commit_variants():
    r = export_bundle(pkg_scoped(), ROOT)
    s = tset(r)
    m1 = "http://example.org/bundles/npm/%40org%2Fscoped-pkg/0.1.0"
    # comma split + trim
    for script in ("lint", "test", "build"):
        assert (m1, NPM + "preCommitScript", f"{m1}/scripts/{script}") in s
    # {run: "check,verify"} form
    m2 = "http://example.org/bundles/npm/%40org%2Fscoped-pkg/0.2.0"
    assert (m2, NPM + "preCommitScript", f"{m2}/scripts/check") in s
    assert (m2, NPM + "preCommitScript", f"{m2}/scripts/verify") in s


def test_engines_array_form():
    r = export_bundle(pkg_scoped(), ROOT)
    s = tset(r)
    m1 = "http://example.org/bundles/npm/%40org%2Fscoped-pkg/0.1.0"
    assert (m1, NPM + "engine", "http://example.org/engines/node/0.10.x") in s
    # non-node engine -> npm module URI
    assert (m1, NPM + "engine",
            "http://example.org/bundles/npm/custom-engine/1.x") in s


def test_bundled_deps():
    r = export_bundle(pkg_scoped(), ROOT)
    s = tset(r)
    m1 = "http://example.org/bundles/npm/%40org%2Fscoped-pkg/0.1.0"
    assert (m1, NPM + "bundledDependency", "http://example.org/bundles/npm/alpha") in s
    assert (m1, NPM + "bundledDependency", "http://example.org/bundles/npm/hotpkg") in s


def test_weird_license_fallbacks():
    r = export_bundle(pkg_weird(), ROOT)
    assert r.error is None
    s = tset(r)
    m0 = "http://example.org/bundles/npm/weird-pkg/0.0.1"
    # deprecated {type, url} object -> type wins when both? no: type&&!url;
    # here both set -> license = url
    assert (m0, SPDX + "licenseDeclared", "http://opensource.org/licenses/MIT") in s
    # unparseable license -> {} + spdx:name + /license @id
    m1 = "http://example.org/bundles/npm/weird-pkg/1.0.0"
    lic1 = f"{m1}/license"
    assert (lic1, SPDX + "name", '"whatever custom license"') in s
    assert (m1, DCT + "license", lic1) in s


def test_unmapped_key_reification():
    r = export_bundle(pkg_weird(), ROOT)
    s = tset(r)
    m0 = "http://example.org/bundles/npm/weird-pkg/0.0.1"
    k = f"{m0}/strangeList"
    assert (m0, NPM + "key", k) in s
    assert (k, RDFS_LABEL, '"strangeList"') in s
    # array -> @list: rdf:first/rest chain hangs off npm:value
    first = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
    assert any(t.pred == first and t.obj == '"a"' for t in r.triples)
    assert any(t.pred == first and t.obj == '"b"' for t in r.triples)
    # nested object in alpha 2.0.0-beta.1: deep tree with @list of mixed types
    ra = export_bundle(pkg_simple(), ROOT)
    sa = tset(ra)
    ma = "http://example.org/bundles/npm/alpha/2.0.0-beta.1"
    deep = f"{ma}/customField/nested/deep"
    assert (f"{ma}/customField", RDFS_LABEL, '"customField"') in sa
    assert any(t.pred == first and
               t.obj == '"1"^^http://www.w3.org/2001/XMLSchema#integer'
               for t in ra.triples)


def test_s13_early_return_bug():
    """If the FIRST @graph entry has no unmapped keys, later entries are
    skipped (NpmContext.js:64-65). The bundle entry is first; dist-tag
    entries carry npm:dist-tag (mapped via npm: prefix) so they never
    have unmapped keys anyway — construct a doc where the bundle entry
    is clean but a LATER graph entry would have unmapped keys."""
    from npm_extraction_server_spark.kernel.unmapped import update_unused_values

    doc = {
        "@context": ["https://linkedsoftwaredependencies.org/contexts/npm.jsonld"],
        "@graph": [
            {"@id": "http://x.org/a", "name": "clean"},
            {"@id": "http://x.org/b", "weirdKey": "value"},
        ],
    }
    update_unused_values(doc)
    assert "npm:key" not in doc["@graph"][0]
    assert "npm:key" not in doc["@graph"][1]  # skipped due to early return

    doc2 = {
        "@context": ["https://linkedsoftwaredependencies.org/contexts/npm.jsonld"],
        "@graph": [
            {"@id": "http://x.org/a", "oddKey": 1},
            {"@id": "http://x.org/b", "weirdKey": "value"},
        ],
    }
    update_unused_values(doc2)
    assert "npm:key" in doc2["@graph"][0]
    assert "npm:key" in doc2["@graph"][1]


def test_person_without_email_and_web_url():
    r = export_bundle(pkg_weird(), ROOT)
    s = tset(r)
    # author without email: no userMap entry, no @id -> blank node skolemized
    m0 = "http://example.org/bundles/npm/weird-pkg/0.0.1"
    authors = [t for t in r.triples if t.subj == m0 and t.pred == NPM + "author"]
    assert len(authors) == 1
    assert "/.well-known/genid/" in authors[0].obj
    # maintainer web -> url -> foaf:homepage on the user node
    u = "http://example.org/users/npm/weird"
    assert (u, FOAF + "homepage", "http://weird.example.org") in s


def test_dist_tag_as_range():
    # 'latest' is not a valid range -> treated as git shorthand repo dep
    r = export_bundle(pkg_weird(), ROOT)
    assert any(t.pred == DOAP + "repository"
               and t.obj == "https://github.com/latest" for t in r.triples)


def test_engine_export():
    triples = export_engines(ENGINE_INDEX, ROOT)
    s = {(t.subj, t.pred, t.obj) for t in triples}
    eb = "http://example.org/engines/node/"
    em = "http://example.org/engines/node/v6.9.1"
    assert (eb, DOAP + "name", '"node"') in s
    assert (eb, DOAP + "release", em) in s
    assert (em, DOAP + "revision", '"v6.9.1"') in s
    assert (em, DCT + "created",
            '"2016-10-19"^^http://www.w3.org/2001/XMLSchema#date') in s
    # @reverse bundle backlink: (engine-bundle-sans-slash, doap:release, module)
    assert ("http://example.org/engines/node", DOAP + "release", em) in s
    assert (em, "http://www.w3.org/2002/07/owl#sameAs",
            "https://nodejs.org/download/release/v6.9.1") in s
    # iojs too
    assert ("http://example.org/engines/iojs/", DOAP + "name", '"iojs"') in s


def test_resolve_module_version():
    doc = pkg_simple()
    assert resolve_module_version(doc, "1.0.0") == "1.0.0"  # exact
    assert resolve_module_version(doc, "^1.0.0") == "1.1.0"  # maxSatisfying
    assert resolve_module_version(doc, "latest") == "1.1.0"  # dist-tag recursion
    assert resolve_module_version(doc, "beta") == "2.0.0-beta.1"
    assert resolve_module_version(doc, "^3.0.0") is None


def test_per_bundle_atomicity():
    # a doc whose license is an empty object throws mid-bundle -> zero triples
    bad = pkg_simple()
    bad["versions"]["1.0.0"]["license"] = {}
    r = export_bundle(bad, ROOT)
    assert r.error is not None
    assert r.triples == []


def test_skolem_determinism():
    r1 = export_bundle(pkg_simple(), ROOT)
    r2 = export_bundle(pkg_simple(), ROOT)
    assert [(t.subj, t.pred, t.obj, t.graph) for t in r1.triples] == [
        (t.subj, t.pred, t.obj, t.graph) for t in r2.triples]


def test_all_iris_valid():
    from npm_extraction_server_spark.functions.jsuri import iri_is_valid
    for pkg in all_packages():
        r = export_bundle(pkg, ROOT)
        for t in r.triples:
            assert iri_is_valid(t.subj), t
            assert iri_is_valid(t.pred), t
            if not t.obj_is_literal:
                assert iri_is_valid(t.obj), t
            assert not t.subj.startswith("_:")
            assert not t.obj.startswith("_:")
