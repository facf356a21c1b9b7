"""Server-mode (output=falsy) parity: the reference's HTTP path renders
docs with link-only readme/scripts and plain dep URIs
(/root/reference/lib/npm/NpmContext.js:135-141, NpmModule.js:75-89,135-136).
The batch path uses output=True; these tests pin the other branch."""

from fixtures import ROOT, pkg_simple

from npm_extraction_server_spark.kernel.bundle import bundle_jsonld
from npm_extraction_server_spark.kernel.jsonld_rdf import to_triples
from npm_extraction_server_spark.kernel.module import module_jsonld
from npm_extraction_server_spark.kernel.uris import bundle_uri, module_uri
from npm_extraction_server_spark.kernel.usermap import build_user_map

RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
NPM = "https://linkedsoftwaredependencies.org/vocabularies/npm#"


def _triples(output: bool):
    doc = pkg_simple()
    um = build_user_map(doc)
    m = module_jsonld(doc, "alpha", "1.0.0", ROOT, um, output=output)
    out = to_triples(m, root=module_uri(ROOT, "alpha", "1.0.0"))
    b = bundle_jsonld(doc, "alpha", ROOT, um, output=output)
    out += to_triples(b, root=bundle_uri(ROOT, "alpha"))
    return {(t.subj, t.pred, t.obj) for t in out}


def test_readme_link_only_in_server_mode():
    server = _triples(output=False)
    batch = _triples(output=True)
    b = bundle_uri(ROOT, "alpha")
    # batch mode carries the full readme text as rdfs:label
    assert any(s == f"{b}/README" and p == RDFS_LABEL for s, p, o in batch)
    assert not any(s == f"{b}/README" and p == RDFS_LABEL for s, p, o in server)
    # both link to the README IRI
    assert any(p == NPM + "readme" and o == f"{b}/README" for s, p, o in server)


def test_scripts_no_labels_in_server_mode():
    server = _triples(output=False)
    m = module_uri(ROOT, "alpha", "1.0.0")
    script_obj = f"{m}/scripts/test"
    # the script edge exists, the command label does not
    assert any(o == script_obj for _, p, o in server)
    assert not any(s == script_obj and p == RDFS_LABEL for s, p, o in server)


def test_deps_plain_uri_in_server_mode():
    """Server mode: dep value is the bare module URI (no bundle backlink
    or version revision on the dep node, NpmModule.js:89)."""
    server = _triples(output=False)
    batch = _triples(output=True)
    dep = "http://example.org/bundles/npm/hotpkg/%5E1.0.0"
    doap_rev = "http://usefulinc.com/ns/doap#revision"
    assert any(s == dep and p == doap_rev for s, p, o in batch)
    assert not any(s == dep and p == doap_rev for s, p, o in server)
    # dep edge itself exists in both
    assert any(o == dep and p == NPM + "dependency" for _, p, o in server)
