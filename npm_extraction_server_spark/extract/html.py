"""HTML -> embedded structured-metadata blobs (the north-star extract
stage).

Pure per-page functions (no Spark imports): the Spark layer maps these
over Arrow batches in ``mapInPandas``. All parsing happens on ``html``;
``text`` is never touched (byte-identical pass-through invariant,
BASELINE.json input_hint).

Recovered doc kinds:
- ``npm_manifest``: CouchDB-style package documents in
  ``<script type="application/json" data-kind="npm-manifest">`` tags —
  these feed the reference pipeline (kernel/pipeline.py) unchanged.
- ``jsonld``: ``<script type="application/ld+json">`` blobs.
- ``microdata``: itemscope/itemtype/itemprop trees, converted to a
  JSON-LD dict with vocabulary-resolved property IRIs.
- ``rdfa``: RDFa-lite vocab/typeof/property scopes (the fourth
  embedded-structured-data syntax next to JSON-LD, manifest blobs and
  microdata), converted to the same JSON-LD dict shape — downstream
  the pipeline's generic JSON-LD branch emits their triples with no
  kind-specific code.
"""

from __future__ import annotations

import hashlib
import json as jsonlib
import re

try:  # orjson: 3-6x faster parse of big manifest blobs; optional
    import orjson as _fastjson
except ImportError:  # pragma: no cover - depends on image contents
    _fastjson = jsonlib

_MANIFEST_RE = re.compile(
    r'<script\s+type="application/json"\s+data-kind="npm-manifest"\s*>(.*?)</script>',
    re.S,
)
_JSONLD_RE = re.compile(r'<script\s+type="application/ld\+json"\s*>(.*?)</script>', re.S)
_ITEMSCOPE_RE = re.compile(
    r'<(\w+)[^>]*\bitemscope\b[^>]*\bitemtype="([^"]+)"[^>]*>(.*?)</\1>', re.S
)
_ITEMPROP_TEXT_RE = re.compile(r'<[^>]*\bitemprop="([^"]+)"[^>]*>([^<]*)<', re.S)
_ITEMPROP_HREF_RE = re.compile(
    r'<a[^>]*\bitemprop="([^"]+)"[^>]*\bhref="([^"]+)"', re.S
)
_RDFA_SCOPE_RE = re.compile(
    r'<(\w+)[^>]*\bvocab="([^"]+)"[^>]*\btypeof="([^"]+)"[^>]*>(.*?)</\1>',
    re.S,
)
_RDFA_PROP_HREF_RE = re.compile(
    r'<a[^>]*\bproperty="([^"]+)"[^>]*\bhref="([^"]+)"', re.S
)
_RDFA_PROP_TEXT_RE = re.compile(r'<[^>]*\bproperty="([^"]+)"[^>]*>([^<]*)<', re.S)


def doc_sha(doc_json: str) -> str:
    return hashlib.sha256(doc_json.encode("utf-8")).hexdigest()


def microdata_to_jsonld(url: str, idx: int, itemtype: str, body: str) -> dict:
    vocab = itemtype.rsplit("/", 1)[0] + "/"
    node: dict = {"@id": f"{url}#item{idx}", "@type": itemtype}
    for prop, href in _ITEMPROP_HREF_RE.findall(body):
        node[vocab + prop] = {"@id": href}
    for prop, value in _ITEMPROP_TEXT_RE.findall(body):
        key = vocab + prop
        if key not in node and value.strip():
            node[key] = value.strip()
    return node


def rdfa_to_jsonld(url: str, idx: int, vocab: str, typeof: str,
                   body: str) -> dict:
    """RDFa-lite scope -> JSON-LD node, mirroring microdata_to_jsonld:
    href properties become IRI objects, first non-empty text value per
    property wins, property IRIs resolve against the scope's vocab."""
    node: dict = {"@id": f"{url}#rdfa{idx}", "@type": vocab + typeof}
    for prop, href in _RDFA_PROP_HREF_RE.findall(body):
        node[vocab + prop] = {"@id": href}
    for prop, value in _RDFA_PROP_TEXT_RE.findall(body):
        key = vocab + prop
        if key not in node and value.strip():
            node[key] = value.strip()
    return node


def extract_parsed(url: str, html: bytes) -> list[tuple[str, dict]]:
    """One page -> [(doc_kind, parsed_doc)]. Broken JSON blobs are
    skipped (a malformed blob must not fail the page). The fused
    pages->triples stage consumes this form directly — no canonical
    re-dump + re-parse on the hot path."""
    try:
        text = html.decode("utf-8", errors="replace")
    except Exception:
        return []
    out: list[tuple[str, dict]] = []
    for m in _MANIFEST_RE.finditer(text):
        try:
            out.append(("npm_manifest", _fastjson.loads(m.group(1))))
        except Exception:
            continue
    for m in _JSONLD_RE.finditer(text):
        try:
            out.append(("jsonld", _fastjson.loads(m.group(1))))
        except Exception:
            continue
    for i, m in enumerate(_ITEMSCOPE_RE.finditer(text)):
        out.append(("microdata", microdata_to_jsonld(url, i, m.group(2), m.group(3))))
    for i, m in enumerate(_RDFA_SCOPE_RE.finditer(text)):
        out.append(("rdfa",
                    rdfa_to_jsonld(url, i, m.group(2), m.group(3), m.group(4))))
    return out


def extract_blobs(url: str, html: bytes) -> list[tuple[str, str]]:
    """One page -> [(doc_kind, doc_json)] with the canonical compact
    re-dump (the docs-table form: stable doc_sha, engine-agnostic)."""
    return [
        (kind, jsonlib.dumps(doc, separators=(",", ":")))
        for kind, doc in extract_parsed(url, html)
    ]
