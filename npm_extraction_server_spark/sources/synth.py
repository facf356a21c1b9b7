"""Deterministic synthetic corpus: package docs + web pages.

BASELINE.json's input is an Iceberg table of Common-Crawl-style pages
(url, warc_ts, html, text, lang) whose html embeds package-manifest
JSON blobs / JSON-LD / microdata (FIXTURES.md §1). No external data —
everything here is a pure function of an integer id (seeded sha256),
so any worker can generate any slice independently: generation runs as
``spark.range(n).mapInPandas(...)`` with zero driver-side loops and
zero shuffles.
"""

from __future__ import annotations

import hashlib
import json as jsonlib

_LICENSES = [
    "MIT", "ISC", "Apache-2.0", "(MIT OR Apache-2.0)", "BSD-3-Clause",
    "BSD", "UNLICENSED", "SEE LICENSE IN LICENSE.md", "whatever",
    "(GPL-2.0 AND MIT)", "Unlicense",
]
_REPOS = [
    "git://github.com/{o}/{n}.git", "{o}/{n}", "gist:{h}", "bitbucket:{o}/{n}",
    "gitlab:{o}/{n}", None,
]
_RANGES = ["^1.0.0", "~1.2", "1.x", "*", ">=1.0.0 <2", "1.0.0", "latest",
           "https://example.org/tarballs/{n}.tgz", "{o}/{n}"]
_LANGS = ["en", "es", "de", "fr", "zh", "ja", "pt", "ru"]

# head entities: most packages depend on these (skew, SURVEY.md §7.6)
HOT_PACKAGES = ["hotpkg", "megalib", "ultrautil"]

_WORDS = (
    "spark graph triple entity linking crawl parse extract batch shuffle "
    "partition skew broadcast vector column parquet iceberg lineage resume "
    "checkpoint semver range bundle module maintainer license repository "
    "registry package version dependency script engine node web page html"
).split()


def _h(i: int, salt: str) -> int:
    return int.from_bytes(
        hashlib.sha256(f"{salt}:{i}".encode()).digest()[:8], "big"
    )


def _words(i: int, salt: str, n: int) -> str:
    h = _h(i, salt)
    return " ".join(_WORDS[(h >> (k * 6)) % len(_WORDS)] for k in range(n))


def synth_package(i: int) -> dict:
    """Package doc #i — deterministic, exercises every fixture branch."""
    h = _h(i, "pkg")
    if i < len(HOT_PACKAGES):
        name = HOT_PACKAGES[i]
    elif h % 11 == 0:
        name = f"@org{h % 7}/pkg-{i}"
    else:
        name = f"pkg-{i}"
    n_versions = 1 + (h % 3)
    owner = f"dev{h % 97}"
    email = f"{owner}@example.org"
    versions = {}
    times = {
        "created": f"201{h % 7}-01-01T00:00:00.000Z",
        "modified": f"201{(h % 7) + 1}-06-01T00:00:00.000Z",
    }
    for v in range(n_versions):
        ver = f"{1 + (h % 2)}.{v}.{(h >> 4) % 10}"
        hv = _h(i * 1000 + v, "ver")
        deps = {}
        # 80% of packages depend on a hot package -> deliberate join skew
        if hv % 10 < 8:
            deps[HOT_PACKAGES[hv % len(HOT_PACKAGES)]] = "^1.0.0"
        deps[f"pkg-{hv % 1000}"] = _RANGES[hv % len(_RANGES)].format(
            o=owner, n=f"pkg-{hv % 1000}")
        manifest = {
            "name": name,
            "version": ver,
            "description": _words(hv, "desc", 6),
            "license": _LICENSES[hv % len(_LICENSES)],
            "author": {"name": f"Dev {h % 97}", "email": email},
            "_npmUser": {"name": owner, "email": email},
            "maintainers": [{"name": owner, "email": email}],
            "dependencies": deps,
            "scripts": {"test": "spark-test", "build": f"make {_words(hv, 's', 1)}"},
            "dist": {
                "tarball": f"http://registry.example.org/{i}/-/{i}-{ver}.tgz",
                "shasum": hashlib.sha1(f"{i}:{ver}".encode()).hexdigest(),
            },
        }
        repo = _REPOS[hv % len(_REPOS)]
        if repo:
            manifest["repository"] = repo.format(o=owner, n=f"pkg-{i}", h=hex(hv)[2:])
        if hv % 5 == 0:
            manifest["engines"] = {"node": ">=4"}
        if hv % 7 == 0:
            manifest["customMeta"] = {"tags": _words(hv, "t", 3).split(), "rank": hv % 100}
        versions[ver] = manifest
        times[ver] = f"201{(h % 7)}-0{1 + v * 2}-01T00:00:00.000Z"
    return {
        "_id": name,
        "name": name,
        "dist-tags": {"latest": list(versions)[-1]},
        "versions": versions,
        "time": times,
        "readme": f"# {name}\n\n{_words(h, 'readme', 12)}",
        "maintainers": [{"name": owner, "email": email}],
    }


def synth_jsonld_blob(i: int) -> dict:
    """A schema.org-flavored JSON-LD blob (absolute-IRI keys: stays in
    our processor's closed subset)."""
    h = _h(i, "ld")
    return {
        "@id": f"http://data.example.org/things/{i}",
        "@type": "http://schema.org/SoftwareApplication",
        "http://schema.org/name": _words(h, "ldname", 2),
        "http://schema.org/version": f"{h % 5}.{h % 10}.0",
    }


def synth_microdata(i: int) -> str:
    h = _h(i, "md")
    return (
        f'<div itemscope itemtype="http://schema.org/Person">'
        f'<span itemprop="name">Person {h % 1000}</span>'
        f'<a itemprop="url" href="http://people.example.org/{h % 1000}">home</a>'
        f"</div>"
    )


def synth_outlinks(i: int) -> list:
    """Deterministic outbound links for page #i: 2-5 (href, anchor
    text) pairs with a deliberate hub-host skew (60% of links land on
    one of 3 hub hosts — the Common-Crawl power-law head). Pure
    function of i so a DuckDB oracle can re-derive the exact link set
    from doc_id alone (sha256-replica pattern, see
    __spark_entry__._WEB_LINKS_CTE)."""
    hl = _h(i, "links")
    out = []
    for j in range(2 + hl % 4):
        t = _h(i * 100 + j, "lnk")
        # site id from high bits: t%40 would be correlated with the
        # t%10>=6 branch condition (only 16 residues reachable)
        host = (f"hub{t % 3}.example.org" if t % 10 < 6
                else f"site{(t >> 4) % 40}.example.org")
        if t % 7 == 0:
            # messy-but-equivalent form real crawls are full of:
            # uppercase scheme+host, explicit default port, fragment —
            # all erased by extract/links.normalize_url
            url = f"HTTP://{host.upper()}:80/p/{t % 1000}#f{t % 10}"
        else:
            url = f"http://{host}/p/{t % 1000}"
        out.append((url, _WORDS[(t >> 8) % len(_WORDS)]))
    return out


def outlinks_footer(i: int) -> str:
    return ("<nav>"
            + "".join(f'<a href="{u}">{w}</a>' for u, w in synth_outlinks(i))
            + "</nav>")


def synth_page(i: int) -> dict:
    """Page #i: url, warc_ts, html (bytes), text, lang. The html embeds
    the package doc (and sometimes JSON-LD / microdata); the text column
    must pass through the pipeline byte-identical (input_hint)."""
    h = _h(i, "page")
    pkg = synth_package(i)
    text = _words(h, "text", 20 + h % 30)
    parts = [
        "<!DOCTYPE html><html><head><title>",
        pkg["name"],
        "</title></head><body>",
        f"<p>{_words(h, 'noise', 15)}</p>",
        '<script type="application/json" data-kind="npm-manifest">',
        jsonlib.dumps(pkg, separators=(",", ":")),
        "</script>",
    ]
    if h % 3 == 0:
        parts += [
            '<script type="application/ld+json">',
            jsonlib.dumps(synth_jsonld_blob(i), separators=(",", ":")),
            "</script>",
        ]
    if h % 4 == 0:
        parts.append(synth_microdata(i))
    parts += [f"<article>{text}</article>", outlinks_footer(i), "</body></html>"]
    html = "".join(parts)
    ts_sec = 1500000000 + (h % 63072000)  # 2017..2019
    return {
        "url": f"http://crawl.example.org/{h % 100}/page-{i}",
        "warc_ts": ts_sec,
        "html": html.encode("utf-8"),
        "text": text,
        "lang": _LANGS[h % len(_LANGS)],
    }
