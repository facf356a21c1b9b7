"""SPDX license-expression parsing + correction.

Ports the behavior the reference gets from ``spdx-expression-parse`` and
``spdx-correct`` (/root/reference/lib/npm/NpmContext.js:6-7,176-206):

- ``parse_spdx(expr)`` -> dict with keys subset of
  {license, plus, exception, conjunction, left, right}; raises
  ``SpdxError`` on invalid input (the reference catches and falls back
  to ``correct`` then ``{}``).
- ``correct(expr)`` -> best-effort fixup of common non-SPDX strings
  (bounded transposition table — covers the fixture corpus; the npm
  package's full table is much larger but our fixtures are
  self-defined, see FIXTURES.md L3).

Note: like ``spdx-expression-parse``, OR and AND both produce a node
with key ``conjunction`` ('or'/'and'); the reference maps BOTH to
``spdx:ConjunctiveLicenseSet`` (NpmContext.js:188 — replicated bug).
"""

from __future__ import annotations

import re

# Bounded subset of the SPDX license list (spdx-license-ids) — enough to
# cover realistic package.json values + the fixture corpus.
LICENSE_IDS = frozenset(
    [
        "MIT", "ISC", "BSD-2-Clause", "BSD-3-Clause", "BSD-4-Clause",
        "Apache-1.1", "Apache-2.0", "GPL-1.0", "GPL-2.0", "GPL-3.0",
        "GPL-2.0-only", "GPL-3.0-only", "GPL-2.0-or-later", "GPL-3.0-or-later",
        "LGPL-2.0", "LGPL-2.1", "LGPL-3.0", "LGPL-2.1-only", "LGPL-3.0-only",
        "AGPL-1.0", "AGPL-3.0", "AGPL-3.0-only",
        "MPL-1.0", "MPL-1.1", "MPL-2.0",
        "CC0-1.0", "CC-BY-3.0", "CC-BY-4.0", "CC-BY-SA-4.0",
        "Unlicense", "WTFPL", "Zlib", "X11", "Artistic-2.0",
        "EPL-1.0", "EPL-2.0", "EUPL-1.1", "0BSD", "BlueOak-1.0.0",
        "BSL-1.0", "CDDL-1.0", "CDDL-1.1", "OFL-1.1", "Python-2.0",
        "Ruby", "PostgreSQL", "PHP-3.0", "Beerware", "JSON",
    ]
)

EXCEPTION_IDS = frozenset(
    [
        "Classpath-exception-2.0", "GCC-exception-3.1", "LZMA-exception",
        "Bison-exception-2.2", "Autoconf-exception-3.0", "GPL-3.0-linking-exception",
    ]
)

_LOWER_IDS = {i.lower(): i for i in LICENSE_IDS}


class SpdxError(ValueError):
    pass


_TOKEN = re.compile(r"\s*(\(|\)|\+|[A-Za-z0-9.:-]+)")


def _tokenize(s: str):
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                break
            raise SpdxError(f"unexpected input at {pos}: {s[pos:]!r}")
        out.append(m.group(1))
        pos = m.end()
    return out


def parse_spdx(source: str) -> dict:
    """Parse an SPDX expression; grammar per spdx-expression-parse:
    expr := and-expr ('OR' and-expr)* ;  and-expr := ref ('AND' ref)* ;
    ref := id ['+'] ['WITH' exception] | '(' expr ')'."""
    if not isinstance(source, str):
        raise SpdxError("not a string")
    toks = _tokenize(source)
    pos = [0]

    def peek():
        return toks[pos[0]] if pos[0] < len(toks) else None

    def advance():
        pos[0] += 1

    def parse_ref():
        t = peek()
        if t == "(":
            advance()
            node = parse_or()
            if peek() != ")":
                raise SpdxError("expected )")
            advance()
            return node
        if t is None or t in (")", "+", "AND", "OR", "WITH"):
            raise SpdxError(f"expected license id, got {t!r}")
        if t.startswith("LicenseRef-") or t.startswith("DocumentRef-"):
            node = {"license": t}
            advance()
        else:
            if t not in LICENSE_IDS:
                raise SpdxError(f"unknown license {t!r}")
            node = {"license": t}
            advance()
            if peek() == "+":
                node["plus"] = True
                advance()
        if peek() == "WITH":
            advance()
            exc = peek()
            if exc not in EXCEPTION_IDS:
                raise SpdxError(f"unknown exception {exc!r}")
            node["exception"] = exc
            advance()
        return node

    def parse_and():
        left = parse_ref()
        while peek() == "AND":
            advance()
            right = parse_ref()
            left = {"left": left, "conjunction": "and", "right": right}
        return left

    def parse_or():
        left = parse_and()
        while peek() == "OR":
            advance()
            right = parse_and()
            left = {"left": left, "conjunction": "or", "right": right}
        return left

    node = parse_or()
    if pos[0] != len(toks):
        raise SpdxError("trailing tokens")
    return node


# --- spdx-correct subset -------------------------------------------------

_TRANSPOSITIONS = {
    "bsd": "BSD-2-Clause",
    "new bsd": "BSD-3-Clause",
    "simplified bsd": "BSD-2-Clause",
    "freebsd": "BSD-2-Clause",
    "mit/x11": "MIT",
    "x11": "X11",
    "gpl": "GPL-3.0",
    "gplv2": "GPL-2.0",
    "gplv3": "GPL-3.0",
    "gpl2": "GPL-2.0",
    "gpl3": "GPL-3.0",
    "lgpl": "LGPL-3.0",
    "lgplv2.1": "LGPL-2.1",
    "agpl": "AGPL-3.0",
    "apache": "Apache-2.0",
    "apache2": "Apache-2.0",
    "apache 2": "Apache-2.0",
    "apache 2.0": "Apache-2.0",
    "apache-2": "Apache-2.0",
    "apache license": "Apache-2.0",
    "apache license 2.0": "Apache-2.0",
    "apache license, version 2.0": "Apache-2.0",
    "mozilla public license 2.0": "MPL-2.0",
    "mpl": "MPL-2.0",
    "mpl2": "MPL-2.0",
    "cc0": "CC0-1.0",
    "public domain": "Unlicense",
    "wtf": "WTFPL",
    "unlicensed": "Unlicense",
}


def correct(source: str) -> str:
    """Best-effort SPDX correction; raises SpdxError if hopeless
    (mirrors spdx-correct returning null -> reference's second catch)."""
    if not isinstance(source, str):
        raise SpdxError("not a string")
    s = source.strip()
    if not s:
        raise SpdxError("empty")
    # already valid as-is?
    try:
        parse_spdx(s)
        return s
    except SpdxError:
        pass
    low = s.lower().rstrip(".")
    for prefix in ("the ",):
        if low.startswith(prefix):
            low = low[len(prefix):]
    if low in _TRANSPOSITIONS:
        return _TRANSPOSITIONS[low]
    if low in _LOWER_IDS:
        return _LOWER_IDS[low]
    # 'Apache License Version 2.0' style: strip filler words
    squished = re.sub(r"\b(license|version|the)\b", " ", low)
    squished = re.sub(r"\s+", " ", squished).strip()
    if squished in _TRANSPOSITIONS:
        return _TRANSPOSITIONS[squished]
    dashed = re.sub(r"\s+", "-", squished)
    if dashed.lower() in _LOWER_IDS:
        return _LOWER_IDS[dashed.lower()]
    # 'GPL-v3' / 'gpl v2' style
    m = re.match(r"^([a-z]+)[\s-]*v?(\d(?:\.\d)?)$", squished)
    if m:
        cand = f"{m.group(1)}-{m.group(2)}"
        if cand in (x.lower() for x in LICENSE_IDS):
            return _LOWER_IDS[cand]
        cand2 = f"{m.group(1)}-{m.group(2)}.0" if "." not in m.group(2) else cand
        if cand2 in _LOWER_IDS:
            return _LOWER_IDS[cand2]
    raise SpdxError(f"cannot correct {source!r}")
