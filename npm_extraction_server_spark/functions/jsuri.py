"""JS-compatible URI kernels.

Bit-exact Python ports of the JavaScript string primitives the reference
relies on (SURVEY.md S1/S2/S4/P5):

- ``encode_uri_component`` == JS ``encodeURIComponent`` (used for every
  IRI path segment, e.g. /root/reference/lib/npm/NpmBundle.js:38).
- ``encode_uri`` == JS ``encodeURI`` (mailto encoding,
  /root/reference/lib/npm/NpmBundle.js:78).
- ``valid_url_is_uri`` == npm ``valid-url``'s ``isUri`` (IRI fallback
  validation, /root/reference/lib/util/JsonLdParser.js:133).
- ``iri_is_valid`` == ``JsonLdParser.isValid``
  (/root/reference/lib/util/JsonLdParser.js:127-136).

All functions are pure and total; vectorized wrappers live in the Spark
operator layer (pandas UDFs apply these per Arrow batch).
"""

from __future__ import annotations

import re
from functools import lru_cache

# JS encodeURIComponent leaves unescaped: A-Z a-z 0-9 - _ . ! ~ * ' ( )
_COMPONENT_SAFE = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-_.!~*'()"
)
# JS encodeURI additionally leaves the URI reserved set: ; / ? : @ & = + $ , #
_URI_SAFE = _COMPONENT_SAFE | frozenset(";/?:@&=+$,#")


def _encode(s: str, safe: frozenset) -> str:
    out = []
    for ch in s:
        if ch in safe:
            out.append(ch)
        else:
            out.extend("%%%02X" % b for b in ch.encode("utf-8"))
    return "".join(out)


@lru_cache(maxsize=16384)
def encode_uri_component(s: str) -> str:
    """JS ``encodeURIComponent``: percent-encode everything outside the
    unreserved+mark set, UTF-8 bytes, uppercase hex. Cached — package
    names/versions repeat across every dep edge in a batch."""
    return _encode(s, _COMPONENT_SAFE)


def encode_uri(s: str) -> str:
    """JS ``encodeURI``: like encodeURIComponent but keeps URI
    reserved characters ``;/?:@&=+$,#`` literal."""
    return _encode(s, _URI_SAFE)


# --- valid-url port (npm valid-url@1.0.9 is_uri) ------------------------

_ILLEGAL = re.compile(r"[^a-z0-9:/?#\[\]@!$&'()*+,;=._~%-]", re.I)
_BAD_HEX1 = re.compile(r"%[^0-9a-f]", re.I)
_BAD_HEX2 = re.compile(r"%[0-9a-f](?:[^0-9a-f]|$)", re.I)
_SPLIT = re.compile(
    r"^(?:([^:/?#]+):)?(?:\/\/([^/?#]*))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?"
)
_SCHEME = re.compile(r"^[a-z][a-z0-9+.-]*$")


@lru_cache(maxsize=16384)
def valid_url_is_uri(value: str | None) -> str | None:
    """Port of valid-url's ``isUri`` — returns the value if it is a
    syntactically valid RFC-3986 URI, else None. Cached: the same
    subjects/predicates are validated thousands of times per batch."""
    if not value:
        return None
    if _ILLEGAL.search(value):
        return None
    if _BAD_HEX1.search(value) or _BAD_HEX2.search(value):
        return None
    m = _SPLIT.match(value)
    scheme, authority, path = m.group(1), m.group(2), m.group(3)
    if not (scheme and len(scheme) and path is not None):
        return None
    if authority:
        if not (len(path) == 0 or path.startswith("/")):
            return None
    else:
        if path.startswith("//"):
            return None
    if not _SCHEME.match(scheme.lower()):
        return None
    return value


# --- JsonLdParser.isValid (P5) ------------------------------------------

_IRI_FAST = re.compile(r"^\w+:\/\/[a-zA-Z0-9._\-\/]*$")


@lru_cache(maxsize=16384)
def iri_is_valid(uri: str) -> bool:
    """Reference's triple-component validity check: blank label OR the
    fast regex OR the valid-url fallback
    (/root/reference/lib/util/JsonLdParser.js:127-136)."""
    if uri.startswith("_:"):
        return True
    if _IRI_FAST.match(uri):
        return True
    return valid_url_is_uri(uri) is not None


def url_join(*parts: str) -> str:
    """Minimal port of npm ``url-join`` for the skolem-IRI pattern
    ``urljoin(root, '.well-known/genid/', hash)``
    (/root/reference/lib/util/JsonLdParser.js:100): joins with single
    slashes, preserving the scheme's ``://``."""
    joined = "/".join(p.strip("/") if i else p.rstrip("/") for i, p in enumerate(parts))
    # collapse duplicate slashes except after the scheme
    m = re.match(r"^(\w+://)(.*)$", joined, re.S)
    if m:
        return m.group(1) + re.sub(r"/{2,}", "/", m.group(2))
    return re.sub(r"/{2,}", "/", joined)
