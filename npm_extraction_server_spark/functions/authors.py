"""Port of npm ``parse-author``: ``"Name <email> (url)"`` -> dict.

Used by the userMap fold (/root/reference/lib/npm/NpmBundle.js:70-71)
and person normalization (/root/reference/lib/npm/NpmContext.js:237-238).
Regex identical to parse-author@2.0.0; falsy groups are omitted, a
non-matching string yields {}.
"""

from __future__ import annotations

import re

_AUTHOR = re.compile(r"^([^<(]+?)?[ \t]*(?:<([^>(]+?)>)?[ \t]*(?:\(([^)]+?)\)|$)")
_HAS_WORD = re.compile(r"\w")


def parse_author(s) -> dict:
    if not isinstance(s, str):
        raise TypeError("expected author to be a string")
    if not s or not _HAS_WORD.search(s):
        return {}
    m = _AUTHOR.match(s)
    if not m:
        return {}
    out = {}
    if m.group(1):
        out["name"] = m.group(1)
    if m.group(2):
        out["email"] = m.group(2)
    if m.group(3):
        out["url"] = m.group(3)
    return out
