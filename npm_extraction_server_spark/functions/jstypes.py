"""JS truthiness semantics for ported conditionals.

In JavaScript ``{}`` and ``[]`` are truthy; only ``'' 0 null undefined
false NaN`` are falsy. The reference's ``if (json.license)``-style
checks therefore behave differently from Python's ``if`` on empty
containers — every ported conditional over a possibly-container value
goes through ``js_truthy``.
"""

from __future__ import annotations

import math


def js_truthy(v) -> bool:
    if v is None or v is False:
        return False
    if isinstance(v, str):
        return len(v) > 0
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return not (v == 0 or (isinstance(v, float) and math.isnan(v)))
    return True  # dicts, lists, everything else
