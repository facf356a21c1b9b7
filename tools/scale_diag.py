#!/usr/bin/env python
"""Scaling-protocol experiment CLI.

Usage: scale_diag.py <pages_dir> <exec_cores> <n_execs> [n_pairs]
Prints the measure_scaling dict as JSON.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.scale_lib import measure_scaling  # noqa: E402

if __name__ == "__main__":
    pages_dir = sys.argv[1]
    exec_cores = int(sys.argv[2])
    n_execs = int(sys.argv[3])
    n_pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    out = measure_scaling(pages_dir, exec_cores, n_execs, n_pairs)
    print(json.dumps(out, indent=1))
