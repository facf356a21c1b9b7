#!/usr/bin/env python
"""N -> 4N scaling evidence for a SECOND job shape: DSIR importance
weighting (aggregation-heavy) over the same pages corpus the kg
pipeline scaling uses, same pinned-JVM interleaved-pass protocol
(tools/scale_lib.measure_scaling with SCALE_JOB=dsir).
Run: python tools/probe_scaling_dsir.py [pages_dir]
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    os.environ["SCALE_JOB"] = "dsir"
    from tools.scale_lib import measure_scaling

    if len(sys.argv) > 1:
        pages_dir = sys.argv[1]
    else:
        from bench import _write_bench_pages

        # 96k docs, not the kg probe's 24k: DSIR's fixed per-pass costs
        # (the broadcast ratio-table build = two bucket-LM aggregates +
        # one collect) do not shrink with the slice, so a 6k-doc slice
        # measures mostly setup. 24k/slice puts the 4N pass ~20 s where
        # the per-doc work dominates — the regime the 10^12-doc target
        # actually lives in. warm_sec=75 because the first probe showed
        # 4N walls still falling after 30 s of JIT warm (N flat).
        pages_dir = _write_bench_pages(96000)
    out = measure_scaling(pages_dir, exec_cores=1, n_execs=4, n_pairs=5,
                          warm_sec=75.0)
    print(json.dumps({"job": "dsir", "scaling": out}))


if __name__ == "__main__":
    main()
