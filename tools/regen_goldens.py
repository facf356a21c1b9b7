#!/usr/bin/env python
"""Regenerate tests/goldens/*.nt from the kernel. Run ONLY after
verifying a semantics change against the reference (SURVEY.md §2)."""

import sys
from pathlib import Path

repo = Path(__file__).resolve().parents[1]
sys.path[:0] = [str(repo), str(repo / "tests")]

from fixtures import ENGINE_INDEX, ROOT, all_packages  # noqa: E402

from npm_extraction_server_spark.kernel.pipeline import (  # noqa: E402
    export_bundle,
    export_engines,
)
from npm_extraction_server_spark.kernel.serialize import to_ntriples  # noqa: E402

out = repo / "tests" / "goldens"
out.mkdir(exist_ok=True)
for pkg in all_packages():
    r = export_bundle(pkg, ROOT)
    assert r.error is None, r.error
    name = r.bundle.replace("@", "_at_").replace("/", "_")
    (out / f"{name}.nt").write_text(to_ntriples(r.triples))
    print(name, len(r.triples))
(out / "engines.nt").write_text(to_ntriples(export_engines(ENGINE_INDEX, ROOT)))
print("engines done")
