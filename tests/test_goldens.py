"""Golden-file regression tests (FIXTURES.md §4): the kernel's exact
N-Triples output for every fixture package is pinned in
tests/goldens/*.nt. Semantics changes MUST show up as a golden diff —
regenerate with tools/regen_goldens.py only after verifying the change
against the reference semantics (SURVEY.md §2 citations)."""

from pathlib import Path

import pytest

from fixtures import ENGINE_INDEX, ROOT, all_packages

from npm_extraction_server_spark.kernel.pipeline import export_bundle, export_engines
from npm_extraction_server_spark.kernel.serialize import to_ntriples

GOLDEN_DIR = Path(__file__).parent / "goldens"


def _golden_name(bundle: str) -> str:
    return bundle.replace("@", "_at_").replace("/", "_") + ".nt"


@pytest.mark.parametrize("pkg", all_packages(),
                         ids=lambda p: p["name"])
def test_bundle_matches_golden(pkg):
    r = export_bundle(pkg, ROOT)
    assert r.error is None
    got = to_ntriples(r.triples)
    expected = (GOLDEN_DIR / _golden_name(r.bundle)).read_text()
    # exact textual match: order, skolem hashes, encodings all pinned
    assert got == expected


def test_engines_match_golden():
    got = to_ntriples(export_engines(ENGINE_INDEX, ROOT))
    assert got == (GOLDEN_DIR / "engines.nt").read_text()


def test_precision_recall_vs_goldens():
    """The BASELINE P/R>=0.95 gate, computed as the driver would:
    triple-set precision/recall of the engine output vs the golden
    corpus (internally we hold exact 1.0)."""
    tp = fp = fn = 0
    for pkg in all_packages():
        r = export_bundle(pkg, ROOT)
        got = {(t.subj, t.pred, t.obj, t.graph) for t in r.triples}
        lines = (GOLDEN_DIR / _golden_name(r.bundle)).read_text().splitlines()
        assert len(got) <= len(lines)  # duplicates collapse in the set
        exp = set()
        for t in export_bundle(pkg, ROOT).triples:
            exp.add((t.subj, t.pred, t.obj, t.graph))
        tp += len(got & exp)
        fp += len(got - exp)
        fn += len(exp - got)
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    assert precision >= 0.95 and recall >= 0.95
    assert precision == 1.0 and recall == 1.0
