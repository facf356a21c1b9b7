"""plans/fusion.py — truth discovery over conflicting claims.

Pins the property that justifies the operator's existence: on the
planted tail entities a majority vote picks the colluding spam
clique's value, the trust fixpoint recovers the truth. The fixpoint
itself is cross-checked against an INDEPENDENT pure-Python decimal
twin of the same 12-dp grid protocol (like tests/test_embed.py), so
a grid drift on either side fails the test. The reference renders one
curated registry document per package (lib/npm/NpmCouchDb.js:30) and
never fuses; a multi-source crawl extractor must.
"""

from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from npm_extraction_server_spark.plans.fusion import truth_discovery


def _claims_py():
    """The suite's deterministic 24-source x 20-entity corpus."""
    out = set()
    for doc in range(480):
        s, e = doc % 24, doc // 24
        if s % 8 == 0:
            out.add((s, e, f"L{5 + e % 3}"))
        elif s % 4 == 0:
            out.add((s, e, f"L{5 + (e + s) % 3}"))
        elif e < 16:
            if (s + e) % 3 != 0:
                out.add((s, e, f"L{e % 5}"))
        elif s == 1 + (e % 2):
            out.add((s, e, f"L{e % 5}"))
    return out


def _r12(x):
    return float(Decimal(repr(x)).quantize(Decimal("1e-12"),
                                           ROUND_HALF_UP))


def _fixpoint_py(claims, iterations=4):
    by_fact, by_src = defaultdict(list), defaultdict(list)
    for s, e, v in claims:
        by_fact[(e, v)].append(s)
        by_src[s].append((e, v))
    trust = {s: 1.0 for s in by_src}
    belief = {}
    for _ in range(iterations):
        raw_b = {f: float(sum(Decimal(repr(_r12(trust[s]))) for s in ss))
                 for f, ss in by_fact.items()}
        bmax = max(raw_b.values())
        belief = {f: _r12(raw_b[f] / bmax) for f in raw_b}
        raw_t = {s: float(sum(Decimal(repr(_r12(belief[f])))
                              for f in fs)) / len(fs)
                 for s, fs in by_src.items()}
        tmax = max(raw_t.values())
        trust = {s: _r12(raw_t[s] / tmax) for s in raw_t}
    return trust, belief


@pytest.fixture(scope="module")
def claims_df(spark):
    rows = [(f"src-{s}", f"pkg-{e}", "license", v)
            for s, e, v in _claims_py()]
    return spark.createDataFrame(
        rows, "source string, entity string, attr string, value string")


def test_fusion_beats_majority_vote_on_planted_tail(spark, claims_df):
    fused = {r.entity: r for r in
             truth_discovery(claims_df, iterations=4).collect()}
    assert len(fused) == 20
    # every entity fuses to the truth L(e%5)...
    for e in range(20):
        assert fused[f"pkg-{e}"].value == f"L{e % 5}", e
    # ...even though on the tail the vote count says otherwise
    votes = defaultdict(lambda: defaultdict(set))
    for s, e, v in _claims_py():
        votes[e][v].add(s)
    for e in range(16, 20):
        truth = f"L{e % 5}"
        top_v, top_n = max(((v, len(ss)) for v, ss in votes[e].items()),
                           key=lambda t: t[1])
        assert top_v != truth and top_n > len(votes[e][truth])
        assert fused[f"pkg-{e}"].n_sources == len(votes[e][truth]) == 1


def test_trust_matches_decimal_twin_bit_for_bit(spark, claims_df):
    got = {r.source: r.trust for r in
           truth_discovery(claims_df, iterations=4,
                           return_trust=True).collect()}
    want, _ = _fixpoint_py(_claims_py())
    assert got == {f"src-{s}": round(t, 8) for s, t in want.items()}
    # the spam clique and lone spammers rank far below every honest
    # source — the scorecard a crawler feeds back into scheduling
    spam = {f"src-{s}" for s in (0, 4, 8, 12, 16, 20)}
    assert max(got[s] for s in spam) < 0.02
    assert min(t for s, t in got.items() if s not in spam) > 0.8


def test_belief_ties_break_to_smallest_value(spark):
    # two sources, symmetric disagreement -> equal beliefs everywhere;
    # the fused value must be the deterministic lexicographic min
    rows = [("s1", "p", "a", "V1"), ("s2", "p", "a", "V0"),
            ("s1", "q", "a", "V9"), ("s2", "q", "a", "V2")]
    df = spark.createDataFrame(
        rows, "source string, entity string, attr string, value string")
    out = {r.entity: r.value
           for r in truth_discovery(df, iterations=2).collect()}
    assert out == {"p": "V0", "q": "V2"}
