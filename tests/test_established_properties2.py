"""Second property-sweep batch for established operators:
stratified_ate, fairness_report and benford_profile vs brute-force
pure-Python references."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # stratum
            st.booleans(),                            # treated
            st.integers(min_value=0, max_value=20),   # outcome (integral)
        ),
        min_size=2,
        max_size=30,
    )
)
def test_stratified_ate_matches_bruteforce(spark, rows):
    import pytest

    from feature_store_fraud_detection_spark.operators.evaluation import (
        stratified_ate,
    )

    df = spark.createDataFrame(
        [(s, int(t), float(v)) for s, t, v in rows], "s int, t int, y double"
    )
    strata: dict = {}
    for s, t, v in rows:
        strata.setdefault(s, {"t": [], "c": []})["t" if t else "c"].append(v)
    inc = {
        s: g for s, g in strata.items() if g["t"] and g["c"]
    }
    if not inc:
        with pytest.raises(Exception, match="stratified_ate"):
            stratified_ate(df, "t", "y", "s", scale=1).collect()
        return
    out = {r.stratum: r for r in
           stratified_ate(df, "t", "y", "s", scale=1).collect()}
    n_inc = sum(len(g["t"]) + len(g["c"]) for g in inc.values())
    ate = sum(
        (len(g["t"]) + len(g["c"])) / n_inc
        * (sum(g["t"]) / len(g["t"]) - sum(g["c"]) / len(g["c"]))
        for g in inc.values()
    )
    any_row = next(iter(out.values()))
    assert any_row.n_included == n_inc
    assert abs(any_row.ate - ate) < 1e-3
    for s, g in strata.items():
        r = out[s]
        assert (r.n_t, r.n_c) == (len(g["t"]), len(g["c"]))
        assert r.included == (1 if s in inc else 0)
        if s in inc:
            assert abs(
                r.diff - (sum(g["t"]) / len(g["t"]) - sum(g["c"]) / len(g["c"]))
            ) < 1e-3


@SET
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2"]),
            st.booleans(),   # pred
            st.booleans(),   # label
        ),
        min_size=4,
        max_size=30,
    )
)
def test_fairness_report_matches_bruteforce(spark, rows):
    from feature_store_fraud_detection_spark.operators.evaluation import (
        fairness_report,
    )

    df = spark.createDataFrame(rows, "g string, p boolean, y boolean")
    out = {r.g: r for r in fairness_report(df, "g", "p", "y").collect()}
    by_g: dict = {}
    for g, p, y in rows:
        by_g.setdefault(g, []).append((p, y))
    for g, cells in by_g.items():
        r = out[g]
        n = len(cells)
        assert r.n == n
        ppr = sum(1 for p, _ in cells if p) / n
        assert abs(r.pred_pos_rate - ppr) < 1e-3
        pos = [p for p, y in cells if y]
        neg = [p for p, y in cells if not y]
        if pos:
            assert abs(r.tpr - sum(pos) / len(pos)) < 1e-3
        else:
            assert r.tpr is None
        if neg:
            assert abs(r.fpr - sum(neg) / len(neg)) < 1e-3
        else:
            assert r.fpr is None
    # gaps: max-min across groups where defined
    pprs = [r.pred_pos_rate for r in out.values()]
    any_row = next(iter(out.values()))
    assert abs(any_row.dp_gap - (max(pprs) - min(pprs))) < 2e-3


@SET
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=99999),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_benford_profile_matches_bruteforce(spark, rows):
    from feature_store_fraud_detection_spark.operators.stats import (
        benford_profile,
    )

    df = spark.createDataFrame(
        [(g, float(v) / 100.0) for g, v in rows], "g string, v double"
    )
    out = {(r.g, r.digit): r for r in
           benford_profile(df, "g", "v").collect()}
    counts: dict = {}
    for g, v in rows:
        s = str(v)  # v/100 rendered as DECIMAL(18,2) keeps v's digits
        first = next((ch for ch in s if ch != "0"), None)
        if first is None:
            continue
        d = int(first)
        counts[(g, d)] = counts.get((g, d), 0) + 1
    totals = Counter(g for (g, _), c in counts.items() for _ in range(c))
    for (g, d), c in counts.items():
        r = out[(g, d)]
        assert r.n == c
        assert abs(r.observed - c / totals[g]) < 1e-3
        assert abs(r.expected - math.log10(1 + 1.0 / d)) < 1e-3
    assert set(out) == set(counts)


@SET
@given(
    st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=3, max_size=30
    )
)
def test_winsorize_matches_bruteforce(spark, vals):
    from feature_store_fraud_detection_spark.operators.stats import (
        winsorize,
    )

    rows = [(i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v double")
    out = {r.id: r for r in
           winsorize(df, "v", 0.25, 0.75, id_cols=("id",)).collect()}

    def q(p):
        s = sorted(vals)
        idx = (len(s) - 1) * p
        lo_i = int(math.floor(idx))
        frac = idx - lo_i
        hi_i = min(lo_i + 1, len(s) - 1)
        return s[lo_i] + (s[hi_i] - s[lo_i]) * frac

    lo, hi = q(0.25), q(0.75)
    for i, v in enumerate(vals):
        r = out[i]
        clipped = min(max(v, lo), hi)
        assert abs(r.clipped_value - clipped) < 1e-3
        assert r.was_clipped == (1 if (v < lo or v > hi) else 0)


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),  # unit id
            st.booleans(),                            # success
        ),
        min_size=6,
        max_size=40,
    )
)
def test_ab_test_report_matches_bruteforce(spark, rows):
    import hashlib

    from feature_store_fraud_detection_spark.operators.evaluation import (
        ab_test_report,
    )

    df = spark.createDataFrame(rows, "u long, s boolean")

    def arm_a(u):
        h = hashlib.md5(f"exp1|{u}".encode()).hexdigest()[:15]
        return int(h, 16) % 2 == 0

    import pytest

    n_a = sum(1 for u, _ in rows if arm_a(u))
    n_b = len(rows) - n_a
    s_a = sum(1 for u, s in rows if arm_a(u) and s)
    s_b = sum(1 for u, s in rows if not arm_a(u) and s)
    if not (n_a and n_b):
        with pytest.raises(Exception, match="ab_test_report"):
            ab_test_report(df, "u", "s", salt="exp1").collect()
        return
    r = ab_test_report(df, "u", "s", salt="exp1").collect()[0]
    assert (r.n_a, r.n_b) == (n_a, n_b)
    pa, pb = s_a / n_a, s_b / n_b
    assert abs(r.p_a - pa) < 1e-3 and abs(r.p_b - pb) < 1e-3
    assert abs(r.lift - (pa - pb)) < 1e-3
