"""Property-based checks of the survival / calibration family: the
Spark surfaces (bounded day-table folds, exact-integer bin tables)
vs brute-force pure-Python textbook implementations on arbitrary small
inputs — the round-10 extension of the rank/inference sweep program
(VERDICT r9 item 4). The r9 sweeps found two real degenerate-input bugs
the oracles missed; this file points the same gun at kaplan_meier,
nelson_aalen, logrank_test, hosmer_lemeshow and isotonic_calibration.
"""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)

_ANCHOR = dt.datetime(2024, 3, 1, 12, 0, 0)
_HORIZON_DAYS = 7


def _subject_events(subjects):
    """(duration_days, gap_days) per subject -> event rows.

    last = anchor - gap days, first = last - duration days; the
    operator's censoring rule (last within 7 days of the global max
    last) is REPLICATED, not forced, by the Python twins below.
    """
    rows = []
    for i, (d, g) in enumerate(subjects):
        last = _ANCHOR - dt.timedelta(days=g)
        first = last - dt.timedelta(days=d)
        rows.append((f"s{i}", first))
        rows.append((f"s{i}", last))
    return rows


def _km_table(subjects):
    """Brute-force KM/NA day table: per distinct duration ascending,
    (died, censored, at_risk) with the operator's censoring rule."""
    g_min = min(g for _, g in subjects)
    subs = [(d, g <= g_min + _HORIZON_DAYS) for d, g in subjects]
    days = sorted({d for d, _ in subs})
    table = []
    for t in days:
        died = sum(1 for d, c in subs if d == t and not c)
        cens = sum(1 for d, c in subs if d == t and c)
        risk = sum(1 for d, _ in subs if d >= t)
        table.append((t, died, cens, risk))
    return table


_subjects_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),  # duration days
        st.integers(min_value=0, max_value=20),  # gap to anchor, days
    ),
    min_size=1,
    max_size=20,
)


@SET
@given(_subjects_strategy)
def test_kaplan_meier_matches_bruteforce(spark, subjects):
    from feature_store_fraud_detection_spark.operators.survival import (
        kaplan_meier,
    )

    df = spark.createDataFrame(
        _subject_events(subjects), "user string, ts timestamp"
    )
    out = {
        r.duration_days: r
        for r in kaplan_meier(df, "user", "ts").collect()
    }
    s = 1.0
    for t, died, cens, risk in _km_table(subjects):
        s *= 1.0 - died / risk
        r = out.pop(t)
        assert (r.n_risk, r.n_churned, r.n_censored) == (risk, died, cens)
        assert abs(r.survival - s) < 1e-3
    assert not out  # no extra days


@SET
@given(_subjects_strategy)
def test_nelson_aalen_matches_bruteforce(spark, subjects):
    from feature_store_fraud_detection_spark.operators.survival import (
        nelson_aalen,
    )

    df = spark.createDataFrame(
        _subject_events(subjects), "user string, ts timestamp"
    )
    out = {
        r.duration_days: r
        for r in nelson_aalen(df, "user", "ts").collect()
    }
    h = v = 0.0
    for t, died, cens, risk in _km_table(subjects):
        h += died / risk
        v += died / (risk * risk)
        r = out.pop(t)
        assert (r.n_risk, r.n_churned, r.n_censored) == (risk, died, cens)
        assert abs(r.cum_hazard - h) < 1e-3
        assert abs(r.cum_hazard_var - v) < 1e-3
    assert not out


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=15),
        ),
        min_size=1,
        max_size=12,
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=15),
        ),
        min_size=1,
        max_size=12,
    ),
)
def test_logrank_matches_bruteforce(spark, treat, control):
    from feature_store_fraud_detection_spark.operators.survival import (
        logrank_test,
    )

    rows = []
    all_subs = []
    for grp, subjects in (("t", treat), ("c", control)):
        for i, (d, g) in enumerate(subjects):
            last = _ANCHOR - dt.timedelta(days=g)
            first = last - dt.timedelta(days=d)
            rows.append((f"{grp}{i}", grp, first))
            rows.append((f"{grp}{i}", grp, last))
            all_subs.append((grp, d, g))
    df = spark.createDataFrame(rows, "user string, g string, ts timestamp")
    r = logrank_test(df, "user", "ts", "g", "t").collect()[0]

    g_min = min(g for _, _, g in all_subs)
    subs = [
        (grp, d, g <= g_min + _HORIZON_DAYS) for grp, d, g in all_subs
    ]
    o1 = e1 = var = 0.0
    for t in sorted({d for _, d, _ in subs}):
        dd = sum(1 for _, d, c in subs if d == t and not c)
        if dd == 0:
            continue
        d1 = sum(1 for grp, d, c in subs if grp == "t" and d == t and not c)
        n = sum(1 for _, d, _ in subs if d >= t)
        n1 = sum(1 for grp, d, _ in subs if grp == "t" and d >= t)
        o1 += d1
        e1 += n1 / n * dd
        if n > 1:
            var += dd * (n1 / n) * (1 - n1 / n) * (n - dd) / (n - 1)
    assert (r.n_treat, r.n_control) == (len(treat), len(control))
    assert r.observed_treat == int(o1)
    assert abs((r.expected_treat or 0.0) - e1) < 1e-3
    assert abs((r.variance or 0.0) - var) < 1e-3
    if var > 1e-9:
        z = (o1 - e1) / math.sqrt(var)
        assert abs(r.logrank_z - z) < 1e-3
        assert abs(r.logrank_chi2 - z * z) < 2e-3


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10000),  # p4
            st.integers(min_value=0, max_value=1),  # y
        ),
        min_size=1,
        max_size=40,
    )
)
def test_hosmer_lemeshow_matches_bruteforce(spark, obs):
    from feature_store_fraud_detection_spark.operators.evaluation import (
        hosmer_lemeshow,
    )

    df = spark.createDataFrame(obs, "p4 long, y long")
    rows = hosmer_lemeshow(df, "p4", "y", n_bins=10).collect()

    bins: dict[int, list[tuple[int, int]]] = {}
    for p4, y in obs:
        b = min(p4 * 10 // 10000, 9)
        bins.setdefault(b, []).append((p4, y))
    used = excluded = 0
    terms = []
    for b in sorted(bins):
        n_g = len(bins[b])
        exp4 = sum(p for p, _ in bins[b])
        if 0 < exp4 < n_g * 10000:
            used += 1
            e = exp4 / 10000.0
            o = sum(y for _, y in bins[b])
            terms.append((o - e) ** 2 / (e * (1 - e / n_g)))
        else:
            excluded += 1
    h = sum(terms) if used >= 3 else None

    assert len(rows) == len(bins)
    for r in rows:
        n_g = len(bins[r.bin])
        exp4 = sum(p for p, _ in bins[r.bin])
        obs_pos = sum(y for _, y in bins[r.bin])
        assert (r.n_g, r.obs_pos, r.exp_pos4) == (n_g, obs_pos, exp4)
        assert r.bins_used == used and r.bins_excluded == excluded
        if h is None:
            assert r.hl_stat is None and r.df is None
        else:
            assert abs(r.hl_stat - h) < 1e-3
            assert r.df == used - 2


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100),  # prob in 1e-2 units
            st.integers(min_value=0, max_value=1),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_isotonic_calibration_matches_pav(spark, obs):
    from feature_store_fraud_detection_spark.operators.evaluation import (
        isotonic_calibration,
    )

    rows_in = [(p / 100.0, y) for p, y in obs]
    df = spark.createDataFrame(rows_in, "p double, y long")
    rows = isotonic_calibration(df, "p", "y", n_bins=10).collect()

    bins: dict[int, list[int]] = {}
    for p, y in rows_in:
        b = min(int(math.floor(p * 10)), 9)
        bins.setdefault(b, []).append(y)
    order = sorted(bins)
    # brute-force PAV on the (rate, n) bin sequence
    pools: list[list[float]] = []  # [sum, weight, count_of_bins]
    for b in order:
        pools.append([float(sum(bins[b])), float(len(bins[b])), 1])
        while len(pools) >= 2 and (
            pools[-2][0] * pools[-1][1] > pools[-1][0] * pools[-2][1]
        ):
            s2, w2, c2 = pools.pop()
            s1, w1, c1 = pools.pop()
            pools.append([s1 + s2, w1 + w2, c1 + c2])
    iso = []
    for s, w, c in pools:
        iso.extend([s / w] * c)

    assert [r.bin for r in rows] == order
    # monotone non-decreasing (allow round4 jitter)
    fitted = [r.iso_rate for r in rows]
    assert all(b - a > -1e-9 for a, b in zip(fitted, fitted[1:]))
    for r, expect in zip(rows, iso):
        assert r.n_k == len(bins[r.bin])
        assert r.s_pos == sum(bins[r.bin])
        assert abs(r.raw_rate - r.s_pos / r.n_k) < 1e-3
        assert abs(r.iso_rate - expect) < 1e-3
