"""Property-based checks of the experimentation/readout family:
srm_check, cuped_adjusted_lift, ratio_metric_report and
brier_decomposition vs brute-force pure-Python twins that replicate the
salted-md5 arm assignment bit-exactly — round 10's sixth sweep batch.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)


def _round4(x: float) -> float:
    return math.floor(x * 10000 + 0.5) / 10000.0


def _arm_a(salt: str, unit) -> bool:
    h = hashlib.md5(f"{salt}|{unit}".encode()).hexdigest()[:15]
    return int(h, 16) % 2 == 0


@SET
@given(
    st.lists(st.integers(min_value=0, max_value=40), min_size=1,
             max_size=25, unique=True)
)
def test_srm_check_matches_bruteforce(spark, units):
    from feature_store_fraud_detection_spark.operators.evaluation import (
        srm_check,
    )

    # duplicate rows per unit must not change the distinct-unit counts
    rows = [(u,) for u in units] + [(units[0],)]
    df = spark.createDataFrame(rows, "unit long")
    r = srm_check(df, "unit", salt="exp1").collect()[0]
    n = len(units)
    n_a = sum(1 for u in units if _arm_a("exp1", u))
    n_b = n - n_a
    ea = eb = n * 0.5
    chi2 = (n_a - ea) ** 2 / ea + (n_b - eb) ** 2 / eb
    assert (r.n_units, r.n_a, r.n_b) == (n, n_a, n_b)
    assert abs(r.chi2 - chi2) < 1e-3
    assert r.srm_flag == (chi2 > 3.8415)


_SPLIT = "2024-03-10 00:00:00"
_PRE_TS = dt.datetime(2024, 3, 5, 12)
_POST_TS = dt.datetime(2024, 3, 15, 12)


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),  # unit
            st.booleans(),  # pre-period?
            st.integers(min_value=0, max_value=20),  # value
        ),
        min_size=2,
        max_size=30,
    )
)
def test_cuped_matches_bruteforce(spark, events):
    from feature_store_fraud_detection_spark.operators.evaluation import (
        cuped_adjusted_lift,
    )

    rows = [
        (u, _PRE_TS if pre else _POST_TS, float(v)) for u, pre, v in events
    ]
    df = spark.createDataFrame(rows, "unit long, ts timestamp, v double")
    res = cuped_adjusted_lift(df, "unit", "ts", "v", _SPLIT, salt="exp1")

    units: dict[int, list[int]] = {}
    for u, pre, v in events:
        s = units.setdefault(u, [0, 0])
        s[0 if pre else 1] += v
    per = {
        u: (p * 10000, q * 10000, _arm_a("exp1", u))
        for u, (p, q) in units.items()
    }
    n = len(per)
    sp = sum(p for p, _, _ in per.values())
    sq = sum(q for _, q, _ in per.values())
    spp = sum(p * p for p, _, _ in per.values())
    spq = sum(p * q for p, q, _ in per.values())
    sqq = sum(q * q for _, q, _ in per.values())
    n_a = sum(1 for _, _, a in per.values() if a)
    n_b = n - n_a
    cov = n * spq - sp * sq
    var_p = n * spp - sp * sp
    var_q = n * sqq - sq * sq

    if n_a == 0 or n_b == 0:
        # one-armed split: named fail-loud (the ab_test_report rule)
        import pytest

        with pytest.raises(Exception, match="cuped_adjusted_lift"):
            res.collect()
        return
    r = res.collect()[0]
    assert (r.n_a, r.n_b) == (n_a, n_b)
    if var_p == 0:
        # zero pre-period variance: theta/adjustment undefined -> NULL,
        # raw_lift still reports
        assert r.theta is None
        assert r.adjusted_lift is None
        assert r.var_reduction is None
        raw0 = (
            sum(q for _, q, a in per.values() if a) / n_a
            - sum(q for _, q, a in per.values() if not a) / n_b
        )
        assert abs(r.raw_lift - raw0 / 10000.0) < 1e-3
        return
    if var_q == 0:
        assert r.var_reduction is None
    theta = cov / var_p
    mean_pre = sp / n
    sp_a = sum(p for p, _, a in per.values() if a)
    sq_a = sum(q for _, q, a in per.values() if a)
    sp_b, sq_b = sp - sp_a, sq - sq_a
    raw = sq_a / n_a - sq_b / n_b
    adj_a = sq_a / n_a - theta * (sp_a / n_a - mean_pre)
    adj_b = sq_b / n_b - theta * (sp_b / n_b - mean_pre)
    assert abs(r.theta - theta) < 1e-3
    assert abs(r.raw_lift - raw / 10000.0) < 1e-3
    assert abs(r.adjusted_lift - (adj_a - adj_b) / 10000.0) < 1e-3
    if var_q > 0:
        assert abs(r.var_reduction - cov * cov / (var_p * var_q)) < 1e-3


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),  # unit
            st.integers(min_value=0, max_value=15),  # numerator
            st.integers(min_value=1, max_value=5),  # denominator
        ),
        min_size=2,
        max_size=30,
    )
)
def test_ratio_metric_matches_bruteforce(spark, events):
    from feature_store_fraud_detection_spark.operators.evaluation import (
        ratio_metric_report,
    )

    df = spark.createDataFrame(
        [(u, float(x), float(y)) for u, x, y in events],
        "unit long, x double, y double",
    )
    res = ratio_metric_report(df, "unit", "x", "y", salt="exp1")

    units: dict[int, list[int]] = {}
    for u, x, y in events:
        s = units.setdefault(u, [0, 0])
        s[0] += x
        s[1] += y
    arms = {True: [], False: []}
    for u, (x, y) in units.items():
        arms[_arm_a("exp1", u)].append((x * 10000, y * 10000))

    def ratio_se(rows):
        n = len(rows)
        sx = sum(x for x, _ in rows)
        sy = sum(y for _, y in rows)
        sxx = sum(x * x for x, _ in rows)
        sxy = sum(x * y for x, y in rows)
        syy = sum(y * y for _, y in rows)
        r = sx / sy
        s2 = (sxx - 2.0 * r * sxy + r * r * syy) / (n - 1.0)
        ybar = sy / n
        return r, math.sqrt(s2 / n) / ybar

    if len(arms[True]) < 2 or len(arms[False]) < 2:
        # a thin arm has no delta-method variance: named fail-loud
        # (the welch_t_test convention)
        import pytest

        with pytest.raises(Exception, match="ratio_metric_report"):
            res.collect()
        return
    r = res.collect()[0]
    assert (r.n_a, r.n_b) == (len(arms[True]), len(arms[False]))
    ra, sea = ratio_se(arms[True])
    rb, seb = ratio_se(arms[False])
    diff = ra - rb
    se = math.sqrt(sea * sea + seb * seb)
    assert abs(r.ratio_a - ra) < 1e-3
    assert abs(r.ratio_b - rb) < 1e-3
    assert abs(r.diff - diff) < 1e-3
    if se > 1e-12:
        assert abs(r.z - diff / se) < 1e-2
    assert abs(r.ci_lo - (diff - 1.96 * se)) < 1e-3
    assert abs(r.ci_hi - (diff + 1.96 * se)) < 1e-3


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100),  # prob in 1e-2
            st.integers(min_value=0, max_value=1),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_brier_decomposition_matches_bruteforce(spark, obs):
    from feature_store_fraud_detection_spark.operators.evaluation import (
        brier_decomposition,
    )

    rows = [(p / 100.0, y) for p, y in obs]
    df = spark.createDataFrame(rows, "p double, y long")
    out = brier_decomposition(df, "p", "y", n_bins=10).collect()

    bins: dict[int, list[tuple[int, int]]] = {}
    for p, y in rows:
        b = min(int(math.floor(p * 10.0)), 9)
        p6 = int(math.floor(p * 1000000.0 + 0.5))
        bins.setdefault(b, []).append((p6, y))
    n = len(rows)
    s = sum(y for _, y in rows)
    ybar = s / n
    rel = res_syy = res_sy = 0.0
    for b in sorted(bins):
        n_k = len(bins[b])
        pbar = sum(p6 for p6, _ in bins[b]) / (n_k * 1000000.0)
        ybar_k = sum(y for _, y in bins[b]) / n_k
        rel += n_k * (pbar - ybar_k) ** 2
        res_sy += n_k * ybar_k
        res_syy += n_k * ybar_k * ybar_k
    rel /= n
    res = (res_syy - 2 * ybar * res_sy + ybar * ybar * n) / n
    unc = ybar * (1 - ybar)
    assert len(out) == len(bins)
    for r in out:
        n_k = len(bins[r.bin])
        assert r.n_k == n_k
        assert r.s_pos == sum(y for _, y in bins[r.bin])
        assert r.sum_p6 == sum(p6 for p6, _ in bins[r.bin])
        assert abs(r.reliability - rel) < 1e-3
        assert abs(r.resolution - res) < 1e-3
        assert abs(r.uncertainty - unc) < 1e-3
        assert abs(r.brier_binned - (rel - res + unc)) < 2e-3
