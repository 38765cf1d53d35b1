"""Property-based checks of the timeseries/forecasting family: the
Spark daily-series surfaces (exact-decimal daily totals, sequential
struct folds, calendar-lag pair joins, doubled-rank prefix sums) vs
brute-force pure-Python textbook implementations on arbitrary small
inputs — round 10's second sweep batch, following the survival file.

Integer event values keep the daily totals exact (round4 of an integer
sum is the integer), so the twins disagree only if the OPERATOR's math
or edge handling is wrong, never over float folding.
"""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)

_DAY0 = dt.datetime(2024, 3, 4, 0, 0, 0)  # a Monday


def _daily_events(day_vals):
    """[(day_offset, value)] -> event rows at noon of each day."""
    return [
        ("k", _DAY0 + dt.timedelta(days=d, hours=12), v)
        for d, v in day_vals
    ]


def _daily_series(day_vals):
    """Replicate the operator family's daily-total surface: sum per
    day, ascending day order -> [(day_offset, total)]."""
    per_day: dict[int, int] = {}
    for d, v in day_vals:
        per_day[d] = per_day.get(d, 0) + v
    return sorted(per_day.items())


_day_vals_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=25),  # day offset
        st.integers(min_value=-9, max_value=9),  # event value
    ),
    min_size=1,
    max_size=30,
)


@SET
@given(st.lists(st.integers(min_value=-9, max_value=9), min_size=1,
                max_size=25))
def test_lag1_autocorr_matches_bruteforce(spark, vals):
    from feature_store_fraud_detection_spark.operators.timeseries import (
        lag1_autocorr,
    )

    rows = [
        ("k", _DAY0 + dt.timedelta(seconds=i), i, v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long, v long")
    out = lag1_autocorr(df, "k", "ts", "id", "v").collect()
    pairs = list(zip(vals, vals[1:]))  # (x = v_{t-1}, y = v_t)
    if not pairs:
        assert out == [] or out[0].n_pairs == 0
        return
    r = out[0]
    assert r.n_pairs == len(pairs)
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    syy = sum(y * y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    if n >= 2 and vx > 0 and vy > 0:
        expect = (n * sxy - sx * sy) / math.sqrt(vx * vy)
        assert abs(r.autocorr - expect) < 1e-3
    else:
        assert r.autocorr is None


@SET
@given(st.lists(st.integers(min_value=-9, max_value=9), min_size=1,
                max_size=25))
def test_cusum_peak_matches_bruteforce(spark, vals):
    from feature_store_fraud_detection_spark.operators.timeseries import (
        cusum_peak,
    )

    rows = [
        ("k", _DAY0 + dt.timedelta(seconds=i), i, v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long, v long")
    r = cusum_peak(df, "k", "ts", "id", "v").collect()[0]
    n, s = len(vals), sum(vals)
    stats = []
    p = 0
    for k, v in enumerate(vals, start=1):
        p += v
        stats.append(n * p - k * s)
    best = max(range(n), key=lambda i: (abs(stats[i]), -i))
    assert r.n_events == n
    assert r.peak_k == best + 1
    assert abs(r.cusum_peak - stats[best] / n) < 1e-3


@SET
@given(_day_vals_strategy)
def test_ewma_forecast_matches_bruteforce(spark, day_vals):
    from feature_store_fraud_detection_spark.operators.timeseries import (
        ewma_forecast,
    )

    df = spark.createDataFrame(
        _daily_events(day_vals), "k string, ts timestamp, v long"
    )
    r = ewma_forecast(df, "k", "ts", "v", alpha=0.3, z=3.0).collect()[0]
    series = _daily_series(day_vals)
    ys = [float(y) for _, y in series]

    def fold(seq):
        e, v = seq[0], 0.0
        for x in seq[1:]:
            e_new = 0.3 * x + 0.7 * e
            v = 0.7 * (v + 0.3 * (x - e) * (x - e))
            e = e_new
        return e, v

    e, v = fold(ys)
    assert r.n_days == len(ys)
    assert abs(r.last_y - ys[-1]) < 1e-9
    assert abs(r.ewma - e) < 1e-3
    assert abs(r.ewmstd - math.sqrt(v)) < 1e-3
    assert abs(r.forecast_next - e) < 1e-3
    if len(ys) >= 2:
        pe, pv = fold(ys[:-1])
        assert r.alert == (abs(ys[-1] - pe) > 3.0 * math.sqrt(pv))
    else:
        assert r.alert is None


@SET
@given(_day_vals_strategy)
def test_holt_forecast_matches_bruteforce(spark, day_vals):
    from feature_store_fraud_detection_spark.operators.timeseries import (
        holt_forecast,
    )

    df = spark.createDataFrame(
        _daily_events(day_vals), "k string, ts timestamp, v long"
    )
    r = holt_forecast(
        df, "k", "ts", "v", alpha=0.5, beta=0.25, horizon=7
    ).collect()[0]
    ys = [float(y) for _, y in _daily_series(day_vals)]
    level, trend, err = ys[0], 0.0, 0.0
    for y in ys[1:]:
        err += abs(y - (level + trend))
        l_new = 0.5 * y + 0.5 * (level + trend)
        trend = 0.25 * (l_new - level) + 0.75 * trend
        level = l_new
    assert r.n_days == len(ys)
    assert abs(r.level - level) < 1e-3
    assert abs(r.trend - trend) < 1e-3
    assert abs(r.forecast_1 - (level + trend)) < 1e-3
    assert abs(r.forecast_7 - (level + 7 * trend)) < 2e-3
    if len(ys) >= 2:
        assert abs(r.mae_1step - err / (len(ys) - 1)) < 1e-3
    else:
        assert r.mae_1step is None


def _median(sorted_xs):
    m = len(sorted_xs)
    if m % 2 == 1:
        return sorted_xs[m // 2]
    return (sorted_xs[m // 2 - 1] + sorted_xs[m // 2]) / 2.0


@SET
@given(_day_vals_strategy)
def test_theil_sen_matches_bruteforce(spark, day_vals):
    from feature_store_fraud_detection_spark.operators.timeseries import (
        theil_sen_trend,
    )

    df = spark.createDataFrame(
        _daily_events(day_vals), "k string, ts timestamp, v long"
    )
    r = theil_sen_trend(df, "k", "ts", "v").collect()[0]
    series = _daily_series(day_vals)
    assert r.n_days == len(series)
    if len(series) < 2:
        assert r.slope is None and r.intercept is None
        return
    slopes = sorted(
        (series[j][1] - series[i][1]) / (series[j][0] - series[i][0])
        for i in range(len(series))
        for j in range(i + 1, len(series))
    )
    slope = _median(slopes)
    d0 = series[0][0]
    intercepts = sorted(y - slope * (d - d0) for d, y in series)
    assert abs(r.slope - slope) < 1e-3
    assert abs(r.intercept - _median(intercepts)) < 1e-3


@SET
@given(_day_vals_strategy)
def test_pettitt_matches_bruteforce(spark, day_vals):
    from feature_store_fraud_detection_spark.operators.timeseries import (
        pettitt_changepoint,
    )

    df = spark.createDataFrame(
        _daily_events(day_vals), "k string, ts timestamp, v long"
    )
    r = pettitt_changepoint(df, "k", "ts", "v").collect()[0]
    series = _daily_series(day_vals)
    ys = [y * 10000 for _, y in series]  # the operator's 1e-4 surface
    n = len(ys)
    u = []
    p2 = 0
    for t, y in enumerate(ys, start=1):
        below = sum(1 for z in ys if z < y)
        ties = sum(1 for z in ys if z == y)
        p2 += 2 * below + ties + 1
        u.append(p2 - t * (n + 1))
    umax = max(abs(x) for x in u)
    at = next(i for i, x in enumerate(u) if abs(x) == umax)
    assert r.n_days == n
    assert r.u_abs_max == umax
    assert r.u_at == u[at]
    expected_day = (_DAY0 + dt.timedelta(days=series[at][0])).date()
    assert r.at_day == expected_day
    assert r.direction == (0 if u[at] == 0 else (1 if u[at] > 0 else -1))


@SET
@given(_day_vals_strategy)
def test_acf_profile_matches_bruteforce(spark, day_vals):
    from feature_store_fraud_detection_spark.operators.timeseries import (
        acf_profile,
    )

    df = spark.createDataFrame(
        _daily_events(day_vals), "k string, ts timestamp, v long"
    )
    out = {
        r.lag: r for r in acf_profile(df, "k", "ts", "v", max_lag=5).collect()
    }
    series = dict(_daily_series(day_vals))
    for lag in range(1, 6):
        pairs = [
            (series[d] * 10000, series[d + lag] * 10000)
            for d in series
            if d + lag in series
        ]
        if not pairs:
            assert lag not in out  # no rows for pairless lags
            continue
        r = out.pop(lag)
        assert r.n_pairs == len(pairs)
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        d1, d2 = n * sxx - sx * sx, n * syy - sy * sy
        if n >= 2 and d1 > 0 and d2 > 0:
            expect = (n * sxy - sx * sy) / (math.sqrt(d1) * math.sqrt(d2))
            assert abs(r.acf - expect) < 1e-3
        else:
            assert r.acf is None
    assert not out
