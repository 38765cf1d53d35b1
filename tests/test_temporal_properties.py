"""Property-based checks of the temporal-join family: backward as-of
join (window carry-forward form), bucketed interval join and
carry-forward resampling vs brute-force pure-Python twins on arbitrary
small event/feature tables — round 10's tenth sweep batch.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)

_T0 = dt.datetime(2024, 3, 4, 0, 0, 0)


def _ts(sec: int) -> dt.datetime:
    return _T0 + dt.timedelta(seconds=sec)


@SET
@given(
    st.lists(  # events: (key, t)
        st.tuples(st.integers(0, 2), st.integers(0, 50)),
        min_size=1,
        max_size=15,
    ),
    st.lists(  # features: (key, t, tiebreak, value)
        st.tuples(
            st.integers(0, 2), st.integers(0, 50), st.integers(0, 5),
            st.integers(0, 99),
        ),
        min_size=0,
        max_size=15,
    ),
    st.sampled_from([None, 10]),
)
def test_asof_join_matches_bruteforce(spark, events, feats, tol):
    from feature_store_fraud_detection_spark.operators.temporal import (
        asof_join,
    )

    ev = spark.createDataFrame(
        [(k, _ts(t), i) for i, (k, t) in enumerate(events)],
        "k long, ts timestamp, eid long",
    )
    ft = spark.createDataFrame(
        [(k, _ts(t), tb, v) for k, t, tb, v in feats],
        "k long, fts timestamp, tb long, val long",
    )
    out = {
        r.eid: (r.asof_ts, r.asof_age_us, r.val)
        for r in asof_join(
            ev, ft, "k", "ts", "fts", ["val"], tiebreak="tb",
            tolerance_sec=tol,
        ).collect()
    }
    for i, (k, t) in enumerate(events):
        cands = [
            (ft_t, tb, v)
            for fk, ft_t, tb, v in feats
            if fk == k and ft_t <= t
        ]
        if not cands:
            assert out[i] == (None, None, None)
            continue
        ft_t, tb, v = max(cands)
        if tol is not None and (t - ft_t) > tol:
            assert out[i] == (None, None, None)
        else:
            assert out[i] == (_ts(ft_t), (t - ft_t) * 1_000_000, v)


@SET
@given(
    st.lists(  # events
        st.tuples(st.integers(0, 2), st.integers(0, 60)),
        min_size=1,
        max_size=12,
    ),
    st.lists(  # intervals: (key, start, length)
        st.tuples(st.integers(0, 2), st.integers(0, 60), st.integers(0, 25)),
        min_size=0,
        max_size=10,
    ),
)
def test_interval_join_matches_bruteforce(spark, events, ivals):
    from feature_store_fraud_detection_spark.operators.temporal import (
        interval_join,
    )

    ev = spark.createDataFrame(
        [(k, _ts(t), i) for i, (k, t) in enumerate(events)],
        "k long, ts timestamp, eid long",
    )
    iv = spark.createDataFrame(
        [
            (k, _ts(s), _ts(s + ln), j)
            for j, (k, s, ln) in enumerate(ivals)
        ],
        "k long, start timestamp, end timestamp, iid long",
    )
    got = {
        (r.eid, r.iid)
        for r in interval_join(ev, iv, "k", "ts", "start", "end",
                               bucket_sec=7).collect()
    }
    expect = {
        (i, j)
        for i, (ek, et) in enumerate(events)
        for j, (ik, s, ln) in enumerate(ivals)
        if ek == ik and s <= et < s + ln
    }
    assert got == expect


@SET
@given(
    st.lists(  # (key, t, tiebreak, value)
        st.tuples(
            st.integers(0, 1), st.integers(0, 80), st.integers(0, 5),
            st.integers(0, 99),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_resample_carry_forward_matches_bruteforce(spark, rows_in):
    from feature_store_fraud_detection_spark.operators.temporal import (
        resample_carry_forward,
    )

    df = spark.createDataFrame(
        [(k, _ts(t), tb, v) for k, t, tb, v in rows_in],
        "k long, ts timestamp, tb long, v long",
    )
    out = {
        (r.k, r.bucket): (r.value, r.observed)
        for r in resample_carry_forward(
            df, "k", "ts", "v", bucket_sec=10, tiebreak="tb"
        ).collect()
    }

    base_us = int(_T0.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    per_bucket: dict[tuple[int, int], tuple] = {}
    for k, t, tb, v in rows_in:
        b = (base_us + t * 1_000_000) // 10_000_000
        cur = per_bucket.get((k, b))
        if cur is None or (t, tb) > cur[:2]:
            per_bucket[(k, b)] = (t, tb, v)
    expect = {}
    for k in {k for k, *_ in rows_in}:
        buckets = sorted(b for (kk, b) in per_bucket if kk == k)
        last = None
        for b in range(buckets[0], buckets[-1] + 1):
            if (k, b) in per_bucket:
                last = per_bucket[(k, b)][2]
                expect[(k, b)] = (last, True)
            else:
                expect[(k, b)] = (last, False)
    assert out == expect
