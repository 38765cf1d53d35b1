"""Property-based checks of the behavioral/funnel family:
first-touch funnel reach, the weekly cohort-retention matrix and the
Laplace-smoothed Markov stationary distribution vs brute-force
pure-Python twins on arbitrary small event streams — round 10's
seventh sweep batch.
"""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)

_T0 = dt.datetime(2024, 3, 4, 0, 0, 0)  # a Monday


def _round4(x: float) -> float:
    return math.floor(x * 10000 + 0.5) / 10000.0


_STEPS = ["a", "b", "c"]


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # user
            st.sampled_from(["a", "b", "c", "x"]),  # event type
        ),
        min_size=1,
        max_size=30,
    )
)
def test_funnel_counts_matches_bruteforce(spark, events):
    from feature_store_fraud_detection_spark.operators.funnel import (
        funnel_counts,
    )

    rows = [
        (u, t, _T0 + dt.timedelta(seconds=i))
        for i, (u, t) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "user long, type string, ts timestamp")
    res = funnel_counts(df, "user", "type", "ts", _STEPS)

    per_user: dict[int, list[tuple[str, int]]] = {}
    for i, (u, t) in enumerate(events):
        per_user.setdefault(u, []).append((t, i))
    reach = {s: 0 for s in _STEPS}
    for u, evs in per_user.items():
        prev_t = None
        for step in _STEPS:
            cand = [
                i
                for t, i in evs
                if t == step and (prev_t is None or i > prev_t)
            ]
            if not cand:
                break
            prev_t = min(cand)
            reach[step] += 1

    if reach["a"] == 0:
        # empty first step: conversion is 0/0 — whatever the contract,
        # it must not be an unnamed engine error
        try:
            rows_out = res.collect()
        except Exception as exc:  # noqa: BLE001
            assert "funnel" in str(exc)
        else:
            assert all(r.n_users == 0 for r in rows_out)
        return
    out = {r.step: (r.step_order, r.n_users, r.conversion) for r in
           res.collect()}
    for i, s in enumerate(_STEPS):
        assert out[s] == (
            i + 1,
            reach[s],
            _round4(reach[s] / reach["a"]),
        )


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # user
            st.integers(min_value=0, max_value=70),  # day offset
        ),
        min_size=1,
        max_size=30,
    )
)
def test_cohort_retention_matches_bruteforce(spark, events):
    from feature_store_fraud_detection_spark.operators.funnel import (
        cohort_retention,
    )

    rows = [
        (u, _T0 + dt.timedelta(days=d, hours=7)) for u, d in events
    ]
    df = spark.createDataFrame(rows, "user long, ts timestamp")
    out = {
        (r.cohort_week, r.week_offset): (r.n_active, r.n_cohort, r.retention)
        for r in cohort_retention(df, "user", "ts", max_offset=8).collect()
    }

    def week_of(d):
        date = (_T0 + dt.timedelta(days=d)).date()
        return date - dt.timedelta(days=date.weekday())  # ISO Monday

    activity = {(u, week_of(d)) for u, d in events}
    cohort = {}
    for u, w in activity:
        if u not in cohort or w < cohort[u]:
            cohort[u] = w
    sizes: dict[dt.date, int] = {}
    for u, w in cohort.items():
        sizes[w] = sizes.get(w, 0) + 1
    retained: dict[tuple[dt.date, int], set] = {}
    for u, w in activity:
        off = (w - cohort[u]).days // 7
        if off <= 8:
            retained.setdefault((cohort[u], off), set()).add(u)
    expect = {
        (cw, off): (
            len(us),
            sizes[cw],
            _round4(len(us) / sizes[cw]),
        )
        for (cw, off), us in retained.items()
    }
    assert out == expect


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # user
            st.sampled_from(["u", "v", "w"]),  # event type
        ),
        min_size=1,
        max_size=25,
    )
)
def test_markov_stationary_matches_bruteforce(spark, events):
    from feature_store_fraud_detection_spark.operators.funnel import (
        markov_stationary,
    )

    rows = [
        (u, t, _T0 + dt.timedelta(seconds=i), i)
        for i, (u, t) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "user long, type string, ts timestamp, id long"
    )
    out = {
        r.type: r.stationary_p
        for r in markov_stationary(df, "user", "type", "ts", "id",
                                   iters=30).collect()
    }

    types = sorted({t for _, t in events})
    k = len(types)
    per_user: dict[int, list[str]] = {}
    for u, t in events:
        per_user.setdefault(u, []).append(t)  # already in (ts, id) order
    counts: dict[tuple[str, str], int] = {}
    for seq in per_user.values():
        for a, b in zip(seq, seq[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    ci = {t: sum(c for (a, _), c in counts.items() if a == t) for t in types}
    P = {
        (a, b): (counts.get((a, b), 0) + 1) / (ci[a] + k)
        for a in types
        for b in types
    }
    p = {t: 1.0 / k for t in types}
    for _ in range(30):
        p = {
            b: sum(sorted(p[a] * P[(a, b)] for a in types)) for b in types
        }
    assert set(out) == set(types)
    for t in types:
        assert abs(out[t] - p[t]) < 1e-3
    assert abs(sum(out.values()) - 1.0) < 1e-2
