"""Property-based checks of the decay + spatial pair: exact
power-of-two recency weighting and the Getis-Ord-style grid hot-spot
statistic vs brute-force pure-Python twins — round 10's thirteenth
sweep batch.
"""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)

_T0 = dt.datetime(2024, 3, 4, 0, 0, 0)


def _round4(x: float) -> float:
    return math.floor(x * 10000 + 0.5) / 10000.0


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),  # key
            st.integers(0, 400_000),  # age offset seconds (several HLs)
            st.integers(-9, 9),  # value
        ),
        min_size=1,
        max_size=20,
    )
)
def test_decayed_user_value_matches_bruteforce(spark, events):
    from feature_store_fraud_detection_spark.operators.decay import (
        decayed_user_value,
    )

    hl = 86_400
    t_max = max(s for _, s, _ in events)
    rows = [
        (k, _T0 + dt.timedelta(seconds=s), float(v)) for k, s, v in events
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    out = {
        r.k: (r.n_events, r.decayed_value, r.decayed_weight)
        for r in decayed_user_value(df, "k", "ts", "v", hl).collect()
    }

    per: dict[int, list[tuple[float, float]]] = {}
    for k, s, v in events:
        age = t_max - s
        w = 1.0 / (1 << min(age // hl, 62))
        per.setdefault(k, []).append((v * w, w))
    expect = {}
    for k, pairs in per.items():
        wv = sum(sorted(x for x, _ in pairs))
        w = sum(sorted(x for _, x in pairs))
        expect[k] = (len(pairs), _round4(wv), _round4(w))
    assert set(out) == set(expect)
    for k, (n, wv, w) in expect.items():
        assert out[k][0] == n
        assert abs(out[k][1] - wv) < 1e-9
        assert abs(out[k][2] - w) < 1e-9


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(0, 40),  # lat in 1e-2 degrees
            st.integers(0, 40),  # lon in 1e-2 degrees
        ),
        min_size=1,
        max_size=30,
    )
)
def test_grid_hotspots_matches_bruteforce(spark, pts):
    from feature_store_fraud_detection_spark.operators.spatial import (
        grid_hotspots,
    )

    cell = 0.05
    rows = [(la / 100.0, lo / 100.0) for la, lo in pts]
    df = spark.createDataFrame(rows, "lat double, lon double")
    out = {
        (r.cx, r.cy): (r.n_events, r.neighbor_sum, r.w, r.gi_z)
        for r in grid_hotspots(df, "lat", "lon", cell_deg=cell).collect()
    }

    cells: dict[tuple[int, int], int] = {}
    for la, lo in rows:
        c = (int(math.floor(la / cell)), int(math.floor(lo / cell)))
        cells[c] = cells.get(c, 0) + 1
    n = len(cells)
    m = sum(cells.values()) / n
    var = sum(c * c for c in cells.values()) / n - m * m
    expect = {}
    for (cx, cy), cnt in cells.items():
        hood = [
            cells[(cx + dx, cy + dy)]
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (cx + dx, cy + dy) in cells
        ]
        s_i, w_i = sum(hood), len(hood)
        z = (
            _round4((s_i - m * w_i) / (math.sqrt(var) * math.sqrt(w_i)))
            if var > 0
            else None
        )
        expect[(cx, cy)] = (cnt, s_i, w_i, z)
    assert set(out) == set(expect)
    for key_, (cnt, s_i, w_i, z) in expect.items():
        got = out[key_]
        assert (got[0], got[1], got[2]) == (cnt, s_i, w_i)
        if z is None:
            assert got[3] is None
        else:
            assert abs(got[3] - z) < 1e-3
