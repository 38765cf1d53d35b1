"""Property-based checks of the attribution/robust-stats trio:
U-shaped multi-touch attribution (exact integer-millionth credit),
median/MAD robust outliers (exact-percentile twin) and bucketed
quantile normalization vs brute-force pure-Python twins — round 10's
ninth sweep batch.
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


def _spark_percentile(sorted_vals, q):
    n = len(sorted_vals)
    pos = q * (n - 1)
    lo = int(math.floor(pos))
    frac = pos - lo
    if lo + 1 < n:
        return sorted_vals[lo] + frac * (sorted_vals[lo + 1] - sorted_vals[lo])
    return float(sorted_vals[lo])


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # user
            st.sampled_from(["ad", "email", "search", "conv"]),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_position_attribution_matches_bruteforce(spark, events):
    from feature_store_fraud_detection_spark.operators.funnel import (
        position_based_attribution,
    )

    rows = [
        (u, t, _T0 + dt.timedelta(seconds=i), i)
        for i, (u, t) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "user long, type string, ts timestamp, id long"
    )
    out = {
        r.channel: (r.n_touches, r.credit)
        for r in position_based_attribution(
            df, "user", "type", "ts", "id", "conv"
        ).collect()
    }

    per_user: dict[int, list[tuple[str, int]]] = {}
    for i, (u, t) in enumerate(events):
        per_user.setdefault(u, []).append((t, i))
    credit_ppm: dict[str, list[int]] = {}
    for u, evs in per_user.items():
        # journey id = number of conversions at-or-after the touch
        journeys: dict[int, list[str]] = {}
        for pos, (t, i) in enumerate(evs):
            j = sum(1 for tt, _ in evs[pos:] if tt == "conv")
            if t != "conv" and j >= 1:
                journeys.setdefault(j, []).append(t)
        for chans in journeys.values():  # already in forward time order
            n = len(chans)
            for r, ch in enumerate(chans, start=1):
                if n == 1:
                    c = 1_000_000
                elif n == 2:
                    c = 500_000
                elif r in (1, n):
                    c = 400_000
                else:
                    c = 200_000 // (n - 2)
                credit_ppm.setdefault(ch, []).append(c)
    expect = {
        ch: (len(cs), _round4(sum(cs) / 1_000_000.0))
        for ch, cs in credit_ppm.items()
    }
    assert out == expect


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # key
            st.integers(min_value=-20, max_value=20),  # value
        ),
        min_size=1,
        max_size=25,
    )
)
def test_robust_outliers_matches_bruteforce(spark, rows_in):
    from feature_store_fraud_detection_spark.operators.stats import (
        robust_outliers,
    )

    rows = [(k, i, float(v)) for i, (k, v) in enumerate(rows_in)]
    df = spark.createDataFrame(rows, "k long, id long, v double")
    out = {
        r.id: (r.robust_z, r.is_outlier)
        for r in robust_outliers(df, "k", "v").collect()
    }

    per_key: dict[int, list[float]] = {}
    for k, _, v in rows:
        per_key.setdefault(k, []).append(v)
    med = {k: _spark_percentile(sorted(vs), 0.5) for k, vs in per_key.items()}
    mad = {
        k: _spark_percentile(sorted(abs(v - med[k]) for v in vs), 0.5)
        for k, vs in per_key.items()
    }
    for k, i, v in rows:
        if mad[k] == 0.0:
            assert out[i] == (None, 0)
        else:
            z = _round4(0.6745 * abs(v - med[k]) / mad[k])
            assert abs(out[i][0] - z) < 1e-9
            assert out[i][1] == (1 if z > 3.5 else 0)


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # group
            st.integers(min_value=0, max_value=30),  # value
        ),
        min_size=4,
        max_size=30,
    )
)
def test_quantile_normalize_matches_bruteforce(spark, rows_in):
    from feature_store_fraud_detection_spark.operators.stats import (
        quantile_normalize,
    )

    n_buckets = 4
    rows = [(g, i, float(v)) for i, (g, v) in enumerate(rows_in)]
    df = spark.createDataFrame(rows, "g long, id long, v double")
    out = {
        (r.g, r.bucket): (r.n_rows, r.mean_raw, r.target)
        for r in quantile_normalize(df, "g", "v", "id",
                                    n_buckets=n_buckets).collect()
    }

    per_group: dict[int, list[tuple[float, int]]] = {}
    for g, i, v in rows:
        per_group.setdefault(g, []).append((v, i))
    means: dict[tuple[int, int], tuple[int, float]] = {}
    for g, vs in per_group.items():
        ordered = [v for v, _ in sorted(vs, key=lambda t: (t[0], t[1]))]
        n = len(ordered)
        base, extra = divmod(n, n_buckets)
        idx = 0
        for b in range(1, n_buckets + 1):
            size = base + (1 if b <= extra else 0)
            if size == 0:
                continue
            chunk = ordered[idx : idx + size]
            idx += size
            means[(g, b)] = (size, _round4(sum(chunk) / size))
    targets: dict[int, float] = {}
    for b in range(1, n_buckets + 1):
        ms = sorted(m for (g, bb), (_, m) in means.items() if bb == b)
        if ms:
            targets[b] = _round4(sum(ms) / len(ms))
    expect = {
        (g, b): (n, m, targets[b]) for (g, b), (n, m) in means.items()
    }
    assert set(out) == set(expect)
    for key_, (n, m, t) in expect.items():
        assert out[key_][0] == n
        assert abs(out[key_][1] - m) < 1e-3
        assert abs(out[key_][2] - t) < 1e-3
