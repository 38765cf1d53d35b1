"""Property sweep: KMV sketch family vs brute-force pure-Python md5
twins on arbitrary small keyed value sets — round 11. The existing
fixtures assert behavioral bounds (never-underestimate, merge=union);
this sweep pins the exact deterministic state: the sketch IS the k
smallest 60-bit-md5 uniform points of the distinct values, the merge
is the k smallest of the union, and the estimator switches exactly at
sketch fullness ((k-1)/u_k full, exact count otherwise).
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)

_SPACE = float(2**60)

_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 40)),  # (key, value)
    min_size=1,
    max_size=40,
)


def _point(v) -> float:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16) / _SPACE


def _round4(x: float) -> float:
    return math.floor(x * 10000 + 0.5) / 10000.0


def _brute_sketch(rows, k):
    per: dict[int, set[int]] = {}
    for key, v in rows:
        per.setdefault(key, set()).add(v)
    return {key: sorted(map(_point, vs))[:k] for key, vs in per.items()}


@SET
@given(_rows, st.sampled_from([4, 8, 256]))
def test_kmv_sketch_matches_bruteforce(spark, rows, k):
    from feature_store_fraud_detection_spark.operators.sketches import (
        kmv_sketch,
    )

    df = spark.createDataFrame(rows, "key long, v long")
    got = {
        r.key: list(r.kmv)
        for r in kmv_sketch(df, "key", "v", k=k).collect()
    }
    assert got == _brute_sketch(rows, k)


@SET
@given(_rows, _rows, st.sampled_from([4, 8]))
def test_kmv_merge_equals_sketch_of_union(spark, rows_a, rows_b, k):
    from feature_store_fraud_detection_spark.operators.sketches import (
        kmv_merge,
        kmv_sketch,
    )

    da = spark.createDataFrame(rows_a, "key long, v long")
    db = spark.createDataFrame(rows_b, "key long, v long")
    merged = {
        r.key: list(r.kmv)
        for r in kmv_merge(
            kmv_sketch(da, "key", "v", k=k),
            kmv_sketch(db, "key", "v", k=k),
            "key",
            k=k,
        ).collect()
    }
    assert merged == _brute_sketch(rows_a + rows_b, k)


@SET
@given(_rows, st.sampled_from([4, 8]))
def test_kmv_estimate_switches_exactly_at_fullness(spark, rows, k):
    from feature_store_fraud_detection_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
    )

    df = spark.createDataFrame(rows, "key long, v long")
    got = {
        r.key: (r.sketch_size, r.distinct_est)
        for r in kmv_estimate(
            kmv_sketch(df, "key", "v", k=k), "key", k=k
        ).collect()
    }
    for key, pts in _brute_sketch(rows, k).items():
        n = len(pts)
        expect = float(n) if n < k else (k - 1) / pts[k - 1]
        assert got[key] == (n, _round4(expect)), key
