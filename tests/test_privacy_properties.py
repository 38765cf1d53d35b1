"""Property-based checks of the release-risk/privacy family:
k-anonymity, l-diversity, categorical and numeric-EMD t-closeness and
the seeded Laplace mechanism vs brute-force pure-Python twins on
arbitrary small tables — round 10's fifth sweep batch. The t-closeness
surfaces are exact integers by design (sum_abs_scaled), so those
assert equality.
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)


def _round4(x: float) -> float:
    return math.floor(x * 10000 + 0.5) / 10000.0


_rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # qi_a
        st.integers(min_value=0, max_value=2),  # qi_b
        st.integers(min_value=0, max_value=3),  # sensitive
    ),
    min_size=1,
    max_size=30,
)


@SET
@given(_rows_strategy)
def test_k_anonymity_matches_bruteforce(spark, rows):
    from feature_store_fraud_detection_spark.operators.validate import (
        k_anonymity_profile,
    )

    df = spark.createDataFrame(rows, "a long, b long, s long")
    out = {
        r.class_size: (r.n_classes, r.n_rows, r.pct_rows_at_risk)
        for r in k_anonymity_profile(df, ["a", "b"]).collect()
    }
    classes: dict[tuple[int, int], int] = {}
    for a, b, _ in rows:
        classes[(a, b)] = classes.get((a, b), 0) + 1
    hist: dict[int, int] = {}
    for size in classes.values():
        hist[size] = hist.get(size, 0) + 1
    total = len(rows)
    cum = 0
    expect = {}
    for size in sorted(hist):
        n_cls = hist[size]
        cum += size * n_cls
        expect[size] = (n_cls, size * n_cls, _round4(cum / total))
    assert out == expect


@SET
@given(_rows_strategy)
def test_l_diversity_matches_bruteforce(spark, rows):
    from feature_store_fraud_detection_spark.operators.validate import (
        l_diversity_profile,
    )

    df = spark.createDataFrame(rows, "a long, b long, s long")
    out = {
        r.n_distinct_sensitive: (r.n_classes, r.n_rows)
        for r in l_diversity_profile(df, ["a", "b"], "s").collect()
    }
    per_class: dict[tuple[int, int], tuple[set, int]] = {}
    for a, b, s in rows:
        vals, n = per_class.get((a, b), (set(), 0))
        vals.add(s)
        per_class[(a, b)] = (vals, n + 1)
    expect: dict[int, list[int]] = {}
    for vals, n in per_class.values():
        e = expect.setdefault(len(vals), [0, 0])
        e[0] += 1
        e[1] += n
    assert out == {k: tuple(v) for k, v in expect.items()}


@SET
@given(_rows_strategy)
def test_t_closeness_matches_bruteforce(spark, rows):
    from feature_store_fraud_detection_spark.operators.validate import (
        t_closeness_profile,
    )

    df = spark.createDataFrame(rows, "a long, b long, s long")
    out = {
        (r.a, r.b): (r.n_rows, r.sum_abs_scaled, r.t_value)
        for r in t_closeness_profile(df, ["a", "b"], "s").collect()
    }
    n_total = len(rows)
    glob: dict[int, int] = {}
    for _, _, s in rows:
        glob[s] = glob.get(s, 0) + 1
    per_class: dict[tuple[int, int], dict[int, int]] = {}
    for a, b, s in rows:
        per_class.setdefault((a, b), {})
        per_class[(a, b)][s] = per_class[(a, b)].get(s, 0) + 1
    expect = {}
    for cls, counts in per_class.items():
        n_c = sum(counts.values())
        sum_abs = sum(
            abs(counts.get(v, 0) * n_total - nv * n_c)
            for v, nv in glob.items()
        )
        expect[cls] = (
            n_c,
            sum_abs,
            _round4(sum_abs / (2.0 * n_c * n_total)),
        )
    assert out == expect


@SET
@given(_rows_strategy)
def test_t_closeness_numeric_matches_bruteforce(spark, rows):
    import pytest

    from feature_store_fraud_detection_spark.operators.validate import (
        t_closeness_numeric_profile,
    )

    df = spark.createDataFrame(rows, "a long, b long, s long")
    res = t_closeness_numeric_profile(df, ["a", "b"], "s")
    values = sorted({s for _, _, s in rows})
    if len(values) == 1:
        with pytest.raises(Exception, match="single-valued"):
            res.collect()
        return
    out = {
        (r.a, r.b): (r.n_rows, r.n_levels, r.sum_abs_scaled, r.t_value)
        for r in res.collect()
    }
    n_total = len(rows)
    glob = {v: sum(1 for _, _, s in rows if s == v) for v in values}
    per_class: dict[tuple[int, int], dict[int, int]] = {}
    for a, b, s in rows:
        per_class.setdefault((a, b), {})
        per_class[(a, b)][s] = per_class[(a, b)].get(s, 0) + 1
    mv = len(values)
    expect = {}
    for cls, counts in per_class.items():
        n_c = sum(counts.values())
        sum_abs = 0
        ccv = cgl = 0
        for v in values:
            ccv += counts.get(v, 0)
            cgl += glob[v]
            sum_abs += abs(ccv * n_total - cgl * n_c)
        expect[cls] = (
            n_c,
            mv,
            sum_abs,
            _round4(sum_abs / ((mv - 1) * n_c * n_total)),
        )
    assert out == expect


@SET
@given(
    st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=30)
)
def test_dp_noisy_counts_matches_seeded_laplace(spark, cats):
    from feature_store_fraud_detection_spark.operators.validate import (
        dp_noisy_counts,
    )

    df = spark.createDataFrame([(c,) for c in cats], "cat long")
    out = {
        r.cat: (r.true_count, r.noisy_count)
        for r in dp_noisy_counts(df, "cat", epsilon=1.0, seed="rel-x")
        .collect()
    }
    counts: dict[int, int] = {}
    for c in cats:
        counts[c] = counts.get(c, 0) + 1
    expect = {}
    for c, n in counts.items():
        h = hashlib.md5(f"rel-x|{c}".encode()).hexdigest()[:15]
        u = int(h, 16) / float(2**60)
        centered = u - 0.5
        noise = -1.0 * math.copysign(1.0, centered) * math.log(
            1.0 - 2.0 * abs(centered)
        )
        expect[c] = (n, int(math.floor(max(0.0, n + noise) + 0.5)))
    assert out == expect
