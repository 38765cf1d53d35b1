"""Property sweep: the encoder family (k-fold assignment, leave-one-out
and out-of-fold target encoding, the feature-hashing trick, rare-category
collapse) vs brute-force pure-Python twins — round 11's sweep of the
last unswept families (VERDICT r10 task 4). The twins recompute every
md5-derived decision and every double expression in the operator's
documented IEEE order, so a silent change to hashing or rounding
semantics fails loudly here.
"""

from __future__ import annotations

import math
import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)


def _md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _round4(x: float) -> float:
    return math.floor(x * 10000 + 0.5) / 10000.0


_labeled_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", "dd"]),  # category
        st.integers(0, 1),  # label
    ),
    min_size=1,
    max_size=30,
)


@SET
@given(st.lists(st.integers(0, 10**6), min_size=1, max_size=30, unique=True),
       st.integers(2, 7))
def test_kfold_assign_matches_md5_and_is_append_stable(spark, ids, k):
    from feature_store_fraud_detection_spark.operators.encoders import (
        kfold_assign,
    )

    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {r.id: r.fold for r in kfold_assign(df, "id", k=k).collect()}
    assert got == {i: _md5_int(str(i)) % k for i in ids}
    # appending rows never moves an existing row's fold
    df2 = spark.createDataFrame(
        [(i,) for i in ids] + [(10**7 + j,) for j in range(5)], "id long"
    )
    again = {r.id: r.fold for r in kfold_assign(df2, "id", k=k).collect()}
    assert all(again[i] == got[i] for i in ids)


@SET
@given(_labeled_rows)
def test_target_encode_loo_matches_bruteforce(spark, rows):
    from feature_store_fraud_detection_spark.operators.encoders import (
        target_encode_loo,
    )

    df = spark.createDataFrame(
        [(i, c, y) for i, (c, y) in enumerate(rows)],
        "id long, cat string, y long",
    )
    got = {
        r.id: r.loo_te
        for r in target_encode_loo(df, "cat", "y").collect()
    }
    cat_sum: dict[str, int] = {}
    cat_n: dict[str, int] = {}
    for c, y in rows:
        cat_sum[c] = cat_sum.get(c, 0) + y
        cat_n[c] = cat_n.get(c, 0) + 1
    g_mean = sum(y for _, y in rows) / float(len(rows))
    for i, (c, y) in enumerate(rows):
        expect = (
            (cat_sum[c] - y) / float(cat_n[c] - 1)
            if cat_n[c] > 1
            else g_mean
        )
        assert got[i] == _round4(expect), (i, c, y)


@SET
@given(_labeled_rows, st.integers(2, 5))
def test_target_encode_oof_matches_bruteforce(spark, rows, k):
    from feature_store_fraud_detection_spark.operators.encoders import (
        target_encode_oof,
    )

    smoothing = 20.0
    df = spark.createDataFrame(
        [(i, c, y) for i, (c, y) in enumerate(rows)],
        "id long, cat string, y long",
    )
    got = {
        r.id: r.oof_te
        for r in target_encode_oof(
            df, "cat", "y", "id", k=k, smoothing=smoothing
        ).collect()
    }
    folds = {i: _md5_int(str(i)) % k for i in range(len(rows))}
    cf_sum: dict[tuple[str, int], int] = {}
    cf_n: dict[tuple[str, int], int] = {}
    cat_sum: dict[str, int] = {}
    cat_n: dict[str, int] = {}
    for i, (c, y) in enumerate(rows):
        f = folds[i]
        cf_sum[(c, f)] = cf_sum.get((c, f), 0) + y
        cf_n[(c, f)] = cf_n.get((c, f), 0) + 1
        cat_sum[c] = cat_sum.get(c, 0) + y
        cat_n[c] = cat_n.get(c, 0) + 1
    prior = sum(y for _, y in rows) / float(len(rows))
    for i, (c, y) in enumerate(rows):
        f = folds[i]
        oof_sum = float(cat_sum[c] - cf_sum[(c, f)])
        oof_n = float(cat_n[c] - cf_n[(c, f)])
        expect = (oof_sum + smoothing * prior) / (oof_n + smoothing)
        assert got[i] == _round4(expect), (i, c, f)


@SET
@given(
    st.lists(
        st.tuples(st.sampled_from(["x", "y", "zz"]),
                  st.sampled_from(["p", "q"])),
        min_size=1,
        max_size=20,
    ),
    st.integers(2, 8),
)
def test_feature_hash_matches_bruteforce(spark, rows, num_buckets):
    from feature_store_fraud_detection_spark.operators.encoders import (
        feature_hash,
    )

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)],
        "id long, c1 string, c2 string",
    )
    got = {
        (r.id, r.feature_idx): r.feature_val
        for r in feature_hash(
            df, "id", ["c1", "c2"], num_buckets=num_buckets
        ).collect()
    }
    expect: dict[tuple[int, int], int] = {}
    for i, (a, b) in enumerate(rows):
        for col, v in (("c1", a), ("c2", b)):
            h = _md5_int(f"{col}={v}")
            idx = h % num_buckets
            sign = 1 if (h >> 32) & 1 == 0 else -1
            expect[(i, idx)] = expect.get((i, idx), 0) + sign
    expect = {kk: v for kk, v in expect.items() if v != 0}
    assert got == expect


@SET
@given(
    st.lists(st.sampled_from(["a", "b", "c", None]), min_size=1, max_size=25),
    st.integers(1, 4),
)
def test_collapse_rare_categories_matches_bruteforce(spark, vals, min_count):
    from feature_store_fraud_detection_spark.operators.encoders import (
        collapse_rare_categories,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v string"
    )
    got = {
        r.id: r.v_collapsed
        for r in collapse_rare_categories(df, "v", min_count).collect()
    }
    counts: dict[str, int] = {}
    for v in vals:
        if v is not None:
            counts[v] = counts.get(v, 0) + 1
    for i, v in enumerate(vals):
        # NULL never joins the frequent set -> collapses regardless
        expect = v if v is not None and counts[v] >= min_count else "__other__"
        assert got[i] == expect, (i, v)
