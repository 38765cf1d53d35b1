"""Closed-form ridge via normal equations (operators/regression.py):
coefficients must match numpy's dense solve, exact-linear data must give
r2 == 1 with the true coefficients at lam=0, and the plan must be a single
aggregate (one scan, no join/iteration)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.operators.regression import (
    ridge_normal_equations,
)


def _fit_numpy(X, y, lam):
    A = X.T @ X + lam * np.diag([0.0, 1.0, 1.0])
    return np.linalg.solve(A, X.T @ y)


def test_ridge_matches_numpy_solve(spark):
    rng = np.random.default_rng(5)
    n = 500
    x1 = rng.integers(0, 24, n)
    x2 = rng.integers(0, 7, n)
    # y quantized to 2 decimals — the exact-decimal contract of the op
    y = np.round(3.5 + 1.25 * x1 - 0.75 * x2 + rng.normal(0, 2.0, n), 2)
    df = spark.createDataFrame(
        [(int(a), int(b), float(c)) for a, b, c in zip(x1, x2, y)],
        "x1 int, x2 int, value double",
    )
    got = ridge_normal_equations(df, "x1", "x2", "value", lam=1.0).collect()[0]
    X = np.column_stack([np.ones(n), x1, x2])
    beta = _fit_numpy(X, y, lam=1.0)
    assert got["n"] == n
    assert abs(got["b0"] - beta[0]) < 1e-3
    assert abs(got["b1"] - beta[1]) < 1e-3
    assert abs(got["b2"] - beta[2]) < 1e-3
    resid = y - X @ beta
    r2 = 1.0 - (resid @ resid) / ((y - y.mean()) @ (y - y.mean()))
    assert abs(got["r2"] - r2) < 1e-3


def test_ridge_recovers_exact_linear_data_at_lam_zero(spark):
    rows = [(x1, x2, 2.0 + 3.0 * x1 - 1.5 * x2) for x1 in range(10) for x2 in range(5)]
    df = spark.createDataFrame(rows, "x1 int, x2 int, value double")
    got = ridge_normal_equations(df, "x1", "x2", "value", lam=0.0).collect()[0]
    assert (got["b0"], got["b1"], got["b2"]) == (2.0, 3.0, -1.5)
    assert got["r2"] == 1.0


def test_ridge_plan_is_single_aggregate_no_join(spark):
    df = spark.createDataFrame(
        [(1, 2, 3.0), (4, 5, 6.0), (2, 3, 1.0)], "x1 int, x2 int, value double"
    )
    plan = (
        ridge_normal_equations(df, "x1", "x2", "value")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    # one partial + one final hash aggregate pair — a single scan fit
    assert plan.count("HashAggregate") <= 2


def test_merged_moment_state_equals_full_fit_bit_exact(spark):
    """Incremental training: fold per-batch moments through
    merge_regression_moments -> ridge_from_moments must equal the
    one-pass fit EXACTLY (not approximately) — the moment sums are
    integer/decimal, so batching cannot change a single bit."""
    from feature_store_fraud_detection_spark.operators.regression import (
        merge_regression_moments,
        regression_moments,
        ridge_from_moments,
        ridge_normal_equations,
    )

    rng = np.random.default_rng(17)
    rows = [
        (int(a), int(b), float(c))
        for a, b, c in zip(
            rng.integers(0, 24, 900),
            rng.integers(0, 7, 900),
            np.round(rng.normal(50, 20, 900), 2),
        )
    ]
    schema = "x1 int, x2 int, value double"
    full = spark.createDataFrame(rows, schema)
    parts = [
        spark.createDataFrame(rows[i::3], schema) for i in range(3)
    ]
    merged = merge_regression_moments(
        *[regression_moments(p, "x1", "x2", "value") for p in parts]
    )
    got = ridge_from_moments(merged, lam=1.0).collect()[0]
    want = ridge_normal_equations(full, "x1", "x2", "value", lam=1.0).collect()[0]
    assert got.asDict() == want.asDict()  # bit-exact, not approx


def test_stream_ridge_moments_fold_matches_batch(spark, tmp_path):
    """foreachBatch incremental fit: per-batch moments fold into a parquet
    state row; after the stream drains, the model from state equals the
    batch fit over all data bit-exactly."""
    import json as _json
    import os as _os

    from feature_store_fraud_detection_spark.operators.regression import (
        merge_regression_moments,
        regression_moments,
        ridge_from_moments,
        ridge_normal_equations,
    )

    rng = np.random.default_rng(23)
    rows = [
        (int(i), int(a), int(b), float(c))
        for i, (a, b, c) in enumerate(
            zip(
                rng.integers(0, 24, 300),
                rng.integers(0, 7, 300),
                np.round(rng.normal(10, 5, 300), 2),
            )
        )
    ]
    src = tmp_path / "ridge_src"
    src.mkdir()
    for part in range(3):
        with open(src / f"p{part}.jsonl", "w") as f:
            for rid, a, b, c in rows[part::3]:
                f.write(_json.dumps({"rid": rid, "x1": a, "x2": b, "value": c}) + "\n")
        _os.utime(src / f"p{part}.jsonl", (1_700_000_000 + part, 1_700_000_000 + part))

    state_dir = str(tmp_path / "moment_state")

    from feature_store_fraud_detection_spark.streaming.pipeline import (
        run_stream_regression_fit,
    )

    raw = (
        spark.readStream.schema("rid bigint, x1 int, x2 int, value double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = run_stream_regression_fit(
        raw, state_dir, "x1", "x2", "value",
        checkpoint_dir=str(tmp_path / "ckpt_ridge"),
    )
    q.awaitTermination(120)

    state = spark.read.parquet(state_dir)
    got = ridge_from_moments(state, lam=1.0).collect()[0]
    full = spark.createDataFrame(
        [(a, b, c) for _, a, b, c in rows], "x1 int, x2 int, value double"
    )
    want = ridge_normal_equations(full, "x1", "x2", "value", lam=1.0).collect()[0]
    assert got.asDict() == want.asDict()


def test_ridge_fit_k_matches_numpy_on_five_features(spark):
    from feature_store_fraud_detection_spark.operators.regression import (
        ridge_fit_k,
    )

    rng = np.random.default_rng(41)
    n, k = 800, 5
    X = rng.normal(0, 2, (n, k))
    beta_true = np.array([1.0, -2.0, 0.5, 3.0, 0.0, 1.5])
    y = beta_true[0] + X @ beta_true[1:] + rng.normal(0, 0.5, n)
    cols = [f"f{i}" for i in range(k)]
    df = spark.createDataFrame(
        [tuple(float(v) for v in row) + (float(t),) for row, t in zip(X, y)],
        ", ".join(f"{c} double" for c in cols) + ", target double",
    )
    beta, info = ridge_fit_k(df, cols, "target", lam=1.0)
    Xd = np.column_stack([np.ones(n), X])
    A = Xd.T @ Xd + 1.0 * np.diag([0.0] + [1.0] * k)
    want = np.linalg.solve(A, Xd.T @ y)
    assert np.allclose(beta, want, atol=1e-8)
    assert info["n"] == n and info["r2"] > 0.95


def test_ridge_learning_curve_nested_subsets_one_scan(spark):
    from feature_store_fraud_detection_spark.operators.regression import (
        ridge_learning_curve,
        ridge_normal_equations,
    )

    rng = np.random.default_rng(53)
    rows = []
    x1s = rng.integers(0, 24, 2000)
    x2s = rng.integers(0, 7, 2000)
    ys = np.round(2.0 + 1.5 * x1s - 0.8 * x2s + rng.normal(0, 1.0, 2000), 2)
    for i in range(2000):
        rows.append((i, int(x1s[i]), int(x2s[i]), float(ys[i])))
    df = spark.createDataFrame(rows, "rid bigint, x1 int, x2 int, value double")
    curve = {
        r["fraction"]: r
        for r in ridge_learning_curve(
            df, "x1", "x2", "value", "rid", lam=1.0
        ).collect()
    }
    assert set(curve) == {0.25, 0.5, 0.75, 1.0}
    # fraction sizes are nested and roughly proportional
    ns = [curve[f]["n"] for f in (0.25, 0.5, 0.75, 1.0)]
    assert ns[0] < ns[1] < ns[2] < ns[3] == 2000
    # the 100% row equals the plain full fit exactly
    full = ridge_normal_equations(df, "x1", "x2", "value", lam=1.0).collect()[0]
    r100 = curve[1.0]
    assert (r100["b0"], r100["b1"], r100["b2"], r100["r2"]) == (
        full["b0"], full["b1"], full["b2"], full["r2"],
    )
    # a clean linear signal: every fraction's fit is already accurate
    for f in curve:
        assert abs(curve[f]["b1"] - 1.5) < 0.1
        assert curve[f]["r2"] > 0.9
    # ONE scan: plan has no join and exactly one aggregate pair + generate
    plan = (
        ridge_learning_curve(df, "x1", "x2", "value", "rid")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert plan.count("HashAggregate") <= 2


def test_ridge_conformal_coverage_guarantee(spark):
    """Split-conformal on a known linear model + noise: coverage must be
    near 1-alpha (finite-sample guarantee is >= 0.9 in expectation over
    splits; with 500 test points allow a small band), q near the noise
    distribution's 90th percentile of |N(0,1)| ~ 1.645, and splits
    roughly 50/25/25."""
    rng = np.random.default_rng(5)
    n = 2000
    x1 = rng.integers(0, 24, n)
    x2 = rng.integers(0, 7, n)
    y = 2.0 + 0.5 * x1 - 1.0 * x2 + rng.normal(0, 1.0, n)
    df = spark.createDataFrame(
        [(int(i), int(a), int(b), float(c)) for i, (a, b, c) in
         enumerate(zip(x1, x2, y))],
        "rid bigint, x1 int, x2 int, y double",
    )
    from feature_store_fraud_detection_spark.operators.regression import (
        ridge_conformal,
    )

    r = ridge_conformal(df, "x1", "x2", "y", "rid", alpha=0.1).collect()[0]
    assert r.n_train + r.n_cal + r.n_test == n
    assert abs(r.n_train - 1000) < 120 and abs(r.n_cal - 500) < 90
    # recovered coefficients close to truth
    assert abs(r.b1 - 0.5) < 0.1 and abs(r.b2 + 1.0) < 0.2
    # q ~ 90th pct of |N(0,1)| = 1.645 (plus estimation slack)
    assert 1.3 < r.q < 2.1
    # empirical coverage honors the conformal guarantee
    assert 0.84 <= r.coverage <= 0.97


def test_ridge_conformal_empty_calibration_split(spark):
    """An id universe whose md5 hashes all land in the train band leaves
    the calibration split EMPTY. The guard must return one row with NULL
    q / NULL coverage and intact betas — NOT raise from element_at(_, 0)
    (Spark arrays are 1-based) or NULL out the model."""
    from feature_store_fraud_detection_spark.operators.regression import (
        ridge_conformal,
    )

    import hashlib

    base = spark.createDataFrame(
        [(int(i), int(i % 5), int(i % 3), float(2 * (i % 5) - (i % 3)))
         for i in range(12)],
        "rid bigint, x1 int, x2 int, y double",
    )

    # pre-searched seed whose 12 ids ALL md5-hash below 0.5 (train band);
    # re-verify driver-side with the same 60-bit construction md5_int uses
    seed = "s5809"
    for rid in range(12):
        h = hashlib.md5(f"{seed}|{rid}".encode()).hexdigest()[:15]
        assert int(h, 16) / float(2**60) < 0.5

    r = ridge_conformal(
        base, "x1", "x2", "y", "rid", alpha=0.1, seed=seed
    ).collect()
    assert len(r) == 1
    row = r[0]
    assert row.n_cal == 0 and row.n_test == 0
    assert row.n_train == 12
    assert row.q is None and row.coverage is None
    # the fitted model survives the empty split
    assert row.b0 is not None and row.b1 is not None


def test_ridge_conformal_sketch_conservative_within_bin_width(spark):
    """The histogram-sketch conformal quantile must sit in
    [q_exact, q_exact + bin_width] (upper-edge rule), keep coverage at or
    above the exact path's, and fall back to the EXACT max residual when
    the conformal rank lands in the overflow bin — so the >= 1-alpha
    guarantee survives residuals beyond the grid."""
    import numpy as np

    from feature_store_fraud_detection_spark.operators.regression import (
        ridge_conformal,
        ridge_conformal_sketch,
    )

    rng = np.random.default_rng(7)
    n = 1500
    x1 = rng.integers(0, 24, n)
    x2 = rng.integers(0, 7, n)
    y = 2.0 + 0.5 * x1 - 1.0 * x2 + rng.normal(0, 1.0, n)
    df = spark.createDataFrame(
        [(int(i), int(a), int(b), float(c)) for i, (a, b, c) in
         enumerate(zip(x1, x2, y))],
        "rid bigint, x1 int, x2 int, y double",
    )
    ex = ridge_conformal(df, "x1", "x2", "y", "rid", alpha=0.1).collect()[0]
    hi, bins = 10.0, 256
    sk = ridge_conformal_sketch(
        df, "x1", "x2", "y", "rid", alpha=0.1, hi=hi, bins=bins
    ).collect()[0]
    assert (sk.n_train, sk.n_cal, sk.n_test) == (
        ex.n_train, ex.n_cal, ex.n_test,
    )
    assert (sk.b0, sk.b1, sk.b2) == (ex.b0, ex.b1, ex.b2)
    width = hi / bins
    assert ex.q <= sk.q <= ex.q + width + 1e-9
    assert sk.coverage >= ex.coverage
    # exact-integer surface: q_bin's upper edge IS q (non-overflow), and
    # covered_count is the integer numerator of coverage
    assert 1 <= sk.q_bin < bins
    assert abs(sk.q_bin * width - sk.q) < 1e-9
    assert sk.covered_count == round(sk.coverage * sk.n_test)
    assert ex.covered_count == round(ex.coverage * ex.n_test)

    # overflow: a grid far too small for the residuals forces the rank
    # into the last bin -> q = exact max calibration residual (>= q_exact)
    ov = ridge_conformal_sketch(
        df, "x1", "x2", "y", "rid", alpha=0.1, hi=0.5, bins=4
    ).collect()[0]
    assert ov.q >= ex.q
    assert ov.coverage >= ex.coverage
    assert ov.q_bin == 4  # overflow sentinel = bins
