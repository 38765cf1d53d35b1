"""Closed-form ridge via normal equations (operators/regression.py):
coefficients must match numpy's dense solve, exact-linear data must give
r2 == 1 with the true coefficients at lam=0, and the plan must be a single
aggregate (one scan, no join/iteration)."""

from __future__ import annotations

import numpy as np

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
