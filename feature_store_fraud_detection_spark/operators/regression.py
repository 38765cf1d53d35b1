"""Exact closed-form ridge regression via normal equations — the
hash-checkable ML-training operator.

The reference's model training (``back_end/model/training.py``) is
iterative (Adam over minibatches) and therefore inherently rows-only to a
cross-engine oracle. This operator is the closed-form counterpart a
100 TB pipeline actually wants for linear baselines: ONE scan builds the
exact moment matrix (integer and DECIMAL sums — no float accumulation
order anywhere), and the coefficients fall out of Cramer's rule evaluated
IN THE PLAN as fixed-order double expressions. Every engine that computes
the same exact moments and the same expression tree gets bit-identical
coefficients, so the fitted model itself hash-checks against a SQL twin
(``ridge_sql`` emits the mirrored formula text).

Model: y ~ b0 + b1*x1 + b2*x2 with L2 penalty ``lam`` on b1/b2 (intercept
unpenalized, the standard convention). x1/x2 must be integer-valued
columns (exact BIGINT moments); y is fixed-point at ``y_scale`` decimals
(exact DECIMAL moments).

Scale: the single aggregate is map-side combined — 10 running sums per
partition, one 1-row reduce. There is no iteration, no driver math, no
collect; 100 TB costs one scan. R^2 comes from the same moments
(SSE = y'y - 2b'X'y + b'X'Xb), so no second pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed evaluation order for the 3x3 Cramer expansion, shared by the
#: DataFrame and SQL sides: det = a11*(a22*a33-a23*a23)
#:   - a12*(a12*a33-a23*a13) + a13*(a12*a23-a22*a13), with b substituted
#: column-wise for the numerators. Kept as data so both sides stay in sync.


def regression_moments(
    df: DataFrame,
    x1_col: str,
    x2_col: str,
    y_col: str,
    y_scale: int = 2,
) -> DataFrame:
    """The 1-row exact moment state for y ~ b0 + b1*x1 + b2*x2: integer
    Gram sums + DECIMAL cross/target sums. ADDITIVE — moments of a union
    equal element-wise sums of per-part moments EXACTLY (integer/decimal
    arithmetic, no float accumulation), which is what makes incremental /
    streaming training bit-identical to a full recompute
    (:func:`merge_regression_moments`)."""
    x1 = F.col(x1_col).cast("bigint")
    x2 = F.col(x2_col).cast("bigint")
    y = F.col(y_col).cast(f"decimal(18,{y_scale})")
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x1).alias("sx1"),
        F.sum(x2).alias("sx2"),
        # Gram products in DECIMAL(38,0): BIGINT products/sums wrap
        # silently in non-ANSI Spark; the SQL twin's BIGINT sums widen to
        # HUGEINT in DuckDB, so decimal is what keeps the engines aligned
        F.sum((x1 * x1).cast("decimal(38,0)")).alias("sx11"),
        F.sum((x1 * x2).cast("decimal(38,0)")).alias("sx12"),
        F.sum((x2 * x2).cast("decimal(38,0)")).alias("sx22"),
        F.sum(y).alias("sy"),
        F.sum(x1 * y).alias("sx1y"),  # int-ok: y is decimal(18,s)
        F.sum(x2 * y).alias("sx2y"),  # int-ok: y is decimal(18,s)
        F.sum(y * y).alias("syy"),  # int-ok: y is decimal(18,s)
    )


_MOMENT_COLS = (
    "n", "sx1", "sx2", "sx11", "sx12", "sx22", "sy", "sx1y", "sx2y", "syy",
)


def merge_regression_moments(*moment_dfs: DataFrame) -> DataFrame:
    """Element-wise sum of 1-row moment frames — the incremental-training
    merge. Exact: every column is an integer or decimal sum, so
    merge(moments(A), moments(B)) == moments(A ∪ B) bit-for-bit, and the
    fitted model from merged state equals the full recompute
    (tests pin this). At scale: per micro-batch, compute the batch's
    moments (one scan of the batch) and fold them into a 10-number state
    row — model updates never re-read history."""
    if not moment_dfs:
        raise ValueError("need at least one moments frame")

    def _canon(m: DataFrame) -> DataFrame:
        # summing widens decimal precision (18 -> 28 -> 38): canonicalize
        # every frame to (bigint | decimal(38, scale)) so fresh moments,
        # merged moments, and parquet-round-tripped state all union cleanly
        from pyspark.sql.types import DecimalType

        cols = []
        for f in m.schema.fields:
            if isinstance(f.dataType, DecimalType):
                cols.append(
                    F.col(f.name).cast(f"decimal(38,{f.dataType.scale})")
                )
            else:
                cols.append(F.col(f.name).cast("bigint"))
        return m.select(*[c.alias(f.name) for c, f in zip(cols, m.schema.fields)])

    unioned = _canon(moment_dfs[0])
    for m in moment_dfs[1:]:
        unioned = unioned.unionByName(_canon(m))
    return unioned.agg(*[F.sum(c).alias(c) for c in _MOMENT_COLS])


def ridge_normal_equations(
    df: DataFrame,
    x1_col: str,
    x2_col: str,
    y_col: str,
    lam: float = 1.0,
    y_scale: int = 2,
) -> DataFrame:
    """Fit y ~ b0 + b1*x1 + b2*x2 by exact normal equations; returns ONE
    row (n, b0, b1, b2, r2), all computed columns rounded to 4 decimals."""
    moments = regression_moments(df, x1_col, x2_col, y_col, y_scale)
    return ridge_from_moments(moments, lam)


def ridge_from_moments(
    moments: DataFrame, lam: float = 1.0, keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Solve the normal equations from a moment frame (fresh from
    :func:`regression_moments`, folded through
    :func:`merge_regression_moments`, or a MULTI-ROW frame — one model per
    row, e.g. the learning curve's per-fraction moments) — Cramer's rule
    as fixed-order double expressions IN THE PLAN, identical text in the
    SQL twin. ``keep_cols`` are carried through to the output (the
    per-row key, e.g. the sample fraction)."""
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    a11, a12, a13 = d("n"), d("sx1"), d("sx2")
    a22 = d("sx11") + F.lit(float(lam))
    a23 = d("sx12")
    a33 = d("sx22") + F.lit(float(lam))
    b1, b2, b3 = d("sy"), d("sx1y"), d("sx2y")
    det = (
        a11 * (a22 * a33 - a23 * a23)
        - a12 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * a23 - a22 * a13)
    )
    det0 = (
        b1 * (a22 * a33 - a23 * a23)
        - a12 * (b2 * a33 - a23 * b3)
        + a13 * (b2 * a23 - a22 * b3)
    )
    det1 = (
        a11 * (b2 * a33 - a23 * b3)
        - b1 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * b3 - b2 * a13)
    )
    det2 = (
        a11 * (a22 * b3 - b2 * a23)
        - a12 * (a12 * b3 - b2 * a13)
        + b1 * (a12 * a23 - a22 * a13)
    )
    # a singular system (empty moment row: n=0 zeroes the whole first
    # column even with the ridge penalty on the diagonal) has no
    # solution — NULL coefficients, never an ANSI divide-by-zero
    # (round-10 degenerate-probe finding)
    det_ok = F.when(det != 0.0, det)
    with_dets = moments.select(
        *keep_cols,
        "n", "sy", "sx1y", "sx2y", "syy", "sx1", "sx2", "sx11", "sx12", "sx22",
        (det0 / det_ok).alias("__b0"),
        (det1 / det_ok).alias("__b1"),
        (det2 / det_ok).alias("__b2"),
    )
    # SSE = y'y - 2 b'X'y + b'(X'X)b over the UNpenalized Gram matrix;
    # SST = y'y - (sum y)^2 / n. Same fixed-order expressions in the twin.
    b0c, b1c, b2c = F.col("__b0"), F.col("__b1"), F.col("__b2")
    g11, g12, g13 = d("n"), d("sx1"), d("sx2")
    g22, g23, g33 = d("sx11"), d("sx12"), d("sx22")
    bxy = b0c * d("sy") + b1c * d("sx1y") + b2c * d("sx2y")
    bgb = (
        b0c * (g11 * b0c + g12 * b1c + g13 * b2c)
        + b1c * (g12 * b0c + g22 * b1c + g23 * b2c)
        + b2c * (g13 * b0c + g23 * b1c + g33 * b2c)
    )
    sse = d("syy") - F.lit(2.0) * bxy + bgb
    n_pos = F.when(F.col("n") > 0, F.col("n")).cast("double")
    sst = d("syy") - d("sy") * d("sy") / n_pos
    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    r4 = round4_stable
    return with_dets.select(
        *keep_cols,
        F.col("n").cast("bigint").alias("n"),
        r4(b0c).alias("b0"),
        r4(b1c).alias("b1"),
        r4(b2c).alias("b2"),
        # constant-y input: SST = 0 and R^2 is undefined — NULL, never
        # an ANSI divide-by-zero (round-10 degenerate-probe finding)
        r4(F.when(sst > 0.0, F.lit(1.0) - sse / sst)).alias("r2"),
    )


def ridge_sql(
    table_expr: str,
    x1_expr: str,
    x2_expr: str,
    y_expr: str,
    lam: float = 1.0,
    y_scale: int = 2,
) -> str:
    """The DuckDB twin of :func:`ridge_normal_equations`: identical moment
    sums and the identical fixed-order double formula text, emitted as SQL.
    ``table_expr`` may be a table name or a parenthesized subquery;
    ``*_expr`` are SQL expressions for the regressors/target."""
    lam = float(lam)
    return f"""
WITH m AS (
  SELECT count(*) AS n,
         sum(CAST({x1_expr} AS BIGINT)) AS sx1,
         sum(CAST({x2_expr} AS BIGINT)) AS sx2,
         sum(CAST({x1_expr} AS BIGINT) * CAST({x1_expr} AS BIGINT)) AS sx11,
         sum(CAST({x1_expr} AS BIGINT) * CAST({x2_expr} AS BIGINT)) AS sx12,
         sum(CAST({x2_expr} AS BIGINT) * CAST({x2_expr} AS BIGINT)) AS sx22,
         sum(CAST({y_expr} AS DECIMAL(18,{y_scale}))) AS sy,
         sum(CAST({x1_expr} AS BIGINT) * CAST({y_expr} AS DECIMAL(18,{y_scale}))) AS sx1y,
         sum(CAST({x2_expr} AS BIGINT) * CAST({y_expr} AS DECIMAL(18,{y_scale}))) AS sx2y,
         sum(CAST({y_expr} AS DECIMAL(18,{y_scale}))
             * CAST({y_expr} AS DECIMAL(18,{y_scale}))) AS syy
  FROM {table_expr}
),
a AS (
  SELECT CAST(n AS DOUBLE) AS a11, CAST(sx1 AS DOUBLE) AS a12,
         CAST(sx2 AS DOUBLE) AS a13,
         CAST(sx11 AS DOUBLE) + {lam!r} AS a22, CAST(sx12 AS DOUBLE) AS a23,
         CAST(sx22 AS DOUBLE) + {lam!r} AS a33,
         CAST(sy AS DOUBLE) AS b1, CAST(sx1y AS DOUBLE) AS b2,
         CAST(sx2y AS DOUBLE) AS b3,
         CAST(syy AS DOUBLE) AS dyy,
         CAST(sx11 AS DOUBLE) AS g22, CAST(sx12 AS DOUBLE) AS g23,
         CAST(sx22 AS DOUBLE) AS g33,
         n, sy
  FROM m
),
dets AS (
  SELECT n, a11, a12, a13, a22, a23, a33, b1, b2, b3, dyy, g22, g23, g33,
         (a11*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13)
            + a13*(a12*a23 - a22*a13)) AS det,
         (b1*(a22*a33 - a23*a23) - a12*(b2*a33 - a23*b3)
            + a13*(b2*a23 - a22*b3)) AS det0,
         (a11*(b2*a33 - a23*b3) - b1*(a12*a33 - a23*a13)
            + a13*(a12*b3 - b2*a13)) AS det1,
         (a11*(a22*b3 - b2*a23) - a12*(a12*b3 - b2*a13)
            + b1*(a12*a23 - a22*a13)) AS det2
  FROM a
),
coef AS (
  SELECT n, a11, a12, a13, b1, b2, b3, dyy, g22, g23, g33,
         det0/det AS b0c, det1/det AS b1c, det2/det AS b2c
  FROM dets
)
SELECT CAST(n AS BIGINT) AS n,
       floor((b0c) * 10000 + 0.5) / 10000 AS b0,
       floor((b1c) * 10000 + 0.5) / 10000 AS b1,
       floor((b2c) * 10000 + 0.5) / 10000 AS b2,
       floor((1.0 - (dyy - 2.0*(b0c*b1 + b1c*b2 + b2c*b3)
              + (b0c*(a11*b0c + a12*b1c + a13*b2c)
                 + b1c*(a12*b0c + g22*b1c + g23*b2c)
                 + b2c*(a13*b0c + g23*b1c + g33*b2c)))
            / (dyy - b1*b1/a11)) * 10000 + 0.5) / 10000 AS r2
FROM coef
"""


def ridge_fit_k(
    df: DataFrame,
    x_cols: list[str],
    y_col: str,
    lam: float = 1.0,
) -> tuple[list[float], dict]:
    """General k-feature ridge by the same one-scan moment strategy: the
    full (k+1)x(k+1) Gram matrix and X'y vector come from ONE map-side-
    combined aggregate (float columns allowed — sums fold in double, so
    this variant is deterministic within Spark but not oracle-exact like
    the 2-feature DECIMAL form), then the solve is numpy on the collected
    1-row moment frame — bounded driver metadata, like every quantizer
    codebook here. Returns (coefficients [b0, b1, ...], info dict with
    n/r2).

    Scale: one scan, one 1-row collect, no iteration — the linear-model
    shape that actually works at 100 TB (vs SGD's many passes). Intercept
    unpenalized.
    """
    import numpy as np

    k = len(x_cols)
    xs = [F.lit(1.0)] + [F.col(c).cast("double") for c in x_cols]
    y = F.col(y_col).cast("double")
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(k + 1):
        for j in range(i, k + 1):
            # int-ok: xs/y all cast("double") above — this variant is
            # documented as double-moment, not oracle-exact
            aggs.append(F.sum(xs[i] * xs[j]).alias(f"g_{i}_{j}"))
        aggs.append(F.sum(xs[i] * y).alias(f"xy_{i}"))  # int-ok: doubles
    aggs.append(F.sum(y * y).alias("syy"))  # int-ok: doubles
    row = df.agg(*aggs).collect()[0]
    G = np.zeros((k + 1, k + 1))
    for i in range(k + 1):
        for j in range(i, k + 1):
            G[i, j] = G[j, i] = row[f"g_{i}_{j}"]
    b = np.array([row[f"xy_{i}"] for i in range(k + 1)])
    A = G + lam * np.diag([0.0] + [1.0] * k)
    beta = np.linalg.solve(A, b)
    sse = float(row["syy"] - 2.0 * beta @ b + beta @ G @ beta)
    sst = float(row["syy"] - row["xy_0"] ** 2 / row["n"])
    return list(map(float, beta)), {
        "n": int(row["n"]),
        "r2": 1.0 - sse / sst if sst > 0 else float("nan"),
    }


def ridge_learning_curve(
    df: DataFrame,
    x1_col: str,
    x2_col: str,
    y_col: str,
    id_col: str,
    fractions: tuple[float, ...] = (0.25, 0.5, 0.75, 1.0),
    lam: float = 1.0,
    y_scale: int = 2,
    salt: str = "lc",
) -> DataFrame:
    """Data-scaling diagnostic ("how much data does this model need"):
    fit the exact ridge on NESTED deterministic subsamples — the md5
    threshold gate makes fraction f's rows a superset of every smaller
    fraction's — and report one (fraction, n, b0, b1, b2, r2) row per
    fraction. Stabilizing coefficients / flattening r2 across fractions
    = more data won't help this model.

    ONE scan: every fraction's moment sums are conditional aggregates
    over the same pass (``sum(CASE WHEN hash < f ...)``), stacked to one
    row per fraction and solved row-wise by the same in-plan Cramer
    expressions — |fractions| models for the price of one table read.
    Fully hash-checkable (exact conditional sums == the SQL twin's
    WHERE-filtered sums; identical formula text).
    """
    digest = F.md5(
        F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))
    )
    hf = F.conv(F.substring(digest, 1, 15), 16, 10).cast("double") / F.lit(
        float(16**15)
    )
    x1 = F.col(x1_col).cast("bigint")
    x2 = F.col(x2_col).cast("bigint")
    y = F.col(y_col).cast(f"decimal(18,{y_scale})")
    base = df.select(
        x1.alias("__x1"), x2.alias("__x2"), y.alias("__y"), hf.alias("__hf")
    )
    aggs = []
    for i, f in enumerate(fractions):
        g = F.col("__hf") < F.lit(float(f))
        gated = lambda c: F.when(g, c)  # noqa: B023, E731
        aggs.extend(
            [
                F.count(F.when(g, F.lit(1))).alias(f"n_{i}"),
                F.sum(gated(F.col("__x1"))).alias(f"sx1_{i}"),
                F.sum(gated(F.col("__x2"))).alias(f"sx2_{i}"),
                F.sum(
                    gated((F.col("__x1") * F.col("__x1")).cast("decimal(38,0)"))
                ).alias(f"sx11_{i}"),
                F.sum(
                    gated((F.col("__x1") * F.col("__x2")).cast("decimal(38,0)"))
                ).alias(f"sx12_{i}"),
                F.sum(
                    gated((F.col("__x2") * F.col("__x2")).cast("decimal(38,0)"))
                ).alias(f"sx22_{i}"),
                F.sum(gated(F.col("__y"))).alias(f"sy_{i}"),
                # int-ok: __y is decimal(18,s) — decimal products
                F.sum(gated(F.col("__x1") * F.col("__y"))).alias(f"sx1y_{i}"),
                # int-ok: decimal product (see above)
                F.sum(gated(F.col("__x2") * F.col("__y"))).alias(f"sx2y_{i}"),
                # int-ok: decimal product (see above)
                F.sum(gated(F.col("__y") * F.col("__y"))).alias(f"syy_{i}"),
            ]
        )
    row = base.agg(*aggs)
    stack_args = []
    for i, f in enumerate(fractions):
        stack_args.append(f"CAST({float(f)!r} AS DOUBLE)")
        stack_args.extend(
            f"{c}_{i}"
            for c in (
                "n", "sx1", "sx2", "sx11", "sx12", "sx22",
                "sy", "sx1y", "sx2y", "syy",
            )
        )
    stacked = row.selectExpr(
        f"stack({len(fractions)}, {', '.join(stack_args)}) AS "
        "(fraction, n, sx1, sx2, sx11, sx12, sx22, sy, sx1y, sx2y, syy)"
    )
    return ridge_from_moments(stacked, lam, keep_cols=("fraction",))


def ridge_conformal(
    df: DataFrame,
    x1_col: str,
    x2_col: str,
    y_col: str,
    id_col: str,
    lam: float = 1.0,
    alpha: float = 0.1,
    seed: str = "conf",
) -> DataFrame:
    """Split-conformal prediction intervals around the exact ridge model:
    deterministic md5 three-way split (50% train / 25% calibration / 25%
    test), fit on train, take the conformal quantile q of absolute
    calibration residuals at rank ceil((n_cal+1)*(1-alpha)), and report
    the TEST coverage of +-q intervals — distribution-free, model-
    agnostic uncertainty with a finite-sample >= 1-alpha guarantee (the
    modern answer to "how wrong can this prediction be").

    Determinism: the split is md5-hashed on the id; predictions use the
    ROUNDED fitted betas (the model row the oracle already hash-checks),
    so residuals are identical doubles cross-engine; q is an exact order
    statistic of the sorted residual list. One row out: split sizes,
    betas, q, coverage.

    Scale: train moments are the one-scan ridge aggregate; the
    calibration residual list is collected sorted (25% of rows — at the
    100 TB shape swap the exact order statistic for the mergeable
    histogram sketch's quantile, trading exactness for a bounded state;
    the conformal guarantee tolerates a conservative q).
    """
    model, cal, test, _resid = _conformal_parts(
        df, x1_col, x2_col, y_col, id_col, lam, seed
    )
    # Betas come from the (single-row, broadcast) model frame, NOT from
    # max() over the residual join: with an EMPTY calibration split the
    # join has zero rows and maxes would be NULL even though the model
    # exists. The quantile guards n_cal = 0 explicitly — element_at with
    # index 0 RAISES in Spark (arrays are 1-based), so the empty split
    # must short-circuit to a NULL q (intervals undefined, coverage NULL)
    # rather than fail at runtime.
    qrow = (
        _resid(cal)
        .agg(
            F.count(F.lit(1)).alias("n_cal"),
            F.array_sort(F.collect_list("__r")).alias("__rs"),
        )
        .crossJoin(F.broadcast(model))
        .select(
            "n_train",
            "n_cal",
            "b0",
            "b1",
            "b2",
            F.expr(
                "CASE WHEN n_cal = 0 THEN CAST(NULL AS DOUBLE) ELSE"
                f" element_at(__rs, CAST(least(ceil((n_cal + 1) *"
                f" {1 - alpha!r}), n_cal) AS INT)) END"
            ).alias("__q"),
        )
    )
    return _conformal_report(qrow, _resid(test))


def _conformal_parts(
    df: DataFrame,
    x1_col: str,
    x2_col: str,
    y_col: str,
    id_col: str,
    lam: float,
    seed: str,
):
    """Shared split/fit/residual stage of the conformal variants: the md5
    three-way split (50/25/25), the ridge fit on train, and a residual
    projector using the ROUNDED betas (cross-engine-identical doubles).
    Returns (model, cal, test, resid_fn)."""
    from feature_store_fraud_detection_spark.operators.encoders import (
        md5_int,
    )

    base = df.filter(
        F.col(y_col).isNotNull()
        & F.col(x1_col).isNotNull()
        & F.col(x2_col).isNotNull()
    )
    u = md5_int(
        F.concat(F.lit(seed + "|"), F.col(id_col).cast("string"))
    ).cast("double") / F.lit(float(2**60))
    tagged = base.withColumn("__u", u)
    train = tagged.filter(F.col("__u") < 0.5)
    cal = tagged.filter((F.col("__u") >= 0.5) & (F.col("__u") < 0.75))
    test = tagged.filter(F.col("__u") >= 0.75)

    model = ridge_normal_equations(
        train, x1_col, x2_col, y_col, lam=lam
    ).select(
        F.col("n").alias("n_train"), "b0", "b1", "b2"
    )

    def _resid(part: DataFrame) -> DataFrame:
        j = part.crossJoin(F.broadcast(model))
        pred = (
            F.col("b0")
            + F.col("b1") * F.col(x1_col).cast("bigint").cast("double")
            + F.col("b2") * F.col(x2_col).cast("bigint").cast("double")
        )
        return j.withColumn("__r", F.abs(F.col(y_col) - pred))

    return model, cal, test, _resid


def _conformal_report(
    qrow: DataFrame, test_resid: DataFrame, extra_cols: tuple = ()
) -> DataFrame:
    """Shared coverage stage: test-split coverage of the +-q interval and
    the one-row report.

    ``covered_count`` is the EXACT integer numerator of the coverage
    ratio (count of test residuals <= q). It exists so oracle-facing
    consumers can hash-check the coverage decision without touching a
    float-repr surface: an ``avg`` over 0/1 doubles is value-identical
    cross-engine, but a different DuckDB build's incremental-mean AVG can
    land 1 ulp away and flip a floor(x*1e4+0.5) boundary — the suspected
    mechanism behind the round-6 driver-gate divergence on
    ``ridge_conformal_sketch`` (CORRECTNESS_r06: hash_match false,
    unreproducible on the local replica). The float ``coverage`` column
    stays for human use and is derived by ONE division from the exact
    pair.

    ``extra_cols`` lets a variant thread additional qrow columns (e.g.
    the sketch's exact ``q_bin``) into the report.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    cov = (
        test_resid
        .crossJoin(F.broadcast(qrow.select("__q")))
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum((F.col("__r") <= F.col("__q")).cast("bigint")).alias(
                "covered_count"
            ),
        )
    )
    return qrow.crossJoin(F.broadcast(cov)).select(
        "n_train",
        "n_cal",
        "n_test",
        "b0",
        "b1",
        "b2",
        *extra_cols,
        F.col("covered_count"),
        round4_stable(F.col("__q")).alias("q"),
        round4_stable(
            F.col("covered_count").cast("double") / F.col("n_test")
        ).alias("coverage"),
    )


def ridge_conformal_sketch(
    df: DataFrame,
    x1_col: str,
    x2_col: str,
    y_col: str,
    id_col: str,
    lam: float = 1.0,
    alpha: float = 0.1,
    seed: str = "conf",
    hi: float = 100.0,
    bins: int = 256,
) -> DataFrame:
    """:func:`ridge_conformal` with the calibration quantile taken from a
    BOUNDED equi-width histogram sketch instead of the exact sorted
    residual list — the 100 TB shape the exact path's docstring promises:
    calibration state is ``bins`` counters (mergeable, additive), never
    a row-sized collect, no matter how many calibration rows exist.

    Conservative by construction, so the finite-sample >= 1-alpha
    guarantee SURVIVES the sketch: q is the UPPER EDGE of the bin owning
    the conformal rank ceil((n_cal+1)*(1-alpha)) — at least the exact
    order statistic, at most one bin width above it; if the rank lands in
    the overflow (last) bin, q falls back to the exact max residual
    (tracked alongside the counters), which upper-bounds everything the
    bin absorbed even when residuals exceed ``hi``. Sketch-vs-exact error
    is therefore in [0, (hi - 0)/bins] whenever the rank stays below the
    overflow bin (pinned in tests at sf0.01 data shapes). Residuals are
    nonnegative, so the grid is [0, hi).

    Output carries BOTH the human-facing doubles (``q``, ``coverage``)
    and an exact-integer surface (``q_bin``: the 1-based bin whose upper
    edge is q, ``bins`` meaning the overflow/max-residual fallback;
    ``covered_count``: the integer coverage numerator). Oracle-checked
    consumers should compare the integer surface — see the round-6
    divergence note in :func:`_conformal_report`.
    """
    model, cal, test, _resid = _conformal_parts(
        df, x1_col, x2_col, y_col, id_col, lam, seed
    )
    w = float(hi) / bins
    bin_idx = F.least(
        F.lit(bins - 1), F.floor(F.col("__r") / F.lit(w))
    ).cast("int")
    per_bin = (
        _resid(cal)
        .groupBy(bin_idx.alias("__bin"))
        .agg(F.count(F.lit(1)).alias("__c"), F.max("__r").alias("__mx"))
    )
    qrow = (
        per_bin.agg(
            F.sum("__c").alias("n_cal"),
            F.max("__mx").alias("__max_r"),
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("__bin", "__c")))
            ).alias("__bm"),
        )
        .select(
            F.coalesce(F.col("n_cal"), F.lit(0)).alias("n_cal"),
            "__max_r",
            F.transform(
                F.sequence(F.lit(0), F.lit(bins - 1)),
                lambda b: F.coalesce(
                    F.element_at("__bm", b), F.lit(0).cast("bigint")
                ),
            ).alias("__counts"),
        )
        .crossJoin(F.broadcast(model))
        .select(
            "n_train",
            "n_cal",
            "b0",
            "b1",
            "b2",
            F.expr(
                f"""CASE WHEN n_cal = 0 THEN
  named_struct('qb', CAST(NULL AS INT), 'q', CAST(NULL AS DOUBLE)) ELSE
  aggregate(
    sequence(1, {bins}),
    named_struct('cum', cast(0 as bigint), 'qb', cast(NULL as int),
                 'q', cast(NULL as double)),
    (acc, b) -> named_struct(
      'cum', acc.cum + element_at(__counts, b),
      'qb', CASE
              WHEN acc.qb IS NOT NULL THEN acc.qb
              WHEN acc.cum + element_at(__counts, b)
                   >= least(ceil((n_cal + 1) * {1 - alpha!r}), n_cal)
              THEN CAST(b AS INT)
              ELSE CAST(NULL AS INT) END,
      'q', CASE
             WHEN acc.q IS NOT NULL THEN acc.q
             WHEN acc.cum + element_at(__counts, b)
                  >= least(ceil((n_cal + 1) * {1 - alpha!r}), n_cal)
             THEN IF(b = {bins}, __max_r, b * {w!r})
             ELSE CAST(NULL AS DOUBLE) END),
    acc -> named_struct('qb', acc.qb, 'q', acc.q)) END"""
            ).alias("__s"),
        )
        .select(
            "n_train",
            "n_cal",
            "b0",
            "b1",
            "b2",
            F.col("__s.qb").alias("q_bin"),
            F.col("__s.q").alias("__q"),
        )
    )
    return _conformal_report(
        qrow, _resid(test), extra_cols=(F.col("q_bin"),)
    )
