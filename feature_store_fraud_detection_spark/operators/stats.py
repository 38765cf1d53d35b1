"""Column statistics and encoding operators (reference P11-P13, A1-A4, M6)."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.functions.numeric import overflow_checked

#: below this many rows in a bounded per-value collapse table, the rank
#: machinery's ordered prefix sum runs as ONE un-sharded window (a single
#: sort of an already-aggregated table) instead of the quantile-sharded
#: cuts/offsets pipeline — the sharded form costs ~10 extra tiny stages
#: per margin, pure orchestration overhead below this size. 1M rows is a
#: sub-second single-task sort; above it, sharding wins on any engine.
#: Ranks are cut-invariant, so both regimes produce identical results.
RANK_SINGLE_SORT_LIMIT = 1_000_000


def dict_encode(df: DataFrame, col: str, out_col: str | None = None) -> DataFrame:
    """Dictionary-encode a key column to dense 0..n-1 ids (reference P11,
    ``load_data.py:20`` ``pd.factorize`` — there, ids ordered by first
    appearance in a pre-sorted file, i.e. by key order).

    Scale design: a global ``dense_rank`` window would funnel ALL rows through
    one partition. Instead: rank only the distinct keys (tiny), then broadcast
    hash join the mapping back — no global sort of the fact table, no skew.
    """
    out_col = out_col or f"{col}_idx"
    mapping = (
        df.select(col)
        .distinct()
        .withColumn(
            out_col,
            (F.dense_rank().over(Window.orderBy(col)) - 1).cast("int"),
        )
    )
    return df.join(F.broadcast(mapping), col, "inner")


def summary_stats(df: DataFrame, col: str) -> DataFrame:
    """count/mean/std/min/max of one numeric column (reference P13/A4,
    ``load_data.py:18`` ``describe()``). One partial-aggregate pass.

    Determinism: ``avg``/``stddev`` over raw doubles is partial-aggregate
    order-dependent, so the 4th decimal can flip between engines near a
    rounding boundary. Instead sum the RAW column (and its square) through
    exact DECIMAL arithmetic — order-independent on any engine — then do
    ONE double division/cancellation at the end and round. The sums are
    decimal(38,6)/decimal(38,12): exact up to ~1e32, far past 100 TB row
    counts. Mirrors the money-math rule in ``plans/registry`` docs.
    """
    # fail-loud precondition: decimal(18,6) holds |x| < 1e12; out-of-range
    # values abort instead of silently NULLing out of the sums.
    dec = overflow_checked(F.col(col), 1e12, f"summary_stats: {col}").cast(
        "decimal(18,6)"
    )
    cnt = F.count(F.lit(1))
    s = F.sum(dec)
    sq = F.sum((dec * dec).cast("decimal(38,12)"))
    # degenerate guards (round-10 degenerate-probe finding): an empty
    # frame has no mean and a single row has no sample variance — NULL,
    # matching describe() semantics, never an ANSI divide-by-zero
    mean_d = F.when(cnt > 0, s.cast("double") / cnt)
    var = F.when(
        cnt >= 2,
        (sq.cast("double") - s.cast("double") * s.cast("double") / cnt)
        / (cnt - 1),
    )
    return df.agg(
        cnt.alias("cnt"),
        F.round(mean_d, 4).alias(f"avg_{col}"),
        F.round(F.sqrt(var), 4).alias(f"std_{col}"),
        F.round(F.min(col), 4).alias(f"min_{col}"),
        F.round(F.max(col), 4).alias(f"max_{col}"),
    )


def table_profile(df: DataFrame, columns: list[str]) -> DataFrame:
    """Whole-table data-quality profile in ONE aggregate pass: per column,
    non-null count, null count, distinct count. The quality gate a training
    pipeline runs before ingesting a new drop. Returns one row per column
    (unpivoted from the single-pass wide aggregate — no per-column jobs)."""
    aggs = []
    for c in columns:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}"),
            F.countDistinct(F.col(c)).alias(f"__dist_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __null_{c}, __dist_{c}" for c in columns
    )
    return wide.selectExpr(
        f"stack({len(columns)}, {stack_args}) AS "
        "(column_name, n_non_null, n_null, n_distinct)"
    )


def monotonic_check(df: DataFrame, key: str, order: str) -> DataFrame:
    """Diagnostic: is ``order`` non-decreasing within each key (reference P12,
    ``load_data.py:13`` sortedness assert)? Returns one row per key with a
    boolean — a window lag + min, not a driver-side loop."""
    w = Window.partitionBy(key).orderBy(order)
    lagged = df.withColumn("__prev", F.lag(order).over(w))
    return lagged.groupBy(key).agg(
        F.min(
            F.when(F.col("__prev").isNull(), F.lit(True)).otherwise(
                F.col(order) >= F.col("__prev")
            )
        ).alias("is_sorted")
    )


def drift_psi(
    base: DataFrame, curr: DataFrame, col: str, n_bins: int = 10
) -> DataFrame:
    """Population-stability-index drift report between a baseline and a
    current window of one numeric feature — the train/serving drift check
    an ML-ops pipeline runs before trusting a model on fresh traffic.

    Bins are the baseline's ``n_bins``-quantile cut points (exact
    interpolated ``percentile``, one scalar aggregate broadcast to both
    sides — the same no-global-window pattern as the decile query); each
    side reduces to per-bin counts, and the PSI term uses Laplace-smoothed
    shares ``(n + 0.5) / (total + n_bins/2)`` so empty bins stay finite and
    both engines compute identical doubles. Output: one row per occupied
    bin (bin, n_base, n_curr, psi_term); the scalar PSI is the sum of
    terms (left to the caller — a 10-row sum has no stable engine-neutral
    order to hash).

    Scale: two scans + two tiny per-bin aggregates; nothing wider than
    ``n_bins`` rows ever joins or broadcasts except the one cut-point row.

    NULL feature values are excluded up front (see ``drift_ks``: they would
    otherwise count as bin 0 and inflate the lowest decile).
    """
    from feature_store_fraud_detection_spark.functions.numeric import round4_stable

    base = base.filter(F.col(col).isNotNull())
    curr = curr.filter(F.col(col).isNotNull())
    qs = ", ".join(str(i / n_bins) for i in range(1, n_bins))
    cuts = base.agg(
        F.expr(f"percentile({col}, array({qs}))").alias("__cuts")
    )

    def binned(df: DataFrame, name: str) -> DataFrame:
        return (
            df.crossJoin(F.broadcast(cuts))
            .select(
                F.size(F.filter("__cuts", lambda q: F.col(col) > q)).alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(name))
        )

    j = (
        binned(base, "n_base")
        .join(binned(curr, "n_curr"), "bin", "full")
        .fillna(0, ["n_base", "n_curr"])
    )
    totals = j.agg(
        F.sum("n_base").alias("__ta"), F.sum("n_curr").alias("__tb")
    )
    half = F.lit(0.5)
    pad = F.lit(n_bins / 2.0)
    p_base = (F.col("n_base") + half) / (F.col("__ta") + pad)
    p_curr = (F.col("n_curr") + half) / (F.col("__tb") + pad)
    return j.crossJoin(F.broadcast(totals)).select(
        "bin",
        "n_base",
        "n_curr",
        round4_stable((p_curr - p_base) * F.log(p_curr / p_base)).alias("psi_term"),
    )


def robust_outliers(
    df: DataFrame,
    key: str,
    val: str,
    z_threshold: float = 3.5,
) -> DataFrame:
    """Per-key robust outlier flags via median/MAD (Iglewicz-Hoaglin
    modified z-score): z = 0.6745 * |x - median| / MAD, outlier when the
    4-decimal-rounded z exceeds ``z_threshold``.

    Median/MAD instead of mean/stddev because fraud-style value columns are
    heavy-tailed — a single large transaction drags the mean enough to mask
    every other outlier; the breakdown point of the median is 50%.

    Scale shape: two keyed aggregations (median, then MAD over deviations)
    and two keyed joins — every exchange is on the key, no global sort. The
    medians here are EXACT (sort-based within each key group) so the oracle
    can hash them; at 100 TB swap ``percentile`` for ``percentile_approx``
    (t-digest, partial-aggregated, no per-group sort) and tolerance-check.
    MAD = 0 (constant-valued key) yields NULL z and outlier = 0 rather than
    a division blow-up.
    """
    from feature_store_fraud_detection_spark.functions.numeric import round4_stable

    med = df.groupBy(key).agg(
        F.percentile(F.col(val), F.lit(0.5)).alias("med")
    )
    with_med = df.join(med, key)
    mad = (
        with_med.withColumn("__absdev", F.abs(F.col(val) - F.col("med")))
        .groupBy(key)
        .agg(
            F.min("med").alias("med"),
            F.percentile(F.col("__absdev"), F.lit(0.5)).alias("mad"),
        )
    )
    z = round4_stable(
        F.lit(0.6745)
        * F.abs(F.col(val) - F.col("med"))
        / F.nullif(F.col("mad"), F.lit(0.0))
    )
    return (
        df.join(mad, key)
        .withColumn("robust_z", z)
        .withColumn(
            "is_outlier",
            F.coalesce(
                (F.col("robust_z") > z_threshold).cast("int"), F.lit(0)
            ),
        )
        .withColumn("med", round4_stable(F.col("med")))
        .withColumn("mad", round4_stable(F.col("mad")))
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    p_low: float = 0.01,
    p_high: float = 0.99,
    id_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Percentile clipping (winsorization): cap ``value_col`` at its exact
    [p_low, p_high] quantiles — the standard robust-feature step before
    scaling/training (outlier transactions would otherwise dominate a
    standard scaler's variance).

    The two cut points come from one exact ``percentile`` aggregate
    (linear interpolation — DuckDB ``quantile_cont`` twin, parity proven by
    the percentiles query) broadcast back over the rows as a 1-row cross
    join. Exact percentile buffers values per group; at 100 TB swap in
    ``approx_percentile`` with a tolerance-checked gate — the operator
    contract (clip at quantile cut points) is unchanged.
    """
    from feature_store_fraud_detection_spark.functions.numeric import round4_stable

    cuts = df.agg(
        F.percentile(value_col, F.lit(p_low)).alias("__lo"),
        F.percentile(value_col, F.lit(p_high)).alias("__hi"),
    )
    keep = [F.col(c) for c in id_cols] or [F.col(c) for c in df.columns]
    return (
        df.crossJoin(F.broadcast(cuts))
        .select(
            *keep,
            F.col(value_col).alias("raw_value"),
            round4_stable(
                F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi"))
            ).alias("clipped_value"),
            (
                (F.col(value_col) < F.col("__lo"))
                | (F.col(value_col) > F.col("__hi"))
            ).cast("int").alias("was_clipped"),
        )
    )


def leakage_scan(
    df: DataFrame, feature_cols: list[str], label_col: str
) -> DataFrame:
    """Target-leakage / feature-screen report: the point-biserial
    correlation of every numeric feature against a binary label, in ONE
    aggregation pass (N features cost N*4 conditional sums, never N scans).
    |corr| near 1 means the feature leaks the label (or IS the label
    through a proxy) and must not ship to training.

    corr_pb = (m1 - m0) * sqrt(p * (1 - p)) / std, with m1/m0 the label-
    conditional means, p the positive rate, std the population std.

    Determinism: every sum runs in exact DECIMAL from the raw columns; the
    five sums convert to double ONCE at the end (the repo's money-math
    rule), so partial-aggregation order cannot move the result.
    """
    from feature_store_fraud_detection_spark.functions.numeric import round4_stable

    is_pos = F.col(label_col) == 1
    aggs = [F.count(F.lit(1)).alias("__n"), F.sum(is_pos.cast("long")).alias("__n1")]
    for c in feature_cols:
        # fail-loud precondition (see summary_stats): |x| >= 1e12 would
        # silently NULL out of decimal(18,6) and skew corr_pb undetected.
        d = overflow_checked(F.col(c), 1e12, f"leakage_scan: {c}").cast(
            "decimal(18,6)"
        )
        d2 = (d * d).cast("decimal(38,12)")
        aggs += [
            F.sum(d).alias(f"__s_{c}"),
            F.sum(d2).alias(f"__s2_{c}"),
            F.sum(F.when(is_pos, d)).alias(f"__s1_{c}"),
        ]
    row = df.agg(*aggs)
    n = F.col("__n").cast("double")
    n1 = F.col("__n1").cast("double")
    p = n1 / n
    reports = []
    for c in feature_cols:
        s = F.col(f"__s_{c}").cast("double")
        s2 = F.col(f"__s2_{c}").cast("double")
        s1 = F.col(f"__s1_{c}").cast("double")
        m = s / n
        m1 = s1 / n1
        m0 = (s - s1) / (n - n1)
        var = s2 / n - m * m
        # single-class label or zero-variance feature: the point-biserial
        # correlation is undefined — NULL, never an ANSI divide-by-zero
        # (round-10 degenerate-probe finding)
        corr = F.when(
            (n1 > 0) & (n1 < n) & (var > 0),
            (m1 - m0) * F.sqrt(p * (1 - p)) / F.sqrt(var),
        )
        reports.append(
            F.struct(
                F.lit(c).alias("feature"),
                round4_stable(corr).alias("corr_pb"),
                round4_stable(F.abs(corr)).alias("abs_corr"),
            )
        )
    return (
        row.select(F.explode(F.array(*reports)).alias("r"))
        .select("r.feature", "r.corr_pb", "r.abs_corr")
    )


def drift_ks(
    base: DataFrame, curr: DataFrame, col: str, n_bins: int = 10
) -> DataFrame:
    """Kolmogorov-Smirnov-style drift report: per baseline-quantile bin,
    the gap between the two samples' cumulative shares — the scalar KS
    statistic is the max of ``cdf_gap`` (left to the caller, like
    ``drift_psi``'s sum). Complements PSI: KS localizes WHERE in the
    distribution the shift happened; PSI weights by magnitude.

    Same scale shape as drift_psi: two scans reduce to n_bins counts; the
    cumulative window runs over the bounded bin table, never raw rows.

    NULL feature values are excluded up front: an unfiltered NULL yields an
    empty filtered-cuts array and would land in bin 0 while still counting
    toward the totals, inflating the lowest decile on both sides.
    """
    from feature_store_fraud_detection_spark.functions.numeric import round4_stable

    base = base.filter(F.col(col).isNotNull())
    curr = curr.filter(F.col(col).isNotNull())
    qs = ", ".join(str(i / n_bins) for i in range(1, n_bins))
    cuts = base.agg(
        F.expr(f"percentile({col}, array({qs}))").alias("__cuts")
    )

    def binned(df: DataFrame, name: str) -> DataFrame:
        return (
            df.crossJoin(F.broadcast(cuts))
            .select(
                F.size(F.filter("__cuts", lambda q: F.col(col) > q)).alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(name))
        )

    j = (
        binned(base, "n_base")
        .join(binned(curr, "n_curr"), "bin", "full")
        .fillna(0, ["n_base", "n_curr"])
    )
    totals = j.agg(F.sum("n_base").alias("__ta"), F.sum("n_curr").alias("__tb"))
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    return (
        j.crossJoin(F.broadcast(totals))
        .select(
            "bin",
            "n_base",
            "n_curr",
            # an empty side has no CDF to compare — NULL gap, never an
            # ANSI divide-by-zero (round-10 degenerate-probe finding)
            round4_stable(
                F.when(
                    (F.col("__ta") > 0) & (F.col("__tb") > 0),
                    F.abs(
                        F.sum("n_base").over(w)
                        / F.col("__ta").cast("double")
                        - F.sum("n_curr").over(w)
                        / F.col("__tb").cast("double")
                    ),
                )
            ).alias("cdf_gap"),
        )
    )


#: Benford's-law expected first-digit shares log10(1 + 1/d), embedded as
#: Python-computed literals in BOTH engines (libm log10 is not correctly
#: rounded, so computing them engine-side risks last-ulp divergence).
BENFORD_EXPECTED = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def benford_profile(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law, per group —
    the forensic-accounting fraud screen (fabricated amounts over-sample
    mid digits; organic money follows log10(1+1/d)).

    The digit is extracted from the DECIMAL(18,2) string rendering (both
    engines print decimals identically), NOT via floor(log10(v)) — libm
    log10 can land 1 ulp under an integer boundary and flip the floor.
    Rows whose amount has no nonzero digit (zero) are excluded.

    Output per (group, digit): count, observed share, expected share, and
    the chi-square contribution (n_d - N*p_d)^2 / (N*p_d) — the scalar
    statistic is the per-group sum, left to the caller (same convention as
    drift_psi). Scale: one scan, one (group x 9)-key aggregation; the
    group-total join is against a tiny aggregate.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    # nullif('') before the cast: a zero amount extracts no digit and the
    # empty string would fail an ANSI cast (mirrors the oracle's NULLIF)
    digit = F.nullif(
        F.regexp_extract(
            F.col(value_col).cast("decimal(18,2)").cast("string"), "[1-9]", 0
        ),
        F.lit(""),
    )
    counts = (
        df.select(F.col(group_col), digit.cast("int").alias("digit"))
        .filter(F.col("digit").isNotNull())
        .groupBy(group_col, "digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = counts.groupBy(group_col).agg(F.sum("n").alias("__total"))
    expected = F.element_at(
        F.array(*[F.lit(BENFORD_EXPECTED[d]) for d in range(1, 10)]),
        F.col("digit"),
    )
    e_n = F.col("__total") * expected
    return counts.join(F.broadcast(totals), group_col).select(
        group_col,
        "digit",
        "n",
        round4_stable(F.col("n") / F.col("__total").cast("double")).alias(
            "observed"
        ),
        round4_stable(expected).alias("expected"),
        round4_stable(
            (F.col("n") - e_n) * (F.col("n") - e_n) / e_n
        ).alias("chi2_term"),
    )


def mutual_information_binned(
    df: DataFrame,
    value_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Binned mutual information between a numeric feature and a binary
    label — the feature-relevance screen complementing ``leakage_scan``'s
    linear correlation (MI catches non-monotone dependence corr misses).

    The feature bins by its own quantile cut points (one scalar aggregate,
    broadcast — the drift_psi pattern); the joint table reduces to at most
    ``n_bins x 2`` rows, and every probability ratio is computed over that
    bounded frame. Output per (bin, label): n and the MI term
    p_xy * log(p_xy / (p_x * p_y)); the scalar MI is the sum (caller's,
    like psi). NULL feature values are excluded up front (bin-0 inflation,
    see drift_ks).
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    df = df.filter(F.col(value_col).isNotNull())
    qs = ", ".join(str(i / n_bins) for i in range(1, n_bins))
    cuts = df.agg(
        F.expr(f"percentile({value_col}, array({qs}))").alias("__cuts")
    )
    joint = (
        df.crossJoin(F.broadcast(cuts))
        .select(
            F.size(
                F.filter("__cuts", lambda q: F.col(value_col) > q)
            ).alias("bin"),
            F.col(label_col).cast("int").alias("label"),
        )
        .groupBy("bin", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wx = Window.partitionBy("bin")
    wy = Window.partitionBy("label")
    wt = Window.partitionBy()
    n = F.col("n").cast("double")
    nx = F.sum("n").over(wx).cast("double")
    ny = F.sum("n").over(wy).cast("double")
    nt = F.sum("n").over(wt).cast("double")
    p_xy, p_x, p_y = n / nt, nx / nt, ny / nt
    return joint.select(
        "bin",
        "label",
        "n",
        round4_stable(p_xy * F.log(p_xy / (p_x * p_y))).alias("mi_term"),
    )


def woe_iv_binned(
    df: DataFrame,
    value_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Weight-of-evidence / information-value binning of a numeric feature
    against a binary label — the credit-risk/fraud-scorecard standard
    feature screen (reference analogue: the feature-relevance role of
    ``back_end/model/training.py``'s feature selection, made exact and
    cross-engine hash-checkable).

    The feature bins by its own quantile cut points (same mechanism as
    :func:`mutual_information_binned`); per bin the positive/negative
    shares use Laplace smoothing ``(n + 0.5) / (total + n_bins/2)`` (the
    :func:`categorical_drift_psi` convention) so empty cells stay finite.
    Output per bin: n_pos, n_neg, woe = ln(share_pos / share_neg) and
    iv_term = (share_pos - share_neg) * woe; the scalar IV is the sum
    (caller's, like psi). NULL feature values are excluded up front.

    Scale: one scan to the cut-point aggregate (broadcast scalar), one
    scan to a <= n_bins x 2 aggregate — no window over data rows, no
    shuffle beyond the bounded group-by.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    df = df.filter(F.col(value_col).isNotNull())
    qs = ", ".join(str(i / n_bins) for i in range(1, n_bins))
    cuts = df.agg(
        F.expr(f"percentile({value_col}, array({qs}))").alias("__cuts")
    )
    binned = (
        df.crossJoin(F.broadcast(cuts))
        .select(
            F.size(
                F.filter("__cuts", lambda q: F.col(value_col) > q)
            ).alias("bin"),
            F.col(label_col).cast("int").alias("__y"),
        )
        .groupBy("bin")
        .agg(
            F.sum("__y").alias("n_pos"),
            F.sum(F.lit(1) - F.col("__y")).alias("n_neg"),
        )
    )
    tot = binned.agg(
        F.sum("n_pos").alias("__tp"),
        F.sum("n_neg").alias("__tn"),
        F.count(F.lit(1)).alias("__k"),
    )
    j = binned.crossJoin(F.broadcast(tot))
    sp = (F.col("n_pos") + F.lit(0.5)) / (
        F.col("__tp") + F.col("__k") / F.lit(2.0)
    )
    sn = (F.col("n_neg") + F.lit(0.5)) / (
        F.col("__tn") + F.col("__k") / F.lit(2.0)
    )
    return j.select(
        "bin",
        "n_pos",
        "n_neg",
        round4_stable(F.log(sp / sn)).alias("woe"),
        round4_stable((sp - sn) * F.log(sp / sn)).alias("iv_term"),
    )


def chi2_independence(
    df: DataFrame, cat_col: str, label_col: str
) -> DataFrame:
    """Pearson chi-square test of independence between a categorical
    column and a binary label — the classical screen for "does this
    category carry signal about the outcome" (complements
    :func:`mutual_information_binned`, which covers numeric features).

    Output per (category, label) cell: observed n, expected
    row_total * col_total / grand_total, and the chi-square contribution
    (n - e)^2 / e; the scalar statistic is the sum over cells with
    k-1 degrees of freedom (caller's, same convention as psi/benford).
    NULL categories are excluded.

    Scale: one keyed count to a (categories x 2)-row frame; the
    row/column/grand totals are windows over that bounded aggregate, so
    nothing beyond the first group-by touches data rows.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    cells = (
        df.filter(F.col(cat_col).isNotNull())
        .select(F.col(cat_col), F.col(label_col).cast("int").alias("label"))
        .groupBy(cat_col, "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wr = Window.partitionBy(cat_col)
    wc = Window.partitionBy("label")
    wt = Window.partitionBy()
    e = (
        F.sum("n").over(wr).cast("double")
        * F.sum("n").over(wc).cast("double")
        / F.sum("n").over(wt).cast("double")
    )
    return cells.select(
        cat_col,
        "label",
        "n",
        round4_stable(e).alias("expected"),
        round4_stable((F.col("n") - e) * (F.col("n") - e) / e).alias(
            "chi2_term"
        ),
    )


def categorical_drift_psi(
    base: DataFrame, curr: DataFrame, cat_col: str
) -> DataFrame:
    """PSI drift over a CATEGORICAL column — the sibling of
    :func:`drift_psi` for category mixes (event types, languages,
    sources): has the traffic composition shifted between a baseline and
    a current window? One row per category seen on either side
    (category, n_base, n_curr, psi_term); the scalar PSI is the caller's
    sum, as with the numeric form.

    Shares use the same Laplace smoothing ``(n + 0.5) / (total + k/2)``
    (k = union category count) so one-sided categories stay finite and
    both engines compute identical doubles.

    Scale: two keyed counts + a full outer join over the (tiny) category
    sets; no percentiles, no windows, no data-row joins.
    """
    a = (
        base.filter(F.col(cat_col).isNotNull())
        .groupBy(cat_col)
        .agg(F.count(F.lit(1)).alias("n_base"))
    )
    b = (
        curr.filter(F.col(cat_col).isNotNull())
        .groupBy(cat_col)
        .agg(F.count(F.lit(1)).alias("n_curr"))
    )
    return categorical_psi_from_counts(a, b, cat_col)


def categorical_psi_from_counts(
    a: DataFrame, b: DataFrame, cat_col: str
) -> DataFrame:
    """PSI terms from pre-aggregated category counts — the mergeable core
    of :func:`categorical_drift_psi`. ``a`` carries (cat_col, n_base),
    ``b`` carries (cat_col, n_curr). Because counts are additive, a
    streaming monitor can fold per-batch counts into a state table and
    call this against a fixed baseline at any time — same numbers as
    recomputing over all rows ever seen (pinned in test_streaming)."""
    from feature_store_fraud_detection_spark.functions.numeric import round4_stable

    cats = a.join(b, cat_col, "full_outer").select(
        cat_col,
        F.coalesce("n_base", F.lit(0)).alias("n_base"),
        F.coalesce("n_curr", F.lit(0)).alias("n_curr"),
    )
    tot = cats.agg(
        F.sum("n_base").alias("__tb"),
        F.sum("n_curr").alias("__tc"),
        F.count(F.lit(1)).alias("__k"),
    )
    j = cats.crossJoin(F.broadcast(tot))
    sa = (F.col("n_base") + F.lit(0.5)) / (
        F.col("__tb") + F.col("__k") / F.lit(2.0)
    )
    sb = (F.col("n_curr") + F.lit(0.5)) / (
        F.col("__tc") + F.col("__k") / F.lit(2.0)
    )
    return j.select(
        cat_col,
        "n_base",
        "n_curr",
        round4_stable((sa - sb) * F.log(sa / sb)).alias("psi_term"),
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    val_col: str,
    tiebreak_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Quantile normalization of a numeric column across groups — the
    batch-effect remover for corpus mixing: each group's distribution is
    remapped onto the CROSS-GROUP average distribution, so downstream
    length/quality filters treat every source on the same scale
    (microarray-style QN, bucketed for unequal group sizes).

    Per (group, ntile bucket over (val, tiebreak) total order): the raw
    bucket mean; per bucket: the normalization TARGET = mean of the
    per-group bucket means (each group votes once, so a huge source
    can't drag the reference distribution). Returns
    (group, bucket, n_rows, mean_raw, target) — the remap table a
    row-level join applies.

    Determinism: integer/DECIMAL-exact sums quotient-rounded per the
    repo rule; the cross-group mean folds the SORTED per-group means.
    ntile over an explicit (val, tiebreak) total order assigns
    identically in Spark and DuckDB (both give the first ``n % buckets``
    buckets the extra row).

    Scale: one window sort per group (the group is the partition key —
    no global sort), one keyed aggregate, one ``n_buckets``-sized
    broadcast back. Skewed group sizes only skew the sort, not the
    remap table.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    w = Window.partitionBy(group_col).orderBy(val_col, tiebreak_col)
    b = df.withColumn("__b", F.ntile(n_buckets).over(w))
    per = b.groupBy(group_col, "__b").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(val_col).cast("decimal(18,4)")).alias("__s"),
    ).select(
        group_col,
        F.col("__b").alias("bucket"),
        "n_rows",
        round4_stable(
            F.col("__s").cast("double") / F.col("n_rows").cast("double")
        ).alias("mean_raw"),
    )
    target = per.groupBy("bucket").agg(
        round4_stable(
            F.aggregate(
                F.array_sort(F.collect_list("mean_raw")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.count(F.lit(1)).cast("double")
        ).alias("target")
    )
    return per.join(F.broadcast(target), "bucket").select(
        group_col, "bucket", "n_rows", "mean_raw", "target"
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    treatment_value,
    n_buckets: int = 32,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test between two groups — the
    rank-based robust A/B companion to :func:`chi2_independence`
    (categorical outcomes) and the t-style mean tests: it compares whole
    DISTRIBUTIONS without assuming normality, so one whale transaction
    cannot swing the verdict the way it swings a mean test.

    Exact-integer core (the hashable surface): with ties sharing their
    average rank, twice the average rank of a value v is the INTEGER
    ``2*(#below v) + (#equal v) + 1``, so ``2*R_treatment`` is an exact
    integer; so are the tie-correction term ``sum(t^3 - t)`` and
    ``2*U = 2*R - n_t*(n_t+1)``. Those sums accumulate in DECIMAL(38,0)
    (a non-ANSI BIGINT sum wraps silently past int64) and fail loud —
    via :func:`bigint_checked` — if a total ever leaves the BIGINT
    report range. The normal-approximation z-score and the
    common-language effect size ``U/(n_t*n_c)`` (= P(treatment draw >
    control draw), the AUC analog) are derived once from those integers
    in fixed IEEE op order and rounded to 4 decimals.

    Scale design: ranking needs a prefix sum over the ordered distinct
    values — NOT a global sort of the rows. Rows collapse to one row per
    distinct value (hash aggregate); the prefix sum over that bounded
    table is sharded by quantile cut points exactly as
    ``windows.bucketed_value_ranks`` shards its ranks (per-bucket windows
    + broadcast bucket offsets), so no single task ever sorts more than
    ~|distinct|/n_buckets entries. Tie counts are guarded against the
    double-precision cliff (t^3 must stay exact in the later double
    divide).
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    rows = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(value_col).alias("__v"),
        (F.col(group_col) == F.lit(treatment_value))
        .cast("int")
        .alias("__t"),
    )
    per_v = rows.groupBy("__v").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum("__t").alias("__nt"),
    )
    # r12 note (guide §1 empirical loop): per_v feeds three independent
    # subtrees (cuts broadcast, bucket-offsets broadcast, ranked join) —
    # each re-runs the base scan + collapse. A persist was measured here
    # (min-of-5 A/B at sf0.1): 0.91 s -> 1.04 s, +14% — the duplicated
    # subqueries evaluate CONCURRENTLY on idle cores, while caching
    # serializes them behind the block locks of one materialization.
    # The duplication factor is fixed (3x, not data-dependent), so the
    # parallel-duplicate form is kept; see OPTIMIZATION_r12.md.
    # shard the ordered prefix sum: quantile cuts -> per-bucket windows
    if n_buckets >= 2:
        qs = ", ".join(str(i / n_buckets) for i in range(1, n_buckets))
        cut_expr = F.expr(f"approx_percentile(__v, array({qs}), 1000)")
        # the 1-row cuts frame is persisted (r13): binned appears under
        # BOTH the offsets broadcast subtree and the ranked probe side,
        # and approx_percentile's sketch can merge partials in a
        # different order per evaluation — two evaluations could bin
        # with different cut arrays, desynchronizing offsets from the
        # window partitions. The cache pins ONE cut multiset for every
        # consumer (exact percentile was deterministic, so the r12 swap
        # introduced this; same fix in ks_two_sample / kruskal_wallis /
        # wilcoxon_signed_rank / spearman_rho's rank_table, and
        # bucketed_value_ranks already persisted its cuts).
        cuts = per_v.agg(cut_expr.alias("__cuts")).persist()
        binned = per_v.crossJoin(F.broadcast(cuts)).withColumn(
            "__bin",
            F.size(F.filter("__cuts", lambda q: F.col("__v") > q)),
        ).drop("__cuts")
    else:
        binned = per_v.withColumn("__bin", F.lit(0))
    bucket_tot = binned.groupBy("__bin").agg(F.sum("__cnt").alias("__bc"))
    woff = Window.orderBy("__bin").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_tot.select(
        "__bin", F.coalesce(F.sum("__bc").over(woff), F.lit(0)).alias("__off")
    )
    wv = (
        Window.partitionBy("__bin")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = binned.join(F.broadcast(offsets), "__bin").select(
        "__v",
        "__cnt",
        "__nt",
        (
            F.col("__off") + F.coalesce(F.sum("__cnt").over(wv), F.lit(0))
        ).alias("__below"),
    )
    # guard the tie cube: t^3 must stay exact in BIGINT (2^63) — fail
    # loud past ~2.09M rows sharing one value. The ELSE branch is cast
    # to BIGINT explicitly so the whole CASE (and hence the tie sum)
    # stays integer-typed: letting Spark unify it to double would make
    # the sum order-dependent past 2^53 (overflow_checked's generic
    # form measured exactly that promotion here).
    t_ok = F.when(
        F.col("__cnt") < F.lit(2097000), F.col("__cnt")
    ).otherwise(
        F.raise_error(
            F.format_string(
                "mann_whitney_u tie size: a value shared by %s rows "
                "overflows the exact tie-term path (bound 2097000)",
                F.col("__cnt").cast("string"),
            )
        ).cast("bigint")
    )
    # the SUMS accumulate in DECIMAL(38,0): per-element products are
    # bounded by the guards above, but a BIGINT sum wraps silently in
    # non-ANSI Spark once the TOTAL passes int64 (two ~2M-row tie
    # groups, or r2_t ~ n_t*2n at ~2e9 rows) — the decimal sum stays
    # exact and bigint_checked fail-louds the final narrowing
    agg = ranked.agg(
        F.sum("__cnt").alias("n"),
        F.sum("__nt").alias("n_t"),
        F.sum(
            F.col("__nt").cast("decimal(38,0)")
            * (F.lit(2) * F.col("__below") + F.col("__cnt") + F.lit(1))
        ).alias("r2_t"),
        F.sum(
            t_ok.cast("decimal(38,0)") * t_ok * t_ok - t_ok
        ).alias("tie_term"),
    )
    # degenerate-split guard: z and effect_cl divide by n_t*n_c — a
    # one-group input must abort (fail-loud house rule), not emit NaN
    n_t_ok = F.when(
        (F.col("n_t") > 0) & (F.col("n_t") < F.col("n")), F.col("n_t")
    ).otherwise(
        F.raise_error(
            F.format_string(
                "mann_whitney_u: degenerate split (n=%s, n_treat=%s) — "
                "both groups must be non-empty",
                F.coalesce(F.col("n").cast("string"), F.lit("0")),
                F.coalesce(F.col("n_t").cast("string"), F.lit("0")),
            )
        ).cast("bigint")
    )
    n = F.col("n").cast("double")
    nt = n_t_ok.cast("double")
    nc = (F.col("n") - n_t_ok).cast("double")
    two_u = (
        F.col("r2_t")
        - F.col("n_t").cast("decimal(38,0)") * (F.col("n_t") + F.lit(1))
    )
    sigma2 = (nt * nc / F.lit(12.0)) * (
        (n + F.lit(1.0))
        - F.col("tie_term").cast("double") / (n * (n - F.lit(1.0)))
    )
    # all-tied input (every value identical) zeroes the tie-corrected
    # variance — z is undefined, report NULL, never an ANSI
    # divide-by-zero (property-sweep counterexample)
    z = F.when(
        sigma2 > 0.0,
        (two_u.cast("double") - nt * nc) / (F.lit(2.0) * F.sqrt(sigma2)),
    )
    from feature_store_fraud_detection_spark.functions.numeric import (
        bigint_checked,
    )

    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("n_t").cast("bigint").alias("n_treat"),
        (F.col("n") - F.col("n_t")).cast("bigint").alias("n_control"),
        bigint_checked(F.col("r2_t"), "mann_whitney_u rank_sum_x2").alias(
            "rank_sum_x2"
        ),
        bigint_checked(two_u, "mann_whitney_u u_x2").alias("u_x2"),
        bigint_checked(F.col("tie_term"), "mann_whitney_u tie_term").alias(
            "tie_term"
        ),
        round4_stable(two_u.cast("double") / (F.lit(2.0) * nt * nc)).alias(
            "effect_cl"
        ),
        round4_stable(z).alias("z_score"),
    )


def anova_f(
    df: DataFrame,
    group_col: str,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """One-way ANOVA F-test across k groups — "do these groups share a
    mean?" for a continuous outcome, next to :func:`chi2_independence`
    (categorical) and :func:`mann_whitney_u` (two-group rank test).

    Exact-moment design (the ridge_fit discipline): values are scaled to
    integers (``scale``, e.g. cents), so the per-group count/sum are
    exact BIGINTs and the sum of squares an exact DECIMAL(38,0). The
    only inexact step is the FINAL cast of those moments to double for
    the F ratio — a relative 1e-16 perturbation, invisible at 4 decimals
    for a RATIO statistic (never emit the raw sums of squares, whose
    absolute error would not round away). Between/within terms fold in
    group-sorted order (fixed IEEE sequence both engines).

    Output: one row per group (group, n, sum_scaled, mean) — each an
    exact integer or a ratio — plus the global f_stat / eta^2 / df
    replicated on every row, so the whole report hash-checks.

    Scale: one hash aggregate to k rows; everything after is arithmetic
    on the bounded group table (sorted folds over k elements).
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    v_int = F.floor(
        overflow_checked(
            F.col(value_col).cast("double") * F.lit(float(scale)),
            9.0e15,
            "anova_f scaled value",
        )
        + F.lit(0.5)
    ).cast("bigint")
    per_g = (
        df.filter(F.col(value_col).isNotNull() & F.col(group_col).isNotNull())
        .select(F.col(group_col).alias("grp"), v_int.alias("__v"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_g"),
            F.sum("__v").alias("s_g"),
            F.sum(
                F.col("__v").cast("decimal(38,0)") * F.col("__v")
            ).alias("q_g"),
        )
    )
    folded = per_g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s_tot"),
        # sorted folds over the k-row group table: identical IEEE order
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("grp").cast("string").alias("g"),
                        (
                            F.col("s_g").cast("double")
                            * F.col("s_g").cast("double")
                            / F.col("n_g").cast("double")
                        ).alias("x"),
                        (
                            F.col("q_g").cast("double")
                            - F.col("s_g").cast("double")
                            * F.col("s_g").cast("double")
                            / F.col("n_g").cast("double")
                        ).alias("w"),
                    )
                )
            ),
            F.struct(F.lit(0.0).alias("x"), F.lit(0.0).alias("w")),
            lambda acc, e: F.struct(
                (acc["x"] + e["x"]).alias("x"),
                (acc["w"] + e["w"]).alias("w"),
            ),
        ).alias("__f"),
    )
    nD = F.col("n").cast("double")
    kD = F.col("k").cast("double")
    ssb = F.col("__f.x") - (
        F.col("s_tot").cast("double") * F.col("s_tot").cast("double") / nD
    )
    ssw = F.col("__f.w")
    # degenerate guards (surfaced by the brown_forsythe property sweep):
    # a single group has no between df, and zero within-group variance
    # (every group constant) leaves F undefined — report NULL, never a
    # divide-by-zero (ANSI) or inf (non-ANSI). Same for eta2 when BOTH
    # sums of squares are zero (constant input).
    k_ok = F.when(F.col("k") >= 2, F.col("k")).otherwise(
        F.raise_error(
            F.format_string(
                "anova_f: need >= 2 non-empty groups (got %s)",
                F.coalesce(F.col("k").cast("string"), F.lit("0")),
            )
        ).cast("bigint")
    )
    f_stat = F.when(
        (ssw > 0.0) & (nD > kD),
        (ssb / (kD - F.lit(1.0))) / (ssw / (nD - kD)),
    )
    eta2 = F.when((ssb + ssw) > 0.0, ssb / (ssb + ssw))
    glob = folded.select(
        k_ok.cast("int").alias("k"),
        F.col("n").cast("bigint").alias("n_total"),
        round4_stable(f_stat).alias("f_stat"),
        round4_stable(eta2).alias("eta2"),
    )
    return per_g.crossJoin(F.broadcast(glob)).select(
        F.col("grp").alias(group_col),
        F.col("n_g").cast("bigint").alias("n_g"),
        F.col("s_g").cast("bigint").alias("sum_scaled"),
        round4_stable(
            F.col("s_g").cast("double")
            / F.lit(float(scale))
            / F.col("n_g").cast("double")
        ).alias("mean_val"),
        "k",
        "n_total",
        "f_stat",
        "eta2",
    )


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    treatment_value,
    n_buckets: int = 32,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov test — the SHAPE companion to
    :func:`mann_whitney_u` (which detects location shifts; KS detects
    ANY distribution difference: variance, tails, bimodality). D is the
    maximum gap between the two empirical CDFs, computed on an
    exact-integer surface::

        D_scaled(v) = |c1(v)*n2 - c2(v)*n1|,   D = max_v D_scaled / (n1*n2)

    with c1/c2 the inclusive cumulative counts — every quantity an exact
    integer until the final ratio (the products accumulate in
    DECIMAL(38,0); a non-ANSI BIGINT product wraps silently past ~3e9
    rows per group, and :func:`bigint_checked` fail-louds the report
    narrowing). Also reports the value at which the
    maximum gap occurs (smallest such value on ties — where the two
    populations diverge most, often the actionable number) and the
    asymptotic statistic ``lambda = D * sqrt(n1*n2/(n1+n2))`` (reject at
    ~1.36 for alpha=.05, ~1.63 for .01 — the caller's lookup, no
    Kolmogorov-series evaluation cross-engine).

    Scale design: identical to mann_whitney_u — rows collapse to one row
    per distinct value, the cumulative counts shard by broadcast
    quantile cuts (per-bucket windows + bounded offsets), and the argmax
    is two bounded scalar aggregates, never a global sort.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    rows = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(value_col).alias("__v"),
        (F.col(group_col) == F.lit(treatment_value))
        .cast("int")
        .alias("__t"),
    )
    # r12 note: a persist of per_v (and d_v below) was measured at
    # 0.97 s -> 1.14 s min-of-5 (+19%) — concurrent duplicate subqueries
    # beat a serialized cache at bench scale; kept parallel-duplicate
    # (fixed 4x fan-out). See OPTIMIZATION_r12.md.
    per_v = rows.groupBy("__v").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum("__t").alias("__nt"),
    )
    if n_buckets >= 2:
        qs = ", ".join(str(i / n_buckets) for i in range(1, n_buckets))
        # 1-row cuts persisted (r13): one cut multiset for both the
        # offsets and the cum subtree — approx_percentile can vary
        # per evaluation (see mann_whitney_u's note).
        cuts = per_v.agg(
            F.expr(f"approx_percentile(__v, array({qs}), 1000)").alias("__cuts")
        ).persist()
        binned = per_v.crossJoin(F.broadcast(cuts)).withColumn(
            "__bin",
            F.size(F.filter("__cuts", lambda q: F.col("__v") > q)),
        ).drop("__cuts")
    else:
        binned = per_v.withColumn("__bin", F.lit(0))
    bucket_tot = binned.groupBy("__bin").agg(
        F.sum("__cnt").alias("__bc"), F.sum("__nt").alias("__bt")
    )
    woff = Window.orderBy("__bin").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_tot.select(
        "__bin",
        F.coalesce(F.sum("__bc").over(woff), F.lit(0)).alias("__offc"),
        F.coalesce(F.sum("__bt").over(woff), F.lit(0)).alias("__offt"),
    )
    wv = (
        Window.partitionBy("__bin")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)  # INCLUSIVE cumulative
    )
    cum = binned.join(F.broadcast(offsets), "__bin").select(
        "__v",
        (F.col("__offt") + F.sum("__nt").over(wv)).alias("__c1"),
        (F.col("__offc") + F.sum("__cnt").over(wv)).alias("__call"),
    )
    totals = per_v.agg(
        F.sum("__nt").alias("n1"), F.sum("__cnt").alias("n")
    )
    # products in DECIMAL(38,0): c1*n2 ~ n1*n2 wraps a non-ANSI BIGINT
    # silently past ~3e9 rows per group; the decimal form stays exact
    # and bigint_checked fail-louds the report narrowing
    d_v = cum.crossJoin(F.broadcast(totals)).select(
        "__v",
        "n1",
        (F.col("n") - F.col("n1")).alias("n2"),
        F.abs(
            F.col("__c1").cast("decimal(38,0)")
            * (F.col("n") - F.col("n1"))
            - (F.col("__call") - F.col("__c1")).cast("decimal(38,0)")
            * F.col("n1")
        ).alias("__d"),
    )
    dmax = d_v.agg(F.max("__d").alias("__dmax"))
    agg = d_v.crossJoin(F.broadcast(dmax)).agg(
        F.first("n1").alias("n1"),
        F.first("n2").alias("n2"),
        F.first("__dmax").alias("d_scaled"),
        F.min(F.when(F.col("__d") == F.col("__dmax"), F.col("__v"))).alias(
            "at_value"
        ),
    )
    # degenerate-split guard: D divides by n1*n2 — a one-group input
    # must abort (fail-loud house rule), not emit NaN/NULL statistics
    n1_ok = F.when(
        (F.col("n1") > 0) & (F.col("n2") > 0), F.col("n1")
    ).otherwise(
        F.raise_error(
            F.format_string(
                "ks_two_sample: degenerate split (n_treat=%s, "
                "n_control=%s) — both groups must be non-empty",
                F.coalesce(F.col("n1").cast("string"), F.lit("0")),
                F.coalesce(F.col("n2").cast("string"), F.lit("0")),
            )
        ).cast("bigint")
    )
    from feature_store_fraud_detection_spark.functions.numeric import (
        bigint_checked,
    )

    n1D = n1_ok.cast("double")
    n2D = F.col("n2").cast("double")
    d = F.col("d_scaled").cast("double") / (n1D * n2D)
    lam = d * F.sqrt(n1D * n2D / (n1D + n2D))
    return agg.select(
        F.col("n1").cast("bigint").alias("n_treat"),
        F.col("n2").cast("bigint").alias("n_control"),
        bigint_checked(F.col("d_scaled"), "ks_two_sample d_scaled").alias(
            "d_scaled"
        ),
        "at_value",
        round4_stable(d).alias("d_stat"),
        round4_stable(lam).alias("ks_lambda"),
    )


def ks_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    treatment_col: str,
) -> DataFrame:
    """Per-group exact two-sample KS statistics — one
    :func:`ks_two_sample`-style test PER GROUP in a single pass:
    ``(group, n_treat, n_control, d_scaled, ks_lambda)`` with the same
    exact-integer surface ``D_scaled = max_v |c1*n2 - c2*n1|`` (products
    in DECIMAL(38,0)) and the asymptotic lambda rounded to 4. The
    screen feeds :func:`bh_fdr`, which decides which of the m groups
    drifted after multiple-testing correction.

    A group where either side is empty fails loud (same rule as
    ks_two_sample: NaN statistics are not a report).

    Scale: rows collapse to one (group, value) hash aggregate; the
    cumulative counts are group-partitioned prefix windows (each task
    sorts one group's distinct values — groups shard naturally; a
    single monster group belongs in ks_two_sample's quantile-sharded
    form); per-group totals broadcast back.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        bigint_checked,
        round4_stable,
    )

    rows = df.filter(
        F.col(value_col).isNotNull()
        & F.col(group_col).isNotNull()
        & F.col(treatment_col).isNotNull()
    ).select(
        F.col(group_col).alias("__g"),
        F.col(value_col).alias("__v"),
        F.col(treatment_col).cast("int").alias("__t"),
    )
    # r12 note: a persist of per_v was measured (drift_fdr min-of-5 A/B
    # at sf0.1): 0.85 s -> 0.90 s — cum and the totals broadcast evaluate
    # concurrently on idle cores, and the cache serializes them; kept
    # parallel-duplicate (fixed 2x fan-out). See OPTIMIZATION_r12.md.
    per_v = rows.groupBy("__g", "__v").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum("__t").alias("__nt"),
    )
    wv = (
        Window.partitionBy("__g")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per_v.select(
        "__g",
        F.sum("__nt").over(wv).alias("__c1"),
        F.sum("__cnt").over(wv).alias("__call"),
    )
    totals = per_v.groupBy("__g").agg(
        F.sum("__nt").alias("n1"), F.sum("__cnt").alias("n")
    )
    d_v = cum.join(F.broadcast(totals), "__g").select(
        "__g",
        "n1",
        (F.col("n") - F.col("n1")).alias("n2"),
        F.abs(
            F.col("__c1").cast("decimal(38,0)")
            * (F.col("n") - F.col("n1"))
            - (F.col("__call") - F.col("__c1")).cast("decimal(38,0)")
            * F.col("n1")
        ).alias("__d"),
    )
    agg = d_v.groupBy("__g").agg(
        F.first("n1").alias("n1"),
        F.first("n2").alias("n2"),
        F.max("__d").alias("d_scaled"),
    )
    n1_ok = F.when(
        (F.col("n1") > 0) & (F.col("n2") > 0), F.col("n1")
    ).otherwise(
        F.raise_error(
            F.format_string(
                "ks_by_group: group %s has a degenerate split "
                "(n_treat=%s, n_control=%s) — both sides must be "
                "non-empty; filter the group out explicitly",
                F.col("__g").cast("string"),
                F.coalesce(F.col("n1").cast("string"), F.lit("0")),
                F.coalesce(F.col("n2").cast("string"), F.lit("0")),
            )
        ).cast("bigint")
    )
    n1D = n1_ok.cast("double")
    n2D = F.col("n2").cast("double")
    d = F.col("d_scaled").cast("double") / (n1D * n2D)
    lam = d * F.sqrt(n1D * n2D / (n1D + n2D))
    return agg.select(
        F.col("__g").alias(group_col),
        F.col("n1").cast("bigint").alias("n_treat"),
        F.col("n2").cast("bigint").alias("n_control"),
        bigint_checked(F.col("d_scaled"), "ks_by_group d_scaled").alias(
            "d_scaled"
        ),
        round4_stable(lam).alias("ks_lambda"),
    )


def bh_fdr(
    stats: DataFrame,
    lambda_col: str,
    key_cols: list[str],
    alpha: float = 0.05,
) -> DataFrame:
    """Benjamini-Hochberg FDR selection over a BOUNDED table of KS
    tests — the multiple-testing rung of the experiment ladder: screen
    m features/slices for drift and you WILL see false alarms at raw
    alpha; BH keeps the expected false-discovery share at ``alpha`` by
    rejecting the ``k`` smallest p-values where ``k`` is the largest
    rank with ``p_(i) <= i*alpha/m``.

    Entirely exp/erf-free on the engine side: with the asymptotic KS
    tail ``p = 2*exp(-2*lambda^2)``, the BH inequality inverts to
    ``lambda^2 >= -ln(i*alpha/(2m))/2`` — the m per-rank thresholds are
    computed ONCE on the driver (Python libm ln, the measured-stable
    pair with DuckDB's ln — the same discipline as fellegi_sunter's
    weights; JVM ln/exp is 1 ulp off correctly-rounded, the float
    canary's finding, so it never touches this surface) and enter the
    plan as an array literal indexed by rank. The comparison runs on
    the ROUNDED lambda column so both engines compare identical bits.

    Output per test: ``(key..., ks_lambda, bh_rank, m_tests,
    rejected)`` — rank 1 = strongest drift; ties on lambda break on the
    key columns so the ranking is deterministic.

    Scale: ``m`` is the number of TESTS (bounded by construction — you
    screen features, not rows), so the driver count pull, the m-element
    literal array, and the two single-partition windows over the m-row
    table are all bounded state, not data.
    """
    import math

    m = stats.count()
    if m == 0:
        raise ValueError("bh_fdr: no tests to correct")
    thresholds = [
        -math.log((i * alpha) / (2.0 * m)) / 2.0 for i in range(1, m + 1)
    ]
    arr = F.array(*[F.lit(t) for t in thresholds])
    # fail-loud consistency guard: m was read in a SEPARATE count()
    # action, so a non-deterministic upstream that re-evaluates to MORE
    # rows here would index past the m-element literal — element_at
    # would yield NULL thresholds and those ranks would silently never
    # reject; abort naming the operator instead
    thr_at_rank = F.when(
        F.col("bh_rank") <= F.lit(m),
        F.element_at(arr, F.col("bh_rank")),
    ).otherwise(
        F.raise_error(
            F.format_string(
                f"bh_fdr: input produced rank %s but count() saw only {m} "
                "tests — the stats input is non-deterministic across "
                "actions; materialize (cache/checkpoint) it first",
                F.col("bh_rank").cast("string"),
            )
        ).cast("double")
    )
    wr = Window.orderBy(
        F.col(lambda_col).desc(), *[F.col(c) for c in key_cols]
    )
    ranked = stats.withColumn("bh_rank", F.row_number().over(wr)).withColumn(
        "__flag",
        F.when(
            F.col(lambda_col) * F.col(lambda_col) >= thr_at_rank,
            F.col("bh_rank"),
        ),
    )
    wall = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return ranked.withColumn(
        "__k", F.max("__flag").over(wall)
    ).select(
        *key_cols,
        *[c for c in stats.columns if c not in key_cols],
        "bh_rank",
        F.lit(m).cast("int").alias("m_tests"),
        (F.col("bh_rank") <= F.coalesce(F.col("__k"), F.lit(0)))
        .cast("int")
        .alias("rejected"),
    )


def ks_from_histograms(
    hist_treat: DataFrame,
    hist_control: DataFrame,
    value_col: str,
    count_col: str = "n",
) -> DataFrame:
    """Exact two-sample KS from two PRE-AGGREGATED histograms — the
    order-aware companion to ``categorical_psi_from_counts`` (PSI is
    order-blind: it cannot tell "values shifted up one band" from
    "values scattered randomly"; the CDF gap can). Output is BIT-
    identical to :func:`ks_two_sample` run over the expanded rows —
    same ``|c1*n2 - c2*n1|`` DECIMAL(38,0) surface, same divergence
    location, same lambda — because a KS statistic only ever sees the
    value histogram anyway.

    This is the drift readout for states that are already histograms:
    the streaming drift monitor's accumulated band counts, downsampled
    telemetry, or a privacy-bounded export.

    Scale: the inputs are band tables (bounded by the quantization that
    produced them), so the full-outer merge and the one ordered prefix
    window ride bounded frames, never rows.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        bigint_checked,
        round4_stable,
    )

    a = hist_treat.select(
        F.col(value_col).alias("__v"),
        F.col(count_col).cast("bigint").alias("__nt"),
    )
    b = hist_control.select(
        F.col(value_col).alias("__v"),
        F.col(count_col).cast("bigint").alias("__nc"),
    )
    per_v = (
        a.join(b, "__v", "full")
        .select(
            "__v",
            F.coalesce(F.col("__nt"), F.lit(0)).alias("__nt"),
            (
                F.coalesce(F.col("__nt"), F.lit(0))
                + F.coalesce(F.col("__nc"), F.lit(0))
            ).alias("__cnt"),
        )
        .persist()  # r12: cum + totals each re-ran the hist upstreams
    )
    wv = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_v.select(
        "__v",
        F.sum("__nt").over(wv).alias("__c1"),
        F.sum("__cnt").over(wv).alias("__call"),
    )
    totals = per_v.agg(
        F.sum("__nt").alias("n1"), F.sum("__cnt").alias("n")
    )
    d_v = cum.crossJoin(F.broadcast(totals)).select(
        "__v",
        "n1",
        (F.col("n") - F.col("n1")).alias("n2"),
        F.abs(
            F.col("__c1").cast("decimal(38,0)")
            * (F.col("n") - F.col("n1"))
            - (F.col("__call") - F.col("__c1")).cast("decimal(38,0)")
            * F.col("n1")
        ).alias("__d"),
    ).persist()  # r12: referenced by the dmax broadcast AND the final argmax
    dmax = d_v.agg(F.max("__d").alias("__dmax"))
    agg = d_v.crossJoin(F.broadcast(dmax)).agg(
        F.first("n1").alias("n1"),
        F.first("n2").alias("n2"),
        F.first("__dmax").alias("d_scaled"),
        F.min(F.when(F.col("__d") == F.col("__dmax"), F.col("__v"))).alias(
            "at_value"
        ),
    )
    n1_ok = F.when(
        (F.col("n1") > 0) & (F.col("n2") > 0), F.col("n1")
    ).otherwise(
        F.raise_error(
            F.format_string(
                "ks_from_histograms: degenerate split (n_treat=%s, "
                "n_control=%s) — both histograms must carry mass",
                F.coalesce(F.col("n1").cast("string"), F.lit("0")),
                F.coalesce(F.col("n2").cast("string"), F.lit("0")),
            )
        ).cast("bigint")
    )
    n1D = n1_ok.cast("double")
    n2D = F.col("n2").cast("double")
    d = F.col("d_scaled").cast("double") / (n1D * n2D)
    lam = d * F.sqrt(n1D * n2D / (n1D + n2D))
    return agg.select(
        F.col("n1").cast("bigint").alias("n_treat"),
        F.col("n2").cast("bigint").alias("n_control"),
        bigint_checked(
            F.col("d_scaled"), "ks_from_histograms d_scaled"
        ).alias("d_scaled"),
        "at_value",
        round4_stable(d).alias("d_stat"),
        round4_stable(lam).alias("ks_lambda"),
    )


def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_buckets: int = 32,
) -> DataFrame:
    """Kruskal-Wallis H test across k groups — the k-group extension of
    :func:`mann_whitney_u` exactly as :func:`anova_f` extends the
    two-sample mean test: "do these k groups draw from the same
    distribution?" on ranks, so one whale value cannot swing the verdict
    the way it swings the ANOVA F.

    Exact-integer core (mann_whitney_u's): with ties sharing their
    average rank, twice the average rank of a value v is the INTEGER
    ``2*(#below v) + (#equal v) + 1``, so each group's doubled rank sum
    ``2*R_g`` and the tie term ``sum(t^3 - t)`` are exact integers
    accumulated in DECIMAL(38,0) and narrowed fail-loud via
    :func:`bigint_checked`. H is derived ONCE from those integers in
    fixed IEEE order (group-sorted fold of ``(2R_g)^2 / (4 n_g)``, the
    anova_f discipline) and rounded to 4 decimals; the tie-corrected
    ``H / (1 - tie_term/(n^3 - n))`` reports NULL when every value is
    tied (zero rank variance — nothing to test), and a single-group
    input aborts fail-loud rather than emitting NaN.

    Output: one row per group (group, n_g, doubled rank sum, mean rank)
    with the global (k, n_total, tie_term, h_stat, h_tie_corrected)
    replicated on every row so the whole report hash-checks.

    Scale: rows collapse to one row per (group, value) then per value
    (hash aggregates); the rank prefix sum runs over the bounded
    distinct-value table, sharded by quantile cut points exactly as
    mann_whitney_u shards it — no global row sort, no single-task rank.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        bigint_checked,
        round4_stable,
    )

    rows = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("__g"), F.col(value_col).alias("__v")
    )
    # r12 note: persists of per_gv + per_v + per_g were measured here
    # (min-of-5 A/B at sf0.1): 1.15 s -> 1.63 s, +41% — the five
    # consumers (cuts, offsets, ranked, ties, per-group join) evaluate
    # CONCURRENTLY on idle cores, and a cache chain serializes the
    # critical path behind block locks. Kept parallel-duplicate (fixed
    # ~5x fan-out, not data-dependent). See OPTIMIZATION_r12.md.
    per_gv = rows.groupBy("__g", "__v").agg(
        F.count(F.lit(1)).alias("__cnt_gv")
    )
    per_v = per_gv.groupBy("__v").agg(
        F.sum("__cnt_gv").alias("__cnt")
    )
    # shard the ordered prefix sum: quantile cuts -> per-bucket windows
    if n_buckets >= 2:
        qs = ", ".join(str(i / n_buckets) for i in range(1, n_buckets))
        cut_expr = F.expr(f"approx_percentile(__v, array({qs}), 1000)")
        # 1-row cuts persisted (r13): one cut multiset for both the
        # offsets and the ranked subtree (see mann_whitney_u's note).
        cuts = per_v.agg(cut_expr.alias("__cuts")).persist()
        binned = per_v.crossJoin(F.broadcast(cuts)).withColumn(
            "__bin",
            F.size(F.filter("__cuts", lambda q: F.col("__v") > q)),
        ).drop("__cuts")
    else:
        binned = per_v.withColumn("__bin", F.lit(0))
    bucket_tot = binned.groupBy("__bin").agg(F.sum("__cnt").alias("__bc"))
    woff = Window.orderBy("__bin").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_tot.select(
        "__bin", F.coalesce(F.sum("__bc").over(woff), F.lit(0)).alias("__off")
    )
    wv = (
        Window.partitionBy("__bin")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = binned.join(F.broadcast(offsets), "__bin").select(
        "__v",
        "__cnt",
        (
            F.col("__off") + F.coalesce(F.sum("__cnt").over(wv), F.lit(0))
        ).alias("__below"),
    )
    # per-group doubled rank sums: join the (group, value) counts to the
    # value ranks — both sides keyed on the value, one co-keyed shuffle
    per_g = (
        per_gv.join(ranked, "__v")
        .groupBy("__g")
        .agg(
            F.sum("__cnt_gv").alias("n_g"),
            F.sum(
                F.col("__cnt_gv").cast("decimal(38,0)")
                * (F.lit(2) * F.col("__below") + F.col("__cnt") + F.lit(1))
            ).alias("r2_g"),
        )
    )
    # tie cube guard: t^3 must stay exact in BIGINT before the decimal
    # sum (mann_whitney_u's bound and rationale)
    t_ok = F.when(
        F.col("__cnt") < F.lit(2097000), F.col("__cnt")
    ).otherwise(
        F.raise_error(
            F.format_string(
                "kruskal_wallis tie size: a value shared by %s rows "
                "overflows the exact tie-term path (bound 2097000)",
                F.col("__cnt").cast("string"),
            )
        ).cast("bigint")
    )
    ties = per_v.agg(
        F.sum(t_ok.cast("decimal(38,0)") * t_ok * t_ok - t_ok).alias(
            "tie_term"
        )
    )
    folded = per_g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        # group-sorted fold of (2R_g)^2 / (4 n_g): identical IEEE order
        # on both engines (anova_f's discipline)
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("__g").cast("string").alias("g"),
                        (
                            F.col("r2_g").cast("double")
                            * F.col("r2_g").cast("double")
                            / (F.lit(4.0) * F.col("n_g").cast("double"))
                        ).alias("x"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, e: acc + e["x"],
        ).alias("__fx"),
    ).crossJoin(F.broadcast(ties))
    # degenerate-input guard: H divides by (n^3 - n) and needs k >= 2 —
    # a one-group (or empty) input aborts fail-loud (house rule)
    k_ok = F.when(F.col("k") >= 2, F.col("k")).otherwise(
        F.raise_error(
            F.format_string(
                "kruskal_wallis: degenerate input (k=%s groups) — need "
                "at least 2 non-empty groups",
                F.coalesce(F.col("k").cast("string"), F.lit("0")),
            )
        ).cast("bigint")
    )
    nD = F.col("n").cast("double")
    h = (
        F.lit(12.0) / (nD * (nD + F.lit(1.0))) * F.col("__fx")
        - F.lit(3.0) * (nD + F.lit(1.0))
    )
    corr = F.lit(1.0) - F.col("tie_term").cast("double") / (
        nD * nD * nD - nD
    )
    glob = folded.select(
        k_ok.cast("int").alias("k"),
        F.col("n").cast("bigint").alias("n_total"),
        bigint_checked(F.col("tie_term"), "kruskal_wallis tie_term").alias(
            "tie_term"
        ),
        round4_stable(h).alias("h_stat"),
        round4_stable(F.when(corr > 0.0, h / corr)).alias(
            "h_tie_corrected"
        ),
    )
    return per_g.crossJoin(F.broadcast(glob)).select(
        F.col("__g").alias(group_col),
        F.col("n_g").cast("bigint").alias("n_g"),
        bigint_checked(F.col("r2_g"), "kruskal_wallis rank_sum_x2").alias(
            "rank_sum_x2"
        ),
        round4_stable(
            F.col("r2_g").cast("double")
            / (F.lit(2.0) * F.col("n_g").cast("double"))
        ).alias("mean_rank"),
        "k",
        "n_total",
        "tie_term",
        "h_stat",
        "h_tie_corrected",
    )


def spearman_rho(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_buckets: int = 32,
) -> DataFrame:
    """Spearman rank correlation between two numeric columns — the
    monotone-association companion to the Pearson moments in
    :func:`~feature_store_fraud_detection_spark.operators.regression`:
    Pearson on AVERAGE RANKS, so it measures "does y go up when x goes
    up" without assuming linearity and without a whale value owning the
    slope. Ties get their average rank (the tau-consistent convention).

    Exact-integer core: doubled average ranks ``2*R(v) = 2*(#below v) +
    (#equal v) + 1`` are exact integers per distinct value; rows
    collapse to (x, y) pair counts, and all five weighted rank moments
    (sum, sum of squares, cross product) accumulate in DECIMAL(38,0) —
    exact while ``4 n^4 < 10^38`` (n ~ 1.2e9 rows; beyond that the
    decimal sum NULLs visibly rather than wrapping). rho is derived ONCE
    from the exact moments in fixed IEEE order and rounded to 4
    decimals; zero rank variance on either margin (a constant column)
    reports NULL rho — never NaN.

    Scale: two bounded distinct-value rank tables (quantile-sharded
    prefix sums, mann_whitney_u's machinery), joined back to the (x, y)
    pair-count table on each key — hash joins, no global row sort.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    rows = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(F.col(x_col).alias("__x"), F.col(y_col).alias("__y"))
    # r12 optimization (guide §5 / §2.4): per_xy feeds BOTH rank tables
    # (each evaluating it under its own cuts/offsets broadcast subtrees)
    # plus the final join — ~9 re-runs of the base scan + collapse
    # before these persists (36 parquet scans measured at sf0.1). per_xy
    # and the per-column per_v are bounded collapse tables; not
    # unpersisted (the returned lazy frame reads them).
    per_xy = rows.groupBy("__x", "__y").agg(
        F.count(F.lit(1)).alias("__cnt")
    ).persist()
    # dual regime (r12, the pagerank SMALL_GRAPH convention): when the
    # bounded (x, y) collapse table is small, run each margin's prefix
    # sum as ONE un-sharded window instead of the cuts/offsets pipeline —
    # the sharded form is ~10 extra tiny stages per margin, pure
    # orchestration at this size (measured 4.0 -> 2.5 s at sf0.1, where
    # |per_xy| = 150k). The probe is one count on the cache the final
    # action materializes anyway; above the limit the quantile-sharded
    # form is unchanged (ranks are cut-invariant either way). Skipped
    # when the caller already asked for the un-sharded form (r13,
    # ADVICE: the probe job is pure cost then, and it must not override
    # an explicit n_buckets=1).
    if n_buckets >= 2 and per_xy.count() <= RANK_SINGLE_SORT_LIMIT:
        n_buckets = 1

    def rank_table(col: str) -> DataFrame:
        per_v = (
            per_xy.groupBy(col).agg(F.sum("__cnt").alias("__c")).persist()
        )
        if n_buckets >= 2:
            # approx_percentile (r12): the cuts only SHARD the prefix sum —
            # any monotone binning yields the same exact ranks (bin(v) =
            # #cuts below v is order-consistent for every cut multiset) —
            # and the sketch state is bounded where exact percentile
            # buffers every distinct value into one reducer's merge.
            # Same swap in mann_whitney_u / ks_two_sample / kruskal_wallis
            # / wilcoxon_signed_rank / bucketed_value_ranks.
            qs = ", ".join(str(i / n_buckets) for i in range(1, n_buckets))
            cut_expr = F.expr(f"approx_percentile({col}, array({qs}), 1000)")
            # 1-row cuts persisted (r13): one cut multiset for both the
            # offsets and the binned subtree (mann_whitney_u's note).
            cuts = per_v.agg(cut_expr.alias("__cuts")).persist()
            binned = per_v.crossJoin(F.broadcast(cuts)).withColumn(
                "__bin",
                F.size(F.filter("__cuts", lambda q: F.col(col) > q)),
            ).drop("__cuts")
        else:
            binned = per_v.withColumn("__bin", F.lit(0))
        bucket_tot = binned.groupBy("__bin").agg(F.sum("__c").alias("__bc"))
        woff = Window.orderBy("__bin").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = bucket_tot.select(
            "__bin",
            F.coalesce(F.sum("__bc").over(woff), F.lit(0)).alias("__off"),
        )
        wv = (
            Window.partitionBy("__bin")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return binned.join(F.broadcast(offsets), "__bin").select(
            col,
            (
                F.lit(2)
                * (
                    F.col("__off")
                    + F.coalesce(F.sum("__c").over(wv), F.lit(0))
                )
                + F.col("__c")
                + F.lit(1)
            ).alias(f"__r2{col}"),
        )

    j = per_xy.join(rank_table("__x"), "__x").join(rank_table("__y"), "__y")
    agg = j.agg(
        F.sum("__cnt").alias("n"),
        F.sum(
            F.col("__cnt").cast("decimal(38,0)") * F.col("__r2__x")
        ).alias("sx"),
        F.sum(
            F.col("__cnt").cast("decimal(38,0)") * F.col("__r2__y")
        ).alias("sy"),
        F.sum(
            F.col("__cnt").cast("decimal(38,0)")
            * F.col("__r2__x")
            * F.col("__r2__x")
        ).alias("sxx"),
        F.sum(
            F.col("__cnt").cast("decimal(38,0)")
            * F.col("__r2__y")
            * F.col("__r2__y")
        ).alias("syy"),
        F.sum(
            F.col("__cnt").cast("decimal(38,0)")
            * F.col("__r2__x")
            * F.col("__r2__y")
        ).alias("sxy"),
    )
    # degenerate guard: rho needs at least 2 rows (house rule: abort,
    # don't emit NaN); constant margins report NULL below
    n_ok = F.when(F.col("n") >= 2, F.col("n")).otherwise(
        F.raise_error(
            F.format_string(
                "spearman_rho: degenerate input (n=%s non-null pairs) — "
                "need at least 2",
                F.coalesce(F.col("n").cast("string"), F.lit("0")),
            )
        ).cast("bigint")
    )
    nd = F.col("n").cast("decimal(38,0)")
    num = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    d1 = (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    d2 = (nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    rho = num / (F.sqrt(d1) * F.sqrt(d2))
    return agg.select(
        n_ok.cast("bigint").alias("n"),
        round4_stable(
            F.when((d1 > 0.0) & (d2 > 0.0), rho)
        ).alias("spearman_rho"),
    )


def brown_forsythe(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Brown-Forsythe homogeneity-of-variance test — Levene's test on
    deviations from the group MEDIAN: "do these k groups share a
    SPREAD?", the dispersion companion to :func:`anova_f` (shared mean)
    and :func:`kruskal_wallis` (shared distribution). The median-based
    variant is the robust one (Brown & Forsythe 1974): a heavy-tailed
    group cannot fake a variance difference through its mean.

    Requires an integral ``value_col`` (quantize upstream, e.g. cents):
    with integer values, twice the group median is an exact .0/.5-free
    double (lo + (hi-lo)*0.5 of integers), so the doubled absolute
    deviation ``|2v - 2*median|`` is an exact integer — the F statistic
    then rides :func:`anova_f`'s exact-moment surface unchanged
    (BIGINT/DECIMAL(38,0) sums, group-sorted IEEE folds, fail-loud
    narrowing).

    Scale note: the group median uses Spark's exact ``percentile``
    aggregate — per-group state is the value multiset, fine for bounded
    group counts over quantized values; swap ``percentile_approx`` in at
    unbounded-cardinality scale exactly as the percentiles query
    documents. The median table is k rows, broadcast back.

    Output: anova_f's report shape on the doubled deviations — per
    group (group, n_g, sum_absdev_x2, mean_absdev_x2) + global
    (k, n_total, f_stat, eta2) replicated per row.
    """
    rows = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(F.col(group_col).alias("__g"), F.col(value_col).alias("__v"))
    med = rows.groupBy("__g").agg(
        (F.expr("percentile(__v, 0.5)") * F.lit(2.0)).alias("__med2")
    )
    z = rows.join(F.broadcast(med), "__g").select(
        "__g",
        F.abs(
            overflow_checked(
                F.col("__v").cast("double") * F.lit(2.0),
                9.0e15,
                "brown_forsythe doubled value",
            )
            - F.col("__med2")
        )
        .cast("bigint")
        .alias("__z2"),
    )
    out = anova_f(z, "__g", "__z2", scale=1)
    return out.select(
        F.col("__g").alias(group_col),
        "n_g",
        F.col("sum_scaled").alias("sum_absdev_x2"),
        F.col("mean_val").alias("mean_absdev_x2"),
        "k",
        "n_total",
        "f_stat",
        "eta2",
    )


def jarque_bera(
    df: DataFrame,
    group_col: str,
    value_col: str,
    value_bound: float = 1.0e7,
) -> DataFrame:
    """Jarque-Bera normality screen per group — "is this distribution
    even roughly Gaussian?" from skewness and excess kurtosis, the
    shape diagnostic upstream of every mean-based test in this module
    (:func:`anova_f`'s F assumes it; :func:`kruskal_wallis` is the
    escape hatch when this screen says no).

    Exact-moment design: requires an integral ``value_col`` (quantize
    upstream); the four raw power sums accumulate in DECIMAL(38,0) —
    exact while ``n * bound^4 < 10^38``, which is why ``value_bound``
    fail-louds any |value| >= 1e7 (guard, don't skew: a non-ANSI decimal
    overflow would NULL silently). Central moments, skewness
    ``m3/m2^1.5``, excess kurtosis ``m4/m2^2 - 3`` and
    ``JB = n/6 * (skew^2 + exkurt^2/4)`` are derived ONCE from the exact
    sums in fixed IEEE order and rounded to 4 decimals. A zero-variance
    group reports NULL shape stats — never NaN.

    Scale: one hash aggregate to k group rows; everything after is
    per-row arithmetic on the bounded group table.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    v = overflow_checked(
        F.col(value_col).cast("double"), value_bound, "jarque_bera: value"
    ).cast("bigint")
    per_g = (
        df.filter(
            F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
        )
        .select(F.col(group_col).alias("__g"), v.alias("__v"))
        .groupBy("__g")
        .agg(
            F.count(F.lit(1)).alias("n_g"),
            F.sum(F.col("__v").cast("decimal(38,0)")).alias("s1"),
            F.sum(
                F.col("__v").cast("decimal(38,0)") * F.col("__v")
            ).alias("s2"),
            F.sum(
                F.col("__v").cast("decimal(38,0)")
                * F.col("__v")
                * F.col("__v")
            ).alias("s3"),
            F.sum(
                F.col("__v").cast("decimal(38,0)")
                * F.col("__v")
                * F.col("__v")
                * F.col("__v")
            ).alias("s4"),
        )
    )
    nD = F.col("n_g").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    s3 = F.col("s3").cast("double")
    s4 = F.col("s4").cast("double")
    mu = s1 / nD
    m2 = s2 / nD - mu * mu
    m3 = s3 / nD - F.lit(3.0) * mu * (s2 / nD) + F.lit(2.0) * mu * mu * mu
    m4 = (
        s4 / nD
        - F.lit(4.0) * mu * (s3 / nD)
        + F.lit(6.0) * (mu * mu) * (s2 / nD)
        - F.lit(3.0) * (mu * mu * mu * mu)
    )
    skew = m3 / (m2 * F.sqrt(m2))
    exk = m4 / (m2 * m2) - F.lit(3.0)
    jb = nD / F.lit(6.0) * (
        skew * skew + exk * exk / F.lit(4.0)
    )
    ok = m2 > 0.0
    return per_g.select(
        F.col("__g").alias(group_col),
        F.col("n_g").cast("bigint").alias("n_g"),
        round4_stable(mu).alias("mean_q"),
        round4_stable(F.when(ok, skew)).alias("skewness"),
        round4_stable(F.when(ok, exk)).alias("ex_kurtosis"),
        round4_stable(F.when(ok, jb)).alias("jb_stat"),
    )


def cronbach_alpha(
    df: DataFrame,
    item_cols: list[str],
) -> DataFrame:
    """Cronbach's alpha — internal-consistency reliability of a k-item
    scale: do these k signals measure ONE underlying construct? The
    scale-health companion to :func:`~feature_store_fraud_detection_spark.operators.evaluation.fleiss_kappa`
    (which asks the same of categorical raters)::

        alpha = k/(k-1) * (1 - sum_i var_i / var_total)

    with var_total the variance of the per-row item SUM (sample
    variance convention). Items must be integral (quantize/scale
    upstream — alpha is covariance-based, so bring items to comparable
    scales first or standardize).

    Exact-moment design: per-item and total sums / sums of squares are
    exact BIGINT / DECIMAL(38,0) aggregates in ONE pass; the variance
    terms are derived once per item and folded in the CALLER's column
    order (spelled out, not data-dependent — both engines run the same
    IEEE sequence), rounded to 4. Rows with ANY null item are excluded
    (listwise deletion, the textbook convention). Zero total variance
    reports NULL alpha; n < 2 or k < 2 fails loud.

    Output: one row — n, k_items, sum_item_var, total_var, alpha.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    k = len(item_cols)
    if k < 2:
        raise ValueError(
            f"cronbach_alpha: need >= 2 item columns (got {k})"
        )
    cond = F.lit(True)
    for c in item_cols:
        cond = cond & F.col(c).isNotNull()
    total = None
    for c in item_cols:
        total = F.col(c) if total is None else total + F.col(c)
    rows = df.filter(cond).select(
        *[F.col(c).cast("bigint").alias(f"__x{i}") for i, c in
          enumerate(item_cols)],
        total.cast("bigint").alias("__t"),
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(k):
        aggs.append(
            F.sum(F.col(f"__x{i}").cast("decimal(38,0)")).alias(f"s{i}")
        )
        aggs.append(
            F.sum(
                F.col(f"__x{i}").cast("decimal(38,0)") * F.col(f"__x{i}")
            ).alias(f"q{i}")
        )
    aggs.append(F.sum(F.col("__t").cast("decimal(38,0)")).alias("st"))
    aggs.append(
        F.sum(
            F.col("__t").cast("decimal(38,0)") * F.col("__t")
        ).alias("qt")
    )
    agg = rows.agg(*aggs)
    n_ok = F.when(F.col("n") >= 2, F.col("n")).otherwise(
        F.raise_error(
            F.format_string(
                "cronbach_alpha: need n >= 2 complete rows (got %s)",
                F.coalesce(F.col("n").cast("string"), F.lit("0")),
            )
        ).cast("bigint")
    )
    nD = n_ok.cast("double")

    def var_of(s: str, q: str):
        return (
            F.col(q).cast("double")
            - F.col(s).cast("double") * F.col(s).cast("double") / nD
        ) / (nD - F.lit(1.0))

    sum_item_var = var_of("s0", "q0")
    for i in range(1, k):
        sum_item_var = sum_item_var + var_of(f"s{i}", f"q{i}")
    total_var = var_of("st", "qt")
    alpha = (
        F.lit(float(k))
        / F.lit(float(k - 1))
        * (F.lit(1.0) - sum_item_var / total_var)
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.lit(k).cast("int").alias("k_items"),
        round4_stable(sum_item_var).alias("sum_item_var"),
        round4_stable(total_var).alias("total_var"),
        round4_stable(F.when(total_var > 0.0, alpha)).alias("alpha"),
    )


def wilcoxon_signed_rank(
    df: DataFrame,
    diff_col: str,
    n_buckets: int = 32,
) -> DataFrame:
    """Wilcoxon signed-rank test on PAIRED differences — "did the same
    units move" (pre/post per user, model A minus model B per example):
    the paired companion to :func:`mann_whitney_u` (independent
    samples), robust where the paired t assumes normal diffs. Zero
    diffs carry no sign information and are DROPPED and counted
    (Wilcoxon's convention); ``diff_col`` must be integral (quantize
    upstream) so ties are well-defined cross-engine.

    Exact-integer core: |d| ranks with tie-averaged DOUBLED ranks (the
    mann_whitney_u integers — 2*rank(v) = 2*(#below) + (#equal) + 1
    over the distinct-|d| table, quantile-sharded prefix, no row sort),
    so twice the positive-rank sum ``2*W+``, its null expectation
    ``n(n+1)/2`` and the integer variance surface
    ``V12 = 2n(n+1)(2n+1) - tie_term`` (with ``Var(2W+) = V12/12``) are
    all exact DECIMAL(38,0); z derives once and rounds to 4. All-zero
    input fails loud (nothing to rank); an all-tied |d| table (zero
    variance) reports NULL z.

    Output: one row — n_nonzero, n_zero, w_plus_x2, tie_term, z_score.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        bigint_checked,
        round4_stable,
    )

    d = F.col(diff_col).cast("bigint")
    rows = df.filter(d.isNotNull()).select(
        F.abs(d).alias("__a"), (d > 0).cast("int").alias("__pos")
    )
    zeros = rows.filter(F.col("__a") == 0).agg(
        F.count(F.lit(1)).alias("n_zero")
    )
    nz = rows.filter(F.col("__a") > 0)
    # r12 note: a persist of per_v was measured (min-of-5 A/B at sf0.1):
    # 0.90 s -> 1.10 s, +22% — cuts/offsets/ranked evaluate concurrently
    # on idle cores, and the cache serializes them. Kept
    # parallel-duplicate (fixed 3x fan-out). See OPTIMIZATION_r12.md.
    per_v = nz.groupBy("__a").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum("__pos").alias("__npos"),
    )
    if n_buckets >= 2:
        qs = ", ".join(str(i / n_buckets) for i in range(1, n_buckets))
        cut_expr = F.expr(f"approx_percentile(__a, array({qs}), 1000)")
        # 1-row cuts persisted (r13): one cut multiset for both the
        # offsets and the ranked subtree (see mann_whitney_u's note).
        cuts = per_v.agg(cut_expr.alias("__cuts")).persist()
        binned = per_v.crossJoin(F.broadcast(cuts)).withColumn(
            "__bin",
            F.size(F.filter("__cuts", lambda q: F.col("__a") > q)),
        ).drop("__cuts")
    else:
        binned = per_v.withColumn("__bin", F.lit(0))
    bucket_tot = binned.groupBy("__bin").agg(F.sum("__cnt").alias("__bc"))
    woff = Window.orderBy("__bin").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_tot.select(
        "__bin", F.coalesce(F.sum("__bc").over(woff), F.lit(0)).alias("__off")
    )
    wv = (
        Window.partitionBy("__bin")
        .orderBy("__a")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = binned.join(F.broadcast(offsets), "__bin").select(
        "__cnt",
        "__npos",
        (
            F.col("__off") + F.coalesce(F.sum("__cnt").over(wv), F.lit(0))
        ).alias("__below"),
    )
    t_ok = F.when(
        F.col("__cnt") < F.lit(2097000), F.col("__cnt")
    ).otherwise(
        F.raise_error(
            F.format_string(
                "wilcoxon_signed_rank tie size: a value shared by %s "
                "rows overflows the exact tie-term path (bound 2097000)",
                F.col("__cnt").cast("string"),
            )
        ).cast("bigint")
    )
    agg = ranked.agg(
        F.sum("__cnt").alias("n"),
        F.sum(
            F.col("__npos").cast("decimal(38,0)")
            * (F.lit(2) * F.col("__below") + F.col("__cnt") + F.lit(1))
        ).alias("w2"),
        F.sum(
            t_ok.cast("decimal(38,0)") * t_ok * t_ok - t_ok
        ).alias("tie_term"),
    ).crossJoin(F.broadcast(zeros))
    n_ok = F.when(F.col("n") >= 1, F.col("n")).otherwise(
        F.raise_error(
            F.lit(
                "wilcoxon_signed_rank: every paired difference is zero "
                "— nothing to rank"
            )
        ).cast("bigint")
    )
    nd = n_ok.cast("decimal(38,0)")
    e2 = nd * (nd + F.lit(1).cast("decimal(38,0)"))  # 2 * 2E[W+]... E of 2W+ doubled below
    # Var(2W+) = V12 / 12 with V12 = 2n(n+1)(2n+1) - tie_term (exact)
    v12 = (
        F.lit(2).cast("decimal(38,0)")
        * nd
        * (nd + F.lit(1))
        * (F.lit(2).cast("decimal(38,0)") * nd + F.lit(1))
        - F.col("tie_term")
    )
    # E[2W+] = n(n+1)/2: n(n+1) is even, halve exactly in decimal
    e_half = (e2 / F.lit(2)).cast("decimal(38,0)")
    z = (F.col("w2") - e_half).cast("double") / F.sqrt(
        v12.cast("double") / F.lit(12.0)
    )
    return agg.select(
        n_ok.cast("bigint").alias("n_nonzero"),
        F.col("n_zero").cast("bigint").alias("n_zero"),
        bigint_checked(F.col("w2"), "wilcoxon_signed_rank w_plus_x2").alias(
            "w_plus_x2"
        ),
        bigint_checked(
            F.col("tie_term"), "wilcoxon_signed_rank tie_term"
        ).alias("tie_term"),
        round4_stable(
            F.when(v12.cast("double") > 0.0, z)
        ).alias("z_score"),
    )
