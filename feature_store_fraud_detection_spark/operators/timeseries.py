"""Per-key time-series features: OLS trend and lag-1 autocorrelation.

Behavioral fraud features the reference's trailing windows can't express:
is a card's spend TRENDING up (slope), and is it serially correlated
(burst-and-pause vs steady)? Both reduce to closed-form moment sums, so
each is ONE keyed aggregation pass — no iteration, no per-key model fit.

Determinism (the repo's money-math rule): every sum runs in exact DECIMAL
or integer arithmetic from the raw columns; the closed forms divide once
in double at the end and round. Time enters as integer seconds relative to
a fixed epoch (keeps x*x products inside long range and x*y inside
decimal(38,...) exactness — absolute unix epochs would square to ~3e18 per
row and overflow the exact path at aggregation).

Scale: one hash shuffle on the key with full map-side partial aggregation
(every term is algebraic). The autocorrelation's lag pairs come from ONE
per-key window (same shuffle as the aggregation — Catalyst reuses the
partitioning), bounded by each key's history like any per-key window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.functions.numeric import (
    overflow_checked,
    round4_stable,
)

#: fixed epoch for relative seconds — keeps squared terms exactly summable
TREND_EPOCH = "2024-01-01 00:00:00"


def _y4_quantized(s_col, context: str):
    """Daily-total quantization to exact integer 1e4-ths, fail-loud.

    ``floor(round4(s) * 1e4 + 0.5)`` of an UNBOUNDED double silently
    leaves the exact-integer regime past 2^53 (and a non-ANSI BIGINT
    cast wraps/NULLs past int64 with no error) — the exact hazard class
    the DECIMAL(38,0) accumulators guard everywhere else. Shared by the
    seasonal_strength / pettitt_changepoint / acf_profile daily series.
    """
    return F.floor(
        overflow_checked(
            round4_stable(s_col.cast("double")) * 10000 + F.lit(0.5),
            9.0e15,
            context,
        )
    ).cast("bigint")


def user_trend(
    df: DataFrame, key_col: str, ts_col: str, value_col: str
) -> DataFrame:
    """Per-key OLS slope/intercept of value over time (seconds since
    ``TREND_EPOCH``): slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), intercept
    = (Sy - slope*Sx)/n. Keys with a degenerate time spread (all events
    in the same second, or a single event) report NULL slope/intercept."""
    x = (
        F.unix_timestamp(F.col(ts_col))
        - F.unix_timestamp(F.lit(TREND_EPOCH).cast("timestamp"))
    ).cast("long")
    y = overflow_checked(F.col(value_col), 1e12, "user_trend").cast(
        "decimal(18,6)"
    )
    agg = df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        # decimal(38,0) sums: long sums of x/x^2 would overflow silently
        # (or abort under ANSI) past ~1e9 rows per key at relative-second
        # magnitudes; decimal is exact to 1e38
        F.sum(x.cast("decimal(38,0)")).alias("__sx"),
        F.sum((x * x).cast("decimal(38,0)")).alias("__sxx"),
        F.sum(y).alias("__sy"),
        F.sum((x.cast("decimal(18,0)") * y).cast("decimal(38,6)")).alias(
            "__sxy"
        ),
    )
    n = F.col("n_events").cast("double")
    sx = F.col("__sx").cast("double")
    sxx = F.col("__sxx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    denom = n * sxx - sx * sx
    slope = F.when(denom > 0, (n * sxy - sx * sy) / denom)
    intercept = (sy - slope * sx) / n
    return agg.select(
        key_col,
        "n_events",
        # slope in value-units per DAY (per-second slopes round to 0)
        round4_stable(slope * F.lit(86400.0)).alias("slope_per_day"),
        round4_stable(intercept).alias("intercept"),
    )


def lag1_autocorr(
    df: DataFrame, key_col: str, ts_col: str, id_col: str, value_col: str
) -> DataFrame:
    """Per-key lag-1 autocorrelation over the (value_t, value_{t-1}) pairs
    of consecutive events (time order, id tiebreak): Pearson r of the pair
    set via exact moment sums. Keys with < 3 events (fewer than 2 pairs)
    or zero variance on either side report NULL.

    The lag window and the final aggregation share one hash partitioning
    on the key; nothing else shuffles.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(id_col))
    v = overflow_checked(F.col(value_col), 1e12, "lag1_autocorr").cast(
        "decimal(18,6)"
    )
    paired = df.select(
        F.col(key_col), v.alias("__y"), F.lag(v).over(w).alias("__x")
    ).filter(F.col("__x").isNotNull())
    agg = paired.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum((F.col("__x") * F.col("__x")).cast("decimal(38,12)")).alias(
            "__sxx"
        ),
        F.sum((F.col("__y") * F.col("__y")).cast("decimal(38,12)")).alias(
            "__syy"
        ),
        F.sum((F.col("__x") * F.col("__y")).cast("decimal(38,12)")).alias(
            "__sxy"
        ),
    )
    n = F.col("n_pairs").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    sxy = F.col("__sxy").cast("double")
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    r = F.when(
        (F.col("n_pairs") >= 2) & (var_x > 0) & (var_y > 0),
        (n * sxy - sx * sy) / F.sqrt(var_x * var_y),
    )
    return agg.select(key_col, "n_pairs", round4_stable(r).alias("autocorr"))


def cusum_peak(
    df: DataFrame, key_col: str, ts_col: str, id_col: str, value_col: str
) -> DataFrame:
    """Per-key CUSUM change-point localization: the event where the
    cumulative deviation from the key's own mean peaks — "when did this
    card's spending level shift?". For each key, with prefix sums P_k over
    the (time, id)-ordered values and total S over n events::

        stat_k = n * P_k - k * S            (== n * sum_{i<=k}(x_i - mean))
        peak   = the k maximizing |stat_k|  (earliest event on ties)

    Returns (key, n_events, peak_ts, peak_k, cusum_peak) where cusum_peak
    = stat_k / n in value units (signed: positive = the early segment ran
    ABOVE the mean).

    Determinism: the textbook running sum of (x - mean) needs a division
    before the scan; multiplying through by n keeps every intermediate an
    exact DECIMAL (window prefix sums of decimals are order-independent
    given the total (ts, id) order), and the single double division +
    round happens at the output boundary.

    Scale: one hash shuffle on the key serves all three windows (ordered
    prefix/rank, unordered total, and the argmax rank) — Catalyst reuses
    the partitioning; per-task working set is one key's history, the same
    profile as any per-key window (pre-bucket upstream for pathological
    keys)."""
    w_ord = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rank = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(id_col))
    w_all = Window.partitionBy(key_col)
    v = overflow_checked(F.col(value_col), 1e12, "cusum_peak").cast(
        "decimal(18,6)"
    )
    pre = df.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(id_col),
        F.sum(v).over(w_ord).alias("__p"),
        F.row_number().over(w_rank).alias("__k"),
        F.sum(v).over(w_all).alias("__s"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
    )
    stat = (
        F.col("__n").cast("decimal(18,0)") * F.col("__p")
        - F.col("__k").cast("decimal(18,0)") * F.col("__s")
    ).cast("decimal(38,6)")
    scored = pre.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(id_col),
        F.col("__k"),
        F.col("__n"),
        stat.alias("__stat"),
    )
    pick = Window.partitionBy(key_col).orderBy(
        F.abs(F.col("__stat")).desc(), F.col(ts_col), F.col(id_col)
    )
    return (
        scored.withColumn("__rk", F.row_number().over(pick))
        .filter(F.col("__rk") == 1)
        .select(
            F.col(key_col),
            F.col("__n").cast("bigint").alias("n_events"),
            F.col(ts_col).alias("peak_ts"),
            F.col("__k").cast("int").alias("peak_k"),
            round4_stable(
                F.col("__stat").cast("double") / F.col("__n").cast("double")
            ).alias("cusum_peak"),
        )
    )


def ewma_forecast(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    alpha: float = 0.3,
    z: float = 3.0,
) -> DataFrame:
    """Exponentially-weighted smoothing + control chart per key over the
    daily series: ewma_t = alpha*y_t + (1-alpha)*ewma_{t-1} with the
    matching EW variance v_t = (1-alpha)*(v_{t-1} + alpha*(y_t -
    ewma_{t-1})^2) — the forecasting/monitoring sibling of the trend and
    CUSUM operators (next-day forecast = final ewma; alert if the LAST
    observation breaks the z-sigma EWMA control limit built from the
    state BEFORE it).

    Determinism: daily totals are exact DECIMAL sums rounded to 4 before
    the fold; the fold is a SEQUENTIAL struct fold over the day-sorted
    list (both engines run the identical IEEE op sequence — DuckDB's
    list_reduce takes the first element as the seed, Spark's aggregate
    gets the same seed explicitly). Single-day keys have no prior state:
    ewmstd 0, alert NULL.

    Scale: one (key, day) keyed aggregate, then one per-key fold whose
    state is 3 doubles — the per-key payload is the day count, not the
    row count. For million-day keys the collect_list bounds apply;
    pre-aggregate to coarser buckets first.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    day = F.date_trunc("day", F.col(ts_col))
    daily = (
        df.filter(F.col(val_col).isNotNull())
        .groupBy(F.col(key_col), day.alias("__day"))
        .agg(
            F.sum(F.col(val_col).cast("decimal(18,4)")).alias("__s")
        )
        .select(
            key_col,
            F.unix_timestamp("__day").alias("__d"),
            round4_stable(F.col("__s").cast("double")).alias("__y"),
        )
    )
    series = daily.groupBy(key_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("__d"), F.col("__y")))
        ).alias("__sr")
    )
    ys = F.transform(F.col("__sr"), lambda s: s["__y"])
    a, b = F.lit(float(alpha)), F.lit(1.0 - alpha)

    def _fold(arr):
        init = F.struct(
            F.element_at(arr, 1).alias("e"), F.lit(0.0).alias("v")
        )
        rest = F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0)))
        return F.aggregate(
            rest,
            init,
            lambda acc, x: F.struct(
                (a * x + b * acc["e"]).alias("e"),
                (b * (acc["v"] + a * (x - acc["e"]) * (x - acc["e"]))).alias(
                    "v"
                ),
            ),
        )

    full = _fold(ys)
    prev = _fold(F.slice(ys, 1, F.greatest(F.size(ys) - 1, F.lit(1))))
    n = F.size(ys)
    last_y = F.element_at(ys, -1)
    alert = F.when(
        n >= 2,
        F.abs(last_y - prev["e"])
        > F.lit(float(z)) * F.sqrt(prev["v"]),
    )
    return series.select(
        key_col,
        n.cast("int").alias("n_days"),
        round4_stable(last_y).alias("last_y"),
        round4_stable(full["e"]).alias("ewma"),
        round4_stable(F.sqrt(full["v"])).alias("ewmstd"),
        round4_stable(full["e"]).alias("forecast_next"),
        alert.alias("alert"),
    )


def kaplan_meier(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    censor_days: int = 3,
) -> DataFrame:
    """Kaplan-Meier survival curve over per-key activity lifetimes —
    the deaths-only retention view ``(t_days, n_at_risk, n_events,
    survival)`` this module has exported since round 4.

    Since round 8 this is a thin SCHEMA ADAPTER over the canonical
    :func:`operators.survival.kaplan_meier` (one implementation of the
    product-limit estimator in the repo, not two): the canonical form
    also reports censor counts and censoring-only days; this view
    filters to death days and keeps the original column names. The
    survival values are BIT-identical — censor-only days multiply the
    running product by exactly ``1 - 0/n == 1.0``, an IEEE no-op, so
    dropping those rows changes nothing downstream (pinned by the
    original hand fixture and the `user_survival` oracle).
    """
    from feature_store_fraud_detection_spark.operators.survival import (
        kaplan_meier as _canonical_km,
    )

    out = _canonical_km(
        df, key_col, ts_col, censor_horizon_days=censor_days
    )
    return out.filter(F.col("n_churned") > 0).select(
        F.col("duration_days").alias("t_days"),
        F.col("n_risk").alias("n_at_risk"),
        F.col("n_churned").alias("n_events"),
        "survival",
    )


def holt_forecast(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    alpha: float = 0.5,
    beta: float = 0.25,
    horizon: int = 7,
) -> DataFrame:
    """Holt double exponential smoothing (level + TREND) per key over the
    daily series — the trend-aware sibling of :func:`ewma_forecast`
    (whose flat forecast lags any drifting series)::

        l_t = alpha*y_t + (1-alpha)*(l_{t-1} + b_{t-1})
        b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}

    seeded l_1 = y_1, b_1 = 0 (zero-initial-trend variant; the trend
    adapts within ~1/beta observations). Emits per key: the final level
    and trend, the 1-step and ``horizon``-step-ahead forecasts
    (l + h*b), and the mean absolute one-step in-sample error — the
    honest "should you trust this forecast" companion.

    Determinism: daily totals are exact DECIMAL sums rounded before the
    fold; the fold is a sequential struct fold over the day-sorted list
    (identical IEEE op sequence both engines). The DuckDB twin's
    list_reduce mutates its accumulator field-by-field, so the oracle
    orders fields (err, prev_level, level, trend) such that each update
    reads exactly the pre-/post-assignment values the pure Spark fold
    reads — same discipline as ewma_forecast's (v, e) ordering.

    Scale: one (key, day) keyed aggregate, then one per-key fold whose
    state is 4 doubles; per-key payload is the day count. Million-day
    keys: pre-aggregate to coarser buckets first (collect_list bound).
    """
    day = F.date_trunc("day", F.col(ts_col))
    daily = (
        df.filter(F.col(val_col).isNotNull())
        .groupBy(F.col(key_col), day.alias("__day"))
        .agg(F.sum(F.col(val_col).cast("decimal(18,4)")).alias("__s"))
        .select(
            key_col,
            F.unix_timestamp("__day").alias("__d"),
            round4_stable(F.col("__s").cast("double")).alias("__y"),
        )
    )
    series = daily.groupBy(key_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("__d"), F.col("__y")))
        ).alias("__sr")
    )
    ys = F.transform(F.col("__sr"), lambda s: s["__y"])
    a, ac = F.lit(float(alpha)), F.lit(1.0 - alpha)
    b, bc = F.lit(float(beta)), F.lit(1.0 - beta)

    init = F.struct(
        F.lit(0.0).alias("err"),
        F.element_at(ys, 1).alias("pl"),
        F.element_at(ys, 1).alias("l"),
        F.lit(0.0).alias("t"),
    )
    rest = F.slice(ys, 2, F.greatest(F.size(ys) - 1, F.lit(0)))
    fold = F.aggregate(
        rest,
        init,
        lambda acc, y: F.struct(
            (acc["err"] + F.abs(y - (acc["l"] + acc["t"]))).alias("err"),
            acc["l"].alias("pl"),
            (a * y + ac * (acc["l"] + acc["t"])).alias("l"),
            (
                b * ((a * y + ac * (acc["l"] + acc["t"])) - acc["l"])
                + bc * acc["t"]
            ).alias("t"),
        ),
    )
    n = F.size(ys)
    h = F.lit(float(horizon))
    return series.select(
        key_col,
        n.cast("int").alias("n_days"),
        round4_stable(F.element_at(ys, -1)).alias("last_y"),
        round4_stable(fold["l"]).alias("level"),
        round4_stable(fold["t"]).alias("trend"),
        round4_stable(fold["l"] + fold["t"]).alias("forecast_1"),
        round4_stable(fold["l"] + h * fold["t"]).alias(
            f"forecast_{horizon}"
        ),
        F.when(n >= 2, round4_stable(fold["err"] / (n - 1).cast("double")))
        .alias("mae_1step"),
    )


def theil_sen_trend(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    max_days: int = 365,
) -> DataFrame:
    """Theil-Sen robust trend per key over the daily series: slope =
    MEDIAN of all pairwise slopes (y_j - y_i)/(d_j - d_i), intercept =
    median(y_i - slope*(d_i - d_first)) (the robust level at the key's
    FIRST day, not a days-since-1970 extrapolation) — the outlier-proof
    twin of an OLS fit (one wild day moves OLS arbitrarily; Theil-Sen
    tolerates ~29% corruption).

    Determinism: daily totals are exact DECIMAL sums rounded before any
    float math; day deltas are exact integers; medians are exact order
    statistics over the sorted slope list (even count: mean of the two
    middles, the one division both engines run identically).

    Scale: the pairwise slope list is O(days^2) PER KEY, array-local
    (never a row explosion or a join) — and HARD-CAPPED at the trailing
    ``max_days`` observed days (default 365): a 10-year key folds
    365*364/2 = 66k slopes, not 6.7M. The cap is a windowing choice, not
    an approximation — "trend over the last year" is usually the right
    question anyway; raise ``max_days`` deliberately for longer fits or
    pre-aggregate to coarser buckets (same bound as
    :func:`holt_forecast`'s fold). Keys with a single day return NULL
    slope/intercept; ``n_days`` reports the days actually fitted (post-
    cap).
    """
    if max_days < 2:
        raise ValueError(f"max_days must be >= 2, got {max_days}")
    day = F.date_trunc("day", F.col(ts_col))
    daily = (
        df.filter(F.col(val_col).isNotNull())
        .groupBy(F.col(key_col), day.alias("__day"))
        .agg(F.sum(F.col(val_col).cast("decimal(18,4)")).alias("__s"))
        .select(
            key_col,
            (F.unix_timestamp("__day") / F.lit(86400)).cast("bigint").alias(
                "__d"
            ),
            round4_stable(F.col("__s").cast("double")).alias("__y"),
        )
    )
    full = F.col("__full")
    series = (
        daily.groupBy(key_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__d"), F.col("__y")))
            ).alias("__full")
        )
        # trailing-window cap BEFORE the O(n^2) fold: keep the LAST
        # max_days observed days only
        .select(
            key_col,
            F.when(
                F.size(full) > max_days,
                F.slice(full, -max_days, max_days),
            )
            .otherwise(full)
            .alias("__sr"),
        )
    )
    arr = F.col("__sr")
    n = F.size(arr)

    def _median(sorted_arr: F.Column) -> F.Column:
        m = F.size(sorted_arr)
        mid = F.element_at(sorted_arr, ((m + 1) / 2).cast("int"))
        mid2 = F.element_at(sorted_arr, (m / 2 + 1).cast("int"))
        return F.when(m % 2 == 1, mid).otherwise(
            (F.element_at(sorted_arr, (m / 2).cast("int")) + mid2) / F.lit(2.0)
        )

    slopes = F.array_sort(
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.transform(
                    F.sequence(i + 1, n),
                    lambda j: (
                        F.element_at(arr, j)["__y"]
                        - F.element_at(arr, i)["__y"]
                    )
                    / (
                        F.element_at(arr, j)["__d"]
                        - F.element_at(arr, i)["__d"]
                    ).cast("double"),
                ),
            )
        )
    )
    out = series.select(
        key_col,
        n.cast("int").alias("n_days"),
        F.when(n >= 2, _median(slopes)).alias("__slope"),
        arr.alias("__a"),
    )
    d0 = F.element_at(F.col("__a"), 1)["__d"]
    intercepts = F.array_sort(
        F.transform(
            F.col("__a"),
            lambda s: s["__y"]
            - F.col("__slope") * (s["__d"] - d0).cast("double"),
        )
    )
    return out.select(
        key_col,
        "n_days",
        round4_stable(F.col("__slope")).alias("slope"),
        round4_stable(F.when(F.col("__slope").isNotNull(), _median(intercepts))).alias(
            "intercept"
        ),
    )


def cusum_segments(
    df: DataFrame, key_col: str, ts_col: str, id_col: str, value_col: str
) -> DataFrame:
    """Depth-2 binary segmentation: :func:`cusum_peak` finds ONE level
    shift per key; real series often shift twice (up then down). This
    runs the identical exact-DECIMAL CUSUM at the root, splits each
    key's series at the root peak, and re-runs it inside each half —
    up to 3 localized change points per key, the standard binary-
    segmentation recursion unrolled one level. Returns
    (key, segment in root/left/right, n_events, peak_ts, peak_k,
    cusum_peak) with peak_k ranked WITHIN the segment; 1-row segments
    are dropped (their stat is identically 0).

    Scale: the root level is the cusum_peak plan (one key shuffle
    serving all windows); the child level re-windows on (key, segment)
    — same hash family, one extra keyed join to carry the split point.
    Depth stays fixed: each extra level is one more join + window pass,
    never a driver loop.
    """
    v = overflow_checked(F.col(value_col), 1e12, "cusum_segments").cast(
        "decimal(18,6)"
    )
    ranked = df.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(id_col),
        v.alias("__v"),
        F.row_number()
        .over(Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(id_col)))
        .alias("__k0"),
    )

    def peaks(sdf: DataFrame, parts: list, label) -> DataFrame:
        w_ord = (
            Window.partitionBy(*parts)
            .orderBy(F.col(ts_col), F.col(id_col))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_rank = Window.partitionBy(*parts).orderBy(
            F.col(ts_col), F.col(id_col)
        )
        w_all = Window.partitionBy(*parts)
        pre = sdf.select(
            *parts,
            F.col(ts_col),
            F.col(id_col),
            F.sum("__v").over(w_ord).alias("__p"),
            F.row_number().over(w_rank).alias("__k"),
            F.sum("__v").over(w_all).alias("__s"),
            F.count(F.lit(1)).over(w_all).alias("__n"),
        )
        stat = (
            F.col("__n").cast("decimal(18,0)") * F.col("__p")
            - F.col("__k").cast("decimal(18,0)") * F.col("__s")
        ).cast("decimal(38,6)")
        pick = Window.partitionBy(*parts).orderBy(
            F.abs(stat).desc(), F.col(ts_col), F.col(id_col)
        )
        return (
            pre.withColumn("__stat", stat)
            .withColumn("__rk", F.row_number().over(pick))
            .filter((F.col("__rk") == 1) & (F.col("__n") >= 2))
            .select(
                F.col(key_col),
                label.alias("segment"),
                F.col("__n").cast("bigint").alias("n_events"),
                F.col(ts_col).alias("peak_ts"),
                F.col("__k").cast("int").alias("peak_k"),
                round4_stable(
                    F.col("__stat").cast("double") / F.col("__n").cast("double")
                ).alias("cusum_peak"),
            )
        )

    # r12 optimization (guide §5 caching): root is bounded (<= 1 row per
    # key) and consumed TWICE — as the split-point join side and in the
    # final union — so without the persist the whole root-level CUSUM
    # (scan + three windows over every event) evaluated twice. Not
    # unpersisted (lazy return convention; bench clears cache).
    root = peaks(ranked, [key_col], F.lit("root")).persist()
    with_split = ranked.join(
        root.select(F.col(key_col), F.col("peak_k").alias("__root_k")),
        key_col,
    ).withColumn(
        "__seg",
        F.when(F.col("__k0") <= F.col("__root_k"), F.lit("left")).otherwise(
            F.lit("right")
        ),
    )
    children = peaks(with_split, [key_col, "__seg"], F.col("__seg"))
    return root.unionByName(children)


def holt_winters_forecast(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.3,
    period: int = 7,
    horizon: int = 14,
) -> DataFrame:
    """Additive Holt-Winters (level + trend + SEASONALITY) per key over
    the daily series — completes the smoothing ladder after
    :func:`ewma_forecast` (level) and :func:`holt_forecast`
    (level+trend); with ``period=7`` it captures the weekly rhythm that
    both earlier forecasters smear into noise::

        l_t = alpha*(y_t - s_{t-m}) + (1-alpha)*(l_{t-1} + b_{t-1})
        b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}
        s_t = gamma*(y_t - l_t) + (1-gamma)*s_{t-m}

    Seasonality is indexed by POSITION in the day-sorted series (exactly
    day-of-week only when the series is gap-free — true for dense daily
    aggregates; resample first if not). Seeding uses the classic
    first-season initialization: ``l_m = mean(y_1..m)``, ``b_m = 0``
    (zero-initial-trend, as in holt_forecast), ``s_i = y_i - l_m`` for
    the first ``period`` observations; the fold then runs from
    observation ``period+1``. Keys with fewer than ``period``
    observations are dropped (no season to seed from).

    Emits per key: final level/trend, the next-step seasonal, 1-step and
    ``horizon``-step forecasts (``l + h*b + s_{appropriate phase}``),
    and the mean absolute one-step in-sample error over the folded span.

    Determinism: same discipline as holt_forecast — exact DECIMAL daily
    totals rounded before the fold; the fold is a sequential struct fold
    over the day-sorted list (identical IEEE op sequence both engines),
    with the seasonal queue carried as a ``period``-element array
    (head = s_{t-m}, rotated each step). The DuckDB twin is a recursive
    CTE carrying the same list column.

    Scale: one (key, day) keyed aggregate, then one per-key fold whose
    state is 3 doubles + a ``period``-double array; per-key payload is
    the day count (pre-aggregate million-day keys to coarser buckets
    first, the collect_list bound shared with holt_forecast).
    """
    m = int(period)
    day = F.date_trunc("day", F.col(ts_col))
    daily = (
        df.filter(F.col(val_col).isNotNull())
        .groupBy(F.col(key_col), day.alias("__day"))
        .agg(F.sum(F.col(val_col).cast("decimal(18,4)")).alias("__s"))
        .select(
            key_col,
            F.unix_timestamp("__day").alias("__d"),
            round4_stable(F.col("__s").cast("double")).alias("__y"),
        )
    )
    series = daily.groupBy(key_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("__d"), F.col("__y")))
        ).alias("__sr")
    ).filter(F.size("__sr") >= m)
    ys = F.transform(F.col("__sr"), lambda s: s["__y"])
    a, ac = F.lit(float(alpha)), F.lit(1.0 - alpha)
    b, bc = F.lit(float(beta)), F.lit(1.0 - beta)
    g, gc = F.lit(float(gamma)), F.lit(1.0 - gamma)

    first_season = F.slice(ys, 1, m)
    l0 = (
        F.aggregate(first_season, F.lit(0.0), lambda acc, y: acc + y)
        / F.lit(float(m))
    )
    init = F.struct(
        F.lit(0.0).alias("err"),
        l0.alias("l"),
        F.lit(0.0).alias("t"),
        F.transform(first_season, lambda y: y - l0).alias("s"),
    )
    rest = F.slice(ys, m + 1, F.greatest(F.size(ys) - m, F.lit(0)))
    # every use of the new level recomputes its expression inline — the
    # same IEEE op sequence the SQL twin spells out (holt discipline)
    fold = F.aggregate(
        rest,
        init,
        lambda acc, y: F.struct(
            (
                acc["err"]
                + F.abs(y - (acc["l"] + acc["t"] + F.element_at(acc["s"], 1)))
            ).alias("err"),
            (
                a * (y - F.element_at(acc["s"], 1))
                + ac * (acc["l"] + acc["t"])
            ).alias("l"),
            (
                b
                * (
                    (
                        a * (y - F.element_at(acc["s"], 1))
                        + ac * (acc["l"] + acc["t"])
                    )
                    - acc["l"]
                )
                + bc * acc["t"]
            ).alias("t"),
            F.concat(
                F.slice(acc["s"], 2, m - 1),
                F.array(
                    g
                    * (
                        y
                        - (
                            a * (y - F.element_at(acc["s"], 1))
                            + ac * (acc["l"] + acc["t"])
                        )
                    )
                    + gc * F.element_at(acc["s"], 1)
                ),
            ).alias("s"),
        ),
    )
    n = F.size(ys)
    h = F.lit(float(horizon))
    # forecast h steps ahead reads the seasonal at phase (h-1) mod m + 1
    # of the final queue (head = next step's seasonal)
    phase = ((horizon - 1) % m) + 1
    n_folded = n - m
    return series.select(
        key_col,
        n.cast("int").alias("n_days"),
        round4_stable(F.element_at(ys, -1)).alias("last_y"),
        round4_stable(fold["l"]).alias("level"),
        round4_stable(fold["t"]).alias("trend"),
        round4_stable(F.element_at(fold["s"], 1)).alias("season_next"),
        round4_stable(
            fold["l"] + fold["t"] + F.element_at(fold["s"], 1)
        ).alias("forecast_1"),
        round4_stable(
            fold["l"] + h * fold["t"] + F.element_at(fold["s"], phase)
        ).alias(f"forecast_{horizon}"),
        F.when(
            n_folded >= 1,
            round4_stable(fold["err"] / n_folded.cast("double")),
        ).alias("mae_1step"),
    )


def seasonal_strength(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
) -> DataFrame:
    """How much of a key's daily variance the WEEKLY profile explains —
    the "should you even fit :func:`holt_winters_forecast`" gate::

        strength = 1 - SSW / SST
                 = 1 - sum_d sum_{y in dow d} (y - ybar_d)^2
                       / sum (y - ybar)^2

    (the one-way-ANOVA eta^2 with day-of-week as the group — 0 means the
    weekday tells you nothing, 1 means it determines the value). Also
    reports the peak weekday (largest |dow mean - grand mean|, lowest
    dow on ties) and its deviation — the actionable "our Mondays are
    different" number.

    Exact-moment design: daily totals are the round4 DECIMAL sums every
    forecaster here uses, re-scaled to exact integer 1e4-ths; per-dow
    count/sum/sum-of-squares are exact BIGINT/DECIMAL moments; the
    between-group term folds dow-sorted; the peak argmax rides a packed
    BIGINT (quantized deviation * 8 + (7 - dow), max-reduced — no
    multi-field fold, the cross-engine hazard holt documented). Keys
    with < 2 days or zero variance emit NULL strength (nothing to
    explain).

    Scale: one (key, day) aggregate, one (key, dow) aggregate, one
    7-row-per-key rollup — all map-side combinable, no window, no join.
    """
    day = F.date_trunc("day", F.col(ts_col))
    daily = (
        df.filter(F.col(val_col).isNotNull())
        .groupBy(F.col(key_col), day.alias("__day"))
        .agg(F.sum(F.col(val_col).cast("decimal(18,4)")).alias("__s"))
        .select(
            key_col,
            F.dayofweek("__day").alias("__dow"),  # Spark: 1=Sun..7=Sat
            _y4_quantized(F.col("__s"), "seasonal_strength: daily total").alias("__y4"),
        )
    )
    per_dow = daily.groupBy(key_col, "__dow").agg(
        F.count(F.lit(1)).alias("n_d"),
        F.sum("__y4").alias("s_d"),
        F.sum(
            F.col("__y4").cast("decimal(38,0)") * F.col("__y4")
        ).alias("q_d"),
    )
    x_d = (
        F.col("s_d").cast("double")
        * F.col("s_d").cast("double")
        / F.col("n_d").cast("double")
    )
    per_key = per_dow.groupBy(key_col).agg(
        F.sum("n_d").alias("n_days"),
        F.sum("s_d").alias("s"),
        F.sum("q_d").alias("q"),
        # between-group term folds dow-sorted (fixed IEEE order)
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("__dow").alias("d"), x_d.alias("x")))
            ),
            F.lit(0.0),
            lambda acc, e: acc + e["x"],
        ).alias("__fx"),
        F.count(F.lit(1)).alias("__n_dows"),
    )
    nD = F.col("n_days").cast("double")
    sD, qD = F.col("s").cast("double"), F.col("q").cast("double")
    sst = qD - sD * sD / nD
    ssw = qD - F.col("__fx")
    grand = sD / nD
    # peak dow: packed-BIGINT argmax over the bounded per-dow frame
    dev = F.abs(
        F.col("s_d").cast("double") / F.col("n_d").cast("double")
        - F.col("__g")
    )
    # dev is already in 1e4th-of-value units (the daily totals' scale),
    # so rounding to the nearest integer IS the round4 quantization
    packed = (
        F.floor(dev + F.lit(0.5)).cast("bigint") * F.lit(8)
        + (F.lit(7) - F.col("__dow"))
    )
    # NO broadcast hint on the grand-mean table: it carries one row PER
    # KEY, so it grows with key cardinality — let the optimizer pick a
    # keyed hash join (same fix as ljung_box / classical_decomposition).
    peaks = (
        per_dow.join(
            per_key.select(key_col, (sD / nD).alias("__g")),
            key_col,
        )
        .groupBy(key_col)
        .agg(F.max(packed).alias("__pk"))
        .select(
            key_col,
            (F.lit(7) - F.col("__pk") % 8).cast("int").alias("peak_dow"),
            round4_stable(
                F.floor(F.col("__pk") / 8).cast("double") / F.lit(10000.0)
            ).alias("peak_dev"),
        )
    )
    report = per_key.select(
        key_col,
        F.col("n_days").cast("bigint").alias("n_days"),
        F.when(
            (F.col("n_days") >= 2) & (sst > 0.0),
            round4_stable(
                (F.lit(1.0) - ssw / sst)
            ),
        ).alias("strength"),
    )
    return report.join(peaks, key_col)


def pettitt_changepoint(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
) -> DataFrame:
    """Pettitt changepoint test per key — the rank-based "did the level
    SHIFT, and when?" companion to :func:`cusum_segments` (CUSUM finds
    mean shifts assuming the scale; Pettitt is the Mann-Whitney of
    changepoints: distribution-free, one whale day cannot fake a
    shift). For the daily series y_1..y_n, with tie-averaged ranks::

        U_t = 2 * sum_{i<=t} R_i - t * (n + 1)

    (Pettitt 1979's identity for sum_{i<=t} sum_{j>t} sgn(y_i - y_j));
    the changepoint candidate is the t maximizing |U_t|, its sign the
    shift direction (U > 0: the early segment ranks HIGH — a step
    DOWN after the changepoint).

    ENTIRELY exact-integer: daily totals quantize to 1e4-ths (the
    forecaster family's round4-then-scale), doubled ranks
    ``2R = 2*below + ties + 1`` are the mann_whitney integers, and U_t
    is a prefix-sum expression — the report has NO doubles at all, the
    strongest hash surface in the repo. Day counts are calendar-bounded
    (P2_t <= n*(2n+1): 27 YEARS of days stays under 2^28), so plain
    BIGINT is exact by construction.

    Output per key: ``(key, n_days, u_abs_max, at_day, u_at,
    direction)`` — at_day is the EARLIEST day achieving the max gap
    (the last day of the pre-shift segment), direction = sign(U_at).

    Scale: one (key, day) aggregate; ranks come from the per-(key,
    value) DISTINCT table (mann_whitney's discipline — never a raw-row
    sort) with key-partitioned prefix windows; the argmax is one keyed
    max + one keyed min_by over the bounded day table.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    day = F.date_trunc("day", F.col(ts_col))
    daily = (
        df.filter(F.col(val_col).isNotNull())
        .groupBy(F.col(key_col), day.alias("__day"))
        .agg(F.sum(F.col(val_col).cast("decimal(18,4)")).alias("__s"))
        .select(
            key_col,
            "__day",
            _y4_quantized(F.col("__s"), "pettitt_changepoint: daily total").alias("__y4"),
        )
    )
    per_v = daily.groupBy(key_col, "__y4").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    wv = (
        Window.partitionBy(key_col)
        .orderBy("__y4")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranks = per_v.select(
        key_col,
        "__y4",
        (
            F.lit(2) * F.coalesce(F.sum("__cnt").over(wv), F.lit(0))
            + F.col("__cnt")
            + F.lit(1)
        ).alias("__r2"),
    )
    wd = Window.partitionBy(key_col).orderBy("__day")
    wn = Window.partitionBy(key_col)
    uu = (
        daily.join(ranks, [key_col, "__y4"])
        .select(
            key_col,
            "__day",
            F.row_number().over(wd).alias("__t"),
            F.sum("__r2")
            .over(wd.rowsBetween(Window.unboundedPreceding, 0))
            .alias("__p2"),
            F.count(F.lit(1)).over(wn).alias("__n"),
        )
        .select(
            key_col,
            "__day",
            "__n",
            (
                F.col("__p2") - F.col("__t") * (F.col("__n") + F.lit(1))
            ).alias("__u"),
        )
    )
    km = uu.groupBy(key_col).agg(F.max(F.abs(F.col("__u"))).alias("__umax"))
    # km is one row per key (grows with key cardinality) — no broadcast
    # hint; a keyed hash join is the scale-safe plan.
    return (
        uu.join(km, key_col)
        .filter(F.abs(F.col("__u")) == F.col("__umax"))
        .groupBy(key_col)
        .agg(
            F.first("__n").alias("n_days"),
            F.first("__umax").alias("u_abs_max"),
            F.min("__day").alias("at_day"),
            F.min_by("__u", "__day").alias("u_at"),
        )
        .select(
            key_col,
            F.col("n_days").cast("bigint").alias("n_days"),
            F.col("u_abs_max").cast("bigint").alias("u_abs_max"),
            # DATE, not the truncation's midnight timestamp: the day is
            # a label, and DATE canonicalizes identically cross-engine
            F.col("at_day").cast("date").alias("at_day"),
            F.col("u_at").cast("bigint").alias("u_at"),
            F.signum(F.col("u_at")).cast("int").alias("direction"),
        )
    )


def acf_profile(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    max_lag: int = 14,
) -> DataFrame:
    """Per-key autocorrelation profile of the daily series at calendar
    lags 1..max_lag — the "WHICH lag is the season" diagnostic between
    :func:`seasonal_strength` (is there a weekly profile at all) and
    :func:`holt_winters_forecast` (fit it): a spike at lag 7 says
    weekly, at lag 1 says momentum, nowhere says don't bother.

    Estimator: the Pearson correlation over CALENDAR-lag pairs
    ``(y_d, y_{d+k})`` — days pair by integer day-number join, so a gap
    in the series never silently misaligns lags (run
    :func:`resample_gapfill` first if zero-filling is the right gap
    semantics instead).

    Exact-moment discipline (anova_f's): daily totals quantize to
    integer 1e4-ths, all six pair moments are exact BIGINT /
    DECIMAL(38,0) sums, and the correlation is derived ONCE from those
    moments in fixed IEEE order and rounded to 4. A lag with fewer than
    2 pairs or zero variance on either side reports NULL acf (nothing
    to correlate) — never NaN/inf.

    Scale: one (key, day) aggregate, one lag-exploded SELF-JOIN
    co-partitioned on (key, day-number) — the joined frame is
    |days| x max_lag per key, bounded by the calendar — then one
    (key, lag) moment aggregate. No windows, no driver state.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    day = F.date_trunc("day", F.col(ts_col))
    daily = (
        df.filter(F.col(val_col).isNotNull())
        .groupBy(F.col(key_col), day.alias("__day"))
        .agg(F.sum(F.col(val_col).cast("decimal(18,4)")).alias("__s"))
        .select(
            key_col,
            F.datediff(
                F.col("__day").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("__dn"),
            _y4_quantized(F.col("__s"), "acf_profile: daily total").alias("__y4"),
        )
    )
    left = daily.select(
        key_col,
        "__dn",
        F.col("__y4").alias("__x"),
        F.explode(
            F.sequence(F.lit(1), F.lit(int(max_lag)))
        ).alias("lag"),
    ).withColumn("__dn_b", F.col("__dn") + F.col("lag"))
    right = daily.select(
        key_col,
        F.col("__dn").alias("__dn_b"),
        F.col("__y4").alias("__yv"),
    )
    pairs = left.join(right, [key_col, "__dn_b"])
    per = pairs.groupBy(key_col, "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        # first moments in DECIMAL(38,0) too — a BIGINT sum of 2^53-bound
        # values wraps silently in non-ANSI Spark at ~1000 pairs of
        # max-scale days, while sxx/syy/sxy already ride decimal
        F.sum(F.col("__x").cast("decimal(38,0)")).alias("__sx"),
        F.sum(F.col("__yv").cast("decimal(38,0)")).alias("__sy"),
        F.sum(F.col("__x").cast("decimal(38,0)") * F.col("__x")).alias(
            "__sxx"
        ),
        F.sum(F.col("__yv").cast("decimal(38,0)") * F.col("__yv")).alias(
            "__syy"
        ),
        F.sum(F.col("__x").cast("decimal(38,0)") * F.col("__yv")).alias(
            "__sxy"
        ),
    )
    n = F.col("n_pairs")
    num = (
        n * F.col("__sxy")
        - F.col("__sx").cast("decimal(38,0)") * F.col("__sy")
    ).cast("double")
    d1 = (
        n * F.col("__sxx")
        - F.col("__sx").cast("decimal(38,0)") * F.col("__sx")
    ).cast("double")
    d2 = (
        n * F.col("__syy")
        - F.col("__sy").cast("decimal(38,0)") * F.col("__sy")
    ).cast("double")
    r = num / (F.sqrt(d1) * F.sqrt(d2))
    return per.select(
        key_col,
        F.col("lag").cast("int").alias("lag"),
        n.cast("bigint").alias("n_pairs"),
        round4_stable(
            F.when((n >= 2) & (d1 > 0.0) & (d2 > 0.0), r)
        ).alias("acf"),
    )


def ljung_box(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    max_lag: int = 10,
) -> DataFrame:
    """Ljung-Box portmanteau test per key — "is this daily series white
    noise?" pooled over the first ``max_lag`` calendar-lag
    autocorrelations: the yes/no gate in front of :func:`acf_profile`
    (which says WHERE the structure is) and the forecasters (which
    assume there is some)::

        Q = n (n + 2) * sum_{k=1..h} rho_k^2 / (n - k)

    with n the number of observed days and rho_k the SAME calendar-lag
    Pearson estimator :func:`acf_profile` reports (gaps pair by integer
    day-number join, never by row position — run
    :func:`resample_gapfill` first if zero-filling is the right gap
    semantics). Lags with undefined acf (under 2 pairs or zero
    variance) or ``n - k <= 0`` are EXCLUDED and the df reported as
    ``lags_used`` — never silently folded as zero.

    Determinism: rho_k is already 4-decimal-stable (exact-moment
    derivation in acf_profile), so the lag-sorted fold of
    ``rho^2/(n-k)`` runs the identical IEEE sequence on both engines;
    Q is rounded once at the end. A key with NO usable lag drops out
    (nothing to pool), matching the SQL twin's inner join.

    Scale: acf_profile's plan (bounded calendar self-join) plus one
    per-key distinct-day count and a fold over <= max_lag rows per key.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    acf = acf_profile(df, key_col, ts_col, val_col, max_lag)
    day = F.date_trunc("day", F.col(ts_col))
    ndays = (
        df.filter(F.col(val_col).isNotNull())
        .groupBy(F.col(key_col))
        .agg(F.countDistinct(day).alias("n_days"))
    )
    # no broadcast hint: ndays grows with key cardinality (one row per
    # key), so at high-cardinality keys a forced broadcast could exceed
    # the threshold / driver memory — let the optimizer pick (it still
    # broadcasts when the table is provably small, and falls back to a
    # key-partitioned hash join otherwise)
    incl = acf.join(ndays, key_col).filter(
        F.col("acf").isNotNull() & (F.col("n_days") - F.col("lag") > 0)
    )
    folded = incl.groupBy(key_col, "n_days").agg(
        F.count(F.lit(1)).alias("lags_used"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("lag").alias("lag"),
                        (
                            F.col("acf")
                            * F.col("acf")
                            / (F.col("n_days") - F.col("lag")).cast(
                                "double"
                            )
                        ).alias("x"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, e: acc + e["x"],
        ).alias("__fx"),
    )
    nD = F.col("n_days").cast("double")
    return folded.select(
        key_col,
        F.col("n_days").cast("bigint").alias("n_days"),
        F.col("lags_used").cast("int").alias("lags_used"),
        round4_stable(nD * (nD + F.lit(2.0)) * F.col("__fx")).alias(
            "q_stat"
        ),
    )


def classical_decomposition(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    period: int = 7,
) -> DataFrame:
    """Classical additive decomposition of each key's daily series —
    ``y = trend + seasonal + remainder`` with a centered ``period``-day
    moving-average trend and day-slot seasonal indices: the EXPLAIN
    step between :func:`seasonal_strength` (is there a weekly profile)
    and :func:`holt_winters_forecast` (exploit it) — it shows WHERE the
    level is going and what each weekday is worth, per key.

    Mechanics (period must be odd; 7 = weekly on daily data):

    * trend_t = mean(y_{t-h}..y_{t+h}), h = period//2 — NULL unless all
      ``period`` calendar days are present (gaps never fake a trend;
      resample first if zero-filling is right);
    * seasonal index per day slot ``dn % period`` (day-number modulo —
      engine-independent, unlike locale dayofweek) = mean of the
      detrended values on that slot, centered so the indices sum to 0;
    * remainder = y - trend - seasonal, NULL wherever trend is.

    Exactness: daily totals quantize to integer 1e4-ths; the trend
    window sum and the detrended value ``period*y4 - sum_window`` are
    exact DECIMAL(38,0) integers; the per-slot means and their center
    fold over the BOUNDED slot table (<= period rows per key) in
    slot-sorted order. Every report double derives once and rounds to 4.

    Scale: one (key, day) aggregate, one explode-by-offset co-keyed
    window-sum join (acf_profile's calendar pattern, |days| x period),
    one bounded per-slot aggregate. No row windows, no driver state.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    if period % 2 != 1 or period < 3:
        raise ValueError(
            f"classical_decomposition: period must be odd >= 3 "
            f"(got {period})"
        )
    half = period // 2
    day = F.date_trunc("day", F.col(ts_col))
    daily = (
        df.filter(F.col(val_col).isNotNull())
        .groupBy(F.col(key_col), day.alias("__day"))
        .agg(F.sum(F.col(val_col).cast("decimal(18,4)")).alias("__s"))
        .select(
            key_col,
            F.datediff(
                F.col("__day").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("__dn"),
            _y4_quantized(
                F.col("__s"), "classical_decomposition: daily total"
            ).alias("__y4"),
        )
    )
    contrib = daily.select(
        F.col(key_col).alias("__k2"),
        F.explode(
            F.sequence(
                F.col("__dn") - F.lit(half), F.col("__dn") + F.lit(half)
            )
        ).alias("__t"),
        F.col("__y4").alias("__yc"),
    )
    sums = contrib.groupBy("__k2", "__t").agg(
        F.sum(F.col("__yc").cast("decimal(38,0)")).alias("__w"),
        F.count(F.lit(1)).alias("__cnt"),
    )
    base = daily.join(
        sums,
        (F.col(key_col) == F.col("__k2")) & (F.col("__dn") == F.col("__t")),
    ).select(
        F.col(key_col).alias("__k"),
        "__dn",
        "__y4",
        "__w",
        "__cnt",
    )
    complete = F.col("__cnt") == F.lit(period)
    detr = (
        F.lit(period).cast("decimal(38,0)") * F.col("__y4") - F.col("__w")
    )
    slot = F.pmod(F.col("__dn"), F.lit(period))
    per_slot = (
        base.filter(complete)
        .groupBy(F.col("__k"), slot.alias("__slot"))
        .agg(
            F.sum(detr).alias("__sd"),
            F.count(F.lit(1)).alias("__nd"),
        )
        .select(
            "__k",
            "__slot",
            (
                F.col("__sd").cast("double")
                / (
                    F.lit(float(period) * 10000.0)
                    * F.col("__nd").cast("double")
                )
            ).alias("__s_raw"),
        )
    )
    centers = per_slot.groupBy("__k").agg(
        (
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("__slot").alias("slot"),
                            F.col("__s_raw").alias("x"),
                        )
                    )
                ),
                F.lit(0.0),
                lambda acc, e: acc + e["x"],
            )
            / F.count(F.lit(1)).cast("double")
        ).alias("__mean_s")
    )
    # no broadcast hint: centers is one row per key — per-key tables
    # scale with key cardinality; let the optimizer choose (see
    # ljung_box note)
    seasonal = per_slot.join(centers, "__k").select(
        F.col("__k").alias("__k3"),
        "__slot",
        (F.col("__s_raw") - F.col("__mean_s")).alias("__seas"),
    )
    out = base.join(
        seasonal,
        (F.col("__k") == F.col("__k3"))
        & (F.pmod(F.col("__dn"), F.lit(period)) == F.col("__slot")),
        "left",
    )
    yv = F.col("__y4").cast("double") / F.lit(10000.0)
    tr = F.col("__w").cast("double") / F.lit(float(period) * 10000.0)
    return out.select(
        F.col("__k").alias(key_col),
        F.col("__dn").cast("int").alias("day_number"),
        round4_stable(yv).alias("y"),
        round4_stable(F.when(complete, tr)).alias("trend"),
        round4_stable(F.col("__seas")).alias("seasonal"),
        round4_stable(
            F.when(
                complete & F.col("__seas").isNotNull(),
                yv - tr - F.col("__seas"),
            )
        ).alias("remainder"),
    )
