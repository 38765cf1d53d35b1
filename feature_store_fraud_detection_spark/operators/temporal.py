"""Point-in-time (as-of) and interval joins — the temporal-correctness core
of a feature store.

The reference serves "latest state at request time" online
(``redis_writer.py`` upsert + ``main.py`` lookup); the OFFLINE twin of that
contract is the point-in-time join: for every labeled event, attach the
feature values as they stood AT OR BEFORE the event's timestamp — never
after, or the training set leaks the future. The reference builds training
frames with pandas sort + global windows (``batch_processing.py``); here the
same semantics are expressed as ONE Spark shuffle with no join operator at
all.

Scale design (100 TB):
- :func:`asof_join` is union + single window carry-forward: both tables
  hash-shuffle ONCE on the key, sort once per partition, and a running
  ``last(..., ignoreNulls)`` propagates the newest feature struct to each
  event row. No join → no build side, no skew-prone probe, no range
  explosion. A sort-merge as-of join would shuffle the same bytes but add a
  second operator; the window form also pipelines into downstream
  per-key work without re-shuffling.
- The feature payload rides in ONE struct column, so K feature columns cost
  one window expression, not K.
- Hot keys: same profile as any per-key window — pre-bucket upstream
  (``sources/offline_store.write_bucketed``) if a single key's history
  exceeds a partition.
- :func:`interval_join` avoids the O(|events| x |intervals|) cross product
  by equi-joining on (key, coarse time bucket) after exploding each
  interval into the buckets it overlaps — the classic range-bucketing
  trick. Bucket width should be chosen near the median interval length;
  each event then meets only intervals sharing its bucket.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    events: DataFrame,
    features: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tiebreak: str | None = None,
    tolerance_sec: int | None = None,
) -> DataFrame:
    """Backward as-of join: each event row gains the newest feature row with
    ``feature.ts <= event.ts`` (inclusive), per key — left-join semantics
    (no prior feature → nulls). Output adds ``value_cols`` plus
    ``asof_ts`` (the matched feature timestamp) and ``asof_age_us``
    (event ts − feature ts in exact integer microseconds).

    ``tiebreak`` (strongly recommended) makes the match deterministic when
    one key has several feature rows at the same timestamp: the row with
    the greatest tiebreak wins. (ts, tiebreak) should totally order the
    feature rows within a key.

    ``tolerance_sec`` bounds staleness: a match older than the tolerance is
    discarded (nulls), the offline twin of an online-store TTL.

    ``value_cols`` land on the output under their own names — alias them on
    the ``features`` side first if the events table has colliding columns.
    ``tiebreak`` must be a ``features`` column; it is read from ``events``
    too when present (only to fix an arbitrary-but-stable sort among
    simultaneous events — event order never affects the carried value).

    Implementation: tag each source, union, then ONE window
    ``last(feature_struct, ignoreNulls=True)`` over
    ``partitionBy(key).orderBy(ts, side, tiebreak)`` with a ROWS frame —
    features sort before events at equal ts, so "at or before" is
    inclusive. Single shuffle, no join operator (see module scale notes).
    """
    f = features.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__tb"),
        F.struct(
            F.col(right_ts).alias("asof_ts"),
            *[F.col(c) for c in value_cols],
        ).alias("__payload"),
    )
    if tiebreak and tiebreak in events.columns:
        e_tb = F.col(tiebreak)
    elif tiebreak:
        e_tb = F.lit(None).cast(features.schema[tiebreak].dataType)
    else:
        e_tb = F.lit(0)
    e = (
        events.withColumn("__ts", F.col(left_ts))
        .withColumn("__side", F.lit(1))
        .withColumn("__tb", e_tb)
    )
    unioned = e.unionByName(f, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__side", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__carry", F.last(F.col("__payload"), ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == 1)
    if tolerance_sec is not None:
        fresh = (
            F.unix_micros(F.col(left_ts))
            - F.unix_micros(F.col("__carry.asof_ts"))
        ) <= F.lit(int(tolerance_sec) * 1_000_000)
        out = out.withColumn(
            "__carry", F.when(fresh, F.col("__carry"))
        )
    out = out.withColumn("asof_ts", F.col("__carry.asof_ts")).withColumn(
        "asof_age_us",
        F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col("asof_ts")),
    )
    for c in value_cols:
        out = out.withColumn(c, F.col(f"__carry.{c}"))
    return out.drop("__ts", "__side", "__tb", "__payload", "__carry")


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    key: str,
    ts: str,
    start: str,
    end: str,
    bucket_sec: int,
) -> DataFrame:
    """Inner join of events to the intervals containing them
    (``start <= ts < end``, same key), without a cross product.

    Both sides map each row to coarse ``bucket_sec``-wide time buckets —
    an interval explodes into every bucket it overlaps, an event into
    exactly one — then an equi-join on (key, bucket) meets only
    bucket-local candidates and the exact containment predicate filters.
    Equivalent to ``events JOIN intervals ON key AND ts BETWEEN``, but the
    shuffle is on (key, bucket): bounded fan-out, prunable, skew-safe as
    long as bucket_sec is within ~100x of the median interval length.
    """
    # exact integer division (`div`), never floor(a/b) on doubles — at
    # epoch-microsecond magnitudes the double quotient can land one ulp
    # under an exact boundary and truncate into the previous bucket
    usec = 1_000_000 * int(bucket_sec)
    ev = events.withColumn("__bucket", F.expr(f"unix_micros({ts}) div {usec}"))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros({start}) div {usec}"),
                # end is exclusive: a zero-length tail bucket is still
                # generated (harmless; the exact predicate drops misses)
                F.expr(f"unix_micros({end}) div {usec}"),
            )
        ),
    )
    joined = ev.join(iv, [key, "__bucket"]).filter(
        (F.col(start) <= F.col(ts)) & (F.col(ts) < F.col(end))
    )
    return joined.drop("__bucket")


def resample_carry_forward(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    bucket_sec: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Resample an event series to a regular ``bucket_sec`` grid per key,
    gap-filling missing buckets by carrying the last observed value forward
    — the materialization step that turns an irregular transaction log into
    the fixed-cadence feature series a model trainer consumes.

    Output: (key, bucket, value, observed) — ``bucket`` is the integer
    epoch bucket (``epoch_us div (bucket_sec * 1e6)``, exact integer
    division on both engines — a double ``floor(a/b)`` could misbucket near
    boundaries at large epochs), ``observed`` is False for gap-filled rows.

    Scale: events first compact to one row per (key, bucket) — the ONLY
    shuffle proportional to input size; the grid explode and carry-forward
    window run on the compacted series (|keys| x |buckets|). Dense grids
    (years of seconds) should raise bucket_sec rather than explode.
    """
    usec = int(bucket_sec) * 1_000_000
    bucket = F.expr(f"unix_micros({ts}) div {usec}")
    order = (
        [F.col(ts), F.col(tiebreak)] if tiebreak else [F.col(ts)]
    )
    per_bucket = (
        df.withColumn("__b", bucket)
        .groupBy(key, "__b")
        .agg(
            F.max_by(F.col(value_col), F.struct(*order)).alias("__v"),
        )
    )
    grid = (
        per_bucket.groupBy(key)
        .agg(F.min("__b").alias("__b0"), F.max("__b").alias("__b1"))
        .select(
            F.col(key),
            F.explode(F.sequence("__b0", "__b1")).alias("__b"),
        )
    )
    joined = grid.join(per_bucket, [key, "__b"], "left").withColumn(
        "observed", F.col("__v").isNotNull()
    )
    w = (
        Window.partitionBy(key)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col(key),
        F.col("__b").alias("bucket"),
        F.last(F.col("__v"), ignorenulls=True).over(w).alias("value"),
        "observed",
    )


def scd2_intervals(
    df: DataFrame,
    key: str,
    ts: str,
    value_cols: Sequence[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Materialize an event log as slowly-changing-dimension type-2
    history: one validity interval per state write, ``valid_from`` = the
    write's timestamp, ``valid_to`` = the next write's timestamp for the
    key (null while current). The interval form is what the as-of join
    consumes when features live in a dimension table instead of a log.

    Duplicate (key, ts) writes collapse to the max-``tiebreak`` row first —
    the same total-order convention as :func:`asof_join`, so
    ``asof_join(events, log) == interval lookup on scd2_intervals(log)``.

    One shuffle on the key; the dedupe and the ``lead`` share the same
    partitioning and sort.
    """
    from pyspark.sql import Window as W

    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    wd = W.partitionBy(key, ts).orderBy(
        *[c.desc() for c in ([F.col(tiebreak)] if tiebreak else [F.lit(0)])]
    )
    deduped = (
        df.withColumn("__rn", F.row_number().over(wd))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    wl = W.partitionBy(key).orderBy(*order)
    return deduped.select(
        F.col(key),
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(wl).alias("valid_to"),
        *[F.col(c) for c in value_cols],
    ).withColumn("is_current", F.col("valid_to").isNull())


def duplicate_transactions(
    df: DataFrame,
    key_col: str,
    id_col: str,
    ts_col: str,
    value_col: str,
    window_sec: int = 600,
) -> DataFrame:
    """Near-duplicate transaction pairs: same key, identical value, within
    ``window_sec`` — the classic double-charge / replay-fraud detector.

    Blocked self-join, the 1-D time analogue of ``spatial.proximity_pairs``:
    rows snap to time buckets of width ``window_sec``; any qualifying pair
    lies in the same or an adjacent bucket, so side A expands to its
    3-bucket cover (bounded x3 fan-out) and equi-joins side B's own bucket
    on (key, value, bucket) — each pair met exactly once (B's bucket occurs
    once in A's cover), then the exact |dt| <= window filter verifies.

    Scale: a naive same-key self-join is quadratic per key; here the join
    key (key, value, bucket) bounds candidates to one window-width of one
    key at one value — shuffle is 3x|rows| cover + |rows|, never |key|^2.
    """
    base = df.select(
        F.col(key_col).alias("__k"),
        F.col(id_col).alias("__id"),
        F.col(ts_col).alias("__ts"),
        F.col(value_col).alias("__v"),
        F.floor(F.unix_timestamp(ts_col) / window_sec).alias("__b"),
    )
    cover = base.select(
        F.col("__k"),
        F.col("__id").alias("id_a"),
        F.col("__ts").alias("__ts_a"),
        F.col("__v"),
        F.explode(
            F.array(F.col("__b") - 1, F.col("__b"), F.col("__b") + 1)
        ).alias("__b"),
    )
    other = base.select(
        F.col("__k"),
        F.col("__id").alias("id_b"),
        F.col("__ts").alias("__ts_b"),
        F.col("__v"),
        F.col("__b"),
    )
    return (
        cover.join(other, ["__k", "__v", "__b"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.abs(
                    F.unix_timestamp("__ts_a") - F.unix_timestamp("__ts_b")
                )
                <= window_sec
            )
        )
        .select(
            F.col("__k").alias(key_col),
            "id_a",
            "id_b",
            F.col("__v").alias(value_col),
            F.abs(
                F.unix_timestamp("__ts_a") - F.unix_timestamp("__ts_b")
            ).cast("int").alias("gap_sec"),
        )
        .distinct()
    )


def seasonal_baseline_anomalies(
    base: DataFrame,
    curr: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Seasonal-profile anomaly counts: per (group, hour-of-day), the
    baseline window's mean/std (exact-DECIMAL sums, one double division at
    the end — the ``summary_stats`` money-math rule) scores the current
    window's rows; a row is anomalous when its 4-decimal-rounded |z|
    exceeds ``z_threshold`` (rounded-before-compare so the flag is
    bit-reproducible cross-engine).

    Scale: two scans reduce to a (group x 24)-row profile that broadcasts
    back onto the current side — no window functions, no self-joins; the
    per-row z is a narrow projection against the broadcast profile.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        overflow_checked,
        round4_stable,
    )

    hour = lambda c: F.hour(F.col(c))  # noqa: E731
    dec = overflow_checked(
        F.col(value_col), 1e12, "seasonal_baseline_anomalies"
    ).cast("decimal(18,6)")
    prof = (
        base.groupBy(
            F.col(group_col), hour(ts_col).alias("hour_of_day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_base"),
            F.sum(dec).alias("__s"),
            F.sum((dec * dec).cast("decimal(38,12)")).alias("__s2"),
        )
        .withColumn(
            "__mean", F.col("__s").cast("double") / F.col("n_base")
        )
        .withColumn(
            "__std",
            # guarded: a single-row baseline cell has no sample std (the
            # (n-1) division would be /0 under ANSI); NULL std scores no
            # anomalies for that cell
            F.when(
                F.col("n_base") > 1,
                F.sqrt(
                    (
                        F.col("__s2").cast("double")
                        - F.col("__s").cast("double")
                        * F.col("__s").cast("double")
                        / F.col("n_base")
                    )
                    / (F.col("n_base") - 1)
                ),
            ),
        )
    )
    scored = curr.select(
        F.col(group_col), hour(ts_col).alias("hour_of_day"), F.col(value_col)
    ).join(
        F.broadcast(prof.select(group_col, "hour_of_day", "n_base", "__mean", "__std")),
        [group_col, "hour_of_day"],
    )
    # z only where a positive std exists (lazy branch guards the division;
    # a zero/NULL std cell — constant or single-row baseline — flags none)
    anomaly = F.when(
        F.col("__std") > 0,
        (
            round4_stable(
                F.abs((F.col(value_col) - F.col("__mean")) / F.col("__std"))
            )
            > z_threshold
        ).cast("long"),
    ).otherwise(F.lit(0))
    return (
        scored.groupBy(group_col, "hour_of_day")
        .agg(
            F.max("n_base").alias("n_base"),
            F.count(F.lit(1)).alias("n_curr"),
            F.sum(anomaly).alias("n_anomalies"),
        )
    )
