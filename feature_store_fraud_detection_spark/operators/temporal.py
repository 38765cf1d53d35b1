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
    usec = F.lit(1_000_000 * bucket_sec)
    ev = events.withColumn(
        "__bucket", (F.unix_micros(F.col(ts)) / usec).cast("bigint")
    )
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.unix_micros(F.col(start)) / usec).cast("bigint"),
                # end is exclusive: a zero-length tail bucket is still
                # generated (harmless; the exact predicate drops misses)
                (F.unix_micros(F.col(end)) / usec).cast("bigint"),
            )
        ),
    )
    joined = ev.join(iv, [key, "__bucket"]).filter(
        (F.col(start) <= F.col(ts)) & (F.col(ts) < F.col(end))
    )
    return joined.drop("__bucket")
