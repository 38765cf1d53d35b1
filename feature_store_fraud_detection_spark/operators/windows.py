"""Windowed operators — the heart of the reference.

Covers: trailing range-frame aggregates (W1/W2), latest-N per key (W5/W6),
and event-time sliding windows (batch twin of the streaming W3/W4).

Scale notes (100 TB):
- Every partitionBy(key) window is ONE hash shuffle on the key + per-partition
  sort; Spark's WindowExec evaluates trailing range frames in a single running
  pass (no O(n^2)). Hot keys are the risk — AQE skew handling covers joins but
  not windows, so extremely hot keys should be pre-bucketed upstream
  (see sources/offline_store bucketing) or handled with a two-level
  aggregate; with the reference's 983-cards key space at 1.3M rows/key-max
  this stays comfortably in-memory per partition.
- latest-N uses row_number + filter, which Spark >= 3.5 rewrites into a
  WindowGroupLimit (per-partition top-N pushdown before the final sort) —
  confirmed in the physical plan, see tests/test_windows.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.functions.features import unix_time


def trailing_range_aggs(
    df: DataFrame,
    key: str,
    ts: str,
    aggs: Sequence[tuple[Column, int, str]],
) -> DataFrame:
    """Add trailing event-time range-window aggregates.

    ``aggs``: (aggregate expression, trailing_seconds, output name) triples —
    e.g. ``(F.count("*"), 600, "txn_count_last_10_min")`` reproduces reference
    W1 (``batch_processing.py:41,44``) and ``(F.avg("amt"), 3600,
    "avg_amt_last_1_hour")`` W2 (``:42,45``).

    RANGE (not ROWS) frame over long seconds: all rows with equal timestamp
    are included together (SURVEY §7 trap 2). All frames share one
    partitionBy(key).orderBy(unix seconds) — Catalyst plans a single
    shuffle+sort reused by every frame.
    """
    df = df.withColumn("__unix_ts", unix_time(ts))
    out = df
    for agg_expr, seconds, name in aggs:
        w = (
            Window.partitionBy(key)
            .orderBy("__unix_ts")
            .rangeBetween(-seconds, Window.currentRow)
        )
        out = out.withColumn(name, agg_expr.over(w))
    return out.drop("__unix_ts")


def latest_n_per_key(
    df: DataFrame,
    key: str,
    ts: str,
    n: int = 1,
    tiebreak: str | None = None,
) -> DataFrame:
    """Most recent N rows per key (reference W5/W6: Redis
    ``ZREVRANGE timeline 0 n-1``, ``app/routes/feature.py:126-131,164-171``).

    Adds ``rn`` (1 = newest). ``tiebreak`` column makes ordering total when
    timestamps tie (the Redis ZSET breaks score ties lexically by member; a
    total order keeps results deterministic for the oracle).
    """
    order = [F.col(ts).desc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).desc())
    w = Window.partitionBy(key).orderBy(*order)
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= n)


def rolling_rows_aggs(
    df: DataFrame,
    key: str,
    order_cols: Sequence[str],
    aggs: Sequence[tuple[Column, int, str]],
) -> DataFrame:
    """Trailing ROWS-frame aggregates (last-N-rows, vs the RANGE frames of
    trailing_range_aggs): e.g. mean of the last 5 transactions regardless of
    their spacing. ``order_cols`` must define a total order per key
    (timestamp + unique tiebreak) or the frame contents are nondeterministic.
    """
    out = df
    for agg_expr, n_rows, name in aggs:
        w = (
            Window.partitionBy(key)
            .orderBy(*order_cols)
            .rowsBetween(-(n_rows - 1), Window.currentRow)
        )
        out = out.withColumn(name, agg_expr.over(w))
    return out


def inter_event_gaps(
    df: DataFrame, key: str, ts: str, tiebreak: str
) -> DataFrame:
    """Seconds since the previous event per key (lag) and until the next
    (lead) — the classic recency features a fraud model wants next to the
    trailing counts. Null at partition edges (first/last event)."""
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    ts_s = unix_time(ts)
    return df.withColumn(
        "secs_since_prev", ts_s - F.lag(ts_s).over(w)
    ).withColumn("secs_until_next", F.lead(ts_s).over(w) - ts_s)


def session_window_aggs(
    df: DataFrame,
    key: str,
    ts: str,
    gap: str,
    aggs: Sequence[Column],
) -> DataFrame:
    """Sessionization: group each key's events into sessions separated by
    >= ``gap`` of inactivity (``F.session_window`` — dynamic, data-driven
    windows; works identically on batch and streams). Returns
    (session_start, session_end, key, *aggs) where session_end = last event
    + gap (Spark's convention)."""
    agged = df.groupBy(F.session_window(ts, gap), F.col(key)).agg(*aggs)
    agg_names = [c for c in agged.columns if c not in ("session_window", key)]
    return agged.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        F.col(key),
        *[F.col(c) for c in agg_names],
    )


def sliding_window_aggs(
    df: DataFrame,
    key: str,
    ts: str,
    window_duration: str,
    slide_duration: str,
    aggs: Sequence[Column],
) -> DataFrame:
    """Event-time sliding-window aggregate (batch twin of streaming W3/W4).

    The reference's Flink job uses sliding *processing-time* windows despite
    configuring event-time watermarks (``pipeline.py:26,46-49,61,66`` — the
    watermarks are dead; SURVEY §2.9 T1). The canonical re-design is
    event-time: ``groupBy(window(ts, size, slide), key)``. Same code path runs
    in Structured Streaming with a watermark (streaming/pipeline.py).

    Returns (window_start, window_end, key, *aggs).
    """
    agged = df.groupBy(F.window(ts, window_duration, slide_duration), F.col(key)).agg(
        *aggs
    )
    agg_names = [c for c in agged.columns if c not in ("window", key)]
    return agged.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        F.col(key),
        *[F.col(c) for c in agg_names],
    )
