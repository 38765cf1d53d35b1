"""Serving-surface relational operators.

The reference serves features through FastAPI routes backed by Prisma/Postgres
and Redis loops (``back_end/app/routes/feature.py``). Each access pattern is
re-expressed as a DataFrame query so it runs in-engine, distributed, with
Catalyst pushdown instead of per-row Python:

- point lookup (P4, ``feature.py:73-75``)
- date-range scan with day bounds (P5, ``feature.py:92-103``)
- bulk export with limit (P8, ``feature.py:111,139-140``)
- stats ⋈ latest-txn join (J3, ``feature.py:117-137``) — broadcast hash join
  instead of a Python Redis scan loop
- offline→online semi-join sync (J4, ``feature.py:189-220``) — one MERGE-style
  join instead of per-key GET/HSET
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.operators.windows import latest_n_per_key


def point_lookup(df: DataFrame, key: str, value) -> DataFrame:
    """All rows for one key (reference P4). Equality predicate pushes into the
    parquet scan (row-group stats + dictionary filters)."""
    return df.filter(F.col(key) == F.lit(value))


def range_scan(df: DataFrame, ts: str, start_date: str, end_date: str) -> DataFrame:
    """Rows within [start_date 00:00:00, end_date 23:59:59.999999] — the
    reference's day-bound semantics (``feature.py:92-103``, P5)."""
    lo = f"{start_date} 00:00:00"
    hi = f"{end_date} 23:59:59.999999"
    return df.filter(F.col(ts).between(F.lit(lo).cast("timestamp"), F.lit(hi).cast("timestamp")))


def bulk_export(df: DataFrame, order_by: str, limit: int = 100_000) -> DataFrame:
    """Deterministic bulk export (reference P8 caps the Redis scan at
    ``limit``). Ordered by a unique column so the result set is stable; Spark
    plans this as TakeOrderedAndProject (no full sort materialization)."""
    return df.orderBy(order_by).limit(limit)


def stats_with_latest(
    events: DataFrame, key: str, ts: str, value: str, tiebreak: str
) -> DataFrame:
    """Per-key stats joined with each key's most recent row (reference J3 +
    W5: Redis ``txn:*:stats`` scan + ``ZREVRANGE 0 0`` + hash fetch, done as a
    Python nested loop in ``feature.py:117-137``).

    Here: one aggregate + one broadcast-able equi-join. The aggregated side is
    |keys| rows — tiny relative to events — so we broadcast it explicitly.
    """
    # avg through a DECIMAL sum (double summation is order-dependent; the
    # raw value column is 2-decimal money, so the cast is exact), then
    # floor-based rounding: Spark round() rounds the shortest decimal repr
    # while DuckDB rounds the binary value, and quotients can land exactly
    # on a half (both divergences observed at sf0.1). floor(x*1e4+0.5)/1e4
    # is bit-identical double arithmetic on both engines (positive values).
    avg_q = F.sum(F.col(value).cast("decimal(18,2)")).cast("double") / F.count(
        F.lit(1)
    )
    stats = events.groupBy(key).agg(
        F.count(F.lit(1)).alias("txn_count"),
        (F.floor(avg_q * 10000 + F.lit(0.5)) / F.lit(10000.0)).alias("avg_value"),
    )
    latest = latest_n_per_key(events, key, ts, n=1, tiebreak=tiebreak).select(
        F.col(key),
        F.col(ts).alias("latest_ts"),
        F.col(value).alias("latest_value"),
    )
    return F.broadcast(stats).join(latest, key, "inner")


def sync_offline_to_online(
    online: DataFrame, offline: DataFrame, key: str, static_cols: list[str]
) -> DataFrame:
    """Overwrite static columns of online rows from the offline store for keys
    present in both (reference J4, ``feature.py:189-220``: per-row Python loop
    over Postgres rows + Redis existence check).

    MERGE-style: inner join on key, offline side wins for ``static_cols``,
    online rows without an offline match pass through unchanged. One shuffle
    (or zero if the offline side broadcasts).
    """
    offline_sel = offline.select(key, *static_cols)
    renamed = offline_sel.select(
        F.col(key), *[F.col(c).alias(f"__off_{c}") for c in static_cols]
    )
    joined = online.join(renamed, key, "left")
    out = joined
    for c in static_cols:
        out = out.withColumn(c, F.coalesce(F.col(f"__off_{c}"), F.col(c)))
    return out.drop(*[f"__off_{c}" for c in static_cols])
