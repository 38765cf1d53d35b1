"""Online feature store: keyed latest-state table.

Replaces the reference's Redis online store (hashes ``txn:{cc}:stats`` /
``txn:{cc}:data:{id}`` + ZSET timeline, ``redis_writer.py:17-44``) with an
engine-native keyed table:

- state = one row per key (latest by event time);
- upsert = MERGE-style union + latest-per-key, used by the streaming job's
  foreachBatch (streaming/pipeline.py);
- TTL (Redis EXPIRE 86400, ``redis_writer.py:25,38``) = retention filter on
  event time — state older than (max event time - retention) drops out on
  the next upsert; event-time-driven, so deterministic and replayable.

Storage is a parquet/in-memory DataFrame snapshot; on a cluster the same
MERGE pattern targets a Delta/Iceberg table (not available in this
container, so the snapshot form keeps it runnable everywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.operators.windows import latest_n_per_key


def upsert_latest_state(
    current: DataFrame | None,
    batch: DataFrame,
    key: str,
    ts: str,
    retention_seconds: int | None = 86_400,
) -> DataFrame:
    """Merge a micro-batch of per-key rows into the keyed state table.

    Latest row per key wins (by ``ts``). The per-key reduction is one hash
    shuffle on the key; the retention horizon is a scalar aggregate (cheap,
    partial-agg'd) evaluated per upsert, not a global window funnel.
    """
    unioned = batch if current is None else current.unionByName(batch)
    latest = latest_n_per_key(unioned, key, ts, n=1).drop("rn")
    if retention_seconds is not None:
        horizon_row = unioned.agg(F.max(F.col(ts)).alias("m")).first()
        if horizon_row is not None and horizon_row["m"] is not None:
            latest = latest.filter(
                F.col(ts)
                >= F.lit(horizon_row["m"])
                - F.expr(f"INTERVAL {retention_seconds} SECONDS")
            )
    return latest
