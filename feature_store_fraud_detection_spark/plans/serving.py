"""FeatureServer — the engine-native serving facade.

The reference serves features over FastAPI routes (``back_end/app/routes/
feature.py``) that loop in Python over Prisma/Redis. Here the same access
patterns are DataFrame queries against the offline/online stores; an API
layer (if one is wanted) becomes a thin shim over these, with the engine
doing all data work (SURVEY §7 architecture table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from feature_store_fraud_detection_spark.operators.relational import (
    stats_with_latest,
    sync_offline_to_online,
)
from feature_store_fraud_detection_spark.sources.offline_store import OfflineStore


class FeatureServer:
    """Point/range/bulk/latest-N serving over an OfflineStore plus an
    optional keyed online-state DataFrame."""

    def __init__(
        self,
        spark: SparkSession,
        offline: OfflineStore,
        key_col: str = "cc_num",
        ts_col: str = "feature_timestamp",
    ):
        self.spark = spark
        self.offline = offline
        self.key_col = key_col
        self.ts_col = ts_col
        self.online: DataFrame | None = None

    # reference GET /features/by-ccnum/{cc} (feature.py:70-80)
    def features_by_key(self, key_value) -> DataFrame:
        return self.offline.by_key(self.key_col, key_value)

    # reference GET /features/by-date-range (feature.py:83-107)
    def features_by_date_range(self, start_date: str, end_date: str) -> DataFrame:
        return self.offline.by_date_range(start_date, end_date)

    # reference GET /redis/transactions/bulk (feature.py:110-142)
    def bulk_features(self, limit: int = 100_000) -> DataFrame:
        return self.offline.bulk(self.key_col, limit)

    # reference Redis stats+latest loop (feature.py:117-137, J3+W5)
    def online_stats(self, events: DataFrame, ts: str, value: str, tiebreak: str) -> DataFrame:
        return stats_with_latest(events, self.key_col, ts, value, tiebreak)

    # reference POST /redis/sync-features (feature.py:189-220, J4)
    def sync_online(self, static_cols: list[str]) -> DataFrame:
        if self.online is None:
            raise ValueError("no online state attached")
        return sync_offline_to_online(
            self.online, self.offline.read(), self.key_col, static_cols
        )
