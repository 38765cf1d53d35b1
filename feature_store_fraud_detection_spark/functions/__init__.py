"""Shared scalar feature expressions — the single source of truth used by the
batch pipeline, the streaming pipeline, and serving (the reference implements
every feature three divergent times: Spark / Flink / pandas)."""

from feature_store_fraud_detection_spark.functions.features import (
    age_at_txn,
    day_of_week,
    hour_of_day,
    threshold_label,
    unix_time,
)
from feature_store_fraud_detection_spark.functions.geo import haversine_miles

__all__ = [
    "age_at_txn",
    "day_of_week",
    "haversine_miles",
    "hour_of_day",
    "threshold_label",
    "unix_time",
]
