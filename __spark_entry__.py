"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship batch feature pipeline on sf0.001.
``queries()`` / ``oracle_sql()`` expose the full operator registry
(feature_store_fraud_detection_spark/plans/registry.py) for the driver's
DuckDB-oracle correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from feature_store_fraud_detection_spark.plans.batch_pipeline import (
    compute_features,
    events_as_transactions,
)
from feature_store_fraud_detection_spark.plans.registry import QUERIES
from feature_store_fraud_detection_spark.schemas import load_table


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    return compute_features(events_as_transactions(events))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted -> rows-only check)."""
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
