"""Typed batch readers (reference S1-S4).

The reference reads its raw CSV with ``inferSchema=True`` (an extra full scan
and nondeterministic typing, ``batch_processing.py:21``) and re-reads Spark
output part-files with pandas glob+concat (``model/training.py:57-58``,
``insert_offline.py:18-21``). Here every format reads through one explicit
schema — no inference job, no driver-side concatenation (Spark unions a
directory of part files natively).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from feature_store_fraud_detection_spark.schemas import TRANSACTIONS_SCHEMA


def read_transactions_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType = TRANSACTIONS_SCHEMA,
    timestamp_format: str | None = None,
) -> DataFrame:
    """CSV scan with explicit schema (replaces reference S1's inferSchema).

    ``path`` may be a file, directory, or glob — a directory of part files is
    read as one DataFrame (replaces reference S3's pandas glob+concat).
    ``timestamp_format`` defaults to Spark's own (round-trips Spark-written
    CSV); the reference's raw dump uses "yyyy-MM-dd HH:mm:ss", which that
    default also parses.
    """
    reader = spark.read.option("header", True).schema(schema)
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan — the preferred storage format (columnar, predicate
    pushdown, column pruning; reference S2's CSV sink is replaced by parquet
    in sources/offline_store.py)."""
    return spark.read.parquet(path)


def read_json_lines(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Typed JSON-lines scan (batch twin of the streaming from_json ingest)."""
    return spark.read.schema(schema).json(path)
