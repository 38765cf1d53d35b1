"""Synthetic stream generator (reference ``stream_processing/producer.py``).

The reference runs a Python loop posting 1 JSON txn/sec to Kafka with
amount ~ Exp(scale=70), lat ~ N(38.5, 5.1), long ~ N(-90.2, 13.7), 983 card
keys (``producer.py:14,19-30,44``). Here the same distributions are column
expressions over Spark's rate source — no external broker needed for tests,
and swapping in ``format("kafka")`` is a one-line change on a cluster.

Inverse-CDF / Box-Muller via built-ins keeps generation JVM-side:
Exp(scale) = -scale * ln(U); randn() is already standard normal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NUM_KEYS = 983  # producer.py:14
AMOUNT_SCALE = 70.0  # producer.py:23
LAT_MEAN, LAT_STD = 38.5, 5.1  # producer.py:24
LON_MEAN, LON_STD = -90.2, 13.7  # producer.py:25


def synthetic_stream(
    spark: SparkSession, rows_per_second: int = 1, seed: int = 42
) -> DataFrame:
    """Streaming DataFrame of synthetic transactions (typed, event-time)."""
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    ).load()
    return _with_txn_columns(rate, seed)


def synthetic_batch(spark: SparkSession, num_rows: int, seed: int = 42) -> DataFrame:
    """Batch variant over spark.range for deterministic tests."""
    base = spark.range(num_rows).select(
        F.col("id").alias("value"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=F.col("id"))).alias(
            "timestamp"
        ),
    )
    return _with_txn_columns(base, seed)


def _with_txn_columns(df: DataFrame, seed: int) -> DataFrame:
    return df.select(
        F.concat(F.lit("txn_"), F.col("value").cast("string")).alias("txn_id"),
        (F.abs(F.hash(F.col("value").cast("string"), F.lit(seed))) % NUM_KEYS)
        .cast("long")
        .alias("cc_num"),
        (-F.lit(AMOUNT_SCALE) * F.log(F.rand(seed))).alias("amount"),
        (F.lit(LAT_MEAN) + F.lit(LAT_STD) * F.randn(seed + 1)).alias("lat"),
        (F.lit(LON_MEAN) + F.lit(LON_STD) * F.randn(seed + 2)).alias("long"),
        (F.lit(LAT_MEAN) + F.lit(LAT_STD) * F.randn(seed + 3)).alias("merch_lat"),
        (F.lit(LON_MEAN) + F.lit(LON_STD) * F.randn(seed + 4)).alias("merch_long"),
        F.col("timestamp").alias("event_time"),
    )
