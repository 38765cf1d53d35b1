"""The flagship batch feature pipeline.

Re-expresses the reference's whole batch path (``back_end/feature_store/
batch_processing.py:14-52``) as one declarative DataFrame plan:

raw transactions -> typed parse (F1) -> derived scalars (F2-F6) -> trailing
range-window aggregates per card (W1/W2) -> 13-column feature projection.

One Catalyst plan, one shuffle (the window partitionBy), zero Python UDFs.
The reference's downstream CSV -> HTTP -> per-row Postgres INSERT chain
(``insert_offline.py``, ``app/routes/feature.py:28-49``) collapses into a
bulk partitioned-parquet write (sources/offline_store.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.functions.features import (
    age_at_txn,
    day_of_week,
    hour_of_day,
    unix_time,
)
from feature_store_fraud_detection_spark.functions.geo import haversine_miles
from feature_store_fraud_detection_spark.functions.numeric import overflow_checked
from feature_store_fraud_detection_spark.operators.windows import trailing_range_aggs

FEATURE_COLUMNS = [
    "cc_num",
    "amt",
    "hour_of_day",
    "day_of_week",
    "age_at_txn",
    "distance_to_merchant",
    "txn_count_last_10_min",
    "avg_amt_last_1_hour",
    "category",
    "gender",
    "city_pop",
    "feature_timestamp",
    "is_fraud",
]


def compute_features(txns: DataFrame) -> DataFrame:
    """Transactions (TRANSACTIONS_SCHEMA, timestamps already typed) ->
    feature table (FEATURES_SCHEMA). Mirrors ``batch_processing.py:24-48``."""
    df = (
        txns.withColumn("unix_time", unix_time("trans_date_trans_time"))
        .withColumn("hour_of_day", hour_of_day("trans_date_trans_time"))
        .withColumn("day_of_week", day_of_week("trans_date_trans_time"))
        .withColumn("age_at_txn", age_at_txn("trans_date_trans_time", "dob"))
        .withColumn(
            "distance_to_merchant",
            haversine_miles("lat", "long", "merch_lat", "merch_long"),
        )
    )
    # avg as DECIMAL-exact windowed sum / count (amt is 2-decimal money, so
    # the cast is exact): a plain avg(double) over the frame depends on
    # summation order, so its low bits vary with partitioning/engine — this
    # form is bit-stable, which the cross-engine oracle requires. All three
    # frames share one (cc_num, unix_time) sort -> still ONE Window node.
    df = trailing_range_aggs(
        df,
        key="cc_num",
        ts="trans_date_trans_time",
        aggs=[
            (F.count(F.lit(1)), 600, "txn_count_last_10_min"),
            # |amt| < 1e12 is the DECIMAL(14,2) domain; beyond it the
            # cast ANSI-aborts with an unnamed error, so make the
            # contract loud (bigvals probe, round 12)
            (
                F.sum(
                    overflow_checked(
                        F.col("amt"), 1e12, "compute_features: amt"
                    ).cast("decimal(14,2)")
                ),
                3600,
                "__amt_sum_1h",
            ),
            (F.count("amt"), 3600, "__amt_cnt_1h"),
        ],
    ).withColumn(
        "avg_amt_last_1_hour",
        F.col("__amt_sum_1h").cast("double") / F.col("__amt_cnt_1h"),
    )
    return df.withColumn("feature_timestamp", F.col("trans_date_trans_time")).select(
        *FEATURE_COLUMNS
    )


def events_as_transactions(events: DataFrame) -> DataFrame:
    """Adapt the driver's ``events`` table to the transactions shape
    (FIXTURES.md §4 mapping: user_id->cc_num, value->amt, ts->timestamp,
    event_type->category). Coordinates and dob are synthesized
    deterministically from event_id/user_id so F5/F6 stay exercised without
    random state (reproducible for the DuckDB oracle).
    """
    return events.select(
        F.col("ts").alias("trans_date_trans_time"),
        F.col("user_id").alias("cc_num"),
        F.lit(None).cast("string").alias("merchant"),
        F.col("event_type").alias("category"),
        F.col("value").alias("amt"),
        F.when(F.col("user_id") % 2 == 0, F.lit("M")).otherwise(F.lit("F")).alias("gender"),
        # synthetic-but-deterministic coordinates in plausible ranges
        (F.lit(30.0) + (F.col("event_id") % 1000) / F.lit(100.0)).alias("lat"),
        (F.lit(-100.0) + (F.col("event_id") % 2000) / F.lit(100.0)).alias("long"),
        (F.col("user_id") * 1000 + 10000).cast("long").alias("city_pop"),
        # dob = fixed epoch + user_id years-ish offset; deterministic
        F.to_timestamp(
            F.concat(
                (F.lit(1960) + F.col("user_id") % 40).cast("string"),
                F.lit("-01-15 00:00:00"),
            )
        ).alias("dob"),
        F.col("event_id").cast("string").alias("trans_num"),
        (F.lit(30.0) + (F.col("user_id") % 1000) / F.lit(50.0)).alias("merch_lat"),
        (F.lit(-100.0) + (F.col("user_id") % 2000) / F.lit(50.0)).alias("merch_long"),
        (F.col("event_type") == F.lit("error")).cast("int").alias("is_fraud"),
        F.lit(None).cast("double").alias("merch_zipcode"),
    )
