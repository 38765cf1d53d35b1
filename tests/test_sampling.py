"""Sampling/rebalancing/split operators: determinism and ratio properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.operators.sampling import (
    fraction_sample,
    label_filter,
    null_fill,
    rebalance_classes,
    train_test_split,
)
from feature_store_fraud_detection_spark.schemas import load_table


def test_fraction_sample_deterministic(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    a = fraction_sample(ev, 0.75, seed=42).count()
    b = fraction_sample(ev, 0.75, seed=42).count()
    assert a == b
    assert 0.6 * ev.count() < a < 0.9 * ev.count()


def test_rebalance_ratio(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "is_fraud", (F.col("event_type") == "error").cast("int")
    )
    out = rebalance_classes(ev, "is_fraud", positive_value=1, negative_ratio=2.0, seed=7)
    pos = out.filter(F.col("is_fraud") == 1).count()
    neg = out.filter(F.col("is_fraud") == 0).count()
    assert pos == ev.filter(F.col("is_fraud") == 1).count()  # all positives kept
    assert 1.0 < neg / pos < 3.0  # ~2:1 in expectation


def test_split_partitions_everything(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    train, test = train_test_split(ev, test_size=0.25, seed=42)
    assert train.count() + test.count() == ev.count()
    # no overlap
    assert train.join(test, "event_id", "inner").count() == 0


def test_label_filter_and_null_fill(spark):
    df = spark.createDataFrame(
        [(1, None), (0, 2.0)], "is_fraud int, merch_zipcode double"
    )
    assert label_filter(df, "is_fraud", 1).count() == 1
    filled = null_fill(df, {"merch_zipcode": -1.0})
    assert filled.filter(F.col("merch_zipcode") == -1.0).count() == 1
