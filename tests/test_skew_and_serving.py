"""Salted aggregates/joins (skew path) + FeatureServer facade + CSV reader."""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.operators.skew import (
    salted_join,
    salted_stats,
)
from feature_store_fraud_detection_spark.plans.batch_pipeline import (
    compute_features,
    events_as_transactions,
)
from feature_store_fraud_detection_spark.plans.serving import FeatureServer
from feature_store_fraud_detection_spark.schemas import load_table
from feature_store_fraud_detection_spark.sources.offline_store import OfflineStore
from feature_store_fraud_detection_spark.sources.readers import read_transactions_csv


def test_salted_stats_matches_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    salted = salted_stats(ev, "user_id", "value", num_salts=8)
    plain = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("value").alias("sum_v"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )
    j = salted.alias("s").join(plain.alias("p"), "user_id")
    assert j.count() == plain.count()
    assert (
        j.filter(
            (F.col("s.cnt") != F.col("p.cnt"))
            | (F.abs(F.col("s.sum_v") - F.col("p.sum_v")) > 1e-6)
            | (F.col("s.min_v") != F.col("p.min_v"))
            | (F.col("s.max_v") != F.col("p.max_v"))
        ).count()
        == 0
    )


def test_salted_join_matches_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("user_id").agg(F.avg("value").alias("dim_avg"))
    salted = salted_join(ev.select("event_id", "user_id"), dim, "user_id", num_salts=4)
    plain = ev.select("event_id", "user_id").join(dim, "user_id")
    assert salted.count() == plain.count()
    assert salted.join(plain, ["event_id", "user_id", "dim_avg"]).count() == plain.count()


def test_feature_server_routes(spark, sf_dir, tmp_path):
    feats = compute_features(
        events_as_transactions(load_table(spark, sf_dir, "events"))
    )
    store = OfflineStore(spark, str(tmp_path / "offline"))
    store.write(feats)
    srv = FeatureServer(spark, store)
    assert srv.features_by_key(3).count() == feats.filter(F.col("cc_num") == 3).count()
    rng = srv.features_by_date_range("2024-01-05", "2024-01-07")
    assert rng.count() > 0
    assert srv.bulk_features(limit=50).count() == 50


def test_csv_reader_roundtrip(spark, sf_dir, tmp_path):
    txns = events_as_transactions(load_table(spark, sf_dir, "events"))
    path = str(tmp_path / "txns_csv")
    txns.write.mode("overwrite").option("header", True).csv(path)
    back = read_transactions_csv(spark, path)
    assert back.count() == txns.count()
    assert [f.dataType for f in back.schema.fields] == [
        f.dataType for f in txns.schema.fields
    ]
    # values survive the round-trip (a bad timestampFormat nulls silently)
    assert back.filter(F.col("trans_date_trans_time").isNull()).count() == 0
    assert (
        back.agg(F.sum("amt")).first()[0] == txns.agg(F.sum("amt")).first()[0]
    )
