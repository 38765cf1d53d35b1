"""IVF ANN variant + predict_batch_udf MLP scoring path."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.ml.torch_scoring import (
    forward,
    init_weights,
    score_dataframe,
)
from feature_store_fraud_detection_spark.operators.similarity import ivf_topk
from feature_store_fraud_detection_spark.plans.batch_pipeline import (
    compute_features,
    events_as_transactions,
)
from feature_store_fraud_detection_spark.schemas import load_table


def test_ivf_topk_finds_identical_vector(spark):
    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 16)]) for i in range(2, 60)]
    base = rows[5][1]
    rows = [(0, base), (1, list(base))] + rows  # 0 and 1 identical
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = ivf_topk(df, "vec_id", "embedding", query_max_id=1, top_k=3,
                   num_clusters=4, n_probe=2)
    by_rank = {r.rank: r for r in out.collect()}
    # the identical vector lands in the same cluster -> rank 1, cosine 1.0
    assert by_rank[1].neighbor_id == 1
    assert by_rank[1].cosine == 1.0


def test_predict_batch_udf_scoring(spark, sf_dir):
    feats = compute_features(
        events_as_transactions(load_table(spark, sf_dir, "events"))
    ).na.fill(0)
    cols = [
        "amt", "hour_of_day", "day_of_week", "age_at_txn",
        "distance_to_merchant", "txn_count_last_10_min",
        "avg_amt_last_1_hour", "city_pop",
    ]
    scored = score_dataframe(feats, cols)
    rows = scored.select("cc_num", "fraud_prob").collect()
    assert len(rows) == feats.count()
    assert all(0.0 <= r.fraud_prob <= 1.0 for r in rows)
    # distributed result matches a local numpy forward pass exactly
    w = init_weights(n_features=len(cols))
    sample = feats.orderBy("cc_num", "feature_timestamp").limit(5).collect()
    x = np.array([[float(getattr(r, c)) for c in cols] for r in sample])
    local = forward(x, w)
    got = (
        scored.orderBy("cc_num", "feature_timestamp")
        .limit(5)
        .select("fraud_prob")
        .collect()
    )
    assert np.allclose([r.fraud_prob for r in got], local, atol=1e-12)
