"""MLlib pipeline: train/evaluate/score end-to-end on testdata features."""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.ml.pipeline import (
    FraudModelConfig,
    evaluate,
    train,
)
from feature_store_fraud_detection_spark.operators.sampling import train_test_split
from feature_store_fraud_detection_spark.plans.batch_pipeline import (
    compute_features,
    events_as_transactions,
)
from feature_store_fraud_detection_spark.schemas import load_table


def test_train_evaluate_score(spark, sf_dir):
    feats = compute_features(
        events_as_transactions(load_table(spark, sf_dir, "events"))
    ).na.fill(0)
    tr, te = train_test_split(feats, 0.25, seed=42)
    # logistic for test speed; MLP shares every other pipeline stage
    model = train(tr, FraudModelConfig(model="logistic", max_iter=20))
    pred = model.transform(te)
    assert pred.count() == te.count()
    assert {"prediction", "probability"} <= set(pred.columns)
    # is_fraud == (category='error'); a single indexed categorical is not
    # linearly separable, so expect informative-but-imperfect
    metrics = evaluate(model, te)
    assert metrics["areaUnderROC"] > 0.7
    assert 0 <= metrics["accuracy"] <= 1
    # distributed scoring: no driver loop, one narrow transform
    assert pred.filter(F.col("prediction").isin(0.0, 1.0)).count() == pred.count()


def test_model_save_load_roundtrip(spark, sf_dir, tmp_path):
    # reference ML2 checkpoints to fraud_model.pth; MLlib twin: save/load
    from pyspark.ml import PipelineModel

    feats = compute_features(
        events_as_transactions(load_table(spark, sf_dir, "events"))
    ).na.fill(0).limit(400)
    model = train(feats, FraudModelConfig(model="logistic", max_iter=5))
    path = str(tmp_path / "fraud_model")
    model.write().overwrite().save(path)
    loaded = PipelineModel.load(path)
    orig = model.transform(feats).select("cc_num", "feature_timestamp", "prediction")
    re = loaded.transform(feats).select("cc_num", "feature_timestamp", "prediction")
    assert orig.exceptAll(re).count() == 0


def test_mlp_parity_geometry(spark, sf_dir):
    feats = compute_features(
        events_as_transactions(load_table(spark, sf_dir, "events"))
    ).na.fill(0).limit(300)
    model = train(feats, FraudModelConfig(model="mlp", hidden_layers=[8], max_iter=5))
    clf = model.stages[-1]
    assert clf.getLayers() == [10, 8, 2]
    assert model.transform(feats).count() == 300


def test_metric_parity_report(spark, sf_dir, capsys):
    """Metric-parity report vs the reference's published numbers
    (reference README.md:152-156: feature-store MLP reaches accuracy
    0.9714 / precision 0.9666 / recall 0.8564 / F1 0.9080 on its Kaggle
    fraud data). Exact parity is impossible here — the driver data is
    synthetic and the container has no torch — so this runs the SAME
    pipeline shape (indexers -> assembler -> train-only scaler -> MLP with
    a reduced hidden geometry for test time) and asserts the full ML3
    evaluator suite produces sane, informative metrics; the numbers are
    recorded in PERF.md.
    """
    feats = compute_features(
        events_as_transactions(load_table(spark, sf_dir, "events"))
    ).na.fill(0)
    tr, te = train_test_split(feats, 0.25, seed=42)
    model = train(tr, FraudModelConfig(model="mlp", hidden_layers=[16, 8], max_iter=40))
    metrics = evaluate(model, te)
    # full reference ML3 suite present
    assert set(metrics) == {
        "areaUnderROC", "areaUnderPR", "accuracy", "f1", "precision", "recall",
    }
    # loose bounds: the synthetic label (category=='error') is learnable
    # from the indexed categorical, so the model must beat chance clearly
    assert metrics["areaUnderROC"] > 0.8
    assert metrics["accuracy"] > 0.8
    assert all(0.0 <= v <= 1.0 for v in metrics.values())
    print("METRIC_PARITY " + " ".join(f"{k}={v:.4f}" for k, v in sorted(metrics.items())))
