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


def test_hash_sample_deterministic_and_expandable(spark):
    from feature_store_fraud_detection_spark.operators.sampling import hash_sample

    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    s10 = {r.k for r in hash_sample(df, "k", 0.1).collect()}
    s30 = {r.k for r in hash_sample(df, "k", 0.3).collect()}
    # deterministic: same call, same rows
    assert s10 == {r.k for r in hash_sample(df, "k", 0.1).collect()}
    # expandable: growing the fraction keeps the smaller sample as a subset
    assert s10 <= s30
    # rates land near nominal (md5 is uniform; 2000 draws)
    assert 0.05 < len(s10) / 2000 < 0.15
    assert 0.24 < len(s30) / 2000 < 0.36
    # independent draw under a different salt
    s30b = {r.k for r in hash_sample(df, "k", 0.3, salt="other").collect()}
    assert s30b != s30


def test_drift_psi_identical_and_shifted(spark):
    """PSI of a distribution against itself is ~0 in every bin; a shifted
    window produces strictly positive terms in the moved mass's bins."""
    from pyspark.sql import functions as F

    from feature_store_fraud_detection_spark.operators.stats import drift_psi

    base = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
    same = drift_psi(base, base, "v", n_bins=10).collect()
    assert len(same) == 10
    assert all(abs(r.psi_term) < 1e-9 for r in same)

    shifted = spark.range(1000).select(
        ((F.col("id") % 100) + 50).cast("double").alias("v")
    )
    drifted = drift_psi(base, shifted, "v", n_bins=10).collect()
    assert sum(r.psi_term for r in drifted) > 0.25  # "significant drift" bar


def test_weighted_hash_sample_rate_tracks_mean_weight(spark):
    from feature_store_fraud_detection_spark.operators.sampling import (
        weighted_hash_sample,
    )
    from pyspark.sql import functions as F

    # constant weight w: the md5 threshold keeps ~w of rows (binomial
    # tolerance), and the SAME rows on every run/partitioning
    df = spark.range(4000).select(F.col("id"), F.lit(0.3).alias("w"))
    kept = weighted_hash_sample(df, "id", "w")
    n = kept.count()
    assert abs(n - 1200) < 150  # ~5 sigma for Binomial(4000, 0.3)
    again = {r.id for r in weighted_hash_sample(df.repartition(7), "id", "w").collect()}
    assert {r.id for r in kept.collect()} == again


def test_drift_psi_ignores_null_values(spark):
    """NULL feature values must be excluded from binning entirely — an
    unfiltered NULL yields an empty filtered-cuts array and lands in bin 0
    while counting toward totals, inflating the lowest decile."""
    from pyspark.sql import functions as F

    from feature_store_fraud_detection_spark.operators.stats import (
        drift_ks,
        drift_psi,
    )

    base = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
    with_nulls = spark.range(1500).select(
        F.when(F.col("id") < 1000, (F.col("id") % 100).cast("double")).alias("v")
    )
    for op in (drift_psi, drift_ks):
        rows = op(base, with_nulls, "v", n_bins=10).collect()
        # 500 NULL rows contribute nothing: both sides bin identically
        assert sum(r.n_curr for r in rows) == sum(r.n_base for r in rows) == 1000
        by_bin = {r.bin: (r.n_base, r.n_curr) for r in rows}
        assert all(nb == nc for nb, nc in by_bin.values())


def test_overflow_checked_aborts_instead_of_silent_null(spark):
    """The exact-decimal aggregation guard: values past the decimal(18,6)
    range abort the job with the operator's name, instead of silently
    NULLing out of F.sum and skewing the aggregate."""
    import pytest
    from pyspark.sql import functions as F

    from feature_store_fraud_detection_spark.operators.stats import (
        leakage_scan,
        summary_stats,
    )

    ok = spark.range(10).select(F.col("id").cast("double").alias("v"))
    assert summary_stats(ok, "v").collect()[0]["cnt"] == 10

    bad = ok.union(spark.createDataFrame([(1e13,)], "v double"))
    with pytest.raises(Exception, match="summary_stats"):
        summary_stats(bad, "v").collect()
    with pytest.raises(Exception, match="leakage_scan"):
        labeled = bad.withColumn("y", (F.col("v") > 5).cast("int"))
        leakage_scan(labeled, ["v"], "y").collect()


# --------------------------------------------------------------------------
# Source mixing
# --------------------------------------------------------------------------


def test_source_mix_sample_caps_and_allowlist(spark):
    from feature_store_fraud_detection_spark.operators.sampling import (
        source_mix_sample,
    )

    rows = [(i, "a" if i < 800 else ("b" if i < 900 else "c")) for i in range(1000)]
    df = spark.createDataFrame(rows, "id bigint, src string")
    # a: 800 rows capped at 10% of 1000 -> ~100 kept; b: under target, kept
    # whole; c: not in the allowlist -> dropped entirely
    out = source_mix_sample(df, "id", "src", {"a": 0.10, "b": 0.50})
    by_src = {
        r["src"]: r["n"]
        for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    assert "c" not in by_src
    assert by_src["b"] == 100  # p=1: kept whole
    assert 60 <= by_src.get("a", 0) <= 140  # ~Binomial(800, 0.125)


def test_source_mix_sample_deterministic_and_monotone(spark):
    from feature_store_fraud_detection_spark.operators.sampling import (
        source_mix_sample,
    )

    df = spark.range(0, 2000).selectExpr("id", "'a' AS src")
    small = {r["id"] for r in source_mix_sample(df, "id", "src", {"a": 0.2}).collect()}
    small2 = {r["id"] for r in source_mix_sample(df, "id", "src", {"a": 0.2}).collect()}
    big = {r["id"] for r in source_mix_sample(df, "id", "src", {"a": 0.5}).collect()}
    assert small == small2  # pure function of (salt, id)
    assert small <= big  # raising the share only adds rows


def test_stratified_hash_sample_rates_and_determinism(spark, sf_dir):
    """Per-stratum keep rates track the fractions map, strata absent from
    the map are dropped entirely, and two runs (any partitioning) return
    the identical row set — the property seeded sampleBy cannot give."""
    from feature_store_fraud_detection_spark.operators.sampling import (
        stratified_hash_sample,
    )
    from feature_store_fraud_detection_spark.schemas import load_table

    ev = load_table(spark, sf_dir, "events")
    fr = {"purchase": 0.5, "view": 0.1}
    got = stratified_hash_sample(ev, "event_type", "event_id", fr, salt="t")
    base = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    kept = {
        r["event_type"]: r["n"]
        for r in got.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert set(kept) <= set(fr)  # unmapped strata dropped
    for label, frac in fr.items():
        rate = kept.get(label, 0) / base[label]
        assert abs(rate - frac) < 0.08, (label, rate)
    ids_a = {r["event_id"] for r in got.select("event_id").collect()}
    ids_b = {
        r["event_id"]
        for r in stratified_hash_sample(
            ev.repartition(7), "event_type", "event_id", fr, salt="t"
        ).select("event_id").collect()
    }
    assert ids_a == ids_b


def test_ivf_md5_sample_quantizer_matches_kmeans_shape(spark, sf_dir):
    """The deterministic md5-sample quantizer returns the same output shape
    and ranking contract as the KMeans path: per query exactly top_k ranked
    rows, ranks 1..k, cosine non-increasing."""
    from feature_store_fraud_detection_spark.operators.similarity import ivf_topk
    from feature_store_fraud_detection_spark.schemas import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = ivf_topk(
        emb, "vec_id", "embedding", query_max_id=5, top_k=3,
        num_clusters=4, n_probe=2, init="md5_sample",
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        cos = [r["cosine"] for r in rows]
        assert cos == sorted(cos, reverse=True)
        assert all(r["neighbor_id"] != q for r in rows)


def test_temperature_mix_flattens_toward_uniform(spark):
    """T=2 sampling must move group shares toward uniform: the dominant
    group's share shrinks, small groups keep ~all rows (down-sample-only),
    and the draw is deterministic."""
    from feature_store_fraud_detection_spark.operators.sampling import (
        temperature_mix_sample,
    )

    rows = (
        [(i, "big") for i in range(900)]
        + [(i + 1000, "mid") for i in range(90)]
        + [(i + 2000, "tiny") for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = temperature_mix_sample(
        df, "doc_id", "lang", temperature=2.0, total_rows=500
    )
    got = {r["lang"]: r["cnt"] for r in out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    # sqrt weights: 30/(30+9.49+3.16) etc -> big keeps ~0.39 of its rows,
    # mid rises to ~1 (111/90 capped), tiny kept whole
    assert got["tiny"] == 10
    assert got["mid"] >= 80          # ~all kept (p capped at 1)
    assert 280 < got["big"] < 420    # ~0.39 * 900 with binomial spread
    # natural share of 'big' was 90%; T=2 targets sqrt-share ~0.70 of the
    # kept mix (0.39*900 / (0.39*900+90+10) ~ 0.78 with the caps) — assert
    # it moved well below natural
    total = sum(got.values())
    assert got["big"] / total < 0.85
    # determinism
    again = {r["lang"]: r["cnt"] for r in temperature_mix_sample(
        df, "doc_id", "lang", temperature=2.0, total_rows=500
    ).groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert got == again


def test_temperature_one_is_natural_proportions(spark):
    """T=1 with budget == |input| keeps every row (p_g == 1 exactly)."""
    from feature_store_fraud_detection_spark.operators.sampling import (
        temperature_mix_sample,
    )

    rows = [(i, "a" if i % 4 else "b") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = temperature_mix_sample(df, "doc_id", "lang", temperature=1.0)
    assert out.count() == 400
