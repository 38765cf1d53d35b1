"""Bloom-filter semi-join (operators/bloom.py): exact-equivalence vs the
plain semi-join, no-false-negative property of the probe, and the plan gate
that makes the operator worth having — the probe must run as a scan-stage
filter on the fact side, not a join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.operators.bloom import (
    bloom_bits,
    bloom_might_contain,
    bloom_semi_join,
)


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bloom_semi_join_equals_plain_semi_join(spark, sf_dir):
    from feature_store_fraud_detection_spark.schemas import load_table

    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    keys = su.filter(F.col("s_suppkey") % 3 == 0).select("s_suppkey")
    got = (
        bloom_semi_join(li, "l_suppkey", keys, "s_suppkey")
        .groupBy("l_suppkey")
        .count()
    )
    want = (
        li.join(
            keys.withColumnRenamed("s_suppkey", "l_suppkey").distinct(),
            "l_suppkey",
            "left_semi",
        )
        .groupBy("l_suppkey")
        .count()
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bloom_probe_has_no_false_negatives(spark):
    keys = spark.range(0, 500).select((F.col("id") * 7).alias("k"))
    words = bloom_bits(keys, "k", m_bits=1 << 12, k=4)
    # every inserted key must pass the probe
    hits = (
        keys.where(bloom_might_contain("k", words, 1 << 12, k=4)).count()
    )
    assert hits == 500


def test_bloom_probe_prunes_most_non_members(spark):
    keys = spark.range(0, 200).select(F.col("id").alias("k"))
    words = bloom_bits(keys, "k", m_bits=1 << 17, k=5)
    non_members = spark.range(10_000, 60_000).select(F.col("id").alias("k"))
    passed = non_members.where(
        bloom_might_contain("k", words, 1 << 17, k=5)
    ).count()
    # fpr at n=200, m=2^17, k=5 is ~1e-9; allow slack up to 0.1%
    assert passed <= 50


def test_bloom_probe_is_scan_stage_filter(spark, sf_dir):
    """The fact side must see a plain Filter (xxhash64 probes against a
    literal bitmap) directly over its scan — no join, no exchange — and the
    only join in the full operator is the final exact semi-join."""
    from feature_store_fraud_detection_spark.schemas import load_table

    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    keys = su.filter(F.col("s_suppkey") % 5 == 0).select("s_suppkey")
    words = bloom_bits(keys, "s_suppkey")
    probe_only = li.where(bloom_might_contain("l_suppkey", words, 1 << 17))
    plan = _physical(probe_only)
    assert "xxhash64" in plan and "getbit" in plan
    assert "Exchange" not in plan and "Join" not in plan
    full = bloom_semi_join(li, "l_suppkey", keys, "s_suppkey")
    fplan = _physical(full)
    assert fplan.count("Join") == 1
    # the probe filter sits below the join on the fact side
    assert "getbit" in fplan
