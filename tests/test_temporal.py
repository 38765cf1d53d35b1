"""Point-in-time (as-of) and interval join semantics + plan quality.

The as-of join is the leakage-free training join: a feature snapshot is
visible to an event only at-or-before the event's timestamp. Fixtures pin
the edge cases (no prior snapshot, exact-tie inclusivity, equal-ts
tiebreak, staleness tolerance); the plan gate pins the one-shuffle shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.operators.temporal import (
    asof_join,
    interval_join,
)
from feature_store_fraud_detection_spark.plans.registry import QUERIES


def _fixture(spark):
    feats = spark.createDataFrame(
        [(1, 10, 5.0, 100), (1, 20, 7.0, 101), (1, 20, 9.0, 102), (2, 30, 1.0, 103)],
        "k int, t int, snap double, fid int",
    ).select("k", F.timestamp_seconds("t").alias("fts"), "snap", "fid")
    events = spark.createDataFrame(
        [(1, 5, "a"), (1, 15, "b"), (1, 20, "c"), (1, 25, "d"), (2, 29, "e"), (2, 31, "f")],
        "k int, t int, eid string",
    ).select("k", F.timestamp_seconds("t").alias("ets"), "eid")
    return events, feats


def test_asof_join_semantics(spark):
    events, feats = _fixture(spark)
    out = asof_join(
        events, feats, "k", "ets", "fts", ["snap", "fid"], tiebreak="fid"
    )
    got = {r["eid"]: (r["snap"], r["fid"], r["asof_age_us"]) for r in out.collect()}
    assert got["a"] == (None, None, None)  # no prior snapshot -> left-join nulls
    assert got["b"] == (5.0, 100, 5_000_000)
    # exact tie is INCLUSIVE and the max-tiebreak row wins among equal ts
    assert got["c"] == (9.0, 102, 0)
    assert got["d"] == (9.0, 102, 5_000_000)
    assert got["e"] == (None, None, None)
    assert got["f"] == (1.0, 103, 1_000_000)


def test_asof_join_tolerance(spark):
    events, feats = _fixture(spark)
    out = asof_join(
        events, feats, "k", "ets", "fts", ["snap"], tiebreak="fid", tolerance_sec=4
    )
    got = {r["eid"]: r["snap"] for r in out.collect()}
    # 'b' is 5s stale -> dropped; 'c' exact (age 0) and 'f' (1s) survive
    assert got["b"] is None
    assert got["c"] == 9.0
    assert got["f"] == 1.0


def test_asof_join_single_shuffle(spark, sf_dir):
    df = QUERIES["asof_join_features"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # union + window carry-forward: ONE hash exchange on the key, ONE sort,
    # and no join operator at all
    assert plan.count("Exchange") == 1
    assert plan.count("+- Sort") == 1
    assert "Join" not in plan


def test_interval_join_bounds(spark):
    events, _ = _fixture(spark)
    iv = spark.createDataFrame(
        [(1, 4, 16, 11), (1, 14, 22, 12)], "k int, s int, e int, iv_id int"
    ).select(
        "k",
        F.timestamp_seconds("s").alias("ivs"),
        F.timestamp_seconds("e").alias("ive"),
        "iv_id",
    )
    out = interval_join(events, iv, "k", "ets", "ivs", "ive", bucket_sec=10)
    pairs = {(r["eid"], r["iv_id"]) for r in out.collect()}
    # start inclusive, end EXCLUSIVE: 'c' (t=20) in [14,22) but not [4,16)
    assert pairs == {("a", 11), ("b", 11), ("b", 12), ("c", 12)}


def test_interval_join_matches_naive(spark, sf_dir):
    # bucketed equi-join == naive theta-join on real data
    from feature_store_fraud_detection_spark.schemas import load_table

    ev = load_table(spark, sf_dir, "events")
    iv = ev.filter(F.col("event_id") % 97 == 0).select(
        "user_id",
        F.col("ts").alias("iv_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("iv_end"),
        F.col("event_id").alias("iv_id"),
    )
    fast = interval_join(ev, iv, "user_id", "ts", "iv_start", "iv_end", 7200)
    naive = ev.join(
        iv.withColumnRenamed("user_id", "u2"),
        (F.col("user_id") == F.col("u2"))
        & (F.col("iv_start") <= F.col("ts"))
        & (F.col("ts") < F.col("iv_end")),
    )
    fast_set = {(r["event_id"], r["iv_id"]) for r in fast.select("event_id", "iv_id").collect()}
    naive_set = {(r["event_id"], r["iv_id"]) for r in naive.select("event_id", "iv_id").collect()}
    assert fast_set == naive_set


def test_resample_carry_forward(spark):
    from feature_store_fraud_detection_spark.operators.temporal import (
        resample_carry_forward,
    )

    df = spark.createDataFrame(
        [
            (1, 5, 10.0, 1),   # bucket 0
            (1, 8, 11.0, 2),   # bucket 0, later ts -> wins bucket 0
            (1, 25, 12.0, 3),  # bucket 2 (buckets of 10s); bucket 1 is a gap
            (2, 35, 1.0, 4),   # single-bucket key
        ],
        "k int, t int, v double, eid int",
    ).select("k", F.timestamp_seconds("t").alias("ts"), "v", "eid")
    out = resample_carry_forward(df, "k", "ts", "v", bucket_sec=10, tiebreak="eid")
    rows = {(r.k, r.bucket): (r.value, r.observed) for r in out.collect()}
    assert rows[(1, 0)] == (11.0, True)   # max-ts row wins the bucket
    assert rows[(1, 1)] == (11.0, False)  # gap carried forward
    assert rows[(1, 2)] == (12.0, True)
    assert rows[(2, 3)] == (1.0, True)
    assert len(rows) == 4


def test_scd2_intervals_consistent_with_asof(spark):
    from feature_store_fraud_detection_spark.operators.temporal import scd2_intervals

    events, feats = _fixture(spark)
    hist = scd2_intervals(
        feats, key="k", ts="fts", value_cols=["snap", "fid"], tiebreak="fid"
    )
    rows = hist.collect()
    # equal-ts duplicate (t=20) collapsed to the max-tiebreak row
    assert {(r.k, r.valid_from.second, r.fid) for r in rows} == {
        (1, 10, 100), (1, 20, 102), (2, 30, 103),
    }
    assert {r.fid for r in rows if r.is_current} == {102, 103}
    # interval lookup over the history == asof_join over the raw log
    looked_up = events.join(
        hist,
        (events.k == hist.k)
        & (hist.valid_from <= events.ets)
        & (hist.valid_to.isNull() | (events.ets < hist.valid_to)),
        "left",
    ).select("eid", "snap", "fid")
    via_asof = asof_join(
        events, feats, "k", "ets", "fts", ["snap", "fid"], tiebreak="fid"
    ).select("eid", "snap", "fid")
    assert {tuple(r) for r in looked_up.collect()} == {
        tuple(r) for r in via_asof.collect()
    }
