"""Round-4 operators: time-decay features, deterministic exact-n
stratified sampling, hash rebalance, hash train/test split. (Ordered
funnel / cohort retention live in operators/funnel.py with their own
tests — test_skew_and_serving.py.)"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.operators.decay import (
    decay_weight,
    decayed_user_value,
)
from feature_store_fraud_detection_spark.operators.sampling import (
    rebalance_classes_hash,
    stratified_topn_sample,
    train_test_hash_split,
)
from feature_store_fraud_detection_spark.schemas import load_table


def _ts(h):
    return dt.datetime(2024, 1, 1, h)


def test_decay_weight_is_exact_power_of_two(spark):
    df = spark.createDataFrame(
        [(0,), (3599,), (3600,), (7200,), (86400 * 400,)], "age bigint"
    )
    got = [
        r["w"]
        for r in df.select(
            decay_weight(F.col("age"), 3600).alias("w")
        ).collect()
    ]
    assert got[0] == 1.0 and got[1] == 1.0
    assert got[2] == 0.5
    assert got[3] == 0.25
    assert got[4] == 1.0 / (1 << 62)  # capped exponent


def test_decayed_user_value_hand_case(spark):
    rows = [
        (1, _ts(12), 8.0),            # age 0 -> w 1
        (1, dt.datetime(2023, 12, 31, 12), 8.0),   # age 1 day -> w 0.5
        (1, dt.datetime(2023, 12, 29, 12), 8.0),   # age 3 days -> w 0.125
        (2, _ts(12), 3.0),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    got = {
        r["user_id"]: (r["n_events"], r["decayed_value"], r["decayed_weight"])
        for r in decayed_user_value(
            df, "user_id", "ts", "value", half_life_sec=86_400
        ).collect()
    }
    assert got[1] == (3, 8.0 + 4.0 + 1.0, 1.625)
    assert got[2] == (1, 3.0, 1.0)


def test_stratified_topn_exact_n_and_partition_invariant(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = stratified_topn_sample(ev, "event_type", "event_id", 50, salt="x")
    sizes = {
        r["event_type"]: r["n"]
        for r in out.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert all(v == 50 for v in sizes.values())
    ids_a = {r["event_id"] for r in out.select("event_id").collect()}
    ids_b = {
        r["event_id"]
        for r in stratified_topn_sample(
            ev.repartition(13), "event_type", "event_id", 50, salt="x"
        ).select("event_id").collect()
    }
    assert ids_a == ids_b


def test_rebalance_hash_keeps_positives_and_targets_ratio(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", (F.col("event_type") == "error").cast("int").alias("label")
    )
    out = rebalance_classes_hash(ev, "label", "event_id", 1, 2.0, salt="r")
    n_pos_in = ev.filter(F.col("label") == 1).count()
    n_neg_in = ev.filter(F.col("label") == 0).count()
    n_pos_out = out.filter(F.col("label") == 1).count()
    n_neg_out = out.filter(F.col("label") == 0).count()
    assert n_pos_out == n_pos_in  # every positive kept
    # negatives ~2x positives (Bernoulli at the derived rate; wide tolerance)
    assert abs(n_neg_out / n_pos_out - 2.0) < 0.3
    # when the target ratio exceeds the available negatives the fraction
    # caps at 1.0 and the op is a no-op on negatives
    all_kept = rebalance_classes_hash(
        ev, "label", "event_id", 1, 100.0, salt="r"
    )
    assert all_kept.filter(F.col("label") == 0).count() == n_neg_in


def test_train_test_hash_split_disjoint_total_and_append_stable(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "id bigint")
    train, test = train_test_hash_split(df, "id", test_fraction=0.25, salt="s")
    tr = {r["id"] for r in train.collect()}
    te = {r["id"] for r in test.collect()}
    assert tr.isdisjoint(te) and len(tr) + len(te) == 2000
    assert abs(len(te) / 2000 - 0.25) < 0.05
    # growth stability: appending rows never moves an existing row
    df2 = spark.createDataFrame([(i,) for i in range(3000)], "id bigint")
    tr2, te2 = train_test_hash_split(df2, "id", test_fraction=0.25, salt="s")
    te2_ids = {r["id"] for r in te2.collect()}
    assert te == {i for i in te2_ids if i < 2000}
    assert tr == {r["id"] for r in tr2.collect() if r["id"] < 2000}


def test_merge_decayed_state_equals_full_recompute(spark):
    """Incremental decayed counters: merging batches one at a time must
    equal the full-history recompute — exactly on dyadic values (power-of-2
    rescaling is exact), within 1e-12 otherwise."""
    from feature_store_fraud_detection_spark.operators.decay import (
        bucketed_decay_recompute,
        merge_decayed_state,
    )

    hl = 3600
    batches = [
        [(1, dt.datetime(2024, 1, 1, 0, 10), 2.0),
         (1, dt.datetime(2024, 1, 1, 0, 50), 4.0),
         (2, dt.datetime(2024, 1, 1, 0, 30), 8.0)],
        [(1, dt.datetime(2024, 1, 1, 2, 5), 1.0),
         (3, dt.datetime(2024, 1, 1, 2, 20), 16.0)],
        [(2, dt.datetime(2024, 1, 1, 5, 0), 0.5)],
    ]
    schema = "user_id bigint, ts timestamp, value double"
    state = None
    for rows in batches:
        state = merge_decayed_state(
            state, spark.createDataFrame(rows, schema),
            "user_id", "ts", "value", hl,
        ).localCheckpoint(eager=True)  # simulate the per-batch persist
    got = {
        r["user_id"]: (
            r["n_events"], r["decayed_value"], r["decayed_weight"],
            r["anchor_bucket"],
        )
        for r in state.collect()
    }
    full = spark.createDataFrame(
        [r for rows in batches for r in rows], schema
    )
    want = {
        r["user_id"]: (
            r["n_events"], r["decayed_value"], r["decayed_weight"],
            r["anchor_bucket"],
        )
        for r in bucketed_decay_recompute(
            full, "user_id", "ts", "value", hl
        ).collect()
    }
    assert set(got) == set(want)
    for k in got:
        assert got[k][0] == want[k][0] and got[k][3] == want[k][3]
        assert abs(got[k][1] - want[k][1]) < 1e-12
        assert abs(got[k][2] - want[k][2]) < 1e-12
    # dyadic values: exact equality expected
    assert got == want
    # hand check for user 1: anchor = bucket of 05:00 event (hl window 5)
    # events at buckets 0,0,2 -> weights 2^-5, 2^-5, 2^-3
    assert want[1][1] == 2.0 / 32 + 4.0 / 32 + 1.0 / 8


def test_merge_decayed_state_stream_foreachbatch(spark, tmp_path):
    """The merge drives a real foreachBatch loop: state parquet read-merge-
    rewritten per micro-batch; final state equals the recompute over all
    ingested events (stream == batch)."""
    import json

    from feature_store_fraud_detection_spark.operators.decay import (
        bucketed_decay_recompute,
        merge_decayed_state,
    )

    src = tmp_path / "ev_src"
    src.mkdir()
    rows = [
        {"user_id": 1, "ts": "2024-01-01 00:10:00", "value": 2.0},
        {"user_id": 1, "ts": "2024-01-01 02:05:00", "value": 4.0},
        {"user_id": 2, "ts": "2024-01-01 01:00:00", "value": 8.0},
    ]
    with open(src / "a.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    state_dir = str(tmp_path / "decay_state")

    def _merge(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        batch_df = batch_df.withColumn("ts", F.col("ts").cast("timestamp"))
        try:
            cur = spark.read.parquet(state_dir)
        except Exception:
            cur = None
        merged = merge_decayed_state(
            cur, batch_df, "user_id", "ts", "value", 3600
        ).localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(state_dir)

    raw = spark.readStream.schema(
        "user_id bigint, ts string, value double"
    ).option("maxFilesPerTrigger", 1).json(str(src))
    q = raw.writeStream.foreachBatch(_merge).trigger(availableNow=True).start()
    q.awaitTermination(120)

    got = {
        r["user_id"]: (r["n_events"], r["decayed_value"], r["anchor_bucket"])
        for r in spark.read.parquet(state_dir).collect()
    }
    full = spark.createDataFrame(
        [(r["user_id"], dt.datetime.fromisoformat(r["ts"]), r["value"]) for r in rows],
        "user_id bigint, ts timestamp, value double",
    )
    want = {
        r["user_id"]: (r["n_events"], r["decayed_value"], r["anchor_bucket"])
        for r in bucketed_decay_recompute(
            full, "user_id", "ts", "value", 3600
        ).collect()
    }
    assert got == want


def test_train_test_hash_split_fraction_expansion_is_subset(spark):
    """Growing the test fraction keeps the old test set as a strict subset
    (the md5-threshold construction is monotone in the threshold) — the
    property that lets a pipeline enlarge its holdout without leaking
    previously-trained-on rows into it."""
    from feature_store_fraud_detection_spark.operators.sampling import (
        train_test_hash_split,
    )

    df = spark.createDataFrame([(i,) for i in range(3000)], "id bigint")
    prev = None
    for frac in (0.05, 0.1, 0.25, 0.5):
        _, test = train_test_hash_split(df, "id", test_fraction=frac, salt="m")
        ids = {r["id"] for r in test.collect()}
        if prev is not None:
            assert prev < ids  # strict superset as the threshold grows
        prev = ids
