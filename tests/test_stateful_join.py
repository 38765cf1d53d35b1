"""Emit-on-update stateful join (reference J1 semantics) — streaming test
with a file source; expectations computed by hand per the Flink semantics:
each arrival emits the merged record iff the other side's latest is present.
"""

from __future__ import annotations

import json

from feature_store_fraud_detection_spark.streaming.stateful import (
    emit_on_update_join,
    tag_sides,
)


def test_emit_on_update_join(spark, tmp_path):
    # one micro-batch; within a key, rows processed in event_ts order
    left_rows = [  # (cc, count-side value, ts)
        (1, 3.0, "2024-01-01T00:00:00"),
        (1, 4.0, "2024-01-01T00:00:20"),
        (2, 7.0, "2024-01-01T00:00:05"),
    ]
    right_rows = [  # (cc, avg-side value, ts)
        (1, 50.0, "2024-01-01T00:00:10"),
        (3, 9.0, "2024-01-01T00:00:15"),
    ]
    src = tmp_path / "src_l"
    src.mkdir()
    with open(src / "l.json", "w") as f:
        for cc, v, ts in left_rows:
            f.write(json.dumps({"cc": cc, "v": v, "side": "l", "ts": ts}) + "\n")
        for cc, v, ts in right_rows:
            f.write(json.dumps({"cc": cc, "v": v, "side": "r", "ts": ts}) + "\n")

    schema = "cc long, v double, side string, ts timestamp"
    raw = spark.readStream.schema(schema).json(str(src))
    left = raw.filter("side = 'l'")
    right = raw.filter("side = 'r'")
    tagged = tag_sides(left, right, "cc", "v", "v", "ts")
    out = emit_on_update_join(tagged)
    q = (
        out.writeStream.format("memory")
        .queryName("joined")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [
        (r.cc_num, r.left_value, r.right_value, r.event_ts.isoformat())
        for r in spark.table("joined").collect()
    ]
    # key 1 in ts order: L3@00 (no R -> no emit), R50@10 -> emit (3,50),
    # L4@20 -> emit (4,50). key 2: only L -> nothing. key 3: only R -> nothing.
    assert sorted(rows) == [
        (1, 3.0, 50.0, "2024-01-01T00:00:10"),
        (1, 4.0, 50.0, "2024-01-01T00:00:20"),
    ]


def test_emit_on_update_join_transform_with_state(spark, tmp_path):
    """Same semantics on the Spark 4 transformWithStateInPandas API with
    native state TTL (requires the RocksDB state store provider).

    transformWithStateInPandas starts a protobuf-speaking Python state
    server; skip where the protobuf runtime is absent (this container)."""
    import pytest

    pytest.importorskip("google.protobuf.descriptor")
    from feature_store_fraud_detection_spark.streaming.stateful import (
        emit_on_update_join_tws,
    )

    left_rows = [
        (1, 3.0, "2024-01-01T00:00:00"),
        (1, 4.0, "2024-01-01T00:00:20"),
        (2, 7.0, "2024-01-01T00:00:05"),
    ]
    right_rows = [
        (1, 50.0, "2024-01-01T00:00:10"),
        (3, 9.0, "2024-01-01T00:00:15"),
    ]
    src = tmp_path / "src_tws"
    src.mkdir()
    with open(src / "l.json", "w") as f:
        for cc, v, ts in left_rows:
            f.write(json.dumps({"cc": cc, "v": v, "side": "l", "ts": ts}) + "\n")
        for cc, v, ts in right_rows:
            f.write(json.dumps({"cc": cc, "v": v, "side": "r", "ts": ts}) + "\n")

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        schema = "cc long, v double, side string, ts timestamp"
        raw = spark.readStream.schema(schema).json(str(src))
        tagged = tag_sides(
            raw.filter("side = 'l'"), raw.filter("side = 'r'"), "cc", "v", "v", "ts"
        )
        q = (
            emit_on_update_join_tws(tagged)
            .writeStream.format("memory")
            .queryName("joined_tws")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = [
            (r.cc_num, r.left_value, r.right_value, r.event_ts.isoformat())
            for r in spark.table("joined_tws").collect()
        ]
        assert sorted(rows) == [
            (1, 3.0, 50.0, "2024-01-01T00:00:10"),
            (1, 4.0, 50.0, "2024-01-01T00:00:20"),
        ]
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
