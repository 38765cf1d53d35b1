"""Faithful emit-on-update stream join (reference J1/J2 semantics).

The preferred re-design computes both aggregates in one groupBy (pipeline.py
here) — but the reference's exact semantics (``stream_features.py:19-47``:
two keyed streams, each side caches its latest record in ValueState, every
arrival re-emits the merged record if the other side is present) are not
expressible with Spark's SQL stream-stream joins (append-only, watermark
-bounded). This module reproduces them with ``applyInPandasWithState`` —
the engine's custom-stateful-operator escape hatch:

- the two sides are unioned with a side tag (Spark groups one stream; a
  Flink-style two-input connect becomes union + tag — same keyed delivery);
- per-key state holds the latest record of each side;
- every input row updates its side and emits iff both sides are present
  (emit-on-update, last-value join);
- unlike the reference (unbounded ValueState, SURVEY §2.9 T4), state has an
  optional PROCESSING-TIME TTL (``GroupStateTimeout.ProcessingTimeTimeout``
  + ``setTimeoutDuration``; the tws variant's ttl is likewise wall-clock),
  so 100 TB key cardinality cannot pin the state store. Note this makes
  eviction replay-dependent: a re-run that processes faster keeps more
  state alive. Event-time eviction (``EventTimeTimeout`` +
  ``setTimeoutTimestamp`` against the watermark) would be deterministic
  under replay — use it if exact replayability of evictions matters more
  than wall-clock hygiene.

This is the slow-path operator by design (Arrow-batched Python per group);
the single-agg redesign stays the default.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# state: latest value + event time per side
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("left_value", T.DoubleType()),
        T.StructField("left_ts", T.LongType()),
        T.StructField("right_value", T.DoubleType()),
        T.StructField("right_ts", T.LongType()),
    ]
)

_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("cc_num", T.LongType()),
        T.StructField("left_value", T.DoubleType()),
        T.StructField("right_value", T.DoubleType()),
        T.StructField("event_ts", T.TimestampType()),
    ]
)


def tag_sides(left: DataFrame, right: DataFrame, key: str, value_left: str,
              value_right: str, ts: str) -> DataFrame:
    """Union two keyed streams with a side tag (the Spark form of a Flink
    two-input connect)."""
    l_tagged = left.select(
        F.col(key).alias("cc_num"),
        F.lit("L").alias("side"),
        F.col(value_left).cast("double").alias("value"),
        F.col(ts).alias("event_ts"),
    )
    r_tagged = right.select(
        F.col(key).alias("cc_num"),
        F.lit("R").alias("side"),
        F.col(value_right).cast("double").alias("value"),
        F.col(ts).alias("event_ts"),
    )
    return l_tagged.unionByName(r_tagged)


def _combine(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    cc_num = key[0]
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        lv, lt, rv, rt = state.get
    else:
        lv = lt = rv = rt = None
    out_rows = []
    for pdf in pdfs:
        pdf = pdf.sort_values("event_ts")
        for row in pdf.itertuples(index=False):
            ts_us = int(pd.Timestamp(row.event_ts).value // 1000)
            if row.side == "L":
                lv, lt = float(row.value), ts_us
            else:
                rv, rt = float(row.value), ts_us
            # emit-on-update: every arrival emits iff both sides present
            if lv is not None and rv is not None:
                out_rows.append((cc_num, lv, rv, row.event_ts))
    state.update((lv, lt, rv, rt))
    # TTL: drop idle keys 1h after the last processing activity
    state.setTimeoutDuration(3_600_000)
    if out_rows:
        yield pd.DataFrame(
            out_rows, columns=["cc_num", "left_value", "right_value", "event_ts"]
        )


def emit_on_update_join(tagged: DataFrame) -> DataFrame:
    """Apply the stateful last-value join to a side-tagged keyed stream."""
    return tagged.groupBy("cc_num").applyInPandasWithState(
        _combine,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def emit_on_update_join_tws(tagged: DataFrame, ttl_ms: int = 3_600_000) -> DataFrame:
    """Same semantics on the Spark 4 ``transformWithStateInPandas`` API
    (SURVEY §2.5 J1 names it as the modern realization): typed per-key
    ``ValueState`` with a NATIVE state TTL — the state store itself ages
    entries out after ``ttl_ms``, replacing the manual timeout bookkeeping
    the ``applyInPandasWithState`` variant needs. Requires the RocksDB state
    store provider (the scale-grade provider anyway; set
    ``spark.sql.streaming.stateStore.providerClass`` accordingly) and the
    Python ``protobuf`` runtime (transformWithState runs a protobuf-speaking
    state server; absent in this container, so the applyInPandasWithState
    variant carries the tests here).

    Activation was re-attempted round 8 and is NOT possible in this
    container: pyspark 4.1.2's generated ``StateMessage_pb2`` pins
    ``ValidateProtobufRuntimeVersion(PUBLIC, 6, 33, 0)`` — a protobuf
    >= 6.33 runtime — while the only runtime anywhere on disk is a
    vendored 4.23.2 that predates the ``runtime_version`` module
    itself (two majors short), and the container has no package
    network. The importorskip test self-activates the moment a
    compatible runtime appears."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _EmitOnUpdate(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "latest", _STATE_SCHEMA, ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            cc_num = key[0]
            if self._state.exists():
                lv, lt, rv, rt = self._state.get()
            else:
                lv = lt = rv = rt = None
            out_rows = []
            for pdf in rows:
                pdf = pdf.sort_values("event_ts")
                for row in pdf.itertuples(index=False):
                    ts_us = int(pd.Timestamp(row.event_ts).value // 1000)
                    if row.side == "L":
                        lv, lt = float(row.value), ts_us
                    else:
                        rv, rt = float(row.value), ts_us
                    if lv is not None and rv is not None:
                        out_rows.append((cc_num, lv, rv, row.event_ts))
            self._state.update((lv, lt, rv, rt))
            if out_rows:
                yield pd.DataFrame(
                    out_rows,
                    columns=["cc_num", "left_value", "right_value", "event_ts"],
                )

        def close(self) -> None:
            pass

    return tagged.groupBy("cc_num").transformWithStateInPandas(
        _EmitOnUpdate(),
        outputStructType=_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
