"""Property-based checks of the sequence/session family: contiguous
pattern detection, next-event training-pair construction, gap-based
sessionization and inter-event gaps vs brute-force pure-Python twins
on arbitrary small event streams — round 10's twelfth sweep batch.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)

_T0 = dt.datetime(2024, 3, 4, 0, 0, 0)

_events_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),  # key
        st.sampled_from(["a", "b", "c"]),  # type
        st.integers(0, 60),  # t (seconds; duplicates allowed)
    ),
    min_size=1,
    max_size=25,
)


def _streams(events):
    """(key -> [(t, i, type)] in the operator's (ts, tiebreak) order)."""
    per: dict[int, list[tuple[int, int, str]]] = {}
    for i, (k, t, sec) in enumerate(events):
        per.setdefault(k, []).append((sec, i, t))
    return {k: sorted(v) for k, v in per.items()}


@SET
@given(_events_strategy)
def test_contiguous_pattern_matches_bruteforce(spark, events):
    from feature_store_fraud_detection_spark.operators.funnel import (
        contiguous_pattern_hits,
        contiguous_pattern_matches,
    )

    pattern, within = ["a", "b"], 15
    rows = [
        (k, t, _T0 + dt.timedelta(seconds=sec), i)
        for i, (k, t, sec) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "k long, type string, ts timestamp, id long")

    hits = {
        (r.k, r.anchor_id)
        for r in contiguous_pattern_hits(
            df, "k", "type", "ts", pattern, within, "id"
        ).collect()
    }
    expect_hits = set()
    per_key_anchor: dict[int, list[int]] = {}
    for k, seq in _streams(events).items():
        for i in range(len(seq) - len(pattern) + 1):
            window_ = seq[i : i + len(pattern)]
            if [t for _, _, t in window_] == pattern and (
                window_[-1][0] - window_[0][0] <= within
            ):
                expect_hits.add((k, window_[i - i][1]))
                per_key_anchor.setdefault(k, []).append(window_[0][0])
    assert hits == expect_hits

    matches = {
        r.k: (r.n_matches, r.first_match_ts)
        for r in contiguous_pattern_matches(
            df, "k", "type", "ts", pattern, within, "id"
        ).collect()
    }
    expect_m = {
        k: (len(ts_), _T0 + dt.timedelta(seconds=min(ts_)))
        for k, ts_ in per_key_anchor.items()
    }
    assert matches == expect_m


@SET
@given(_events_strategy)
def test_next_event_pairs_match_bruteforce(spark, events):
    from feature_store_fraud_detection_spark.operators.funnel import (
        next_event_training_pairs,
    )

    rows = [
        (k, t, _T0 + dt.timedelta(seconds=sec), i)
        for i, (k, t, sec) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "k long, type string, ts timestamp, id long")
    out = {
        (r.k, r.id): (r.context, r.target)
        for r in next_event_training_pairs(
            df, "k", "type", "ts", "id", context_len=3
        ).collect()
    }
    expect = {}
    for k, seq in _streams(events).items():
        types = [t for _, _, t in seq]
        ids = [i for _, i, _ in seq]
        for pos in range(3, len(seq)):
            expect[(k, ids[pos])] = (
                ">".join(types[pos - 3 : pos]),
                types[pos],
            )
    assert out == expect


@SET
@given(_events_strategy)
def test_session_windows_match_bruteforce(spark, events):
    from pyspark.sql import functions as F

    from feature_store_fraud_detection_spark.operators.windows import (
        session_window_aggs,
    )

    gap = 10
    rows = [
        (k, _T0 + dt.timedelta(seconds=sec))
        for k, _, sec in events
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp")
    out = {
        (r.k, r.session_start): (r.session_end, r.n)
        for r in session_window_aggs(
            df, "k", "ts", f"{gap} seconds", [F.count(F.lit(1)).alias("n")]
        ).collect()
    }
    expect = {}
    per: dict[int, list[int]] = {}
    for k, _, sec in events:
        per.setdefault(k, []).append(sec)
    for k, secs in per.items():
        secs.sort()
        start = prev = secs[0]
        n = 1
        for s in secs[1:]:
            # Spark merges an event landing EXACTLY on the previous
            # session's end (prev + gap): the boundary is inclusive
            if s - prev <= gap:
                prev = s
                n += 1
            else:
                expect[(k, _T0 + dt.timedelta(seconds=start))] = (
                    _T0 + dt.timedelta(seconds=prev + gap),
                    n,
                )
                start = prev = s
                n = 1
        expect[(k, _T0 + dt.timedelta(seconds=start))] = (
            _T0 + dt.timedelta(seconds=prev + gap),
            n,
        )
    assert out == expect


@SET
@given(_events_strategy)
def test_inter_event_gaps_match_bruteforce(spark, events):
    from feature_store_fraud_detection_spark.operators.windows import (
        inter_event_gaps,
    )

    rows = [
        (k, _T0 + dt.timedelta(seconds=sec), i)
        for i, (k, _, sec) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, id long")
    out = {
        r.id: (r.secs_since_prev, r.secs_until_next)
        for r in inter_event_gaps(df, "k", "ts", "id").collect()
    }
    for k, seq in _streams(events).items():
        for pos, (sec, i, _) in enumerate(seq):
            prev_gap = sec - seq[pos - 1][0] if pos > 0 else None
            next_gap = seq[pos + 1][0] - sec if pos + 1 < len(seq) else None
            assert out[i] == (prev_gap, next_gap)
