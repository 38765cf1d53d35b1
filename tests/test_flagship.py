"""Flagship batch feature pipeline: hand-checked fixture + testdata smoke.

Fixture values verified by hand (FIXTURES.md §5): range-frame tie inclusion,
exact-boundary inclusion (600s / 3600s), single-row key, negative age.
"""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.plans.batch_pipeline import (
    FEATURE_COLUMNS,
    compute_features,
    events_as_transactions,
)
from feature_store_fraud_detection_spark.schemas import TRANSACTIONS_SCHEMA, load_table


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _mk_txn(
    ts: str,
    cc: int,
    amt: float,
    dob: str = "1990-01-01 00:00:00",
    lat: float = 40.0,
    lon: float = -75.0,
    mlat: float = 40.1,
    mlon: float = -75.1,
    fraud: int = 0,
):
    return (
        _ts(ts), cc, "m", "grocery", amt, "F", lat, lon, 1000, _ts(dob),
        f"t{cc}-{ts}", mlat, mlon, fraud, None,
    )


def test_flagship_hand_fixture(spark):
    rows = [
        # key 1: four txns — boundary + tie cases around the 600s window
        _mk_txn("2024-01-07 12:00:00", 1, 10.0),
        _mk_txn("2024-01-07 12:05:00", 1, 20.0),
        _mk_txn("2024-01-07 12:10:00", 1, 30.0),   # exactly 600s after first -> included
        _mk_txn("2024-01-07 12:10:00", 1, 40.0),   # tie ts -> RANGE includes both
        # key 2: single row
        _mk_txn("2024-01-07 00:30:00", 2, 99.0, dob="2030-01-01 00:00:00"),
    ]
    txns = spark.createDataFrame(rows, TRANSACTIONS_SCHEMA)
    out = compute_features(txns)
    assert out.columns == FEATURE_COLUMNS

    got = {
        (r.cc_num, r.feature_timestamp.isoformat(), r.amt): r
        for r in out.collect()
    }
    # RANGE frame: the two tied 12:10 rows each see all 4 rows (600s inclusive)
    r30 = got[(1, "2024-01-07T12:10:00", 30.0)]
    r40 = got[(1, "2024-01-07T12:10:00", 40.0)]
    assert r30.txn_count_last_10_min == 4 and r40.txn_count_last_10_min == 4
    assert math.isclose(r30.avg_amt_last_1_hour, (10 + 20 + 30 + 40) / 4)
    # first row: only itself
    r10 = got[(1, "2024-01-07T12:00:00", 10.0)]
    assert r10.txn_count_last_10_min == 1
    assert math.isclose(r10.avg_amt_last_1_hour, 10.0)
    # single-row key: count=1, avg=amt
    r99 = got[(2, "2024-01-07T00:30:00", 99.0)]
    assert r99.txn_count_last_10_min == 1
    assert math.isclose(r99.avg_amt_last_1_hour, 99.0)
    # negative age (dob in the future), no clamping
    assert r99.age_at_txn < 0
    # 2024-01-07 is a Sunday: Spark convention dayofweek=1
    assert r10.day_of_week == 1
    assert r10.hour_of_day == 12
    # haversine spot value: (40,-75) -> (40.1,-75.1): ~8.71 miles
    assert abs(r10.distance_to_merchant - 8.71) < 0.05


def test_flagship_on_testdata(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    out = compute_features(events_as_transactions(events))
    n = out.count()
    assert n == events.count()
    assert out.filter(F.col("txn_count_last_10_min") < 1).count() == 0


def test_flagship_amt_overflow_fails_named(spark):
    # bigvals probe (round 12): an amt outside the DECIMAL(14,2) domain
    # must abort with the operator name, never a bare ANSI
    # NUMERIC_VALUE_OUT_OF_RANGE
    import pytest

    rows = [
        _mk_txn("2024-01-07 12:00:00", 1, 10.0),
        _mk_txn("2024-01-07 12:01:00", 1, 9.0e12),
    ]
    df = spark.createDataFrame(rows, TRANSACTIONS_SCHEMA)
    with pytest.raises(Exception, match="compute_features"):
        compute_features(df).collect()
