"""Physical-plan quality gates — the scale properties the engine promises.

These assert on the optimized plan, not timings, so they hold on any
hardware: filter/column pushdown into scans, single-shuffle windows,
broadcast joins for dims, window-group-limit for top-N.
"""

from __future__ import annotations

from feature_store_fraud_detection_spark.plans.registry import QUERIES


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _analyzed(df) -> str:
    return df._jdf.queryExecution().toString()


def test_point_lookup_pushes_filter(spark, sf_dir):
    df = QUERIES["point_lookup"].fn(spark, sf_dir)
    plan = _analyzed(df)
    assert "DataFilters: [isnotnull(user_id" in plan
    assert "(user_id" in plan and "= 7)" in plan


def test_pricing_prunes_columns(spark, sf_dir):
    df = QUERIES["pricing_summary"].fn(spark, sf_dir)
    plan = _analyzed(df)
    # only the 7 needed lineitem columns reach the scan (16-col table)
    scan_line = next(l for l in plan.split("\n") if "FileScan" in l)
    assert "l_orderkey" not in scan_line
    assert "l_shipdate" in scan_line


def test_flagship_single_window_shuffle(spark, sf_dir):
    df = QUERIES["flagship_features"].fn(spark, sf_dir)
    plan = _physical(df)
    # both range frames share one partitionBy(cc_num) exchange + sort
    assert plan.count("Exchange") == 1
    assert plan.count("Window") == 1


def test_latest_n_uses_window_group_limit(spark, sf_dir):
    df = QUERIES["latest5_per_key"].fn(spark, sf_dir)
    assert "WindowGroupLimit" in _physical(df)


def test_revenue_joins_broadcast(spark, sf_dir):
    df = QUERIES["revenue_by_nation"].fn(spark, sf_dir)
    plan = _physical(df)
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
