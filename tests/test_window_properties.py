"""Property-based check of the trailing range-window semantics (W1/W2):
for arbitrary keyed event sets, the Spark RANGE-frame results must equal a
brute-force per-row recomputation (all rows of the key with ts in
[t-600, t], ties included)."""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.operators.windows import (
    bucketed_trailing_aggs,
    trailing_range_aggs,
)

BASE = dt.datetime(2024, 1, 7, 12, 0, 0)

event = st.tuples(
    st.integers(min_value=0, max_value=2),            # key
    st.integers(min_value=0, max_value=2000),         # offset seconds
    st.floats(min_value=0.5, max_value=100, allow_nan=False, width=32),
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(event, min_size=1, max_size=25))
def test_trailing_range_matches_bruteforce(spark, events):
    rows = [
        (k, BASE + dt.timedelta(seconds=off), float(round(v, 2)))
        for k, off, v in events
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    out = trailing_range_aggs(
        df,
        key="k",
        ts="ts",
        aggs=[(F.count(F.lit(1)), 600, "cnt"), (F.avg("v"), 3600, "avg_v")],
    ).collect()

    # brute force: per output row, scan all input rows of the key
    def window_rows(k, t, sec):
        return [
            r for r in rows
            if r[0] == k and t - dt.timedelta(seconds=sec) <= r[1] <= t
        ]

    # rows may duplicate (same k/ts/v) — compare as sorted multisets
    got = sorted((r.k, r.ts, r.v, r.cnt, round(r.avg_v, 9)) for r in out)
    exp = sorted(
        (
            k,
            t,
            v,
            len(window_rows(k, t, 600)),
            round(
                sum(r[2] for r in window_rows(k, t, 3600))
                / len(window_rows(k, t, 3600)),
                9,
            ),
        )
        for k, t, v in rows
    )
    for g, e in zip(got, exp):
        assert g[:4] == e[:4]
        assert math.isclose(g[4], e[4], rel_tol=1e-9)
    assert len(got) == len(exp)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(event, min_size=1, max_size=25))
def test_bucketed_trailing_matches_plain_window(spark, events):
    """The skew-resistant bucketed decomposition must be bit-identical to the
    plain partitionBy(key) RANGE frame — including boundary rows at exactly
    t-W and timestamp ties."""
    rows = [
        (i, k, BASE + dt.timedelta(seconds=off), float(round(v, 2)))
        for i, (k, off, v) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "rid long, k long, ts timestamp, v double")
    for sec in (600, 3600):
        plain = trailing_range_aggs(
            df,
            key="k",
            ts="ts",
            aggs=[(F.count(F.lit(1)), sec, "cnt"), (F.avg("v"), sec, "avg_v")],
        )
        exp = {r.rid: (r.cnt, r.avg_v) for r in plain.collect()}
        got = bucketed_trailing_aggs(
            df, key="k", ts="ts", value="v", seconds=sec, row_id="rid"
        ).collect()
        assert len(got) == len(exp)
        for r in got:
            ec, ea = exp[r.rid]
            assert r.cnt_w == ec
            assert math.isclose(r.avg_w, ea, rel_tol=1e-12)


def test_bucketed_trailing_no_bare_key_exchange(spark):
    """Every exchange in the bucketed plan must partition on (key, bucket) —
    a hashpartitioning on the key alone would reintroduce the hot-key
    serialization the operator exists to avoid."""
    import re

    df = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1), 1.0)],
        "rid long, k long, ts timestamp, v double",
    )
    plan = (
        bucketed_trailing_aggs(df, "k", "ts", "v", 600, "rid")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for m in re.finditer(r"hashpartitioning\(([^)]*)\)", plan):
        cols = m.group(1)
        if cols.startswith("k#"):
            assert "__bkt" in cols, f"bare-key exchange found: {cols}"


# --- incremental state merge: random splits must equal full recompute ----

merge_event = st.tuples(
    st.integers(min_value=0, max_value=4),           # user
    st.integers(min_value=0, max_value=10_000),      # offset seconds
    st.floats(min_value=0.5, max_value=500, allow_nan=False, width=32),
    st.integers(min_value=0, max_value=2),           # batch assignment
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(merge_event, min_size=1, max_size=30))
def test_merge_aggregate_state_equals_full_recompute(spark, events):
    from feature_store_fraud_detection_spark.operators.incremental import (
        aggregate_state,
        merge_aggregate_state,
    )

    rows = [
        (u, BASE + dt.timedelta(seconds=off), round(float(v), 2), b)
        for u, off, v, b in events
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, batch int"
    )
    full = aggregate_state(df, "user_id", "ts", "value")
    state = aggregate_state(df.filter("batch = 0"), "user_id", "ts", "value")
    for b in (1, 2):
        part = aggregate_state(
            df.filter(f"batch = {b}"), "user_id", "ts", "value"
        )
        state = merge_aggregate_state(state, part, "user_id")
    canon = lambda d: {
        r.user_id: (r.txn_count, str(r.value_sum), r.value_min, r.value_max, r.last_ts)
        for r in d.collect()
    }
    assert canon(state) == canon(full)


# --- CDC round-trip law: apply(old, diff(old, new)) == new ---------------

snapshot_row = st.tuples(
    st.integers(min_value=0, max_value=9),           # key
    st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
    st.sampled_from(["a", "b", "c"]),
)


def _dedupe_keys(rows):
    seen, out = set(), []
    for k, v, s in rows:
        if k not in seen:
            seen.add(k)
            out.append((k, v, s))
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(snapshot_row, min_size=0, max_size=10),
    st.lists(snapshot_row, min_size=0, max_size=10),
)
def test_diff_apply_roundtrip_law(spark, old_rows, new_rows):
    from feature_store_fraud_detection_spark.operators.diff import (
        apply_diff,
        table_diff,
    )

    schema = "k long, v int, s string"
    old = spark.createDataFrame(_dedupe_keys(old_rows), schema)
    new = spark.createDataFrame(_dedupe_keys(new_rows), schema)
    ch = table_diff(old, new, "k", ["v", "s"])
    rebuilt = apply_diff(old, ch, "k", ["v", "s"])
    assert {tuple(r) for r in rebuilt.collect()} == {
        tuple(r) for r in new.collect()
    }


# --- spatial proximity join == brute-force all-pairs within radius -------

point = st.tuples(
    st.integers(min_value=0, max_value=14),                 # id (unique-d)
    st.floats(min_value=30.0, max_value=30.2, allow_nan=False),
    st.floats(min_value=-100.2, max_value=-100.0, allow_nan=False),
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(point, min_size=2, max_size=15))
def test_proximity_pairs_equals_brute_force(spark, pts):
    from feature_store_fraud_detection_spark.operators.spatial import (
        proximity_pairs,
    )

    seen, rows = set(), []
    for pid, lat, lon in pts:
        if pid not in seen:
            seen.add(pid)
            rows.append((pid, float(lat), float(lon)))
    df = spark.createDataFrame(rows, "pid long, lat double, lon double")
    got = {
        (r.id_a, r.id_b)
        for r in proximity_pairs(
            df, "pid", "lat", "lon", radius_miles=1.0, cell_deg=0.05
        ).collect()
    }

    def hav(a, b):
        rl1, rl2 = math.radians(a[1]), math.radians(b[1])
        dlat, dlon = rl2 - rl1, math.radians(b[2]) - math.radians(a[2])
        x = (
            math.sin(dlat / 2) ** 2
            + math.cos(rl1) * math.cos(rl2) * math.sin(dlon / 2) ** 2
        )
        return 2 * 3963.0 * math.asin(math.sqrt(x))

    expected = set()
    for i, p in enumerate(rows):
        for q in rows[i + 1 :]:
            lo, hi = sorted([p, q], key=lambda r: r[0])
            if math.floor(hav(lo, hi) * 10000 + 0.5) / 10000 <= 1.0:
                expected.add((lo[0], hi[0]))
    assert got == expected


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # partition key
            st.integers(min_value=0, max_value=9),  # value (ties likely)
        ),
        min_size=1,
        max_size=40,
    )
)
def test_bucketed_value_ranks_equal_plain_window(spark, rows):
    """The cut-point-bucketed rank decomposition must be EXACTLY the plain
    partitionBy(part).orderBy(value, id) window for percent_rank /
    cume_dist / ntile(4) — for arbitrary key skew, tie patterns, and
    bucket counts (including buckets >> distinct values)."""
    from pyspark.sql import Window

    from feature_store_fraud_detection_spark.operators.windows import (
        bucketed_value_ranks,
    )

    data = [
        (i, k, float(v)) for i, (k, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "id long, part long, value double")
    w = Window.partitionBy("part").orderBy(F.col("value"), F.col("id"))
    expected = {
        r.id: (r.pr, r.cd, r.nt)
        for r in df.select(
            "id",
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
            F.ntile(4).over(w).alias("nt"),
        ).collect()
    }
    for n_buckets in (1, 4, 64):
        got = {
            r["id"]: (r["__pct_rank"], r["__cume"], r["__quartile"])
            for r in bucketed_value_ranks(
                df, "part", "value", "id", n_buckets=n_buckets
            ).collect()
        }
        assert set(got) == set(expected)
        for i, (pr, cd, nt) in expected.items():
            gpr, gcd, gnt = got[i]
            assert math.isclose(gpr, pr, abs_tol=1e-12), (n_buckets, i)
            assert math.isclose(gcd, cd, abs_tol=1e-12), (n_buckets, i)
            assert gnt == nt, (n_buckets, i)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),    # user
            st.integers(min_value=0, max_value=3000), # offset seconds
            st.integers(min_value=0, max_value=3),    # value band
        ),
        min_size=1,
        max_size=30,
    )
)
def test_duplicate_transactions_equals_brute_force(spark, events):
    """The 3-bucket blocked self-join must return EXACTLY the brute-force
    pair set (same key+value, |dt| <= window) for arbitrary clustering
    around bucket boundaries — each qualifying pair exactly once."""
    from feature_store_fraud_detection_spark.operators.temporal import (
        duplicate_transactions,
    )

    window = 600
    rows = [
        (u, i, BASE + dt.timedelta(seconds=off), float(v))
        for i, (u, off, v) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "u long, id long, ts timestamp, v double")
    got = {
        (r.id_a, r.id_b)
        for r in duplicate_transactions(df, "u", "id", "ts", "v", window).collect()
    }
    expected = set()
    for ua, ia, ta, va in rows:
        for ub, ib, tb, vb in rows:
            if (
                ua == ub and va == vb and ia < ib
                and abs(int(ta.timestamp()) - int(tb.timestamp())) <= window
            ):
                expected.add((ia, ib))
    assert got == expected


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),   # order
            st.integers(min_value=0, max_value=6),   # item
        ),
        min_size=1,
        max_size=40,
    )
)
def test_basket_pairs_equals_brute_force(spark, lines):
    """Array-local pair expansion == brute-force per-order pair counting
    (distinct items, a < b) for arbitrary baskets incl. duplicate lines."""
    import itertools
    from collections import Counter

    from feature_store_fraud_detection_spark.operators.market_basket import (
        basket_pairs,
    )

    df = spark.createDataFrame(
        [(o, f"i{i}") for o, i in lines], "o long, i string"
    )
    got = {
        (r.item_a, r.item_b): r.n_ab
        for r in basket_pairs(df, "o", "i", min_support=1).collect()
    }
    baskets: dict[int, set] = {}
    for o, i in lines:
        baskets.setdefault(o, set()).add(f"i{i}")
    expected = Counter()
    for items in baskets.values():
        for a, b in itertools.combinations(sorted(items), 2):
            expected[(a, b)] += 1
    assert got == dict(expected)
