"""Windowed operators — the heart of the reference.

Covers: trailing range-frame aggregates (W1/W2), latest-N per key (W5/W6),
and event-time sliding windows (batch twin of the streaming W3/W4).

Scale notes (100 TB):
- Every partitionBy(key) window is ONE hash shuffle on the key + per-partition
  sort; Spark's WindowExec evaluates trailing range frames in a single running
  pass (no O(n^2)). Hot keys are the risk — AQE skew handling covers joins but
  not windows, so extremely hot keys should be pre-bucketed upstream
  (see sources/offline_store bucketing) or handled with a two-level
  aggregate; with the reference's 983-cards key space at 1.3M rows/key-max
  this stays comfortably in-memory per partition.
- latest-N uses row_number + filter, which Spark >= 3.5 rewrites into a
  WindowGroupLimit (per-partition top-N pushdown before the final sort) —
  confirmed in the physical plan, see tests/test_windows.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.functions.features import unix_time


def trailing_range_aggs(
    df: DataFrame,
    key: str,
    ts: str,
    aggs: Sequence[tuple[Column, int, str]],
) -> DataFrame:
    """Add trailing event-time range-window aggregates.

    ``aggs``: (aggregate expression, trailing_seconds, output name) triples —
    e.g. ``(F.count("*"), 600, "txn_count_last_10_min")`` reproduces reference
    W1 (``batch_processing.py:41,44``) and ``(F.avg("amt"), 3600,
    "avg_amt_last_1_hour")`` W2 (``:42,45``).

    RANGE (not ROWS) frame over long seconds: all rows with equal timestamp
    are included together (SURVEY §7 trap 2). All frames share one
    partitionBy(key).orderBy(unix seconds) — Catalyst plans a single
    shuffle+sort reused by every frame.
    """
    df = df.withColumn("__unix_ts", unix_time(ts))
    out = df
    for agg_expr, seconds, name in aggs:
        w = (
            Window.partitionBy(key)
            .orderBy("__unix_ts")
            .rangeBetween(-seconds, Window.currentRow)
        )
        out = out.withColumn(name, agg_expr.over(w))
    return out.drop("__unix_ts")


def bucketed_trailing_aggs(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    seconds: int,
    row_id: str,
) -> DataFrame:
    """Skew-resistant EXACT twin of ``trailing_range_aggs`` for one trailing
    width: per-row count/sum/avg over ``[t - seconds, t]`` per key, computed
    with **no** ``partitionBy(key)`` window anywhere in the plan.

    ``trailing_range_aggs`` (reference W1/W2, ``batch_processing.py:41-45``)
    shuffles on the key alone: a single pathologically hot key (one card with
    billions of rows at 100 TB) serializes one reducer and no salting can
    help, because the running frame must see the whole key partition in time
    order. This operator decomposes the trailing window algebraically so
    every shuffle is on ``(key, time_bucket)`` — a hot key fans out across
    its time range and the per-task working set is bounded by one
    window-width of one key's data, independent of total key volume.

    Decomposition (bucket width == window width W, so a trailing window
    spans at most its own bucket b and bucket b-1):

        window(t)  =  running_own(t)            -- events in b with u <= t
                   +  total(b-1)                -- per-(key,bucket) partials
                   -  strict_before(b-1, t - W) -- events in b-1 with u < t-W

    ``running_own`` is a range frame within (key, bucket); ``total`` a plain
    groupBy; ``strict_before`` is evaluated by unioning one probe row per
    event (at time t-W in bucket b-1) with the events and taking a running
    sum ordered by (time, is_event) — probes sort before events at equal
    time, so a row at exactly t-W is *excluded* from the subtraction and
    therefore *included* in the closed window, matching RANGE BETWEEN
    W PRECEDING AND CURRENT ROW tie semantics exactly.

    Cost: 3 shuffles on (key, bucket) + 1 join-back on ``row_id`` vs the
    plain form's single shuffle — use only when the key histogram is
    pathological; correctness is identical (hash-checked against the plain
    form's oracle). ``row_id`` must be unique and non-null.

    Returns (row_id, key, cnt_w, cnt_v, sum_w, avg_w): count(*) over the
    window, count(value), sum(value), avg(value) (null iff cnt_v = 0).
    """
    w = int(seconds)
    base = df.select(
        F.col(row_id),
        F.col(key),
        unix_time(ts).alias("__u"),
        F.col(value).alias("__v"),
    ).withColumn("__bkt", F.floor(F.col("__u") / w))

    # per-(key, bucket) running aggregates — range frame keeps tie semantics
    w_run = (
        Window.partitionBy(key, "__bkt")
        .orderBy("__u")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    own = (
        base.withColumn("__run_cnt", F.count(F.lit(1)).over(w_run))
        .withColumn("__run_cv", F.count("__v").over(w_run))
        .withColumn("__run_sum", F.sum("__v").over(w_run))
    )

    totals = base.groupBy(key, "__bkt").agg(
        F.count(F.lit(1)).alias("__tot_cnt"),
        F.count("__v").alias("__tot_cv"),
        F.sum("__v").alias("__tot_sum"),
    )

    # probe at (key, b-1, t-W): running events strictly before the probe
    events_side = base.select(
        F.col(key),
        F.col("__bkt"),
        F.col("__u").alias("__t"),
        F.lit(1).alias("__is_event"),
        F.lit(1).alias("__c"),
        F.when(F.col("__v").isNotNull(), 1).otherwise(0).alias("__cv"),
        F.col("__v").alias("__s"),
        F.lit(None).cast(df.schema[row_id].dataType).alias(row_id),
    )
    probe_side = base.select(
        F.col(key),
        (F.col("__bkt") - 1).alias("__bkt"),
        (F.col("__u") - w).alias("__t"),
        F.lit(0).alias("__is_event"),
        F.lit(0).alias("__c"),
        F.lit(0).alias("__cv"),
        F.lit(None).cast(df.schema[value].dataType).alias("__s"),
        F.col(row_id),
    )
    w_pre = (
        Window.partitionBy(key, "__bkt")
        .orderBy("__t", "__is_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    strict = (
        events_side.unionByName(probe_side)
        .withColumn("__pre_cnt", F.sum("__c").over(w_pre))
        .withColumn("__pre_cv", F.sum("__cv").over(w_pre))
        .withColumn("__pre_sum", F.sum("__s").over(w_pre))
        .filter(F.col("__is_event") == 0)
        .select(F.col(row_id), F.col(key), "__bkt", "__pre_cnt", "__pre_cv", "__pre_sum")
    )

    # prev-bucket contribution = total(b-1) - strict_before(t-W); both sides
    # are already partitioned on (key, bucket), so this join adds no new
    # exchange of the big side
    prev = strict.join(totals, [key, "__bkt"], "left").select(
        F.col(row_id).alias("__rid"),
        (F.coalesce("__tot_cnt", F.lit(0)) - F.col("__pre_cnt")).alias("__prev_cnt"),
        (F.coalesce("__tot_cv", F.lit(0)) - F.col("__pre_cv")).alias("__prev_cv"),
        (
            F.coalesce("__tot_sum", F.lit(0).cast(df.schema[value].dataType))
            - F.coalesce("__pre_sum", F.lit(0).cast(df.schema[value].dataType))
        ).alias("__prev_sum"),
    )

    out = own.join(prev, own[row_id] == prev["__rid"])
    cnt_v = (F.col("__run_cv") + F.col("__prev_cv")).alias("cnt_v")
    sum_w = (
        F.coalesce("__run_sum", F.lit(0).cast(df.schema[value].dataType))
        + F.col("__prev_sum")
    )
    return out.select(
        F.col(row_id),
        F.col(key),
        (F.col("__run_cnt") + F.col("__prev_cnt")).alias("cnt_w"),
        cnt_v,
        sum_w.alias("sum_w"),
        F.when(
            F.col("__run_cv") + F.col("__prev_cv") > 0,
            sum_w / (F.col("__run_cv") + F.col("__prev_cv")),
        ).alias("avg_w"),
    )


def latest_n_per_key(
    df: DataFrame,
    key: str,
    ts: str,
    n: int = 1,
    tiebreak: str | None = None,
) -> DataFrame:
    """Most recent N rows per key (reference W5/W6: Redis
    ``ZREVRANGE timeline 0 n-1``, ``app/routes/feature.py:126-131,164-171``).

    Adds ``rn`` (1 = newest). ``tiebreak`` column makes ordering total when
    timestamps tie (the Redis ZSET breaks score ties lexically by member; a
    total order keeps results deterministic for the oracle).
    """
    order = [F.col(ts).desc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).desc())
    w = Window.partitionBy(key).orderBy(*order)
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= n)


def rolling_rows_aggs(
    df: DataFrame,
    key: str,
    order_cols: Sequence[str],
    aggs: Sequence[tuple[Column, int, str]],
) -> DataFrame:
    """Trailing ROWS-frame aggregates (last-N-rows, vs the RANGE frames of
    trailing_range_aggs): e.g. mean of the last 5 transactions regardless of
    their spacing. ``order_cols`` must define a total order per key
    (timestamp + unique tiebreak) or the frame contents are nondeterministic.
    """
    out = df
    for agg_expr, n_rows, name in aggs:
        w = (
            Window.partitionBy(key)
            .orderBy(*order_cols)
            .rowsBetween(-(n_rows - 1), Window.currentRow)
        )
        out = out.withColumn(name, agg_expr.over(w))
    return out


def inter_event_gaps(
    df: DataFrame, key: str, ts: str, tiebreak: str
) -> DataFrame:
    """Seconds since the previous event per key (lag) and until the next
    (lead) — the classic recency features a fraud model wants next to the
    trailing counts. Null at partition edges (first/last event)."""
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    ts_s = unix_time(ts)
    return df.withColumn(
        "secs_since_prev", ts_s - F.lag(ts_s).over(w)
    ).withColumn("secs_until_next", F.lead(ts_s).over(w) - ts_s)


def session_window_aggs(
    df: DataFrame,
    key: str,
    ts: str,
    gap: str,
    aggs: Sequence[Column],
) -> DataFrame:
    """Sessionization: group each key's events into sessions separated by
    >= ``gap`` of inactivity (``F.session_window`` — dynamic, data-driven
    windows; works identically on batch and streams). Returns
    (session_start, session_end, key, *aggs) where session_end = last event
    + gap (Spark's convention)."""
    agged = df.groupBy(F.session_window(ts, gap), F.col(key)).agg(*aggs)
    agg_names = [c for c in agged.columns if c not in ("session_window", key)]
    return agged.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        F.col(key),
        *[F.col(c) for c in agg_names],
    )


def sliding_window_aggs(
    df: DataFrame,
    key: str,
    ts: str,
    window_duration: str,
    slide_duration: str,
    aggs: Sequence[Column],
) -> DataFrame:
    """Event-time sliding-window aggregate (batch twin of streaming W3/W4).

    The reference's Flink job uses sliding *processing-time* windows despite
    configuring event-time watermarks (``pipeline.py:26,46-49,61,66`` — the
    watermarks are dead; SURVEY §2.9 T1). The canonical re-design is
    event-time: ``groupBy(window(ts, size, slide), key)``. Same code path runs
    in Structured Streaming with a watermark (streaming/pipeline.py).

    Returns (window_start, window_end, key, *aggs).
    """
    agged = df.groupBy(F.window(ts, window_duration, slide_duration), F.col(key)).agg(
        *aggs
    )
    agg_names = [c for c in agged.columns if c not in ("window", key)]
    return agged.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        F.col(key),
        *[F.col(c) for c in agg_names],
    )


def activity_bursts(
    df: DataFrame,
    key: str,
    ts: str,
    burst_threshold: int = 2,
) -> DataFrame:
    """Per-key velocity + streak profile: max events in any 1-hour bucket,
    number of "burst" hours (>= ``burst_threshold`` events), and the longest
    run of consecutive active DAYS (gaps-and-islands via the date minus
    row_number trick — consecutive dates share ``d - row_number``).

    The fraud-ops cut of sessionization: bucketed counts instead of
    gap-based sessions, so every aggregation is a keyed hash groupBy with
    map-side partial aggregation — integer/date logic only, no floats, no
    global windows. The row_number window partitions by key over active
    days (<= days in retention per key), never over raw events.
    """
    hourly = df.groupBy(
        F.col(key), F.date_trunc("hour", F.col(ts)).alias("__h")
    ).agg(F.count(F.lit(1)).alias("__n"))
    hstats = hourly.groupBy(key).agg(
        F.max("__n").alias("max_hourly_events"),
        F.sum((F.col("__n") >= burst_threshold).cast("int"))
        .cast("bigint")
        .alias("n_burst_hours"),
    )
    days = df.select(F.col(key), F.to_date(F.col(ts)).alias("__d")).distinct()
    w = Window.partitionBy(key).orderBy("__d")
    streaks = (
        days.withColumn("__g", F.date_sub(F.col("__d"), F.row_number().over(w)))
        .groupBy(key, "__g")
        .agg(F.count(F.lit(1)).alias("__len"))
        .groupBy(key)
        .agg(F.max("__len").alias("longest_day_streak"))
    )
    return hstats.join(streaks, key)


def sliding_distinct_counts(
    df: DataFrame, key: str, ts_col: str, window_days: int = 7
) -> DataFrame:
    """Exact rolling ``window_days``-day distinct-key counts per day (the
    "7-day active users" metric) — the one sliding aggregate that is NOT
    algebraic, so no window frame computes it.

    Scale shape: reduce to the distinct (key, day) activity table first
    (one keyed agg — |keys x active days|, tiny vs |events|), then explode
    each activity day to the ``window_days`` trailing windows it feeds
    (bounded x``window_days`` fan-out of the SMALL table) and run one
    hash countDistinct per day. Cost is O(|activity| x window_days) with
    map-side partials — never a per-day scan of history, never a global
    sort. Days outside the observed range are dropped by a semi-join
    against the present days.
    """
    days = df.select(
        F.col(key), F.col(ts_col).cast("date").alias("d")
    ).distinct()
    present = days.select(F.col("d").alias("day")).distinct()
    covered = days.select(
        F.col(key),
        F.explode(
            F.expr(f"sequence(d, date_add(d, {window_days - 1}), interval 1 day)")
        ).alias("day"),
    )
    return (
        covered.join(present, "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct(key).alias("n_active"))
    )


def bucketed_value_ranks(
    df: DataFrame,
    part_col: str,
    value_col: str,
    id_col: str,
    n_buckets: int = 32,
) -> DataFrame:
    """percent_rank / cume_dist / ntile(4) per partition WITHOUT a
    per-partition total-order sort — the scale-safe twin of
    ``Window.partitionBy(part).orderBy(value, id)`` rank functions.

    A low-cardinality partition key (5 event types) means the naive window
    sorts ~1/5 of the table in ONE task at any scale. Instead, the total
    order is decomposed exactly (same two-level idea as
    ``bucketed_trailing_aggs``):

    1. per-partition quantile cut points (one scalar aggregate, broadcast);
    2. each row binned by cut points — rows in bucket b all precede rows in
       bucket b+1 under (value, id) order, since the bin is a function of
       value alone;
    3. ``row_number`` runs per (partition, bucket) — every sorted run is
       ~|part|/n_buckets rows, bounded by the bucket, not the partition;
    4. bucket offsets (a tiny counts-per-bucket table) broadcast back, so
       global_rn = offset + local_rn, exactly.

    All three outputs derive from the global row number over distinct
    (value, id) keys: percent_rank = (rn-1)/(n-1), cume_dist = rn/n, and
    ntile(t) by the standard first-(n mod t)-tiles-get-one-extra split.

    Cuts come from ``approx_percentile`` (r12): bin balance shifts but
    every output is exact regardless of where the cuts land (they only
    shard the sort; correctness never depends on them), and the sketch
    state is bounded where exact ``percentile`` buffers every distinct
    value of the column into one reducer's merge.
    """
    # ONE percentile with an array argument: N separate percentile()
    # aggregates each buffer the whole column (N x memory and sort work);
    # the array form buffers once and reads all cut points from it.
    # n_buckets=1 degenerates to a single unsharded bucket (empty cuts).
    if n_buckets >= 2:
        qs = ", ".join(str(i / n_buckets) for i in range(1, n_buckets))
        cut_expr = F.expr(f"approx_percentile({value_col}, array({qs}), 1000)")
    else:
        cut_expr = F.first(F.array().cast("array<double>"))
    # r12 optimization (guide §5 / §2.4): cuts is referenced under BOTH
    # binned occurrences (the counts subtree and the final join) — each
    # re-ran the full-column percentile aggregate (the single most
    # expensive node here: percentile buffers the whole column). counts
    # likewise feeds the offsets broadcast whose subtree re-ran
    # binned -> scan + percentile. Both tables are bounded (one row per
    # partition value resp. per (partition, bucket)); persisting them
    # leaves ONE percentile pass and two narrow binned scans. Not
    # unpersisted (the returned lazy frame reads them).
    cuts = df.groupBy(part_col).agg(cut_expr.alias("__cuts")).persist()
    binned = (
        df.join(F.broadcast(cuts), part_col)
        .withColumn(
            "__bin",
            F.size(F.filter("__cuts", lambda q: F.col(value_col) > q)),
        )
        .drop("__cuts")
    )
    counts = binned.groupBy(part_col, "__bin").agg(
        F.count(F.lit(1)).alias("__cnt")
    ).persist()
    # cumulative offsets + totals over the bounded per-bucket counts table
    woff = (
        Window.partitionBy(part_col)
        .orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wtot = Window.partitionBy(part_col)
    offsets = counts.select(
        part_col,
        "__bin",
        F.coalesce(F.sum("__cnt").over(woff), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(wtot).alias("__n"),
    )
    win = Window.partitionBy(part_col, "__bin").orderBy(
        F.col(value_col), F.col(id_col)
    )
    rn = F.row_number().over(win) + F.col("__off")
    n = F.col("__n")
    q, rem = F.floor(n / 4), n % 4
    big = rem * (q + 1)
    quartile = F.when(rn <= big, F.floor((rn - 1) / (q + 1)) + 1).otherwise(
        rem + F.floor((rn - big - 1) / q) + 1
    )
    return (
        binned.join(F.broadcast(offsets), [part_col, "__bin"])
        .select(
            *df.columns,
            rn.cast("bigint").alias("__rank"),
            n.alias("__n_part"),
            F.when(n == 1, F.lit(0.0))
            .otherwise((rn - 1) / (n - 1).cast("double"))
            .alias("__pct_rank"),
            (rn / n.cast("double")).alias("__cume"),
            quartile.cast("int").alias("__quartile"),
        )
    )
