"""Time-decay weighted features (recency-weighted aggregates).

Fraud/recommendation features routinely weight events by recency ("a
transaction an hour ago matters more than one last month"). The textbook
form multiplies by exp(-age/tau), but libm ``exp`` is NOT bit-reproducible
across engines, which would break the repo's exact-hash oracle gate. This
operator uses half-life decay with a WHOLE-PERIOD exponent instead:

    weight(age) = 1 / 2^min(floor(age / half_life), 62)

Powers of two are exactly representable doubles and ``1.0 / (1 << k)`` is
an exact IEEE division on every engine — so the weights (and therefore the
sums, with a fixed fold order) are bit-identical cross-engine, while
keeping the exponential-decay shape (piecewise-constant within a
half-life). The 62 cap keeps the shift inside int64; beyond it the weight
is < 3e-19 — zero at feature precision.

Scale: weights are a narrow projection (no shuffle); the per-key rollup is
one hash aggregate. The sorted-fold sum (collect_list + array_sort) pins
one summation order for the oracle; at 100 TB swap it for a plain
``sum`` + tolerance check — the weights themselves stay exact either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def decay_weight(age_sec: Column, half_life_sec: int) -> Column:
    """Exact power-of-two half-life weight for a non-negative age.

    ``shiftleft`` goes through ``expr`` because the column API variant only
    accepts a literal bit count; the exponent here is per-row.
    """
    k = F.least(
        F.floor(age_sec / F.lit(half_life_sec)).cast("long"), F.lit(62)
    ).cast("int")
    shifted = F.call_function("shiftleft", F.lit(1).cast("long"), k)
    return F.lit(1.0) / shifted.cast("double")


def decayed_user_value(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    half_life_sec: int = 86_400,
) -> DataFrame:
    """Per-key recency-weighted value: (key, n_events, decayed_value,
    decayed_weight) as of the table's max timestamp (deterministic "now" —
    a wall-clock now would be unhashable and unreplayable).

    ``decayed_value = round4(sum(value * w))``, ``decayed_weight =
    round4(sum(w))`` — their ratio is the recency-weighted mean. Sums use a
    sorted sequential fold so both engines add in one order.
    """
    now = df.agg(F.max(ts_col).alias("__now"))
    base = df.crossJoin(F.broadcast(now)).select(
        F.col(key_col),
        (
            F.col(value_col).cast("double")
            * decay_weight(
                F.unix_timestamp("__now") - F.unix_timestamp(ts_col),
                half_life_sec,
            )
        ).alias("__wv"),
        decay_weight(
            F.unix_timestamp("__now") - F.unix_timestamp(ts_col),
            half_life_sec,
        ).alias("__w"),
    )

    def _fold_sum(c: str) -> Column:
        arr = F.array_sort(F.collect_list(c))
        return F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)

    return base.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.floor(_fold_sum("__wv") * 10000 + F.lit(0.5)) / 10000).alias(
            "decayed_value"
        ),
        (F.floor(_fold_sum("__w") * 10000 + F.lit(0.5)) / 10000).alias(
            "decayed_weight"
        ),
    )


# --------------------------------------------------------------------------
# Incremental (streaming) form: bucket-aligned decayed counters
# --------------------------------------------------------------------------
# The serving-path version of the decay feature: per-key state
# (n_events, decayed_value, decayed_weight, anchor_bucket) that a
# foreachBatch loop MERGES micro-batches into, instead of recomputing over
# all history. Ages are bucket-aligned (weight = 2^-(anchor - bucket(e)))
# — the classic "exponentially decayed counter": rescaling old state to a
# newer anchor is an EXACT division by a power of two, so merging never
# accumulates error and merge(merge(s,b1),b2) equals the full recompute up
# to float addition order (power-of-2 scaling commutes with IEEE rounding).


def _bucket(ts_col, half_life_sec: int) -> Column:
    return F.floor(F.unix_timestamp(ts_col) / F.lit(half_life_sec)).cast("long")


def bucketed_decay_recompute(
    df: DataFrame, key_col: str, ts_col: str, value_col: str, half_life_sec: int
) -> DataFrame:
    """Full-history recompute of the bucket-aligned decayed counters — the
    batch twin the incremental merge is tested against. Anchor = the global
    max bucket (deterministic)."""
    b = df.select(
        F.col(key_col),
        _bucket(F.col(ts_col), half_life_sec).alias("__b"),
        F.col(value_col).cast("double").alias("__v"),
    )
    anchor = b.agg(F.max("__b").alias("__anchor"))
    w = F.lit(1.0) / F.call_function(
        "shiftleft",
        F.lit(1).cast("long"),
        F.least(F.col("__anchor") - F.col("__b"), F.lit(62)).cast("int"),
    ).cast("double")
    return (
        b.crossJoin(F.broadcast(anchor))
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # int-ok: __v cast to double above, w is double — precision
            # regime, not the silent-int64-wrap class
            F.sum(F.col("__v") * w).alias("decayed_value"),
            F.sum(w).alias("decayed_weight"),
            F.max("__anchor").alias("anchor_bucket"),
        )
    )


def merge_decayed_state(
    current: DataFrame | None,
    batch: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    half_life_sec: int,
) -> DataFrame:
    """Merge a micro-batch of raw events into the decayed-counter state.

    Both sides re-anchor to the newest bucket seen (state divides by
    2^(b_new - b_old) — exact; batch events weight by their own bucket
    age), then one keyed sum. State volume is |keys|; the merge shuffles
    only the batch's keys plus the state — at scale, store the state in the
    bucket-partitioned ``ParquetOnlineStore`` layout so each micro-batch
    reads/rewrites only its touched key buckets.
    """
    batch_state = bucketed_decay_recompute(
        batch, key_col, ts_col, value_col, half_life_sec
    )
    if current is None:
        return batch_state
    unioned = current.unionByName(batch_state)
    new_anchor = unioned.agg(F.max("anchor_bucket").alias("__na"))
    rescale = F.lit(1.0) / F.call_function(
        "shiftleft",
        F.lit(1).cast("long"),
        F.least(F.col("__na") - F.col("anchor_bucket"), F.lit(62)).cast("int"),
    ).cast("double")
    return (
        unioned.crossJoin(F.broadcast(new_anchor))
        .select(
            F.col(key_col),
            "n_events",
            (F.col("decayed_value") * rescale).alias("decayed_value"),
            (F.col("decayed_weight") * rescale).alias("decayed_weight"),
            F.col("__na").alias("anchor_bucket"),
        )
        .groupBy(key_col)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("decayed_value").alias("decayed_value"),
            F.sum("decayed_weight").alias("decayed_weight"),
            F.max("anchor_bucket").alias("anchor_bucket"),
        )
    )
