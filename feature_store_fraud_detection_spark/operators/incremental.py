"""Incremental aggregate maintenance: update stored per-key aggregates with
a new batch WITHOUT recomputing history.

The feature-store refresh problem: the offline table holds per-key
aggregate state (count / sum / min / max / last-event time); a day's new
events arrive; the new state must equal a full recompute over
history ∪ batch. For algebraic aggregates the merge is exact:

    count' = count + count_b        sum' = sum + sum_b
    min'   = min(min, min_b)        max' = max(max, max_b)

so the engine only aggregates the BATCH (tiny) and merges via one keyed
outer join against the stored state — cost O(|batch| + |touched keys|),
not O(|history|). Averages derive from (sum, count) at read time; medians/
distincts are not algebraic — keep a sketch (t-digest / HLL) in state for
those, same merge shape.

Sums are exact DECIMAL (the repo's money-math rule), so merge order cannot
produce float drift: merged state is bit-identical to the full recompute —
asserted by the oracle, which recomputes from scratch.

Scale: both sides of the merge join hash-partition on the key; with the
state table written via ``OfflineStore.write_bucketed`` the stored side
needs no shuffle at all. This is the batch twin of the streaming
``OnlineStoreSink`` upsert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: state schema columns maintained per key
STATE_COLS = ("txn_count", "value_sum", "value_min", "value_max", "last_ts")


def aggregate_state(df: DataFrame, key: str, ts_col: str, value_col: str) -> DataFrame:
    """Aggregate raw events into per-key state (full recompute / bootstrap
    path — also the per-batch partial aggregation)."""
    return df.groupBy(key).agg(
        F.count(F.lit(1)).alias("txn_count"),
        F.sum(F.col(value_col).cast("decimal(38,2)")).alias("value_sum"),
        F.min(value_col).alias("value_min"),
        F.max(value_col).alias("value_max"),
        F.max(ts_col).alias("last_ts"),
    )


def merge_aggregate_state(
    state: DataFrame, batch_state: DataFrame, key: str
) -> DataFrame:
    """Merge stored state with a batch's partial state (full outer join on
    the key; either side may introduce new keys). Output schema == state
    schema, so merges chain day after day."""
    s = state.select(
        F.col(key), *[F.col(c).alias(f"__s_{c}") for c in STATE_COLS]
    )
    b = batch_state.select(
        F.col(key), *[F.col(c).alias(f"__b_{c}") for c in STATE_COLS]
    )
    j = s.join(b, key, "full_outer")
    zero = F.lit(0)
    return j.select(
        F.col(key),
        (
            F.coalesce(F.col("__s_txn_count"), zero)
            + F.coalesce(F.col("__b_txn_count"), zero)
        ).alias("txn_count"),
        (
            F.coalesce(F.col("__s_value_sum"), F.lit(0).cast("decimal(38,2)"))
            + F.coalesce(F.col("__b_value_sum"), F.lit(0).cast("decimal(38,2)"))
        ).cast("decimal(38,2)").alias("value_sum"),
        F.least(
            F.coalesce(F.col("__s_value_min"), F.col("__b_value_min")),
            F.coalesce(F.col("__b_value_min"), F.col("__s_value_min")),
        ).alias("value_min"),
        F.greatest(
            F.coalesce(F.col("__s_value_max"), F.col("__b_value_max")),
            F.coalesce(F.col("__b_value_max"), F.col("__s_value_max")),
        ).alias("value_max"),
        F.greatest(
            F.coalesce(F.col("__s_last_ts"), F.col("__b_last_ts")),
            F.coalesce(F.col("__b_last_ts"), F.col("__s_last_ts")),
        ).alias("last_ts"),
    )


def distinct_sketch_state(df: DataFrame, key: str, col: str) -> DataFrame:
    """Per-key HLL sketch of a column's distinct values — the incremental
    substrate for the one aggregate ``merge_aggregate_state`` cannot carry
    algebraically (COUNT DISTINCT). The sketch is a few-KB binary per key;
    batches merge with ``merge_distinct_sketch`` and the union-of-sketches
    estimate equals the full-recompute estimate exactly (same sketch, same
    registers — asserted in tests), so daily refreshes never rescan
    history for distinct counts either."""
    return df.groupBy(key).agg(F.hll_sketch_agg(col).alias("distinct_sketch"))


def merge_distinct_sketch(
    state: DataFrame, batch_state: DataFrame, key: str
) -> DataFrame:
    """Union per-key sketches from stored state and a batch (either side
    may introduce new keys)."""
    return (
        state.unionByName(batch_state)
        .groupBy(key)
        .agg(F.hll_union_agg("distinct_sketch").alias("distinct_sketch"))
    )


def distinct_estimate(state: DataFrame, key: str) -> DataFrame:
    """(key, n_distinct) read view over sketch state."""
    return state.select(
        F.col(key),
        F.hll_sketch_estimate("distinct_sketch").cast("bigint").alias("n_distinct"),
    )
