"""Skew-mitigation operators for hot keys.

At the reference's scale (983 card keys, ~1.3k rows/key) skew is invisible;
at 100 TB a single hot card/merchant key can hold a whole shuffle hostage.
AQE's skew-join splitting covers joins automatically (enabled in
session.py); aggregations over skewed keys need the two-level (salted)
pattern below — partial aggregates over (key, salt) first, then the final
combine over the now-uniform key space.

Only algebraic aggregates (count/sum/min/max and things derivable from
them, like avg = sum/count) can be salted this way; holistic aggregates
(exact median) need different machinery (approx_percentile).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, num_salts: int):
    """Per-ROW salt from a hash of every column. NOT spark_partition_id:
    a small input (one cached/parquet partition) would put every row in
    ONE salt and silently degenerate the salted path back to the plain
    hot-key shuffle — the failure is invisible because results stay
    correct. A row hash spreads a hot key across all salts regardless of
    the input's partitioning. Identical duplicate rows share a salt;
    that skews only if one exact row dominates, in which case aggregate
    the duplicates first."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(num_salts))


def salted_stats(
    df: DataFrame,
    key: str,
    value: str,
    num_salts: int = 16,
) -> DataFrame:
    """Two-level count/sum/avg/min/max per key.

    Level 1 aggregates (key, salt) — hot keys fan out over ``num_salts``
    reducers; level 2 combines ``num_salts`` partials per key — uniform by
    construction. Returns (key, cnt, sum_v, avg_v, min_v, max_v).
    """
    salted = df.withColumn("__salt", _row_salt(df, num_salts))
    partial = salted.groupBy(key, "__salt").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum(value).alias("__sum"),
        F.min(value).alias("__min"),
        F.max(value).alias("__max"),
    )
    return (
        partial.groupBy(key)
        .agg(
            F.sum("__cnt").alias("cnt"),
            F.sum("__sum").alias("sum_v"),
            F.min("__min").alias("min_v"),
            F.max("__max").alias("max_v"),
        )
        .withColumn("avg_v", F.col("sum_v") / F.col("cnt"))
        .select(key, "cnt", "sum_v", "avg_v", "min_v", "max_v")
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    num_salts: int = 8,
) -> DataFrame:
    """Skew-proof fact⋈dim equi-join: salt the fact side's key, replicate the
    dim side across all salts, join on (key, salt).

    Prefer ``F.broadcast(dim)`` when the dim fits in memory (no shuffle at
    all) and AQE skew-join for sort-merge cases; this explicit form is for
    the middle ground — a dim too big to broadcast joined against a fact
    with pathological key skew.
    """
    salted_facts = facts.withColumn("__salt", _row_salt(facts, num_salts))
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    out = salted_facts.join(replicated_dim, [key, "__salt"])
    return out.drop("__salt")


def key_skew_profile(df: DataFrame, key: str, top_n: int = 20) -> DataFrame:
    """Key-distribution diagnostic: the top-N heaviest keys with their row
    counts, traffic share, and ratio to a uniform key (ratio 40x means this
    key's reducer gets 40 keys' worth of rows — the number that tells you
    whether the plain keyed shuffle survives or needs `salted_stats`/
    `bucketed_trailing_aggs`).

    One keyed count (map-side combined), a broadcast 1-row total, and a
    total-order top-N (count desc, key) via TakeOrderedAndProject — safe to
    run on the full 100 TB fact table as a planning probe.
    """
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("__total"), F.count(F.lit(1)).alias("__n_keys")
    )
    from feature_store_fraud_detection_spark.functions.numeric import round4_stable

    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            F.col(key),
            F.col("cnt"),
            round4_stable(F.col("cnt") / F.col("__total")).alias("share"),
            round4_stable(
                F.col("cnt").cast("double") * F.col("__n_keys") / F.col("__total")
            ).alias("ratio_to_uniform"),
        )
        .orderBy(F.col("cnt").desc(), F.col(key))
        .limit(top_n)
    )
