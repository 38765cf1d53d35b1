"""KMV (k-minimum-values) distinct-count sketch — the deterministic,
cross-engine-reproducible alternative to HLL.

`operators/incremental.distinct_sketch_state` uses Spark's HLL sketches,
whose binary state is engine-specific (rows-only check). KMV fixes that:
hash every distinct value to a uniform point in (0,1) with md5 (the repo's
only hash), keep each key's k smallest points, and estimate
n_distinct ~= (k-1) / u_(k) where u_(k) is the k-th smallest point. Every
intermediate is a deterministic function of the data — DuckDB reproduces
the sketch AND the estimate bit-for-bit, so the oracle can hash it
(std error ~ 1/sqrt(k-2): k=256 -> ~6%).

Mergeability (the property that makes it a sketch, not a sample): the KMV
of a union is the k smallest of the combined point sets — merging per-day
sketches equals sketching the union directly (property-tested).

Scale: distinct (key, value) is one hash aggregation; the per-key k
smallest points is a row_number window that Spark >= 3.5 executes with
WindowGroupLimit (per-partition top-k pushdown before any sort of the
full group); sketch state is k doubles per key, constant-size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.functions.numeric import round4_stable

#: 60-bit hash space (md5 first 15 hex chars) — fits a double exactly
#: (< 2^60 needs 60 bits > 53-bit mantissa... the DIVISION result is a
#: rounded double, but identically rounded in both engines, so portable)
_KMV_SPACE = float(1 << 60)


def _uniform_point(col: Column) -> Column:
    """md5 -> 60-bit int -> double in (0,1); DuckDB twin:
    ('0x' || substr(md5(x), 1, 15))::BIGINT / 2^60."""
    return (
        F.conv(
            F.substring(F.md5(F.encode(col.cast("string"), "UTF-8")), 1, 15),
            16,
            10,
        ).cast("bigint")
        / F.lit(_KMV_SPACE)
    )


def kmv_sketch(df: DataFrame, key_col: str, value_col: str, k: int = 256) -> DataFrame:
    """Per-key KMV sketch: the (sorted) k smallest uniform points of the
    key's distinct values — constant-size mergeable state."""
    pts = (
        df.select(F.col(key_col), F.col(value_col))
        .distinct()
        .select(F.col(key_col), _uniform_point(F.col(value_col)).alias("__u"))
    )
    w = Window.partitionBy(key_col).orderBy("__u")
    return (
        pts.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .groupBy(key_col)
        .agg(F.sort_array(F.collect_list("__u")).alias("kmv"))
    )


def kmv_merge(a: DataFrame, b: DataFrame, key_col: str, k: int = 256) -> DataFrame:
    """Union two sketch tables: per key, the k smallest of the combined
    point sets (array-local — no re-scan of raw data)."""
    both = a.unionByName(b)
    return both.groupBy(key_col).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("kmv")))),
            1,
            k,
        ).alias("kmv")
    )


def _cms_bucket(col: Column, row: int, width: int) -> Column:
    """Row-``row`` bucket of a count-min sketch: md5 of the seeded value,
    first 15 hex chars as a 60-bit int, mod width. DuckDB twin:
    ('0x' || substr(md5('cms<row>:' || x), 1, 15))::BIGINT % width."""
    seeded = F.concat(F.lit(f"cms{row}:"), col.cast("string"))
    return (
        F.conv(F.substring(F.md5(F.encode(seeded, "UTF-8")), 1, 15), 16, 10)
        .cast("bigint")
        % F.lit(width)
    )


def cms_sketch(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Count-min sketch of an item stream -> (row, bucket, cnt).

    ``depth`` independent md5-seeded hash rows of ``width`` counters; each
    occurrence increments one counter per row. Like KMV (above) and unlike
    engine-native sketch state, every counter is a deterministic function
    of the data, so the DuckDB oracle reproduces the sketch bit-for-bit.

    Scale: the explode multiplies rows by ``depth`` BEFORE a map-side
    combined aggregate whose result is at most ``depth * width`` cells —
    shuffle traffic is the sketch size (constant), not the stream. Sketches
    of shards merge by cell-wise addition (same groupBy), the property that
    lets 1000 executors sketch 100 TB independently.
    """
    rows = F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("row"),
                _cms_bucket(F.col(item_col), r, width).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("s"))
        .select("s.row", "s.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_query(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-query a count-min sketch: estimate = min over rows of the
    item's counter. Guaranteed >= the true count (never under), within
    2N/width with probability 1 - 2^-depth.

    The sketch is at most ``depth * width`` cells — broadcast — so probing
    any number of items is a narrow map-side join, no shuffle of the probe
    side."""
    probes = items.select(
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row"),
                        _cms_bucket(F.col(item_col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("s"),
    ).select(item_col, "s.row", "s.bucket")
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def kmv_estimate(sketch: DataFrame, key_col: str, k: int = 256) -> DataFrame:
    """Distinct-count estimate per key: (k-1)/u_(k) when the sketch is
    full, else the EXACT count (fewer than k distinct values seen — every
    point is in the sketch)."""
    n_pts = F.size("kmv")
    u_k = F.element_at("kmv", k)
    est = F.when(n_pts < k, n_pts.cast("double")).otherwise(
        F.lit(float(k - 1)) / u_k
    )
    return sketch.select(
        key_col,
        n_pts.alias("sketch_size"),
        round4_stable(est).alias("distinct_est"),
    )
