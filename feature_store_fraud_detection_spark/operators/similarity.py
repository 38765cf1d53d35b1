"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline. Query
  side is broadcast; the data side is scanned once, ranked per query with a
  window top-k (WindowGroupLimit prunes per partition before the shuffle).
- ``lsh_buckets`` / ``lsh_topk``: random-hyperplane LSH — the scale path.
  Hyperplane components are derived from md5 (deterministic, seedable,
  engine-portable), so bucket assignment is reproducible anywhere.

Numeric portability: dot products are sequential left-folds over doubles
(``aggregate(zip_with(...))``) — the exact same IEEE operation order as the
DuckDB oracle's ``list_reduce``, so cosines match bit-for-bit.

All of it is built-in higher-order column functions — JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product: ((0+x1)+x2)+... — deterministic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def with_norm(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Attach a double-typed copy of the vector and its L2 norm."""
    vec_d = _to_double(F.col(vec_col))
    return df.select(
        F.col(id_col),
        vec_d.alias("__vec_d"),
        F.sqrt(dot_expr(vec_d, vec_d)).alias("__norm"),
    )


def cosine_expr(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    return dot_expr(a, b) / (norm_a * norm_b)


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_max_id: int,
    top_k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for every vector with id < query_max_id.

    The query side (small) broadcasts; each executor scans its slice of the
    corpus once and emits (query, candidate, cosine); a per-query window
    keeps the top-k with id tie-break. No |corpus|^2 blow-up — cost is
    |queries| x |corpus| partitioned across the cluster.
    """
    from pyspark.sql import Window

    v = with_norm(df, id_col, vec_col)
    q = v.filter(F.col(id_col) < query_max_id).select(
        F.col(id_col).alias("query_id"),
        F.col("__vec_d").alias("__qvec"),
        F.col("__norm").alias("__qnorm"),
    )
    pairs = F.broadcast(q).join(v, F.col("query_id") != F.col(id_col))
    scored = pairs.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(
            cosine_expr(
                F.col("__qvec"), F.col("__vec_d"), F.col("__qnorm"), F.col("__norm")
            ),
            4,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_buckets(
    df: DataFrame, id_col: str, vec_col: str, num_planes: int = 8
) -> DataFrame:
    """Assign each vector a random-hyperplane LSH bucket key.

    bucket bit p = sign of <vec, H_p> where H_p[d] = (first hex nibble of
    md5('p,d')) - 7.5 — a deterministic pseudo-random hyperplane, portable
    to any engine with md5, no driver-side RNG arrays to broadcast.
    Cosine-similar vectors agree on most signs, so near neighbors collide.
    """
    plane = F.explode(F.sequence(F.lit(0), F.lit(num_planes - 1))).alias("plane")
    exploded = df.select(F.col(id_col), plane, F.col(vec_col))
    per_dim = exploded.select(
        F.col(id_col),
        F.col("plane"),
        F.posexplode(_to_double(F.col(vec_col))).alias("dim", "x"),
    )
    contrib = per_dim.withColumn(
        "hp",
        F.expr(
            "instr('0123456789abcdef', substring("
            "md5(encode(concat_ws(',', cast(plane as string), cast(dim as string)), 'UTF-8')),"
            " 1, 1)) - 1 - 7.5"
        ),
    ).withColumn("c", F.col("x") * F.col("hp"))
    signs = (
        contrib.groupBy(id_col, "plane")
        .agg(F.sum("c").alias("s"))
        .withColumn("bit", F.when(F.col("s") > 0, F.lit("1")).otherwise(F.lit("0")))
    )
    return signs.groupBy(id_col).agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("plane", "bit"))),
                lambda x: x["bit"],
            ),
        ).alias("bucket")
    )


def lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_max_id: int,
    top_k: int = 5,
    num_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    then exact cosine ranking within the bucket. The join is on bucket keys
    — at scale this turns |queries| x |corpus| into |queries| x |bucket|."""
    from pyspark.sql import Window

    buckets = lsh_buckets(df, id_col, vec_col, num_planes)
    v = with_norm(df, id_col, vec_col).join(buckets, id_col)
    q = v.filter(F.col(id_col) < query_max_id).select(
        F.col(id_col).alias("query_id"),
        F.col("__vec_d").alias("__qvec"),
        F.col("__norm").alias("__qnorm"),
        F.col("bucket").alias("__qbucket"),
    )
    pairs = F.broadcast(q).join(
        v,
        (F.col("__qbucket") == F.col("bucket"))
        & (F.col("query_id") != F.col(id_col)),
    )
    scored = pairs.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(
            cosine_expr(
                F.col("__qvec"), F.col("__vec_d"), F.col("__qnorm"), F.col("__norm")
            ),
            4,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
