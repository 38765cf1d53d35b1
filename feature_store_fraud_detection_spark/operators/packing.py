"""Sequence packing: place documents into fixed-capacity context windows.

The training-data step between a cleaned corpus and a pretraining run:
documents are concatenated in a deterministic order and split into
``capacity``-token packs, and each document needs to know its pack id and
offset (a doc may span a pack boundary — the standard concatenate-then-split
packing of LLM pipelines, which wastes zero tokens).

Scale design: a single global concatenation order would serialize the corpus
through one running sum. Instead documents are first hash-sharded
(``n_shards`` deterministic md5 buckets) and packed independently WITHIN each
shard — every shuffle and window is keyed by shard, so 100 TB packs with
shard-parallelism (each training data-loader rank reads its own shards; the
per-shard remainder tail is the only waste, bounded by n_shards * capacity
tokens corpus-wide). The running offset is one window sum over
(shard, doc_id) — order is total, so placement is reproducible run-to-run
and engine-to-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.operators.text_analysis import token_count


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    capacity: int = 256,
    n_shards: int = 8,
) -> DataFrame:
    """Assign each document a (shard, pack_id, pack_offset) placement.

    Within a shard, docs concatenate in ``id_col`` order; ``shard_offset``
    is the exclusive running token count, ``pack_id = shard_offset div
    capacity``, ``pack_offset = shard_offset % capacity``, and
    ``spans_boundary`` flags docs split across two packs. Integer div/mod
    only — no float bucketing (exact on both engines at any offset).
    """
    base = df.select(
        F.col(id_col),
        token_count(text_col).cast("bigint").alias("n_tokens"),
        (
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
            ).cast("bigint")
            % n_shards
        ).alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        base.withColumn(
            "shard_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        )
        .withColumn("pack_id", F.expr(f"shard_offset div {capacity}"))
        .withColumn("pack_offset", F.col("shard_offset") % capacity)
        .withColumn(
            "spans_boundary",
            ((F.col("pack_offset") + F.col("n_tokens")) > capacity).cast("int"),
        )
    )


def export_training_shards(
    df: DataFrame,
    id_col: str,
    path: str,
    n_shards: int = 8,
    salt: str = "shard",
) -> None:
    """Write the training corpus as ``n_shards`` deterministic shards, each
    internally shuffled in a reproducible pseudo-random order — the layout a
    data loader consumes (shard = worker unit; within-shard order = the
    epoch-0 sample order).

    Both decisions are pure functions of the row id:
    - shard = pmod(xxhash64(salt, id), n_shards) — uniform, skew-free, and
      stable across runs/partitionings (a seeded ``repartition`` is neither);
    - within-shard order = md5(salt|id) — the same deterministic shuffle
      trick as ``sampling.shuffle_rows``, so a re-export byte-reproduces.

    Plan shape: ONE exchange (repartition on the shard key), a
    within-partition sort (no global sort), and a partitioned write —
    ``shard=N/`` directories, each readable independently.
    """
    shard = F.pmod(F.xxhash64(F.lit(salt), F.col(id_col)), F.lit(n_shards)).cast(
        "int"
    )
    order_key = F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    (
        df.withColumn("shard", shard)
        .withColumn("__ord", order_key)
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "__ord")
        .drop("__ord")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
