"""Corpus curation operators: the dedup-adjacent steps an LLM training-data
pipeline runs AFTER candidate duplicates are found — chunk-level cross-doc
dedup, canonical-representative selection per near-dup cluster, incremental
new-batch-vs-corpus dedup, and duplicate-cluster-aware train/test splitting.

These compose the primitives in ``operators/dedup.py`` (pair generation,
connected components) and ``operators/text_analysis.py`` (chunking) into the
decisions a curation pipeline actually ships: which bytes to keep.

Scale notes (100 TB):
- every cross-document shuffle in this module is keyed on a 32-byte md5
  digest or a cluster label — document text never shuffles;
- representative selection is a partial-aggregatable ``min(struct(...))``
  per cluster, not a per-cluster sort window;
- the split decision is a pure hash function of the cluster label, so it is
  reproducible across engines, runs and partitionings (same construction as
  ``operators/sampling.hash_sample``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.operators.dedup import dedup_clusters
from feature_store_fraud_detection_spark.operators.text_analysis import (
    chunk_documents,
)


def chunk_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 32,
) -> DataFrame:
    """Cross-document chunk-level dedup profile: split every document into
    non-overlapping ``chunk_size``-token chunks, mark each chunk a duplicate
    unless it is the globally FIRST occurrence of its content (ordered by
    (doc id, chunk position)), and report per-document retention stats.

    This is the "remove boilerplate repeated across pages" step of web-corpus
    pipelines (the chunk-granular complement of whole-doc exact dedup):
    documents keep their unique chunks and shed content already contributed
    by an earlier document.

    Returns (id, n_chunks, n_dup_chunks, kept_tokens, dup_ratio) for every
    non-empty document; dup_ratio is rounded to 4 decimals for cross-engine
    hashing.

    Shape at scale: chunking is array-local (narrow); the first-occurrence
    election shuffles ONE 32-byte digest row per chunk (``groupBy(digest)``
    with a partial-aggregatable ``min(struct)``), the digest join is keyed on
    the digest on both sides, and the final rollup shuffles on the doc id.
    Chunk text itself never crosses the wire — only digests and positions.
    """
    chunks = chunk_documents(
        df, id_col, text_col, chunk_size=chunk_size, stride=chunk_size
    )
    keyed = chunks.select(
        F.col(id_col),
        "chunk_idx",
        "n_tokens",
        F.md5("chunk_text").alias("digest"),
    )
    firsts = keyed.groupBy("digest").agg(
        F.min(F.struct(F.col(id_col).alias("i"), F.col("chunk_idx").alias("c"))).alias(
            "first"
        )
    )
    flagged = keyed.join(firsts, "digest").withColumn(
        "is_first",
        (F.col(id_col) == F.col("first.i")) & (F.col("chunk_idx") == F.col("first.c")),
    )
    return flagged.groupBy(id_col).agg(
        F.count("*").cast("int").alias("n_chunks"),
        F.sum(F.when(~F.col("is_first"), 1).otherwise(0))
        .cast("int")
        .alias("n_dup_chunks"),
        F.sum(F.when(F.col("is_first"), F.col("n_tokens")).otherwise(0))
        .cast("int")
        .alias("kept_tokens"),
        F.floor(
            F.sum(F.when(~F.col("is_first"), 1.0).otherwise(0.0))
            / F.count("*")
            * 10000
            + F.lit(0.5)
        ).cast("double")
        .alias("_dr10k"),
    ).select(
        id_col,
        "n_chunks",
        "n_dup_chunks",
        "kept_tokens",
        (F.col("_dr10k") / 10000).alias("dup_ratio"),
    )


def canonical_docs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    rank_col: str,
) -> DataFrame:
    """Representative selection: collapse each near-dup cluster (connected
    components over ``pairs``) to ONE kept document — the one with the
    largest ``rank_col`` (e.g. longest text, or a precomputed quality
    score), smallest id on ties.

    Returns one row per cluster: (id = the keeper, canonical_id,
    cluster_size, <rank_col> of the keeper). Singleton documents are their
    own cluster and always survive.

    Shape at scale: cluster labels come from the iterative min-label
    propagation in :func:`operators.dedup.dedup_clusters` (diameter-bounded
    rounds, digest-keyed edges); the election itself is a single
    ``groupBy(cluster)`` with a partial-aggregatable ``min(struct(-rank,
    id))`` — NO per-cluster sort window, so a pathological million-doc
    cluster costs one combiner tree, not one task-local sort.
    """
    labels = dedup_clusters(pairs, docs, id_col)
    joined = docs.select(id_col, rank_col).join(labels, id_col)
    return (
        joined.groupBy("canonical_id")
        .agg(
            F.count("*").cast("int").alias("cluster_size"),
            F.min(
                F.struct(
                    (-F.col(rank_col)).alias("neg_rank"),
                    F.col(id_col).alias("keep_id"),
                )
            ).alias("m"),
        )
        .select(
            F.col("m.keep_id").alias(id_col),
            "canonical_id",
            "cluster_size",
            (-F.col("m.neg_rank")).alias(rank_col),
        )
    )


def incremental_corpus_dedup(
    new_docs: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Incremental ingest dedup: given a NEW batch of documents and the
    already-curated corpus, keep only new documents whose exact content
    (md5 digest) neither appears in the corpus nor earlier in the batch
    (first occurrence by id wins within the batch).

    This is the steady-state form of exact dedup — at 100 TB you never
    re-dedup the whole corpus per ingest; you anti-join the day's batch
    (small) against the corpus digest index (large, but only digests).

    Returns the surviving new rows (id, digest plus the batch's columns
    minus text duplicates is left to the caller — here: id, digest).

    Shape at scale: both the within-batch election (``groupBy(digest)``,
    min id) and the corpus anti-join are keyed on the 32-byte digest; the
    corpus side projects ONLY its digest column (scan-pruned), so the heavy
    side never moves text.
    """
    batch = new_docs.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("digest")
    )
    first_in_batch = (
        batch.groupBy("digest")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, "digest")
    )
    corpus_digests = corpus.select(F.md5(F.col(text_col)).alias("digest"))
    return first_in_batch.join(corpus_digests, "digest", "left_anti").select(
        id_col, "digest"
    )


def cluster_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    train_fraction: float = 0.8,
    salt: str = "split",
) -> DataFrame:
    """Duplicate-aware train/test split: every document in the same near-dup
    cluster lands on the SAME side, killing the classic eval-set leakage
    where a test document's near-duplicate sits in train.

    The side is a pure hash of the cluster's canonical id (md5 first 60 bits
    vs an exact integer threshold — the :func:`sampling.hash_sample`
    construction), so the split is reproducible across engines, runs and
    cluster sizes, and growing ``train_fraction`` only MOVES clusters from
    test to train (monotone). Returns (id, canonical_id, split).
    """
    threshold = int(train_fraction * (16**15))
    labels = dedup_clusters(pairs, docs, id_col)
    digest = F.md5(F.concat_ws("|", F.lit(salt), F.col("canonical_id").cast("string")))
    return labels.select(
        id_col,
        "canonical_id",
        F.when(
            F.conv(F.substring(digest, 1, 15), 16, 10).cast("decimal(20,0)")
            < F.lit(threshold).cast("decimal(20,0)"),
            F.lit("train"),
        )
        .otherwise(F.lit("test"))
        .alias("split"),
    )
