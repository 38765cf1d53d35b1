"""Benchmark decontamination: flag training documents whose word-n-gram
shingles overlap a held-out benchmark/eval set.

The standard LLM-corpus hygiene step (the reference has no equivalent — this
extends the engine's dedup family to train/test contamination): a document is
contaminated when >= ``threshold`` of its distinct k-gram shingles also occur
anywhere in the benchmark set.

Scale design (100 TB corpus, bounded benchmark):
- the benchmark side reduces to its DISTINCT shingle set — benchmarks are
  thousands of documents, so millions of short strings at most; that set is
  broadcast, and the corpus-side probe is a broadcast semi-join — the corpus
  (the 100 TB side) is never shuffled by the join;
- the only exchange is the per-doc overlap count's groupBy(doc_id), which is
  partial-aggregated map-side to one (doc_id, count) row per doc;
- both sides share one exploded shingle table per input, so parity between
  the size denominator and the overlap numerator is structural (no separate
  tokenization that could drift);
- at extreme benchmark sizes (too big to broadcast), drop the broadcast hint
  and the same plan degrades gracefully to a hash join on 32-byte shingles —
  still never on documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.functions.numeric import round4_stable
from feature_store_fraud_detection_spark.operators.dedup import shingle_table


def benchmark_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """(id, n_shingles, n_overlap, overlap_ratio, contaminated) per doc.

    ``overlap_ratio`` = |doc shingles ∩ benchmark shingles| / |doc shingles|,
    floor-rounded to 4 decimals (round4_stable) BEFORE the threshold gate so
    boundary documents classify identically on any engine.
    """
    doc_sh = shingle_table(docs, id_col, text_col, k)
    bench_sh = (
        shingle_table(benchmark, id_col, text_col, k)
        .select("shingle")
        .distinct()
    )
    sizes = doc_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    overlap = (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    ratio = round4_stable(
        F.col("n_overlap") / F.col("n_shingles").cast("double")
    )
    return (
        sizes.join(overlap, id_col, "left")
        .withColumn("n_overlap", F.coalesce(F.col("n_overlap"), F.lit(0)))
        .withColumn("overlap_ratio", ratio)
        .withColumn(
            "contaminated",
            (F.col("overlap_ratio") >= threshold).cast("int"),
        )
        .select(id_col, "n_shingles", "n_overlap", "overlap_ratio", "contaminated")
    )


def split_novelty(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
) -> DataFrame:
    """Per-test-document n-gram NOVELTY against the train split — the
    large-train companion to :func:`benchmark_contamination` (which
    broadcasts a bounded benchmark): for each test document, the
    fraction of its distinct k-gram shingles never seen ANYWHERE in
    train. Low novelty marks memorization risk / split leakage — the
    eval rows the model may have effectively already read; it is also
    the honest denominator for "how hard is this held-out set".

    Scale design: both sides collapse to DISTINCT md5 shingle DIGEST
    tables (text never shuffles — the dup_ngram_stats rule), the probe
    is one digest-keyed left join (co-partitioned 32-byte keys; the
    train index can be arbitrarily large — no broadcast assumption),
    and the readout is one per-doc count aggregate. Test documents with
    zero shingles (shorter than k tokens) have no novelty to measure
    and are absent from the output.

    Output per test doc: ``(id, n_shingles, n_seen, novelty)`` with
    ``novelty = 1 - n_seen/n_shingles`` (round4) — exact integer counts
    otherwise.
    """
    tr = (
        shingle_table(train, id_col, text_col, k)
        .select(F.md5("shingle").alias("__d"))
        .distinct()
        .withColumn("__seen", F.lit(1))
    )
    te = (
        shingle_table(test, id_col, text_col, k)
        .select(F.col(id_col), F.md5("shingle").alias("__d"))
        .distinct()
    )
    per_doc = (
        te.join(tr, "__d", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("__seen"), F.lit(0))).alias("n_seen"),
        )
    )
    return per_doc.select(
        id_col,
        F.col("n_shingles").cast("bigint").alias("n_shingles"),
        F.col("n_seen").cast("bigint").alias("n_seen"),
        round4_stable(
            F.lit(1.0)
            - F.col("n_seen").cast("double")
            / F.col("n_shingles").cast("double")
        ).alias("novelty"),
    )
