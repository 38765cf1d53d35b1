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
