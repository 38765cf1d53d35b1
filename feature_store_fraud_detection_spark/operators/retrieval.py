"""Ranked keyword retrieval over a document corpus (BM25).

Okapi BM25 with the Lucene non-negative idf: for query term t and doc D,

    idf(t)   = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)
    score(D) = sum_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))

Scale design: the only per-corpus work is one tokenize + explode + isin
filter, all fused in the scan's whole-stage-codegen (the filter drops
non-query tokens before anything leaves the stage), so shuffle traffic is
|matching postings|, not |tokens|. The df table and corpus stats are
broadcast (|query| rows and 1 row). Top-k is a TakeOrderedAndProject with a
total order (rounded score desc, id asc) — no global sort materializes.

Cross-engine determinism: per-term contributions are summed in FIXED query
order via one conditional-max per term (each doc has at most one tf row per
term), not a group-sum over arbitrary row order — float addition stays
associativity-free. ln() parity Spark-vs-DuckDB is relied on elsewhere in
the repo (token_tfidf) and the final score is floor-form rounded to 4.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.functions.numeric import round4_stable
from feature_store_fraud_detection_spark.operators.text_analysis import tokens


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    n: int = 10,
) -> DataFrame:
    """Top-n documents for a bag-of-terms query by BM25 score.

    Returns (id, n_matched_terms, score) — docs matching no query term are
    excluded (score would be 0).
    """
    base = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    dl = base.select(F.col(id_col), F.size("__toks").cast("bigint").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )
    postings = base.select(
        F.col(id_col), F.explode("__toks").alias("term")
    ).filter(F.col("term").isin(*query_terms))
    tf = postings.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    contrib = idf * (
        F.col("tf") * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl))
    )
    scored = (
        tf.join(F.broadcast(dfc), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), F.col("term"), contrib.alias("__c"))
    )
    # fixed-order summation: one conditional max per query term (≤1 row per
    # (doc, term) after the tf aggregate), added in literal query order
    per_term = [
        F.coalesce(F.max(F.when(F.col("term") == t, F.col("__c"))), F.lit(0.0))
        for t in query_terms
    ]
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_matched_terms"),
            round4_stable(reduce(lambda a, c: a + c, per_term)).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(n)
    )
