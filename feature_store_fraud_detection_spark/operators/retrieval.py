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


def _md5_int(prefix: str, col: Column) -> Column:
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(prefix), col)), 1, 15), 16, 10
    ).cast("bigint")


def hashed_doc_vectors(
    df: DataFrame, id_col: str, text_col: str, dim: int = 64
) -> DataFrame:
    """Sparse document vectors via the hashing trick: token -> md5 bucket in
    [0, dim), signed (second salted hash bit), weighted by exact TF-IDF —
    text similarity WITHOUT an embedding model, at tokenizer cost.

    Long format (doc_id, bucket, w): the natural layout for inverted-index
    dot products and for feeding `similarity`'s dense kernels after a
    pivot. No vocabulary fit, no driver state — every stage is a keyed
    hash aggregate, so the transform is stateless and streamable.

    Determinism: bucket collisions sum multiple tokens' weights — the fold
    runs over the SORTED contribution list (fixed IEEE order, the repo
    rule), and weights round to 4 before anything downstream reads them.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    term_c = F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))
    sign = F.when(_md5_int("s|", F.col("term")) % 2 == 0, F.lit(1.0)).otherwise(
        F.lit(-1.0)
    )
    contribs = (
        tf.join(dfc, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            (_md5_int("b|", F.col("term")) % dim).alias("bucket"),
            (sign * term_c).alias("c"),
        )
    )
    folded = F.aggregate(
        F.array_sort(F.collect_list("c")), F.lit(0.0), lambda a, x: a + x
    )
    return (
        contribs.groupBy(id_col, "bucket")
        .agg(round4_stable(folded).alias("w"))
        .filter(F.col("w") != 0.0)
    )


def hashed_vector_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_max_id: int,
    dim: int = 64,
    top_k: int = 5,
) -> DataFrame:
    """Top-k most-similar documents per query doc (id < query_max_id) by
    cosine over the hashed TF-IDF vectors — sparse dot products computed as
    an inverted-index join on the bucket id, so disjoint vectors never
    meet and shuffle traffic is |matching (doc, bucket) postings|.

    The dot-product sum per pair and the norm sum per doc both fold sorted
    lists (engine-fixed IEEE order). Output ranks with a total order
    (cosine desc, neighbor id).
    """
    from pyspark.sql import Window

    vecs = hashed_doc_vectors(df, id_col, text_col, dim)
    norms = vecs.groupBy(id_col).agg(
        F.sqrt(
            F.aggregate(
                F.array_sort(F.collect_list(F.col("w") * F.col("w"))),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        ).alias("nrm")
    )
    q = vecs.filter(F.col(id_col) < query_max_id).select(
        F.col(id_col).alias("query_id"), "bucket", F.col("w").alias("wq")
    )
    c = vecs.select(
        F.col(id_col).alias("neighbor_id"), "bucket", F.col("w").alias("wc")
    )
    dots = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.col("wq") * F.col("wc"))),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("dot")
        )
    )
    qn = norms.select(F.col(id_col).alias("query_id"), F.col("nrm").alias("qn"))
    cn = norms.select(
        F.col(id_col).alias("neighbor_id"), F.col("nrm").alias("cn")
    )
    scored = (
        dots.join(qn, "query_id")
        .join(cn, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            round4_stable(F.col("dot") / (F.col("qn") * F.col("cn"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str,
    k: int = 60,
    top_n: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of N rankings — the standard way to combine
    heterogeneous retrieval signals (lexical BM25 + semantic ANN + quality
    priors) without score calibration: rrf = sum_i 1 / (k + rank_i), items
    absent from a list contribute 0 for it.

    Each input must carry (id_col, rank) with rank 1-based. Returns
    (id, rank_1..rank_N as nullable ints, n_lists, rrf_score, fused_rank)
    ordered by the reproducible total order (rounded score desc, id).

    Determinism: the per-list reciprocal terms are added in FIXED list
    order via a chain of outer joins + coalesce (never a group-sum over
    arbitrary row order — the repo's float-summation rule). Scale: the
    inputs are top-k lists (bounded), so every join here is a broadcast
    of a few hundred rows regardless of corpus size; the heavy lifting
    stays inside the upstream retrieval operators.
    """
    from functools import reduce

    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    sides = [
        r.select(
            F.col(id_col),
            F.col("rank").cast("int").alias(f"rank_{i + 1}"),
        )
        for i, r in enumerate(rankings)
    ]
    # no broadcast hint: Spark cannot broadcast a FULL OUTER side; the
    # inputs are top-k lists, so the shuffle moves k rows, not the corpus
    fused = reduce(lambda a, b: a.join(b, id_col, "full_outer"), sides)
    terms = [
        F.coalesce(
            F.lit(1.0) / (F.lit(k) + F.col(f"rank_{i + 1}")), F.lit(0.0)
        )
        for i in range(len(sides))
    ]
    present = [
        F.col(f"rank_{i + 1}").isNotNull().cast("int")
        for i in range(len(sides))
    ]
    scored = fused.select(
        id_col,
        *[f"rank_{i + 1}" for i in range(len(sides))],
        reduce(lambda a, c: a + c, present).alias("n_lists"),
        round4_stable(reduce(lambda a, c: a + c, terms)).alias("rrf_score"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col))
    return (
        scored.withColumn("fused_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("fused_rank") <= top_n)
    )


def mmr_rerank(
    candidates: DataFrame,
    id_col: str,
    rel_col: str,
    toks_col: str,
    n_select: int = 5,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal-marginal-relevance re-ranking of a BOUNDED candidate list —
    the standard diversity stage after fusion (rrf_fuse): greedily pick

        argmax_i  lam * rel(i) - (1 - lam) * max_{j in selected} sim(i, j)

    where sim is token-set Jaccard, until ``n_select`` items are chosen.
    lam=1 reproduces the relevance order; lam->0 spreads picks across
    dissimilar docs. Returns (id, mmr_rank, rel, mmr_score).

    Scale/determinism design: the candidate list is top-k (tens of rows),
    so the whole greedy selection runs as ONE in-plan fold — candidates
    are collected into a single array and ``aggregate(sequence(1, n))``
    appends the arg-best remaining candidate per step. No driver loop, no
    per-step job. The arg-best uses an INTEGER sort key (the MMR score in
    floor-rounded 1e-4 grid, negated, tie-broken by id), so selection
    never compares raw doubles and the DuckDB twin (same fold unrolled as
    one CTE per step) picks bit-identical items. The heavy lifting
    (retrieval, fusion) stays upstream; this stage is O(n_select * k^2)
    Jaccard evaluations on one executor — trivially bounded.
    """
    c_struct = F.struct(
        F.col(id_col).cast("bigint").alias("id"),
        F.col(rel_col).cast("double").alias("rel"),
        F.array_distinct(F.col(toks_col)).alias("toks"),
    )
    packed = candidates.agg(
        F.array_sort(F.collect_list(c_struct)).alias("C")
    )
    mu = 1.0 - lam
    fold = f"""
aggregate(
  sequence(1, {int(n_select)}),
  cast(array() as array<struct<key: bigint, id: bigint, rel: double,
                               toks: array<string>>>),
  (acc, s) -> acc || slice(array_sort(transform(
    filter(C, c -> NOT exists(acc, a -> a.id = c.id)),
    c -> named_struct(
      'key',
      -cast(floor(({lam!r} * c.rel - {mu!r} * coalesce(
          array_max(transform(acc, a ->
            cast(size(array_intersect(c.toks, a.toks)) as double)
            / cast(size(array_union(c.toks, a.toks)) as double))),
          cast(0.0 as double))) * 10000 + 0.5) as bigint),
      'id', c.id, 'rel', c.rel, 'toks', c.toks)
  )), 1, 1)
)
"""
    return (
        packed.select(
            F.posexplode(F.expr(fold)).alias("__pos", "__s")
        )
        .select(
            F.col("__s.id").alias(id_col),
            (F.col("__pos") + 1).cast("int").alias("mmr_rank"),
            F.col("__s.rel").alias("rel"),
            (-F.col("__s.key") / F.lit(10000.0)).alias("mmr_score"),
        )
    )
