"""Deduplication operators for training-data pipelines: exact, n-gram
Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.

Scale design (the whole point at 100 TB):
- exact dedup = hash-groupBy on a digest, never on the raw text (shuffle
  moves 32-byte keys, not documents);
- n-gram Jaccard all-pairs is the VERIFICATION path (quadratic — only for
  bounded candidate sets); MinHash+LSH is the SCALE path: shingle ->
  K min-hashes -> band buckets -> candidates only within a bucket, so the
  self-join is on band keys (tiny) instead of documents (quadratic);
- all hashing is md5-based (portable across engines for the oracle; minimum
  over fixed-length lowercase hex strings == minimum over the encoded
  numbers, so signatures need no hex->int conversion);
- everything is built-in Column expressions (explode/groupBy/join) — zero
  Python UDFs, whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.operators.text_analysis import (
    doc_fingerprint,
    word_shingles,
)


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups by content digest: (fingerprint,
    canonical_id = min id, n_dupes). Reduce-side traffic is digests only."""
    return (
        df.select(F.col(id_col), doc_fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
    )


def shingle_table(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(id, shingle) exploded distinct word-k-gram table — the substrate for
    both exact Jaccard and MinHash."""
    return df.select(
        F.col(id_col), F.explode(word_shingles(text_col, k)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact all-pairs word-k-gram Jaccard >= threshold.

    Inverted-index self-join: pairs are generated per shared shingle and
    aggregated, so disjoint documents never meet (the join is |shared
    shingles|, not |docs|^2). Still quadratic in the worst case — use
    minhash_lsh_pairs at scale and this as the verifier on candidates.
    """
    sh = shingle_table(df, id_col, text_col, k).cache()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_inter", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, num_hashes: int = 16
) -> DataFrame:
    """(id, perm, minhash) — K permutation min-hashes per document.

    Permutation i is simulated by hashing ``i || '|' || shingle``; the min is
    taken over hex strings (order-equivalent to numeric min). One explode +
    one groupBy — a single shuffle keyed by id.
    """
    sh = shingle_table(df, id_col, text_col, k)
    perms = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("perm")
    return (
        sh.select(F.col(id_col), F.col("shingle"), perms)
        .select(
            F.col(id_col),
            F.col("perm"),
            F.md5(
                F.encode(
                    F.concat_ws("|", F.col("perm").cast("string"), F.col("shingle")),
                    "UTF-8",
                )
            ).alias("h"),
        )
        .groupBy(id_col, "perm")
        .agg(F.min("h").alias("minhash"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    threshold: float = 0.2,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, verified with exact Jaccard.

    Banding with r=1: two docs are candidates iff they share ANY of the K
    min-hashes (P[candidate | J] = 1-(1-J)^K; J=0.2,K=16 -> 97%). Candidates
    are then verified with exact shingle Jaccard, so precision is exact and
    only recall is probabilistic. The candidate join is on (perm, minhash)
    buckets — no quadratic document self-join.
    """
    sigs = minhash_signatures(df, id_col, text_col, k, num_hashes)
    a = sigs.alias("a")
    b = sigs.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.perm") == F.col("b.perm"))
            & (F.col("a.minhash") == F.col("b.minhash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    exact = ngram_jaccard_pairs(df, id_col, text_col, k, threshold=0.0)
    return (
        candidates.join(exact, ["id_a", "id_b"])
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_fingerprints(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32
) -> DataFrame:
    """(id, simhash) — SimHash over word tokens as a bit string.

    Bit b of token t = bit (b%4) of hex digit b//4 of md5(t) (portable hex
    -> nibble -> bit extraction, no platform hash). Bit b of the document =
    sign of sum over tokens of (+-1). Near-dup docs differ in few bits
    (Hamming); grouping by the fingerprint gives coarse clusters.
    """
    from feature_store_fraud_detection_spark.operators.text_analysis import tokens

    tok = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("tok")
    ).withColumn("h", F.md5(F.encode(F.col("tok"), "UTF-8")))
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b")
    per_bit = (
        tok.select(F.col(id_col), F.col("h"), bit)
        .withColumn(
            "nibble",
            F.expr("instr('0123456789abcdef', substring(h, b div 4 + 1, 1)) - 1"),
        )
        .withColumn(
            "contrib",
            F.expr("CASE WHEN (nibble >> (b % 4)) & 1 = 1 THEN 1 ELSE -1 END"),
        )
        .groupBy(id_col, "b")
        .agg(F.sum("contrib").alias("s"))
        .withColumn("bit", F.when(F.col("s") > 0, F.lit("1")).otherwise(F.lit("0")))
    )
    return (
        per_bit.groupBy(id_col)
        .agg(
            F.concat_ws(
                "", F.transform(F.array_sort(F.collect_list(F.struct("b", "bit"))), lambda x: x["bit"])
            ).alias("simhash")
        )
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    max_id: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (brute force).

    Exact quadratic baseline; at scale, bucket first (similarity.lsh_buckets)
    and run this within buckets. Dot products are sequential left-folds over
    doubles — deterministic and engine-portable.
    """
    from feature_store_fraud_detection_spark.operators.similarity import (
        cosine_expr,
        with_norm,
    )

    base = df if max_id is None else df.filter(F.col(id_col) < max_id)
    v = with_norm(base, id_col, vec_col)
    a = v.alias("a")
    b = v.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(
                cosine_expr(
                    F.col("a.__vec_d"),
                    F.col("b.__vec_d"),
                    F.col("a.__norm"),
                    F.col("b.__norm"),
                ),
                4,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
