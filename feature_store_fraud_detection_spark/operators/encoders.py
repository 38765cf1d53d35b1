"""ML feature-engineering encoders: k-fold assignment, leave-one-out target
encoding, and the feature-hashing trick.

These extend the reference's modeling prep (StringIndexer / scaler / split,
``model/preprocessing.py``) with the encoders a large-scale training pipeline
needs between the feature store and the trainer. All are pure column
expressions / keyed aggregations:

- fold and hash assignments use md5-derived integers (NOT the engine's
  ``hash()``/``xxhash64``), so the same row lands in the same fold/bucket on
  any engine and any cluster — reproducibility across reruns is the whole
  point of deterministic splits;
- target encoding aggregates integer label sums (exact, order-independent),
  and leaves the quotient's 4-decimal floor-rounding to the output edge;
- everything partial-aggregates map-side; nothing is a global window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.functions.numeric import round4_stable


def md5_int(c: Column) -> Column:
    """Portable 60-bit integer hash: first 15 hex chars of md5 of the
    string form. DuckDB twin: ``('0x' || substr(md5(x), 1, 15))::BIGINT``."""
    return F.conv(
        F.substring(F.md5(F.encode(c.cast("string"), "UTF-8")), 1, 15), 16, 10
    ).cast("bigint")


def kfold_assign(df: DataFrame, id_col: str, k: int = 5) -> DataFrame:
    """Deterministic k-fold assignment: fold = md5_int(id) % k.

    Hash-based (not row_number-based) so the assignment is stable under
    repartitioning, appends, and re-runs — fold membership depends only on
    the id value. Adding data never moves an existing row between folds,
    which keeps incremental CV training honest."""
    return df.withColumn("fold", (md5_int(F.col(id_col)) % k).cast("int"))


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    out_col: str = "loo_te",
) -> DataFrame:
    """Leave-one-out target encoding: each row gets the mean label of its
    category EXCLUDING itself — (sum(label) - own label) / (n - 1).

    LOO removes the self-leakage that makes plain mean-encoding overfit
    (a row's own label never contributes to its feature). Singleton
    categories (n == 1) and the resulting 0/0 fall back to the GLOBAL mean —
    the conventional prior.

    Exactness: labels are integers, so the per-category sums are exact and
    order-independent (no decimal dance needed); only the final quotients
    are doubles, floor-rounded at the output edge. One keyed aggregation +
    one keyed join; the global mean is a scalar broadcast.
    """
    lbl = F.col(label_col).cast("bigint")
    per_cat = df.groupBy(cat_col).agg(
        F.sum(lbl).alias("__cat_sum"), F.count(F.lit(1)).alias("__cat_n")
    )
    glob = df.agg(
        F.sum(lbl).alias("__g_sum"), F.count(F.lit(1)).alias("__g_n")
    )
    loo = (F.col("__cat_sum") - lbl) / (F.col("__cat_n") - 1).cast("double")
    global_mean = F.col("__g_sum") / F.col("__g_n").cast("double")
    return (
        df.join(per_cat, cat_col)
        .crossJoin(F.broadcast(glob))
        .withColumn(
            out_col,
            round4_stable(
                F.when(F.col("__cat_n") > 1, loo).otherwise(global_mean)
            ),
        )
        .drop("__cat_sum", "__cat_n", "__g_sum", "__g_n")
    )


def feature_hash(
    df: DataFrame,
    id_col: str,
    cat_cols: list[str],
    num_buckets: int = 32,
) -> DataFrame:
    """The hashing trick: project arbitrary categorical columns into a
    fixed ``num_buckets``-dimensional space with a signed hash, emitted in
    long format (id, feature_idx, feature_val) — collisions sum.

    idx  = md5_int(col_name || '=' || value) % num_buckets  (name-salted so
    identical values in different columns hash independently);
    sign = +-1 from hash bit 32 (the standard variance-canceling trick:
    colliding features subtract as often as they add). Bit 32 via SHIFT, not
    division — ``floor(h / b)`` would round the 60-bit hash through a double
    and diverge from integer semantics above 2^53; a shift is exact, and bit
    32 is disjoint from the idx bits for any ``num_buckets`` <= 2^32.

    Long format is deliberate at 100 TB: the shuffle carries only non-zero
    entries (|rows| x |cat_cols|), and downstream training consumes exactly
    this sparse layout. No vocabulary, no fit step, no driver state — the
    encoder is a stateless expression, which is what makes it streamable.
    """
    parts = []
    for c in cat_cols:
        tagged = F.concat_ws("=", F.lit(c), F.col(c).cast("string"))
        h = md5_int(tagged)
        parts.append(
            F.struct(
                (h % num_buckets).cast("int").alias("feature_idx"),
                F.when(F.shiftright(h, 32).bitwiseAND(F.lit(1)) == 0, F.lit(1))
                .otherwise(F.lit(-1))
                .alias("sign"),
            )
        )
    exploded = df.select(
        F.col(id_col), F.explode(F.array(*parts)).alias("__f")
    )
    return (
        exploded.groupBy(id_col, F.col("__f.feature_idx").alias("feature_idx"))
        .agg(F.sum("__f.sign").cast("bigint").alias("feature_val"))
        # opposite-sign collisions cancel to 0 == absent in a sparse vector;
        # keep the output truly sparse
        .filter(F.col("feature_val") != 0)
    )


def collapse_rare_categories(
    df: DataFrame,
    col: str,
    min_count: int,
    other_label: str = "__other__",
    out_col: str | None = None,
) -> DataFrame:
    """Long-tail bucketing: category values seen fewer than ``min_count``
    times collapse to ``other_label`` — the standard high-cardinality
    categorical prep before encoding (a tail of one-off merchant names
    would otherwise blow up any one-hot/target-encode vocabulary and leak
    singleton identities into features).

    Scale shape = ``dict_encode``: the frequent-category set comes from ONE
    keyed aggregation (tiny — bounded by the number of categories above
    the threshold, not rows) and broadcasts; the fact table takes a narrow
    projection, no global sort, no second shuffle. The collapse is
    membership against the broadcast frequent set, so the mapping is
    deterministic regardless of partitioning.
    """
    out_col = out_col or f"{col}_collapsed"
    frequent = (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= min_count)
        .select(F.col(col), F.lit(True).alias("__keep"))
    )
    return (
        df.join(F.broadcast(frequent), col, "left")
        .withColumn(
            out_col,
            F.when(F.col("__keep"), F.col(col)).otherwise(
                F.lit(other_label)
            ),
        )
        .drop("__keep")
    )


def target_encode_oof(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    id_col: str,
    k: int = 5,
    smoothing: float = 20.0,
    out_col: str = "oof_te",
) -> DataFrame:
    """Out-of-fold target encoding with a smoothed prior — the k-fold
    sibling of :func:`target_encode_loo` (the form production pipelines
    use when the encoder must be FIT separately from the rows it encodes):
    each row's encoding is its category's label mean computed over the
    OTHER k-1 folds, shrunk toward the global mean by ``smoothing``
    pseudo-counts::

        te = (oof_sum + m * global_mean) / (oof_n + m)

    The shrinkage handles thin categories (and categories absent from the
    other folds: oof_n = 0 degrades cleanly to the prior) — LOO's
    singleton fallback, generalized.

    Determinism: folds are md5-derived (stable under appends /
    repartitioning), label sums are exact integers; the prior quotient
    and the final ratio are fixed-order double expressions, floor-rounded
    at the output edge — the whole encoding hash-checks cross-engine.
    Shape: one (cat, fold) aggregate (map-side combined) + one keyed join
    + a broadcast scalar; no window, no shuffle of the label rows beyond
    the category join.
    """
    lbl = F.col(label_col).cast("bigint")
    with_fold = df.withColumn(
        "__fold", (md5_int(F.col(id_col)) % k).cast("int")
    )
    per_cf = with_fold.groupBy(cat_col, "__fold").agg(
        F.sum(lbl).alias("__cf_sum"), F.count(F.lit(1)).alias("__cf_n")
    )
    per_cat = per_cf.groupBy(cat_col).agg(
        F.sum("__cf_sum").alias("__cat_sum"),
        F.sum("__cf_n").alias("__cat_n"),
    )
    glob = df.agg(
        F.sum(lbl).alias("__g_sum"), F.count(F.lit(1)).alias("__g_n")
    )
    joined = (
        with_fold.join(per_cf, [cat_col, "__fold"])
        .join(per_cat, cat_col)
        .crossJoin(F.broadcast(glob))
    )
    oof_sum = (F.col("__cat_sum") - F.col("__cf_sum")).cast("double")
    oof_n = (F.col("__cat_n") - F.col("__cf_n")).cast("double")
    prior = F.col("__g_sum") / F.col("__g_n").cast("double")
    m = F.lit(float(smoothing))
    return joined.withColumn(
        out_col,
        round4_stable((oof_sum + m * prior) / (oof_n + m)),
    ).drop("__fold", "__cf_sum", "__cf_n", "__cat_sum", "__cat_n", "__g_sum", "__g_n")
