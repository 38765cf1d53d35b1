"""Model-evaluation aggregates that stay exact and distributed.

``exact_auc`` computes ROC AUC WITHOUT a global per-row rank: group rows
by score first (the distinct-score table is orders of magnitude smaller
than the row table at any real scale), then apply the tie-aware
Mann-Whitney identity over score groups:

    2 * numerator = sum over groups g of  n_pos_g * (2 * cum_neg_below_g
                                                      + n_neg_g)
    AUC = numerator / (n_pos_total * n_neg_total)

Everything up to the final division is INTEGER arithmetic — no float
summation order to pin, bit-identical on any engine/partitioning; ties
contribute the standard 1/2 credit via the ``+ n_neg_g`` term.

Scale: one keyed aggregate by score, then a cumulative window over the
aggregated distinct-score rows. If distinct scores themselves are huge,
pre-bucket scores (quantize to 1e-4) or run the same cumsum two-level
(per-range partials + prefix), exactly like ``bucketed_trailing_aggs``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.functions.numeric import round4_stable


def exact_auc(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """One-row (n_pos, n_neg, auc) for a binary label and numeric score."""
    groups = df.groupBy(F.col(score_col).alias("__s")).agg(
        F.sum((F.col(label_col) == 1).cast("long")).alias("__np"),
        F.sum((F.col(label_col) != 1).cast("long")).alias("__nn"),
    )
    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, -1)
    contrib = groups.withColumn(
        "__cum_nn", F.coalesce(F.sum("__nn").over(w), F.lit(0))
    ).select(
        (F.col("__np") * (2 * F.col("__cum_nn") + F.col("__nn"))).alias("__c"),
        "__np",
        "__nn",
    )
    return contrib.agg(
        F.sum("__np").cast("bigint").alias("n_pos"),
        F.sum("__nn").cast("bigint").alias("n_neg"),
        round4_stable(
            F.sum("__c").cast("double")
            / (2.0 * F.sum("__np") * F.sum("__nn"))
        ).alias("auc"),
    )


def pav_calibrate(bin_rows: list) -> list[dict]:
    """Pool-adjacent-violators isotonic regression over calibration bins
    — the monotone probability calibrator (the driver-side d-x-d solve of
    the calibration story, same split as pca_components/ridge: the
    engine reduces N rows to <= n_bins sufficient statistics, the
    bounded convex fit runs on the driver). Input: rows with ``bin``,
    ``n``, ``n_pos`` (calibration_bins' output shape). Returns one dict
    per input bin, ascending, with ``calibrated`` — the isotonic
    positive-rate estimate (pooled where raw rates violate
    monotonicity); pooled blocks preserve the weighted mean, the PAV
    invariant the test pins.
    """
    rows = sorted((dict(r) for r in bin_rows), key=lambda r: r["bin"])
    # each block: [sum_pos, sum_n, member bin ids]
    blocks: list[list] = []
    for r in rows:
        blocks.append([float(r["n_pos"]), float(r["n"]), [r["bin"]]])
        while len(blocks) >= 2:
            (pa, na, ba), (pb, nb, bb) = blocks[-2], blocks[-1]
            if pa / na <= pb / nb:
                break
            blocks[-2:] = [[pa + pb, na + nb, ba + bb]]
    rate = {}
    for p, n, bins in blocks:
        for b in bins:
            rate[b] = p / n
    return [
        {**r, "calibrated": math.floor(rate[r["bin"]] * 1e4 + 0.5) / 1e4}
        for r in rows
    ]


def ab_test_report(
    df: DataFrame,
    unit_col: str,
    success_col: str,
    salt: str = "exp1",
) -> DataFrame:
    """Two-proportion A/B test over a deterministic 50/50 md5 unit split:
    per-arm conversion rates, absolute lift, pooled-SE z statistic, and
    the unpooled 95% CI for the lift — the experimentation primitive
    (assignment is hashed on the UNIT, so every event of a unit lands in
    one arm — the non-negotiable randomization rule; the salt rotates
    assignments between experiments). Mann-Whitney/rank effects are
    covered by exact_auc (AUC == U/(n_pos*n_neg)); this is the
    proportion test.

    One row out: n_a, n_b, p_a, p_b, lift, z, ci_lo, ci_hi — all
    deterministic integer-count arithmetic, rounded to 4.

    Scale: one scan, one 2-row aggregate; nothing else moves.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )
    from feature_store_fraud_detection_spark.operators.encoders import (
        md5_int,
    )

    arm_a = (
        md5_int(F.concat(F.lit(salt + "|"), F.col(unit_col).cast("string")))
        % 2
        == 0
    )
    agg = df.agg(
        F.sum(arm_a.cast("bigint")).alias("n_a"),
        F.sum((~arm_a).cast("bigint")).alias("n_b"),
        F.sum((arm_a & F.col(success_col)).cast("bigint")).alias("s_a"),
        F.sum(((~arm_a) & F.col(success_col)).cast("bigint")).alias("s_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    sa, sb = F.col("s_a").cast("double"), F.col("s_b").cast("double")
    pa, pb = sa / na, sb / nb
    pp = (sa + sb) / (na + nb)
    se_pooled = F.sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb))
    se_unpooled = F.sqrt(pa * (1.0 - pa) / na + pb * (1.0 - pb) / nb)
    lift = pa - pb
    return agg.select(
        "n_a",
        "n_b",
        round4_stable(pa).alias("p_a"),
        round4_stable(pb).alias("p_b"),
        round4_stable(lift).alias("lift"),
        round4_stable(lift / se_pooled).alias("z"),
        round4_stable(lift - 1.96 * se_unpooled).alias("ci_lo"),
        round4_stable(lift + 1.96 * se_unpooled).alias("ci_hi"),
    )
