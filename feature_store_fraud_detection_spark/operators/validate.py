"""Declarative data-quality validation: run a rule set over a table in ONE
aggregation pass and emit a violations report.

The pre-publish gate of a feature pipeline ("don't ship a snapshot whose
null rate jumped"): each rule compiles to a conditional-count column
expression, so N rules cost one scan + one 1-row aggregate — never N
passes. Referential-integrity rules add one left-anti probe against the
(broadcastable or key-shuffled) parent keys.

Rules are plain data (name, predicate column), so pipelines can assemble
them programmatically; the report is a DataFrame (rule, n_violations,
violation_rate) — joinable, storable, alertable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.functions.numeric import round4_stable


def not_null(col: str) -> tuple[str, Column]:
    return (f"{col}_not_null", F.col(col).isNotNull())


def in_range(col: str, lo: float, hi: float) -> tuple[str, Column]:
    return (f"{col}_in_range", (F.col(col) >= lo) & (F.col(col) <= hi))


def one_of(col: str, allowed: list) -> tuple[str, Column]:
    return (f"{col}_one_of", F.col(col).isin(allowed))


def matches(col: str, pattern: str) -> tuple[str, Column]:
    return (f"{col}_matches", F.col(col).rlike(pattern))


def validate(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """One-pass violations report: (rule, n_violations, violation_rate).
    A NULL predicate result counts as a violation (unknown fails the gate).
    """
    total = F.count(F.lit(1))
    aggs = [
        F.sum(
            F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)
        ).alias(f"__v_{name}")
        for name, pred in rules
    ]
    row = df.agg(total.alias("__total"), *aggs)
    reports = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col(f"__v_{name}").cast("bigint").alias("n_violations"),
            round4_stable(
                F.col(f"__v_{name}") / F.col("__total").cast("double")
            ).alias("violation_rate"),
        )
        for name, _ in rules
    ]
    return (
        row.select(F.explode(F.array(*reports)).alias("r"))
        .select("r.rule", "r.n_violations", "r.violation_rate")
    )


def referential_violations(
    child: DataFrame, parent: DataFrame, fk: str, pk: str
) -> DataFrame:
    """Child rows whose foreign key has no parent (left-anti join — the
    probe side broadcasts when the parent key set is bounded)."""
    return child.join(parent.select(F.col(pk).alias(fk)), fk, "left_anti")


def reconcile_order_totals(
    orders: DataFrame,
    lineitem: DataFrame,
    tolerance: float = 0.01,
) -> DataFrame:
    """Cross-table reconciliation: recompute each order's total from its
    line items — sum(extendedprice * (1 - discount) * (1 + tax)) — and
    report, per order status, how many orders disagree with the stored
    ``o_totalprice`` beyond ``tolerance``. The financial-integrity audit a
    feature pipeline runs before trusting a denormalized total.

    Determinism: the per-line charge is exact DECIMAL throughout —
    (18,2) price x (5,2)-scaled factors keeps every product exact, the
    per-order sum is order-independent — and converts to double ONCE for
    the stored-total comparison; the difference is 4-decimal rounded
    BEFORE the tolerance test so the mismatch flag is bit-reproducible.

    Scale: lineitem pre-aggregates to one row per order (map-side partial
    on the natural key), then joins orders on o_orderkey — co-partitioned
    if both sides are bucketed by order key, AQE sort-merge otherwise; the
    final rollup is a tiny per-status aggregate. max_abs_diff is a MAX
    (order-independent), never a cross-engine double sum.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    charge = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(5,2)") - F.col("l_discount").cast("decimal(5,2)"))
        * (F.lit(1).cast("decimal(5,2)") + F.col("l_tax").cast("decimal(5,2)"))
    )
    recomputed = lineitem.groupBy("l_orderkey").agg(
        F.sum(charge).alias("__recomputed")
    )
    diff4 = round4_stable(
        F.abs(
            F.col("__recomputed").cast("double") - F.col("o_totalprice")
        )
    )
    joined = orders.join(
        recomputed, orders["o_orderkey"] == recomputed["l_orderkey"], "left"
    ).select(
        "o_orderstatus",
        F.coalesce(diff4, F.lit(-1.0)).alias("__diff"),  # -1: no line items
    )
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum((F.col("__diff") < 0).cast("long")).alias("n_no_lines"),
        F.sum(
            ((F.col("__diff") >= 0) & (F.col("__diff") > tolerance)).cast("long")
        ).alias("n_mismatched"),
        round4_stable(F.max("__diff")).alias("max_abs_diff"),
    )


def k_anonymity_profile(
    df: DataFrame, quasi_identifiers: list[str]
) -> DataFrame:
    """Re-identification risk profile for a quasi-identifier combination:
    group rows into equivalence classes over the QI columns and histogram
    the class sizes — a release is k-anonymous iff no class is smaller
    than k, so the smallest ``class_size`` row IS the dataset's k. The
    standard privacy screen before sharing a feature table (pairs with
    ``OfflineStore.delete_keys`` on the GDPR side).

    Output per class size: (class_size, n_classes, n_rows,
    pct_rows_at_risk) where pct_rows_at_risk is the cumulative share of
    rows in classes of THIS size or smaller — read the k=1..4 rows to see
    how much of the table is re-identifiable under each threshold.

    Scale: one keyed count (map-side combined) to class sizes, then an
    aggregate over the bounded distinct-size table; the cumulative share
    is a window over that bounded frame — no data-row window, no second
    scan. NULL QI values form their own classes (NULL-safe grouping),
    matching how an attacker would treat them.
    """
    from pyspark.sql import Window

    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    classes = df.groupBy(*quasi_identifiers).agg(
        F.count(F.lit(1)).alias("class_size")
    )
    hist = classes.groupBy("class_size").agg(
        F.count(F.lit(1)).alias("n_classes")
    )
    tot = hist.agg(
        # int-ok: sum over the histogram of class_size*n_classes IS the
        # total row count n — bounded by count() by construction
        F.sum(F.col("class_size") * F.col("n_classes")).alias("__total")
    )
    w = Window.orderBy("class_size").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "class_size",
            "n_classes",
            (F.col("class_size") * F.col("n_classes")).alias("n_rows"),
            round4_stable(
                # int-ok: prefix sum of the same histogram identity <= n
                F.sum(F.col("class_size") * F.col("n_classes")).over(w)
                / F.col("__total").cast("double")
            ).alias("pct_rows_at_risk"),
        )
    )


def l_diversity_profile(
    df: DataFrame, quasi_identifiers: list[str], sensitive_col: str
) -> DataFrame:
    """l-diversity companion to :func:`k_anonymity_profile`: k-anonymity
    alone fails when an equivalence class is large but every row shares
    ONE sensitive value (homogeneity attack) — so histogram the DISTINCT
    sensitive-value count per QI class. A release is l-diverse iff no
    class has fewer than l distinct sensitive values; the smallest
    ``n_distinct_sensitive`` row is the dataset's l.

    Output per diversity level: (n_distinct_sensitive, n_classes,
    n_rows). Scale: one (QI, sensitive) distinct-pair count feeding a
    per-class aggregate — both map-side combinable; the histogram is an
    aggregate over the bounded class table.
    """
    per_class = df.groupBy(*quasi_identifiers).agg(
        F.countDistinct(sensitive_col).alias("n_distinct_sensitive"),
        F.count(F.lit(1)).alias("__rows"),
    )
    return per_class.groupBy("n_distinct_sensitive").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("__rows").alias("n_rows"),
    )


def dp_noisy_counts(
    df: DataFrame,
    cat_col: str,
    epsilon: float = 1.0,
    seed: str = "release-1",
) -> DataFrame:
    """Laplace-mechanism noisy category counts — the differential-privacy
    shape for publishing aggregate statistics: count + Laplace(1/epsilon)
    noise (sensitivity 1 for a count). The noise here is SEEDED (inverse-
    CDF Laplace from an md5-uniform of seed||category) so releases are
    reproducible and cross-engine hash-checkable; the privacy guarantee
    holds against recipients who don't know the seed — rotate the seed
    per release and treat it as a secret, or swap in true randomness
    where reproducibility doesn't matter. noisy_count is clamped at 0
    and rounded to an integer, the standard post-processing.

    ``true_count`` stays in the output for the oracle/audit loop — DROP
    it before an actual release (the noisy column alone is the
    publishable artifact).

    Scale: one keyed count; the noise is a scan-stage expression over the
    bounded category table. NULL categories excluded.
    """
    from feature_store_fraud_detection_spark.operators.encoders import (
        md5_int,
    )

    counts = (
        df.filter(F.col(cat_col).isNotNull())
        .groupBy(cat_col)
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    u = (
        md5_int(F.concat(F.lit(seed + "|"), F.col(cat_col).cast("string")))
        .cast("double")
        / F.lit(float(2**60))
    )
    # inverse-CDF Laplace(b = 1/epsilon): u in (0,1) -> centered noise
    centered = u - F.lit(0.5)
    mag = F.lit(1.0) - F.lit(2.0) * F.abs(centered)
    noise = (
        -F.lit(1.0 / epsilon)
        * F.signum(centered)
        * F.log(mag)
    )
    noisy = F.greatest(
        F.lit(0.0), F.col("true_count").cast("double") + noise
    )
    return counts.select(
        cat_col,
        "true_count",
        F.floor(noisy + F.lit(0.5)).cast("bigint").alias("noisy_count"),
    )


def t_closeness_profile(
    df: DataFrame, quasi_identifiers: list[str], sensitive_col: str
) -> DataFrame:
    """t-closeness — the third rung of the release-risk ladder after
    :func:`k_anonymity_profile` and :func:`l_diversity_profile`:
    l-diversity still leaks when a class's sensitive values are diverse
    but SKEWED relative to the population (skewness attack: "everyone in
    this class is diverse, but 90% have the rare flag"). Per QI class,
    measure the distance between the class's sensitive-value
    distribution and the GLOBAL one; a release is t-close iff no class
    exceeds t. For nominal attributes the standard distance is the
    variational distance (1/2) * sum over v of |p_class(v) - p_global(v)|.

    Exact-integer core: |n_cv/n_c - N_v/N| = |n_cv*N - N_v*n_c| /
    (n_c*N), and the values ABSENT from the class contribute their full
    global mass, so::

        sum_abs = sum over v-in-class |n_cv*N - N_v*n_c|
                + (N*n_c - sum over v-in-class N_v*n_c)

    is an exact integer per class. The products and sums run in
    DECIMAL(38,0) — a non-ANSI BIGINT product wraps silently past ~3e9
    rows, and a wrapped value can even pass a post-hoc magnitude test —
    with :func:`bigint_checked` fail-louding the BIGINT report cast. The
    reported ``t_value = sum_abs / (2*n_c*N)`` is a ratio, derived once
    in fixed IEEE order and rounded to 4. The max t_value row is the
    dataset's t.

    Scale: one (QI, v) count, one per-class rollup; the |V|-row global
    distribution broadcasts (sensitive attributes are low-cardinality by
    definition of the threat model — a high-cardinality sensitive column
    needs the numeric-EMD variant, not this one).
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        bigint_checked,
    )

    base = df.filter(F.col(sensitive_col).isNotNull())
    cls_v = base.groupBy(
        *quasi_identifiers, F.col(sensitive_col).alias("__v")
    ).agg(F.count(F.lit(1)).alias("__n_cv"))
    glob_v = base.groupBy(F.col(sensitive_col).alias("__v")).agg(
        F.count(F.lit(1)).alias("__nv")
    )
    tot = glob_v.agg(F.sum("__nv").alias("__n"))
    wcls = F.sum("__n_cv").over(Window.partitionBy(*quasi_identifiers))
    joined = (
        cls_v.withColumn("__n_c", wcls)
        .join(F.broadcast(glob_v), "__v")
        .crossJoin(F.broadcast(tot))
    )
    # all three products (n_cv*N, N_v*n_c, N*n_c) in DECIMAL(38,0): a
    # non-ANSI BIGINT product WRAPS silently past ~3e9 rows — and a
    # wrapped value can still pass a |x|<9e18 post-hoc test, so guarding
    # the already-wrapped product is no guard at all. The decimal form
    # stays exact; bigint_checked fail-louds the report narrowing.
    term = F.abs(
        F.col("__n_cv").cast("decimal(38,0)") * F.col("__n")
        - F.col("__nv").cast("decimal(38,0)") * F.col("__n_c")
    )
    per_class = joined.groupBy(*quasi_identifiers).agg(
        F.first("__n_c").alias("n_rows"),
        F.first("__n").alias("__n"),
        F.sum(term).alias("__sum_term"),
        F.sum(
            F.col("__nv").cast("decimal(38,0)") * F.col("__n_c")
        ).alias("__sum_cover"),
    )
    sum_abs = F.col("__sum_term") + (
        F.col("__n").cast("decimal(38,0)") * F.col("n_rows")
        - F.col("__sum_cover")
    )
    t_val = sum_abs.cast("double") / (
        F.lit(2.0) * F.col("n_rows").cast("double") * F.col("__n").cast("double")
    )
    return per_class.select(
        *quasi_identifiers,
        F.col("n_rows").cast("bigint").alias("n_rows"),
        bigint_checked(sum_abs, "t_closeness sum_abs").alias(
            "sum_abs_scaled"
        ),
        round4_stable(t_val).alias("t_value"),
    )


def t_closeness_numeric_profile(
    df: DataFrame, quasi_identifiers: list[str], sensitive_col: str
) -> DataFrame:
    """t-closeness for ORDERED sensitive attributes — the numeric-EMD
    companion to :func:`t_closeness_profile`: variational distance
    treats "salary band 3 vs 4" and "band 3 vs 9" as equally different,
    so a class whose values sit one notch away from the population
    looks as risky as one concentrated at the extreme. The
    ordered-distance earth-mover's distance (Li, Li & Venkatasubramanian
    2007, the t-closeness paper's numeric form) weighs mass by how FAR
    it must move::

        EMD(P_c, Q) = (1/(mv-1)) * sum_i |sum_{j<=i} (p_j - q_j)|

    over the mv ordered distinct values of the GLOBAL domain — a prefix
    sum over the value histogram, the same integer-prefix discipline as
    mann_whitney_u's rank surface.

    Exact-integer core: the inner cumulative difference scales to
    ``cum_i = N*C_cv(i) - n_c*C_v(i)`` (class/global inclusive
    cumulative counts) — every term an exact integer in DECIMAL(38,0)
    (non-ANSI BIGINT products wrap silently past ~3e9 rows), summed as
    ``sum_abs = sum_i |cum_i|`` per class with
    ``t_value = sum_abs / ((mv-1) * n_c * N)`` the only double, derived
    once in fixed IEEE order and rounded to 4. A single-valued domain
    (mv=1) fails loud: EMD is undefined and the column carries no
    release risk to measure.

    Scale design: the operator DENSIFIES each class over the global
    value domain (absent values shift the cumulative gap too), so the
    sensitive attribute must be a BOUNDED ordered domain — bands or
    buckets, the numeric threat model's own requirement (quantize
    upstream; a raw high-cardinality column belongs to the categorical
    variational form even less). Work: one (QI, v) count, one |V|-row
    global histogram broadcast (its prefix sum is a single-partition
    window over |V| rows, bounded by construction), a classes x |V|
    dense grid with one per-class ordered prefix window — one shuffle
    keyed on the QI class.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        bigint_checked,
    )

    base = df.filter(F.col(sensitive_col).isNotNull())
    glob_v = base.groupBy(F.col(sensitive_col).alias("__v")).agg(
        F.count(F.lit(1)).alias("__nv")
    )
    # |V|-row bounded table: global inclusive cumulative + totals
    wv = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = glob_v.agg(
        F.sum("__nv").alias("__n"), F.count(F.lit(1)).alias("__mv")
    )
    glob_full = glob_v.select(
        "__v", F.sum("__nv").over(wv).alias("__cnv")
    ).crossJoin(F.broadcast(tot))
    cls = base.groupBy(*quasi_identifiers).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    cls_v = base.groupBy(
        *quasi_identifiers, F.col(sensitive_col).alias("__v")
    ).agg(F.count(F.lit(1)).alias("__n_cv"))
    dense = cls.crossJoin(F.broadcast(glob_full)).join(
        cls_v, [*quasi_identifiers, "__v"], "left"
    )
    wc = (
        Window.partitionBy(*quasi_identifiers)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ccv = F.sum(F.coalesce(F.col("__n_cv"), F.lit(0))).over(wc)
    term = F.abs(
        ccv.cast("decimal(38,0)") * F.col("__n")
        - F.col("__cnv").cast("decimal(38,0)") * F.col("n_rows")
    )
    per_class = dense.select(
        *quasi_identifiers, "n_rows", "__n", "__mv", term.alias("__t")
    ).groupBy(*quasi_identifiers).agg(
        F.first("n_rows").alias("n_rows"),
        F.first("__n").alias("__n"),
        F.first("__mv").alias("__mv"),
        F.sum("__t").alias("__sum_abs"),
    )
    mv_ok = F.when(F.col("__mv") > 1, F.col("__mv")).otherwise(
        F.raise_error(
            F.lit(
                "t_closeness_numeric_profile: single-valued sensitive domain "
                "(mv=1) — EMD is undefined; the column carries no "
                "release risk to measure"
            )
        ).cast("bigint")
    )
    t_val = F.col("__sum_abs").cast("double") / (
        (mv_ok - F.lit(1)).cast("double")
        * F.col("n_rows").cast("double")
        * F.col("__n").cast("double")
    )
    return per_class.select(
        *quasi_identifiers,
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("__mv").cast("int").alias("n_levels"),
        bigint_checked(
            F.col("__sum_abs"), "t_closeness_numeric_profile: sum_abs"
        ).alias("sum_abs_scaled"),
        round4_stable(t_val).alias("t_value"),
    )
