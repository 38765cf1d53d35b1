"""Sampling, rebalancing, and split operators (reference M1-M5, P6).

Seeded-sampling parity across engines does not exist (Spark's Bernoulli /
Poisson samplers != pandas RNG != DuckDB; SURVEY §7 trap 7), so these are
declared to the driver as rows-only checks — determinism within Spark is
still guaranteed by fixed seeds.

Scale notes: sample/sampleBy are narrow (no shuffle); the class-rebalance
union is narrow; the shuffle appears only if the caller asks for a global
random order, which uses a sort by rand(seed) — acceptable because training
consumes it immediately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fraction_sample(df: DataFrame, fraction: float, seed: int) -> DataFrame:
    """Reference M1 (``featurestore_flow.py:48``: sample(frac=0.75,
    random_state=42+run)). Bernoulli row sample, no shuffle."""
    return df.sample(fraction=fraction, seed=seed)


def stratified_sample(
    df: DataFrame, label_col: str, fractions: dict, seed: int
) -> DataFrame:
    """Per-class fraction sample (reference M2's sample(n=...) per class,
    expressed as fractions — exact-n sampling doesn't distribute; the
    standard Spark idiom is sampleBy)."""
    return df.sampleBy(label_col, fractions, seed)


def stratified_hash_sample(
    df: DataFrame,
    label_col: str,
    id_col: str,
    fractions: dict,
    salt: str = "",
) -> DataFrame:
    """Deterministic twin of :func:`stratified_sample`: per-stratum
    md5-threshold sampling. A row is kept iff its 60-bit hash value falls
    below its OWN stratum's fraction of the hash space — the
    :func:`hash_sample` construction with a per-row threshold looked up
    from the fractions map.

    Same statistical contract as seeded ``sampleBy`` (independent Bernoulli
    per row at the stratum's rate), but the decision is a pure function of
    (salt, id, label): reproducible across engines/runs/partitionings (so
    it IS oracle-checkable, unlike partition-dependent seeded sampling),
    composable, and expandable per stratum. Strata absent from
    ``fractions`` are dropped, matching sampleBy. Narrow — the predicate
    evaluates in the scan projection, no shuffle at any scale.
    """
    threshold = None
    for label, frac in fractions.items():
        cond = F.col(label_col) == label
        lit = F.lit(int(frac * (16**15)))
        threshold = (
            F.when(cond, lit) if threshold is None else threshold.when(cond, lit)
        )
    # no otherwise(): strata absent from the map get NULL -> filtered out
    digest = F.md5(
        F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))
    )
    return df.filter(
        F.conv(F.substring(digest, 1, 15), 16, 10).cast("decimal(20,0)")
        < threshold.cast("decimal(20,0)")
    )


def stratified_topn_sample(
    df: DataFrame,
    label_col: str,
    id_col: str,
    n_per_stratum: int,
    salt: str = "",
) -> DataFrame:
    """Exact-n-per-stratum sampling (the reference M2 ``sample(n=...)`` per
    class shape) without RNG: rank rows WITHIN each stratum by
    ``(md5(salt||id), id)`` and keep the first n. The hash order is a
    uniform-random permutation for any non-adversarial id set, so this is a
    simple random sample of exactly n per stratum — deterministic across
    engines/runs/partitionings, and distributable (one shuffle on the
    stratum key + WindowGroupLimit top-n pruning; exact-n seeded sampling
    does not distribute at all, SURVEY §7 trap 7)."""
    from pyspark.sql import Window

    w = Window.partitionBy(label_col).orderBy(
        F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))),
        id_col,
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def rebalance_classes_hash(
    df: DataFrame,
    label_col: str,
    id_col: str,
    positive_value=1,
    negative_ratio: float = 5.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic twin of :func:`rebalance_classes` (reference M3): keep
    every positive, md5-threshold the negatives to ``negative_ratio`` x
    positives. The negative keep fraction derives from the class counts
    INSIDE the plan (one scalar aggregate, broadcast), and the threshold
    arithmetic — ``floor(least(1, r*n_pos/n_neg) * 16^15)`` in doubles — is
    reproduced verbatim by the SQL twin, so the sampled set hash-checks.
    Same expectation contract as the seeded form; decision is a pure
    function of (salt, id, class histogram)."""
    counts = df.agg(
        F.sum(
            F.when(F.col(label_col) == positive_value, 1).otherwise(0)
        ).alias("__np"),
        F.sum(
            F.when(F.col(label_col) != positive_value, 1).otherwise(0)
        ).alias("__nn"),
    )
    # 16^15 == 2^60: exactly representable, so the double multiply + floor
    # lands on the same BIGINT on every engine
    thr = counts.select(
        # no negatives: there is nothing to threshold — keep-everything
        # (the vacuous truth), never an ANSI divide-by-zero (round-10
        # degenerate-probe finding)
        F.floor(
            F.when(
                F.col("__nn") > 0,
                F.least(
                    F.lit(1.0),
                    (F.lit(float(negative_ratio)) * F.col("__np"))
                    / F.col("__nn").cast("double"),
                ),
            ).otherwise(F.lit(1.0))
            * F.lit(float(16**15))
        )
        .cast("long")
        .alias("__thr")
    )
    digest = F.md5(
        F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))
    )
    return (
        df.crossJoin(F.broadcast(thr))
        .filter(
            (F.col(label_col) == positive_value)
            | (
                F.conv(F.substring(digest, 1, 15), 16, 10).cast("long")
                < F.col("__thr")
            )
        )
        .drop("__thr")
    )


def train_test_hash_split(
    df: DataFrame, id_col: str, test_fraction: float = 0.2, salt: str = ""
) -> tuple[DataFrame, DataFrame]:
    """Deterministic train/test split (reference M5's seeded split): rows
    whose 60-bit id hash falls below ``test_fraction`` of the hash space go
    to test, the rest to train. Pure function of (salt, id): the same row
    never switches sides across engines, runs, partitionings, or dataset
    growth — appending new data cannot leak an old training row into test
    (seeded randomSplit reshuffles everything on any change). Narrow: the
    predicate evaluates in the scan."""
    threshold = int(test_fraction * (16**15))
    digest = F.md5(
        F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))
    )
    is_test = (
        F.conv(F.substring(digest, 1, 15), 16, 10).cast("decimal(20,0)")
        < F.lit(threshold).cast("decimal(20,0)")
    )
    return df.filter(~is_test), df.filter(is_test)


def rebalance_classes(
    df: DataFrame,
    label_col: str,
    positive_value=1,
    negative_ratio: float = 5.0,
    seed: int = 42,
) -> DataFrame:
    """Reference M3 (``training.py:64-66``): keep all positives, sample
    negatives to ``negative_ratio`` x positives, union.

    The class counts come from one aggregate pass; the negative fraction is
    derived from them (Spark samples by fraction, not exact n — the ratio is
    honored in expectation, which is what class rebalancing needs).
    """
    counts = {
        r[label_col]: r["cnt"]
        for r in df.groupBy(label_col).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    n_pos = counts.get(positive_value, 0)
    n_neg = sum(v for k, v in counts.items() if k != positive_value)
    if n_pos == 0 or n_neg == 0:
        return df
    frac = min(1.0, negative_ratio * n_pos / n_neg)
    positives = df.filter(F.col(label_col) == positive_value)
    negatives = df.filter(F.col(label_col) != positive_value).sample(
        fraction=frac, seed=seed
    )
    return positives.unionByName(negatives)


def shuffle_rows(df: DataFrame, seed: int) -> DataFrame:
    """Reference M3's final sample(frac=1) shuffle — global reorder by
    rand(seed). Only worth a shuffle when a single-pass consumer needs
    randomized order (SGD-style training)."""
    return df.orderBy(F.rand(seed))


def train_test_split(
    df: DataFrame, test_size: float = 0.25, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """Reference M5 (``training.py:73``): randomSplit — per-row Bernoulli
    assignment, narrow, deterministic per seed."""
    train, test = df.randomSplit([1.0 - test_size, test_size], seed=seed)
    return train, test


def label_filter(df: DataFrame, label_col: str, value) -> DataFrame:
    """Reference P6 (``training.py:64-65``): class split filter."""
    return df.filter(F.col(label_col) == value)


def null_fill(df: DataFrame, fills: dict) -> DataFrame:
    """Reference P7 (``featurestore_flow.py:25`` fillna(0);
    ``load_data.py:11`` fillna(-1) on merch_zipcode)."""
    return df.na.fill(fills)


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Deterministic content-hash sampling: keep rows whose md5(salt||id)
    falls below ``fraction`` of the hash space.

    The scalable twin of seeded ``sample()``: the decision is a pure
    function of the row id, so it is reproducible across engines, runs,
    partitionings and cluster sizes (Spark's seeded sample is
    partition-dependent and can't be cross-checked), composable (the same
    row is in or out in every stage of a pipeline), and expandable — growing
    fraction f1 -> f2 keeps the f1 sample as a strict subset. Different
    ``salt`` values draw independent samples. Narrow (no shuffle): the
    predicate evaluates in the scan projection.

    Uses the first 15 hex digits (60 bits) of the md5 compared against
    fraction * 16^15 — exact integer threshold arithmetic, no float
    comparison on the hash itself.
    """
    threshold = int(fraction * (16**15))
    digest = F.md5(
        F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))
    )
    return df.filter(
        F.conv(F.substring(digest, 1, 15), 16, 10).cast("decimal(20,0)")
        < F.lit(threshold).cast("decimal(20,0)")
    )


def weighted_hash_sample(
    df: DataFrame, id_col: str, weight_col: str, salt: str = ""
) -> DataFrame:
    """Per-row weighted deterministic sampling: keep a row with probability
    equal to its ``weight_col`` (clamped to [0,1]) — the quality-/temperature-
    weighted corpus downsampling step of training-data pipelines ("keep
    high-quality docs always, low-quality ones rarely").

    Same md5-threshold construction as :func:`hash_sample`, but the
    threshold varies per row: keep iff hash_frac(id) < weight, where
    hash_frac is the first 60 hash bits scaled to [0,1). The decision stays
    a pure function of (salt, id, weight): reproducible across engines and
    cluster sizes, and monotone in the weight — raising a doc's weight can
    only add it to the sample. Narrow, scan-bound; the weight is typically a
    computed quality score, so the whole gate fuses into the scan projection.

    Cross-engine note: hash_frac is an exact 60-bit integer divided by the
    double 16^15 — both engines compute the identical double, and the
    comparison against a 4-decimal-rounded weight is therefore exact.
    """
    digest = F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    hash_frac = F.conv(F.substring(digest, 1, 15), 16, 10).cast("double") / F.lit(
        float(16**15)
    )
    w = F.least(F.greatest(F.col(weight_col).cast("double"), F.lit(0.0)), F.lit(1.0))
    return df.filter(hash_frac < w)


def weighted_topk_sample(
    df: DataFrame, id_col: str, weight_col: str, k: int, salt: str = ""
) -> DataFrame:
    """Exactly-k weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-ES), deterministic: each row draws an exponential jitter
    ``key = -ln(u) / w`` with ``u`` the row's md5-uniform in (0,1], and the
    k SMALLEST keys are the sample. Inclusion probability is proportional
    to weight, the draw is a pure function of (salt, id, weight) — the
    reproducible complement to :func:`weighted_hash_sample`, for when the
    pipeline needs an exact sample SIZE (eval sets, human-review batches)
    rather than an expected rate.

    Scale: the key is a narrow scan-stage projection; the global k-smallest
    is ``orderBy(key).limit(k)`` which Spark executes as
    TakeOrderedAndProject — per-partition top-k heaps, only k rows per
    partition reach the driver-side merge. No full sort, no shuffle of the
    corpus. Cross-engine: u is an exact 60-bit integer (+1 to exclude 0)
    over 2^60; ln differs by at most 1 ulp between engines, far below the
    ~1/n relative spacing of adjacent order statistics, and (key, id) is a
    total order.
    """
    digest = F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    u = (
        F.conv(F.substring(digest, 1, 15), 16, 10).cast("double") + F.lit(1.0)
    ) / F.lit(float(16**15))
    w = F.col(weight_col).cast("double")
    key = -F.log(u) / w
    return (
        df.filter(w > 0)
        .withColumn("__key", key)
        .orderBy("__key", id_col)
        .limit(k)
    )


def source_mix_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    shares: dict[str, float],
    salt: str = "mix",
) -> DataFrame:
    """Source/domain mixing: downsample each group toward a TARGET share of
    the original total — the "data mixing" step of corpus assembly (e.g.
    cap any one crawl source at 5% of the training mix).

    Per-group keep probability p_g = min(1, (share_g * N) / n_g) where N is
    the total row count and n_g the group's count; groups already below
    their target share are kept whole (p=1) — this operator only ever
    REMOVES over-represented data, it never upsamples. The keep decision is
    the deterministic md5-threshold gate of :func:`weighted_hash_sample`
    (pure function of (salt, id) vs p_g), so the draw is reproducible across
    engines, runs and partitionings, and monotone in the share.

    Shape at scale: one map-side-combined count aggregation over the group
    key (tiny result), broadcast-joined back; the gate itself is a
    scan-stage projection. Groups absent from ``shares`` are dropped —
    an explicit allowlist, so a new unvetted source can't silently flood
    the mix.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    total = df.count()
    share_map = F.create_map(
        *[x for kv in shares.items() for x in (F.lit(kv[0]), F.lit(float(kv[1])))]
    )
    weights = counts.select(
        F.col(group_col),
        F.least(
            F.lit(1.0),
            (share_map[F.col(group_col)] * F.lit(float(total)))
            / F.col("__n").cast("double"),
        ).alias("__p"),
    ).where(share_map[F.col(group_col)].isNotNull())
    digest = F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    hash_frac = F.conv(F.substring(digest, 1, 15), 16, 10).cast("double") / F.lit(
        float(16**15)
    )
    return df.join(F.broadcast(weights), group_col).where(hash_frac < F.col("__p")).drop(
        "__p"
    )


def temperature_mix_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    temperature: float = 2.0,
    total_rows: int | None = None,
    salt: str = "temp_mix",
) -> DataFrame:
    """Temperature-based source/language rebalancing — the standard
    multilingual-corpus mixing rule (sample group g with probability
    proportional to ``share_g^(1/T)``): T=1 keeps natural proportions,
    T->inf approaches uniform, intermediate T lifts under-represented
    groups without flattening the mix entirely.

    Target share for group g is ``n_g^(1/T) / sum_h n_h^(1/T)``; with a
    row budget ``M`` (default: the input size) the keep probability is
    ``p_g = min(1, target_share_g * M / n_g)``. Like
    :func:`source_mix_sample` this only DOWN-samples (p capped at 1 —
    under-represented groups are kept whole, never duplicated), and the
    per-row decision is the deterministic md5-threshold gate, reproducible
    across engines/runs/partitionings.

    Cross-engine determinism: at the default T=2 the exponent is computed
    as ``sqrt`` — IEEE-correctly-rounded on every engine, so p_g is
    bit-identical and the draw hash-checks. Other temperatures go through
    ``pow``, whose last-ulp behavior libm does not guarantee across
    engines — fine in production, but only T=2 is registered against the
    oracle gate.

    Shape at scale: one map-side-combined count per group + a 1-row total
    (both broadcast); the gate is a scan-stage projection. No shuffle
    touches the data rows.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    if temperature == 2.0:
        w = F.sqrt(F.col("__n").cast("double"))
    else:
        w = F.pow(F.col("__n").cast("double"), F.lit(1.0 / float(temperature)))
    weighted = counts.select(group_col, "__n", w.alias("__w"))
    # aggregate from a RENAMED projection: totals sharing `weighted`'s
    # column lineage would make `__n` ambiguous after the cross join
    totals = weighted.agg(
        F.sum("__w").alias("__sw"), F.sum("__n").alias("__grand_total")
    )
    budget = (
        F.lit(float(total_rows))
        if total_rows is not None
        else F.col("__grand_total").cast("double")
    )
    probs = weighted.crossJoin(F.broadcast(totals)).select(
        group_col,
        F.least(
            F.lit(1.0),
            (F.col("__w") / F.col("__sw"))
            * budget
            / F.col("__n").cast("double"),
        ).alias("__p"),
    )
    digest = F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    hash_frac = F.conv(F.substring(digest, 1, 15), 16, 10).cast("double") / F.lit(
        float(16**15)
    )
    return df.join(F.broadcast(probs), group_col).where(
        hash_frac < F.col("__p")
    ).drop("__p")
