"""Probabilistic record linkage (Fellegi-Sunter) — entity resolution
scoring over blocked candidate pairs.

The fraud-domain need the dedup family's string similarity doesn't cover:
"are these two ACCOUNTS the same actor?" is a multi-FIELD evidence
problem (same active hours, same value band, same volume), not a
text-distance one. Fellegi & Sunter (1969) give the canonical weights:
each field contributes ``ln(m/u)`` when it agrees and
``ln((1-m)/(1-u))`` when it disagrees, where ``m`` = P(agree | same
entity) and ``u`` = P(agree | different entities); the pair score is the
summed log-likelihood ratio.

``u`` is estimated EXACTLY from the data: for a random pair, the
probability field f agrees is ``sum_v c_v*(c_v-1) / (N*(N-1))`` over the
field's value histogram — an exact integer ratio. ``m`` is either
supplied per field or estimated WITHOUT labels by
:func:`em_linkage_params` (Winkler's unsupervised EM over the bounded
agreement-pattern table; :func:`em_weights_report` turns the estimates
into the ln-weight table).

Determinism: u ratios are exact-integer-derived doubles; the two ``ln``
calls per field are the measured-stable libm path (see sequential_ab's
probe); the score sums fields in the ORDER GIVEN (a bounded literal
list, identical in the SQL twin); the top-k ranking breaks ties on the
id pair.

Scale design: candidate generation is BLOCKED self-join (same discipline
as dedup.fuzzy_pairs's prefix blocking) — pairs exist only within a
block, so the join is keyed on the block columns and never all-pairs;
the per-field u table is one bounded aggregate broadcast into the score
projection. Degenerate blocks are the operator's skew hazard: cap them
upstream (filter block sizes) exactly like the dedup family's
hot-shingle caps if a block key collapses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.functions.numeric import round4_stable


def pair_agreement_stats(profiles: DataFrame, field: str) -> tuple[int, int]:
    """Exact random-pair agreement statistics for one field:
    ``(agree_pairs, n)`` with u = agree_pairs / (n*(n-1)) — the ordered-
    pair count sum_v c_v*(c_v-1) over the field's value histogram.
    NULL field values are EXCLUDED (``n`` is the non-null count):
    :func:`fellegi_sunter_pairs` scores a NULL as disagreement, so
    counting NULL-NULL pairs as agreements here would overstate u and
    understate the field's agreement weight ln(m/u) — u must match the
    scoring rule's agreement definition. Bounded driver pull (two
    scalars); exposed for tests and for tuning m against measured u."""
    row = (
        profiles.filter(F.col(field).isNotNull())
        .groupBy(F.col(field).alias("__v"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .agg(
            F.sum(
                (F.col("__c") * (F.col("__c") - 1)).cast("decimal(38,0)")
            ).alias("agree_pairs"),
            F.sum("__c").alias("n"),
        )
        .collect()[0]
    )
    if row["n"] is None:
        # zero non-null values: u is undefined (and every downstream
        # weight ln(m/u) with it) — fail loud with the operator's name
        # instead of int(None) (round-11 all-NULL/empty-side probe)
        raise ValueError(
            f"pair_agreement_stats: field {field!r} has no non-null "
            "values — agreement statistics are undefined on an "
            "empty/all-NULL field"
        )
    return int(row["agree_pairs"]), int(row["n"])


def _pair_agreement_stats_multi(
    profiles: DataFrame, field_cols: list[str]
) -> dict[str, tuple[int, int]]:
    """:func:`pair_agreement_stats` for several fields in ONE Spark job:
    the per-field 1-row aggregates union into a single bounded frame and
    collect once. Each field's histogram fold is the same expression as
    the single-field path (same NULL exclusion, same DECIMAL sums), so
    the returned integers are identical — this only removes the
    k-separate-actions overhead (every action re-ran the whole profile
    pipeline before the caller-side persist landed; r12 optimization,
    guide §5 driver discipline)."""
    parts = [
        profiles.filter(F.col(f).isNotNull())
        .groupBy(F.col(f).alias("__v"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .agg(
            F.lit(f).alias("__field"),
            F.sum(
                (F.col("__c") * (F.col("__c") - 1)).cast("decimal(38,0)")
            ).alias("agree_pairs"),
            F.sum("__c").alias("n"),
        )
        for f in field_cols
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    out: dict[str, tuple[int, int]] = {}
    for row in u.collect():
        f = row["__field"]
        if row["n"] is None:
            raise ValueError(
                f"pair_agreement_stats: field {f!r} has no non-null "
                "values — agreement statistics are undefined on an "
                "empty/all-NULL field"
            )
        out[f] = (int(row["agree_pairs"]), int(row["n"]))
    return out


def _blocked_pairs(
    profiles: DataFrame,
    id_col: str,
    block_cols: list[str],
    field_cols: list[str],
) -> DataFrame:
    """Blocked candidate self-join: pairs exist only WITHIN a block
    (join keyed on the block columns — never all-pairs), each emitted
    once (``id_a < id_b``), with ``<f>_a`` / ``<f>_b`` field columns."""
    left = profiles.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in block_cols + field_cols],
    )
    right = profiles.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in block_cols + field_cols],
    )
    cond = [F.col(f"{c}_a") == F.col(f"{c}_b") for c in block_cols]
    return left.join(right, [*cond, F.col("id_a") < F.col("id_b")], "inner")


def _agree_flag(f: str) -> Column:
    """Field agreement for a candidate pair — NULL counts as
    DISAGREEMENT (no evidence is not agreement)."""
    return (
        F.col(f"{f}_a").isNotNull()
        & F.col(f"{f}_b").isNotNull()
        & (F.col(f"{f}_a") == F.col(f"{f}_b"))
    )


def fellegi_sunter_pairs(
    profiles: DataFrame,
    id_col: str,
    block_cols: list[str],
    field_cols: list[str],
    m_probs: dict[str, float] | None = None,
    default_m: float = 0.9,
    top_k: int | None = 50,
) -> DataFrame:
    """Score blocked candidate pairs with Fellegi-Sunter log-likelihood
    weights -> (id_a, id_b, per-field agreement flags, score).

    ``profiles`` is one row per entity (build it with any keyed
    aggregate); NULL fields count as DISAGREEMENT (no evidence is not
    agreement). Pairs are emitted once (``id_a < id_b``).
    """
    m_probs = m_probs or {}
    # r12 optimization (guide §5 / §2.4): the u statistics are driver
    # actions — without a persist each one re-ran the ENTIRE profile
    # pipeline (events scan + aggregates + rank windows for the registry
    # callers), and the blocked self-join below re-ran it twice more.
    # The profile table is bounded (one row per entity), so cache it
    # once; every u job and both join sides then read memory. The cache
    # is deliberately NOT unpersisted: the returned frame still scans it
    # (materializing the result here would replace the plan the
    # shape gates and the serving callers see), matching the
    # ngram_jaccard_pairs shingle-cache convention.
    profiles = profiles.cache()
    # exact u per field — bounded driver pulls (two scalars per field)
    # that land in the score expression as plan literals; ONE job for
    # all fields (each was a separate full-pipeline action before)
    u_map = _pair_agreement_stats_multi(profiles, field_cols)

    pairs = _blocked_pairs(profiles, id_col, block_cols, field_cols)

    score = None
    flags = []
    for f in field_cols:
        ap, n = u_map[f]
        if n < 2 or ap <= 0:
            raise ValueError(
                f"fellegi_sunter_pairs: field {f!r} has no agreeing random "
                "pairs (u=0) — its agreement weight is unbounded; drop the "
                "field or coarsen its buckets"
            )
        u = float(ap) / float(n * (n - 1))
        if u >= 1.0:
            raise ValueError(
                f"fellegi_sunter_pairs: field {f!r} is constant (u=1) — "
                "it carries no linkage evidence; drop it"
            )
        m = float(m_probs.get(f, default_m))
        if not (u < m < 1.0):
            raise ValueError(
                f"fellegi_sunter_pairs: field {f!r} needs u < m < 1 "
                f"(u={u!r}, m={m!r}) — an m below u means agreement is "
                "evidence AGAINST a match; check the field"
            )
        # plan literals: ln computed ONCE on the driver (python libm),
        # spelled to the SQL twin as the same ln() over the same exact
        # integer ratio so both engines fold identical constants
        agree = _agree_flag(f)
        w_agree = F.log(F.lit(m) / (F.lit(float(ap)) / F.lit(float(n * (n - 1)))))
        w_disagree = F.log(
            (F.lit(1.0) - F.lit(m))
            / (F.lit(1.0) - F.lit(float(ap)) / F.lit(float(n * (n - 1))))
        )
        contrib = F.when(agree, w_agree).otherwise(w_disagree)
        flags.append(agree.cast("int").alias(f"agree_{f}"))
        score = contrib if score is None else score + contrib

    out = pairs.select(
        "id_a",
        "id_b",
        *flags,
        round4_stable(score).alias("score"),
    )
    if top_k is not None:
        out = out.orderBy(
            F.col("score").desc(), F.col("id_a"), F.col("id_b")
        ).limit(int(top_k))
    return out


def em_linkage_params(
    profiles: DataFrame,
    id_col: str,
    block_cols: list[str],
    field_cols: list[str],
    n_iter: int = 20,
    init_p: float = 0.1,
    init_m: float = 0.9,
    init_u: float = 0.1,
) -> dict:
    """Winkler's unsupervised EM over agreement-vector pattern counts —
    the answer to :func:`fellegi_sunter_pairs`'s hardcoded ``default_m``:
    estimate ``m`` = P(field agrees | same entity), ``u`` = P(agrees |
    different entities) and the match share ``p`` FROM THE CANDIDATE
    PAIRS THEMSELVES, no labeled duplicates needed (Winkler 1988; the
    two-class latent-mixture view of Fellegi & Sunter 1969).

    The sufficient statistic is tiny: candidate pairs collapse to their
    agreement PATTERN (one of at most 2^k vectors for k fields) with a
    count — a bounded table pulled to the driver, where EM runs as a
    fixed-iteration, fixed-order float loop (hash-stable: the DuckDB
    oracle twin replays the identical recursion). Per iteration, each
    pattern's match responsibility is::

        w = p * prod_f m_f^a (1-m_f)^(1-a)
            / (that + (1-p) * prod_f u_f^a (1-u_f)^(1-a))

    then m/u/p re-estimate as responsibility-weighted agreement shares.
    All folds run over patterns in a CANONICAL order (flags descending),
    products over fields in the ORDER GIVEN — both spelled identically
    in the SQL twin, so every float op sequence matches bit-for-bit.

    Note the estimand: u here is conditional on the BLOCKING (P(agree |
    non-match within a shared block)) — the right u for scoring blocked
    candidates, and deliberately different from
    :func:`pair_agreement_stats`'s unconditional random-pair u.

    Scale design: the only driver-side state is the <=2^k-row pattern
    table and the O(n_iter * 2^k * k) float loop — independent of data
    size; pattern counting is one groupBy over the blocked join that
    :func:`fellegi_sunter_pairs` already performs.

    Returns ``{"p": float, "m": [per field], "u": [per field],
    "n_pairs": int, "n_patterns": int}`` (raw, un-rounded).
    """
    if n_iter < 1:
        raise ValueError("em_linkage_params: n_iter must be >= 1")
    k = len(field_cols)
    if k == 0:
        raise ValueError("em_linkage_params: need at least one field")
    # r12 optimization (guide §2.4): the blocked self-join evaluates the
    # profile pipeline on BOTH sides of one job — persist it for the
    # single pattern-count action, release right after (the EM loop and
    # the report are pure driver arithmetic; nothing later reads it)
    profiles = profiles.persist()
    pairs = _blocked_pairs(profiles, id_col, block_cols, field_cols)
    flag_cols = [
        _agree_flag(f).cast("int").alias(f"__a{i}")
        for i, f in enumerate(field_cols)
    ]
    pat_rows = (
        pairs.select(*flag_cols)
        .groupBy(*[f"__a{i}" for i in range(k)])
        .agg(F.count(F.lit(1)).alias("__c"))
        .collect()
    )
    profiles.unpersist()
    if not pat_rows:
        raise ValueError(
            "em_linkage_params: no candidate pairs — every block is a "
            "singleton; coarsen the block columns"
        )
    # canonical pattern order: agreement flags DESCENDING (all-agree
    # first) — the SQL twin lists patterns ORDER BY a1 DESC, ..., so
    # every left fold below visits patterns in the same sequence
    pats = sorted(
        (
            (tuple(int(r[f"__a{i}"]) for i in range(k)), int(r["__c"]))
            for r in pat_rows
        ),
        key=lambda t: t[0],
        reverse=True,
    )
    n_pairs = 0
    for _, c in pats:
        n_pairs += c

    p = float(init_p)
    m = [float(init_m)] * k
    u = [float(init_u)] * k
    for _ in range(n_iter):
        # E step: per-pattern responsibility-weighted counts, in
        # canonical pattern order; products over fields in field order
        wcs: list[float] = []
        ucs: list[float] = []
        for a, c in pats:
            t_prod = m[0] if a[0] else (1.0 - m[0])
            for f in range(1, k):
                t_prod = t_prod * (m[f] if a[f] else (1.0 - m[f]))
            u_prod = u[0] if a[0] else (1.0 - u[0])
            for f in range(1, k):
                u_prod = u_prod * (u[f] if a[f] else (1.0 - u[f]))
            pm = p * t_prod
            pu = (1.0 - p) * u_prod
            if pm + pu == 0.0:
                # both mixture components assign this observed pattern
                # zero likelihood (an m/u estimate hit exactly 0 or 1
                # while a conflicting pattern still has mass) — 0/0 here
                # would be a bare ZeroDivisionError with no operator
                # context; fail loud naming the degenerate pattern
                raise ValueError(
                    "em_linkage_params: degenerate EM state — pattern "
                    f"{a} (count {c}) has zero likelihood under both "
                    "classes (m/u estimates reached an exact 0/1 "
                    "boundary); use less extreme init_m/init_u or drop "
                    "the constant field"
                )
            w = pm / (pm + pu)
            wcs.append(w * c)
            ucs.append((1.0 - w) * c)
        # M step: left folds in pattern order (list_reduce parity:
        # first element is the fold seed, NOT 0.0)
        s_w = wcs[0]
        for x in wcs[1:]:
            s_w = s_w + x
        s_u = ucs[0]
        for x in ucs[1:]:
            s_u = s_u + x
        new_m = []
        new_u = []
        for f in range(k):
            num_m = wcs[0] * pats[0][0][f]
            num_u = ucs[0] * pats[0][0][f]
            for i in range(1, len(pats)):
                num_m = num_m + wcs[i] * pats[i][0][f]
                num_u = num_u + ucs[i] * pats[i][0][f]
            new_m.append(num_m / s_w)
            new_u.append(num_u / s_u)
        m = new_m
        u = new_u
        p = s_w / float(n_pairs)
    return {
        "p": p,
        "m": m,
        "u": u,
        "n_pairs": n_pairs,
        "n_patterns": len(pats),
    }


def em_weights_report(
    profiles: DataFrame,
    id_col: str,
    block_cols: list[str],
    field_cols: list[str],
    n_iter: int = 20,
) -> DataFrame:
    """EM-estimated Fellegi-Sunter weight table — one row per field:
    ``(field, m_est, u_est, w_agree, w_disagree, match_share, n_pairs)``
    with ``w_agree = ln(m/u)`` / ``w_disagree = ln((1-m)/(1-u))`` the
    scoring weights :func:`fellegi_sunter_pairs` would otherwise take
    from ``default_m``.

    A field whose EM estimates are degenerate (``u <= 0``, ``m >= 1`` or
    ``m <= u`` — agreement carrying no or negative match evidence) gets
    NULL weights instead of +-inf: a data property, reported, not an
    abort. Doubles round to 4 via the house floor(x*1e4+0.5)/1e4; the
    ``ln`` calls run on the driver (the measured-stable libm path, same
    as fellegi_sunter_pairs's plan-literal weights).
    """
    import math

    est = em_linkage_params(
        profiles, id_col, block_cols, field_cols, n_iter=n_iter
    )

    def _r4(x: float) -> float:
        return math.floor(x * 10000 + 0.5) / 10000

    rows = []
    for f_idx, fname in enumerate(field_cols):
        m_f = est["m"][f_idx]
        u_f = est["u"][f_idx]
        ok = (u_f > 0.0) and (u_f < m_f) and (m_f < 1.0)
        rows.append(
            (
                fname,
                _r4(m_f),
                _r4(u_f),
                _r4(math.log(m_f / u_f)) if ok else None,
                _r4(math.log((1.0 - m_f) / (1.0 - u_f))) if ok else None,
                _r4(est["p"]),
                est["n_pairs"],
            )
        )
    spark = profiles.sparkSession
    return spark.createDataFrame(
        rows,
        "field string, m_est double, u_est double, w_agree double, "
        "w_disagree double, match_share double, n_pairs bigint",
    )


def supervised_m_estimates(
    profiles: DataFrame,
    id_col: str,
    field_cols: list[str],
    labeled_pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Labeled-sample estimation of the Fellegi-Sunter ``m`` — the third
    rung of the m-ladder (``default_m`` guess < :func:`em_linkage_params`
    unsupervised < this): given pairs KNOWN to be the same entity
    (clerical review, a merged-account backfill, planted twins in a
    fixture), ``m_f`` is just the observed agreement share::

        m_f = #{labeled pairs where field f agrees} / #{labeled pairs}

    an EXACT integer ratio — no latent-mixture modelling, no iteration,
    no initialization sensitivity. Entirely plan-side (unlike the EM
    path's driver float loop): two id-keyed joins pull each pair's field
    values, one aggregate counts agreements per field, one ``stack``
    unpivots to the per-field report. NULL on either side counts as
    DISAGREEMENT (:func:`_agree_flag`'s rule — the estimate must match
    the scoring rule's agreement definition, the same discipline as
    :func:`pair_agreement_stats`'s NULL exclusion for u).

    Output: ``(field, n_labeled, n_agree, m_est)`` — one row per field
    in ``field_cols`` order, m rounded to 4. Fails loud on zero labeled
    pairs (an empty sample estimates nothing).

    Scale: ``labeled_pairs`` joins profiles on the id — keyed equi-joins
    both broadcastable when the labeled sample is small (the usual case:
    labels are expensive) and shuffle-joinable when it isn't; the
    aggregate is one row of 2k integers.
    """
    a = profiles.select(
        F.col(id_col).alias("__ia"),
        *[F.col(f).alias(f"{f}_a") for f in field_cols],
    )
    b = profiles.select(
        F.col(id_col).alias("__ib"),
        *[F.col(f).alias(f"{f}_b") for f in field_cols],
    )
    joined = (
        labeled_pairs.select(
            F.col(id_a).alias("__ia"), F.col(id_b).alias("__ib")
        )
        .join(a, "__ia")
        .join(b, "__ib")
    )
    counts = joined.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(_agree_flag(f).cast("bigint")).alias(f"__ag_{i}")
            for i, f in enumerate(field_cols)
        ],
    )
    n_ok = F.when(F.col("__n") > 0, F.col("__n")).otherwise(
        F.raise_error(
            F.lit(
                "supervised_m_estimates: no labeled pairs matched the "
                "profile table — check the id columns"
            )
        ).cast("bigint")
    )
    stack_args = ", ".join(
        f"'{f}', __ag_{i}" for i, f in enumerate(field_cols)
    )
    return (
        counts.select(
            n_ok.alias("n_labeled"),
            F.expr(
                f"stack({len(field_cols)}, {stack_args}) AS (field, n_agree)"
            ),
        )
        .select(
            "field",
            F.col("n_labeled").cast("bigint").alias("n_labeled"),
            F.col("n_agree").cast("bigint").alias("n_agree"),
            round4_stable(
                F.col("n_agree").cast("double")
                / F.col("n_labeled").cast("double")
            ).alias("m_est"),
        )
    )


def supervised_weights_report(
    profiles: DataFrame,
    id_col: str,
    field_cols: list[str],
    labeled_pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Fellegi-Sunter weight table from LABELED duplicates — the
    supervised twin of :func:`em_weights_report`: ``m`` from
    :func:`supervised_m_estimates`'s exact agreement shares, ``u`` from
    :func:`pair_agreement_stats`'s exact random-pair histogram ratio,
    weights ``w_agree = ln(m/u)`` / ``w_disagree = ln((1-m)/(1-u))``
    computed ONCE on the driver (Python libm — the measured-stable pair
    with DuckDB's ln, same as fellegi_sunter_pairs's plan literals) from
    the pulled exact integers.

    A degenerate field (``m >= 1``: every labeled pair agrees — the
    disagreement weight is -inf; ``m <= u``: agreement is not evidence;
    ``n_agree == 0``) reports NULL weights, a data property, matching
    the EM report's convention.

    Output per field: ``(field, n_labeled, n_agree, m_est, u_est,
    w_agree, w_disagree)`` — doubles rounded to 4, counts exact BIGINT.

    Scale: the driver state is 2 integers per field (the labeled-pair
    aggregate) + 2 per field (the u histogram fold) — bounded by the
    field list, never the data.
    """
    import math

    # r12 optimization (guide §5): this report is k+1 driver actions over
    # the same profile table — the m-estimate join and one u histogram
    # per field. Each action re-ran the whole profile pipeline (events
    # scan + aggregates + rank windows for the registry caller, ~12
    # evaluations at k=4). Persist once, fold the k u-jobs into one, and
    # release before returning (the result is driver rows).
    profiles = profiles.persist()
    m_rows = {
        r["field"]: r
        for r in supervised_m_estimates(
            profiles, id_col, field_cols, labeled_pairs, id_a, id_b
        ).collect()
    }
    u_stats = _pair_agreement_stats_multi(profiles, field_cols)
    profiles.unpersist()

    def _r4(x: float) -> float:
        return math.floor(x * 10000 + 0.5) / 10000

    rows = []
    for f in field_cols:
        r = m_rows[f]
        nl, na = int(r["n_labeled"]), int(r["n_agree"])
        ap, n = u_stats[f]
        m_f = float(na) / float(nl)
        u_f = float(ap) / float(n * (n - 1)) if n >= 2 else 0.0
        ok = 0.0 < u_f < m_f < 1.0
        rows.append(
            (
                f,
                nl,
                na,
                _r4(m_f),
                _r4(u_f),
                _r4(math.log(m_f / u_f)) if ok else None,
                _r4(math.log((1.0 - m_f) / (1.0 - u_f))) if ok else None,
            )
        )
    spark = profiles.sparkSession
    return spark.createDataFrame(
        rows,
        "field string, n_labeled bigint, n_agree bigint, m_est double, "
        "u_est double, w_agree double, w_disagree double",
    )
