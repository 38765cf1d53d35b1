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
field's value histogram — an exact integer ratio. ``m`` is supplied per
field (the standard practice when no labeled duplicates exist; EM
estimation is a separate, iterative path out of scope here — supply
``m`` from a labeled sample when one appears).

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
    Bounded driver pull (two scalars); exposed for tests and for tuning
    m against measured u."""
    row = (
        profiles.groupBy(F.col(field).alias("__v"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .agg(
            F.sum(F.col("__c") * (F.col("__c") - 1)).alias("agree_pairs"),
            F.sum("__c").alias("n"),
        )
        .collect()[0]
    )
    return int(row["agree_pairs"]), int(row["n"])


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
    # exact u per field — bounded driver pulls (two scalars per field)
    # that land in the score expression as plan literals
    u_map: dict[str, tuple[int, int]] = {
        f: pair_agreement_stats(profiles, f) for f in field_cols
    }

    left = profiles.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in block_cols + field_cols],
    )
    right = profiles.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in block_cols + field_cols],
    )
    cond = [F.col(f"{c}_a") == F.col(f"{c}_b") for c in block_cols]
    pairs = left.join(
        right, [*cond, F.col("id_a") < F.col("id_b")], "inner"
    )

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
        agree = (
            F.col(f"{f}_a").isNotNull()
            & F.col(f"{f}_b").isNotNull()
            & (F.col(f"{f}_a") == F.col(f"{f}_b"))
        )
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
