"""Survival analysis: Kaplan-Meier product-limit estimation over keyed
event streams — "how long does a user stay active?" with honest handling
of users who HAVEN'T churned yet.

The fraud/retention question the windows and funnel families don't
answer: a naive mean-lifetime over observed durations is biased low
because the users still active at the observation cutoff are truncated,
not finished. Kaplan-Meier (1958) fixes this by multiplying conditional
survival across event times, with right-censored subjects leaving the
risk set without counting as deaths::

    S(t) = prod_{t_i <= t} (1 - d_i / n_i)

where at each distinct duration t_i: d_i = churned subjects, n_i =
subjects still at risk (duration >= t_i, churned or censored).

Exact-integer core: subjects collapse to one row per QUANTIZED duration
(days) carrying exact (d_i, c_i) counts; the at-risk counts come from a
prefix sum over that bounded day table — the same
distinct-value-aggregate discipline as mann_whitney_u, never a sort of
subject rows. Only the survival curve itself is a double: a SINGLE
ascending-day fold of (1 - d/n) products (fixed IEEE sequence; the
DuckDB twin replays it with holt_winters' recursive-CTE-over-index
pattern), rounded to 4.

Scale design: one keyed aggregate to subjects (first/last timestamp),
one hash aggregate to the bounded day table (duration domain = days in
the observation window, enforced by a cap), and the fold rides a
collect_list over that bounded table — driver-free, one shuffle on the
subject key, one on the day.

:func:`logrank_test` is the two-cohort inference companion (equal
hazards vs not) on the same bounded day-table surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.functions.numeric import round4_stable


def kaplan_meier(
    df: DataFrame,
    subject_col: str,
    ts_col: str,
    censor_horizon_days: int = 7,
    max_days: int = 3650,
) -> DataFrame:
    """Kaplan-Meier survival over per-subject activity spans.

    Each subject's duration is ``floor((last_ts - first_ts) / 86400)``
    days; a subject whose LAST event falls within ``censor_horizon_days``
    of the dataset's maximum timestamp is right-CENSORED (still active —
    their true lifetime is only known to exceed the observed span), all
    others are churned at their observed duration.

    Output, one row per observed distinct duration (ascending):
    ``(duration_days, n_risk, n_churned, n_censored, survival)`` — the
    three counts exact BIGINTs, ``survival`` the product-limit S(t)
    after that day's deaths (round4). Censoring-only days keep S
    unchanged but still appear (their n_risk is real information).

    ``max_days`` fail-louds a duration domain that stopped being
    day-bounded (the same cap discipline as theil_sen_trend): the fold
    carries one array of day rows, which is only scale-safe while the
    domain is.
    """
    ts = F.col(ts_col)
    per_subj = (
        df.filter(ts.isNotNull() & F.col(subject_col).isNotNull())
        .groupBy(subject_col)
        .agg(
            F.min(ts).alias("__first"),
            F.max(ts).alias("__last"),
        )
    )
    glob = per_subj.agg(F.max("__last").alias("__cut"))
    dur = F.floor(
        (F.unix_timestamp("__last") - F.unix_timestamp("__first"))
        / F.lit(86400)
    ).cast("bigint")
    dur_ok = F.when(dur <= F.lit(int(max_days)), dur).otherwise(
        F.raise_error(
            F.format_string(
                f"kaplan_meier: duration %s days exceeds max_days="
                f"{int(max_days)} — the day-bounded fold assumption "
                "broke; quantize coarser or raise the cap deliberately",
                dur.cast("string"),
            )
        ).cast("bigint")
    )
    censored = (
        F.unix_timestamp("__last")
        >= F.unix_timestamp("__cut") - F.lit(int(censor_horizon_days) * 86400)
    ).cast("int")
    subj = per_subj.crossJoin(F.broadcast(glob)).select(
        dur_ok.alias("__d"), censored.alias("__c")
    )
    per_day = subj.groupBy("__d").agg(
        F.sum(F.lit(1) - F.col("__c")).alias("__died"),
        F.sum("__c").alias("__cens"),
    )
    # at-risk via prefix sum over the bounded day table (exclusive),
    # subtracted from the subject total
    tot = per_day.agg(
        F.sum(F.col("__died") + F.col("__cens")).alias("__n")
    )
    w = Window.orderBy("__d").rowsBetween(Window.unboundedPreceding, -1)
    day_rows = per_day.crossJoin(F.broadcast(tot)).select(
        "__d",
        "__died",
        "__cens",
        (
            F.col("__n")
            - F.coalesce(
                F.sum(F.col("__died") + F.col("__cens")).over(w), F.lit(0)
            )
        ).alias("__risk"),
    )
    # single ascending-day fold: running product of (1 - d/n), emitted
    # per day — the one double in the operator, fixed IEEE sequence
    folded = day_rows.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("__d").alias("d"),
                        F.col("__died").alias("died"),
                        F.col("__cens").alias("cens"),
                        F.col("__risk").alias("risk"),
                    )
                )
            ),
            F.struct(
                F.lit(1.0).alias("s"),
                F.expr(
                    "cast(array() as array<struct<d:bigint,died:bigint,"
                    "cens:bigint,risk:bigint,surv:double>>)"
                ).alias("out"),
            ),
            lambda acc, x: F.struct(
                (
                    acc["s"]
                    * (
                        F.lit(1.0)
                        - x["died"].cast("double") / x["risk"].cast("double")
                    )
                ).alias("s"),
                F.concat(
                    acc["out"],
                    F.array(
                        F.struct(
                            x["d"].alias("d"),
                            x["died"].alias("died"),
                            x["cens"].alias("cens"),
                            x["risk"].alias("risk"),
                            (
                                acc["s"]
                                * (
                                    F.lit(1.0)
                                    - x["died"].cast("double")
                                    / x["risk"].cast("double")
                                )
                            ).alias("surv"),
                        )
                    ),
                ).alias("out"),
            ),
        ).alias("__f")
    )
    return folded.select(F.explode("__f.out").alias("r")).select(
        F.col("r.d").alias("duration_days"),
        F.col("r.risk").cast("bigint").alias("n_risk"),
        F.col("r.died").cast("bigint").alias("n_churned"),
        F.col("r.cens").cast("bigint").alias("n_censored"),
        round4_stable(F.col("r.surv")).alias("survival"),
    )


def logrank_test(
    df: DataFrame,
    subject_col: str,
    ts_col: str,
    group_col: str,
    treatment_value,
    censor_horizon_days: int = 7,
    max_days: int = 3650,
) -> DataFrame:
    """Two-group log-rank test — "do these cohorts CHURN differently?",
    the inference companion to :func:`kaplan_meier` the way
    mann_whitney_u pairs with the value distributions: under H0 (equal
    hazards), at each death day the treatment group's deaths are
    hypergeometric, so::

        O1 = sum_i d1_i                      (exact BIGINT)
        E1 = sum_i n1_i * d_i / n_i
        V  = sum_i d_i * (n1_i/n_i) * (1 - n1_i/n_i)
                 * (n_i - d_i) / (n_i - 1)
        z  = (O1 - E1) / sqrt(V),   chi2 = z^2   (1 df)

    Exact-integer discipline: every per-day count (d1_i, d_i, n1_i,
    n_i) is an exact BIGINT from prefix sums over the bounded day
    table; E1 and V are the only doubles — per-day ratios of exact
    integers, summed in ONE ascending-day sorted fold (identical IEEE
    sequence in the DuckDB twin's list_reduce), outputs rounded to 4.
    Days with no deaths contribute nothing (their factor is exactly 0
    and is excluded BY CONSTRUCTION, not by floating-point luck);
    single-subject days have V_i = 0 via the (n_i - 1) guard.

    Censoring follows :func:`kaplan_meier`: subjects last seen within
    ``censor_horizon_days`` of the dataset cutoff leave the risk set
    without counting as deaths. A cohort with no subjects fails loud
    (z divides by its risk contribution).

    Scale: identical to kaplan_meier — one keyed aggregate to
    subjects, one hash aggregate to the (day x group) table (bounded by
    ``max_days``), folds over that bounded table only.
    """
    ts = F.col(ts_col)
    per_subj = (
        df.filter(
            ts.isNotNull()
            & F.col(subject_col).isNotNull()
            & F.col(group_col).isNotNull()
        )
        .groupBy(subject_col)
        .agg(
            F.min(ts).alias("__first"),
            F.max(ts).alias("__last"),
            # a subject's cohort must be unambiguous: deterministic min
            F.min(
                (F.col(group_col) == F.lit(treatment_value)).cast("int")
            ).alias("__t"),
        )
    )
    glob = per_subj.agg(F.max("__last").alias("__cut"))
    dur = F.floor(
        (F.unix_timestamp("__last") - F.unix_timestamp("__first"))
        / F.lit(86400)
    ).cast("bigint")
    dur_ok = F.when(dur <= F.lit(int(max_days)), dur).otherwise(
        F.raise_error(
            F.format_string(
                f"logrank_test: duration %s days exceeds max_days="
                f"{int(max_days)} — quantize coarser or raise the cap "
                "deliberately",
                dur.cast("string"),
            )
        ).cast("bigint")
    )
    censored = (
        F.unix_timestamp("__last")
        >= F.unix_timestamp("__cut") - F.lit(int(censor_horizon_days) * 86400)
    ).cast("int")
    subj = per_subj.crossJoin(F.broadcast(glob)).select(
        dur_ok.alias("__d"), censored.alias("__c"), "__t"
    )
    per_day = subj.groupBy("__d").agg(
        F.sum((F.lit(1) - F.col("__c"))).alias("__died"),
        # int-ok: censor/treat flags are 0/1 — the sum is <= n
        F.sum((F.lit(1) - F.col("__c")) * F.col("__t")).alias("__died1"),
        F.sum(F.lit(1)).alias("__left"),
        F.sum("__t").alias("__left1"),
    )
    tot = subj.agg(
        F.sum(F.lit(1)).alias("__n"),
        F.sum("__t").alias("__n1"),
    )
    w = Window.orderBy("__d").rowsBetween(Window.unboundedPreceding, -1)
    day_rows = per_day.crossJoin(F.broadcast(tot)).select(
        "__d",
        "__died",
        "__died1",
        (
            F.col("__n") - F.coalesce(F.sum("__left").over(w), F.lit(0))
        ).alias("__risk"),
        (
            F.col("__n1") - F.coalesce(F.sum("__left1").over(w), F.lit(0))
        ).alias("__risk1"),
    ).filter(F.col("__died") > 0)
    # ascending-day sorted fold over the bounded death-day table: the
    # ONLY doubles in the operator, fixed IEEE sequence
    folded = day_rows.agg(
        # coalesce: with NO death days (all subjects censored) the sum
        # is NULL — but zero observed deaths is a statement, not a
        # missing value (round-10 property-sweep finding)
        F.coalesce(F.sum("__died1"), F.lit(0).cast("bigint")).alias("o1"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("__d").alias("d"),
                        F.col("__died").alias("dd"),
                        F.col("__risk").alias("r"),
                        F.col("__risk1").alias("r1"),
                    )
                )
            ),
            F.struct(F.lit(0.0).alias("e1"), F.lit(0.0).alias("v")),
            lambda acc, e: F.struct(
                (
                    acc["e1"]
                    + e["r1"].cast("double") / e["r"].cast("double")
                    * e["dd"].cast("double")
                ).alias("e1"),
                (
                    acc["v"]
                    + F.when(
                        e["r"] > 1,
                        e["dd"].cast("double")
                        * (e["r1"].cast("double") / e["r"].cast("double"))
                        * (
                            F.lit(1.0)
                            - e["r1"].cast("double") / e["r"].cast("double")
                        )
                        * (e["r"] - e["dd"]).cast("double")
                        / (e["r"] - F.lit(1)).cast("double"),
                    ).otherwise(F.lit(0.0))
                ).alias("v"),
            ),
        ).alias("__f"),
    ).crossJoin(F.broadcast(tot))
    n1_ok = F.when(
        (F.col("__n1") > 0) & (F.col("__n1") < F.col("__n")), F.col("__n1")
    ).otherwise(
        F.raise_error(
            F.format_string(
                "logrank_test: degenerate cohorts (n=%s, n_treat=%s) — "
                "both cohorts must be non-empty",
                F.coalesce(F.col("__n").cast("string"), F.lit("0")),
                F.coalesce(F.col("__n1").cast("string"), F.lit("0")),
            )
        ).cast("bigint")
    )
    # V == 0 (every death day had a single subject at risk, or no death
    # days at all) carries no hypergeometric information: z is NULL, not
    # an ANSI divide-by-zero (round-10 property-sweep finding, the
    # anova_f zero-within-variance class)
    z = F.when(
        F.col("__f.v") > 0.0,
        (F.col("o1").cast("double") - F.col("__f.e1"))
        / F.sqrt(F.col("__f.v")),
    )
    return folded.select(
        n1_ok.cast("bigint").alias("n_treat"),
        (F.col("__n") - F.col("__n1")).cast("bigint").alias("n_control"),
        F.col("o1").cast("bigint").alias("observed_treat"),
        round4_stable(F.col("__f.e1")).alias("expected_treat"),
        round4_stable(F.col("__f.v")).alias("variance"),
        round4_stable(z).alias("logrank_z"),
        round4_stable(z * z).alias("logrank_chi2"),
    )


def nelson_aalen(
    df: DataFrame,
    subject_col: str,
    ts_col: str,
    censor_horizon_days: int = 7,
    max_days: int = 3650,
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator on the same per-subject
    lifetime surface as :func:`kaplan_meier`::

        H(t) = sum_{t_i <= t} d_i / n_i,     var(H) ~= sum d_i / n_i^2

    The ADDITIVE twin of the KM product-limit: H reads as "expected
    churn events per subject so far", is the quantity hazard-ratio
    models (log-rank, Cox) actually work in, and behaves better than
    the product at small risk sets. Deliberately NOT emitting
    exp(-H) (the Fleming-Harrington survival): the float canary showed
    JVM libm and DuckDB disagree at 1 ulp on transcendental calls, and
    H is the estimator — callers can exponentiate downstream.

    Same exact-integer day table, censoring rule, duration cap and
    ascending-day fold discipline as kaplan_meier; the two running
    sums (hazard, its Poisson variance) are the only doubles, each a
    fixed left-assoc IEEE sequence both engines replay, rounded to 4.

    Output, one row per observed distinct duration (ascending):
    (duration_days, n_risk, n_churned, n_censored, cum_hazard,
    cum_hazard_var).
    """
    ts = F.col(ts_col)
    per_subj = (
        df.filter(ts.isNotNull() & F.col(subject_col).isNotNull())
        .groupBy(subject_col)
        .agg(F.min(ts).alias("__first"), F.max(ts).alias("__last"))
    )
    glob = per_subj.agg(F.max("__last").alias("__cut"))
    dur = F.floor(
        (F.unix_timestamp("__last") - F.unix_timestamp("__first"))
        / F.lit(86400)
    ).cast("bigint")
    dur_ok = F.when(dur <= F.lit(int(max_days)), dur).otherwise(
        F.raise_error(
            F.format_string(
                f"nelson_aalen: duration %s days exceeds max_days="
                f"{int(max_days)} — the day-bounded fold assumption "
                "broke; quantize coarser or raise the cap deliberately",
                dur.cast("string"),
            )
        ).cast("bigint")
    )
    censored = (
        F.unix_timestamp("__last")
        >= F.unix_timestamp("__cut")
        - F.lit(int(censor_horizon_days) * 86400)
    ).cast("int")
    subj = per_subj.crossJoin(F.broadcast(glob)).select(
        dur_ok.alias("__d"), censored.alias("__c")
    )
    per_day = subj.groupBy("__d").agg(
        F.sum(F.lit(1) - F.col("__c")).alias("__died"),
        F.sum("__c").alias("__cens"),
    )
    tot = per_day.agg(
        F.sum(F.col("__died") + F.col("__cens")).alias("__n")
    )
    w = Window.orderBy("__d").rowsBetween(Window.unboundedPreceding, -1)
    day_rows = per_day.crossJoin(F.broadcast(tot)).select(
        "__d",
        "__died",
        "__cens",
        (
            F.col("__n")
            - F.coalesce(
                F.sum(F.col("__died") + F.col("__cens")).over(w), F.lit(0)
            )
        ).alias("__risk"),
    )
    # single ascending-day fold: running sums of d/n and d/n^2, emitted
    # per day — fixed IEEE sequence, seeded 0.0 (0.0 + x == x bitwise
    # for the non-negative terms, so the DuckDB running-window twin
    # folds identically)
    folded = day_rows.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("__d").alias("d"),
                        F.col("__died").alias("died"),
                        F.col("__cens").alias("cens"),
                        F.col("__risk").alias("risk"),
                    )
                )
            ),
            F.struct(
                F.lit(0.0).alias("h"),
                F.lit(0.0).alias("v"),
                F.expr(
                    "cast(array() as array<struct<d:bigint,died:bigint,"
                    "cens:bigint,risk:bigint,h:double,v:double>>)"
                ).alias("out"),
            ),
            lambda acc, x: F.struct(
                (
                    acc["h"]
                    + x["died"].cast("double") / x["risk"].cast("double")
                ).alias("h"),
                (
                    acc["v"]
                    + x["died"].cast("double")
                    / (
                        x["risk"].cast("double") * x["risk"].cast("double")
                    )
                ).alias("v"),
                F.concat(
                    acc["out"],
                    F.array(
                        F.struct(
                            x["d"].alias("d"),
                            x["died"].alias("died"),
                            x["cens"].alias("cens"),
                            x["risk"].alias("risk"),
                            (
                                acc["h"]
                                + x["died"].cast("double")
                                / x["risk"].cast("double")
                            ).alias("h"),
                            (
                                acc["v"]
                                + x["died"].cast("double")
                                / (
                                    x["risk"].cast("double")
                                    * x["risk"].cast("double")
                                )
                            ).alias("v"),
                        )
                    ),
                ).alias("out"),
            ),
        ).alias("__f")
    )
    return folded.select(F.explode("__f.out").alias("r")).select(
        F.col("r.d").alias("duration_days"),
        F.col("r.died").cast("bigint").alias("n_churned"),
        F.col("r.cens").cast("bigint").alias("n_censored"),
        F.col("r.risk").cast("bigint").alias("n_risk"),
        round4_stable(F.col("r.h")).alias("cum_hazard"),
        round4_stable(F.col("r.v")).alias("cum_hazard_var"),
    )
