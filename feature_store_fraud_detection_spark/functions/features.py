"""Scalar feature expressions (reference F1-F5, F9).

All pure Column expressions — JVM-side, whole-stage-codegen'd, zero Python in
the hot path. Each cites the reference definition it reproduces.

Semantic conventions (SURVEY §7 "hard parts"):
- ``day_of_week`` follows Spark ``dayofweek`` (1=Sunday..7=Saturday), the
  reference batch path's convention (``batch_processing.py:30``). The pandas
  baseline's 1=Monday convention (``baseline_flow.py:25``) is a documented
  reference-internal divergence we do NOT reproduce.
- ``age_at_txn`` is fractional years with the 365.25-day year of
  ``batch_processing.py:31`` — no clamping for dob > ts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SECONDS_PER_YEAR = 60 * 60 * 24 * 365.25  # batch_processing.py:31


def unix_time(ts: Column | str) -> Column:
    """Seconds since epoch (reference F2, ``batch_processing.py:26``).

    Long seconds (sub-second truncated) — this is what the reference windows
    order by, so the trailing range frames bucket by whole seconds.
    """
    return F.unix_timestamp(ts)


def hour_of_day(ts: Column | str) -> Column:
    """0..23 (reference F3, ``batch_processing.py:29``)."""
    return F.hour(ts)


def day_of_week(ts: Column | str) -> Column:
    """1=Sunday..7=Saturday (reference F4, ``batch_processing.py:30``)."""
    return F.dayofweek(ts)


def age_at_txn(ts: Column | str, dob: Column | str) -> Column:
    """Fractional years between dob and the transaction (reference F5,
    ``batch_processing.py:31``): (ts_long - dob_long) / (60*60*24*365.25)."""
    ts_c = F.col(ts) if isinstance(ts, str) else ts
    dob_c = F.col(dob) if isinstance(dob, str) else dob
    return (ts_c.cast("long") - dob_c.cast("long")) / F.lit(SECONDS_PER_YEAR)


def threshold_label(prob: Column | str, threshold: float = 0.5) -> Column:
    """Score -> 0/1 label (reference F9, ``model/training.py:114``)."""
    prob_c = F.col(prob) if isinstance(prob, str) else prob
    return (prob_c > F.lit(threshold)).cast("int")
