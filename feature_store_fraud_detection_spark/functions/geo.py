"""Geospatial feature expressions.

The reference computes haversine three times (Spark asin form
``batch_processing.py:32-38``; Flink atan2 form ``pipeline.py:17-23``; pandas
``baseline_flow.py:31-38``). One definition here, used everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_MILES = 3963.0  # batch_processing.py:37 / pipeline.py:22


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def haversine_miles(
    lat1: Column | str,
    lon1: Column | str,
    lat2: Column | str,
    lon2: Column | str,
) -> Column:
    """Great-circle distance in miles, R=3963 (reference F6).

    Uses the asin form of ``batch_processing.py:32-38`` — matching the
    reference batch path bit-for-bit-ish (the atan2 streaming twin differs in
    ulps; SURVEY §7 trap 6 picks one form as canonical, and we pick the batch
    one because the offline store is the system of record). Pure built-in
    column math: folds into whole-stage codegen.
    """
    rlat1, rlon1 = F.radians(_c(lat1)), F.radians(_c(lon1))
    rlat2, rlon2 = F.radians(_c(lat2)), F.radians(_c(lon2))
    dlat = rlat2 - rlat1
    dlon = rlon2 - rlon1
    a = F.sin(dlat / 2) ** 2 + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) ** 2
    return F.lit(2.0 * EARTH_RADIUS_MILES) * F.asin(F.sqrt(a))
