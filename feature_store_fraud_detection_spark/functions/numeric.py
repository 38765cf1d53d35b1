"""Cross-engine-stable numeric helpers shared by operators and the oracle
registry.

``round4_stable`` is the engine-portable 4-decimal rounding for computed
QUOTIENTS (averages, ratios, cosines, Jaccard): Spark's ``round()`` rounds
the double's shortest decimal representation (HALF_UP via
``BigDecimal.valueOf``) while DuckDB rounds the binary value — they disagree
exactly when a quotient's shortest form lands on a half (e.g. 3148.24/64 =
"49.19125" -> Spark 49.1913, DuckDB 49.1912). ``floor(x*1e4 + 0.5)/1e4`` is
pure double arithmetic, bit-identical on both engines; the SQL twin is
``floor(x * 10000 + 0.5) / 10000``.

For negative inputs this is round-half-toward-+inf rather than half-away —
a fixed, documented convention; what matters for the correctness gate is
that both engines compute the identical double. Plain ``round()`` stays
fine for sums of 2-decimal money (never near a half) and for values rounded
before comparison.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: SQL twin of :func:`round4_stable` — format with the expression inside.
ROUND4_SQL = "floor(({expr}) * 10000 + 0.5) / 10000"


def round4_stable(col: Column) -> Column:
    """4-decimal rounding as pure double arithmetic (see module docstring)."""
    return F.floor(col * 10000 + F.lit(0.5)) / F.lit(10000.0)
