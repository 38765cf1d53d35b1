"""Z-order (Morton) keys: bit-interleave two bounded integer dimensions so
that sorting by the key clusters rows that are close in BOTH dimensions.

Why this matters at 100 TB: parquet prunes row groups with per-column
min/max stats. A table sorted by one column prunes only on that column; a
table sorted by the Morton key of (key, time-bucket) or (user, amount-band)
keeps BOTH columns' min/max ranges narrow within every row group, so
two-dimensional predicates skip most of the file. This is the portable core
of Delta/Iceberg `OPTIMIZE ZORDER BY` — here it is just an expression passed
to ``OfflineStore.write(sort_cols=...)`` / ``compact`` (both already sort
within partitions), no table format required.

Pure integer bit arithmetic (shift/and/or) — exact, engine-portable,
whole-stage-codegen'd; never a UDF.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_key(x: Column, y: Column, bits: int = 10) -> Column:
    """Interleave the low ``bits`` bits of non-negative ``x`` and ``y``:
    result bit 2i = x bit i, bit 2i+1 = y bit i. Callers clamp/bucket the
    inputs into [0, 2^bits) first (see ``clamp_bits``)."""
    xt = [
        F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        for i in range(bits)
    ]
    yt = [
        F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a + b, xt + yt).cast("bigint")


def clamp_bits(c: Column, bits: int = 10) -> Column:
    """Clamp a non-negative integer column into [0, 2^bits): values above
    the range saturate at the max (preserves ordering at the tail, unlike a
    wrap-around mask)."""
    return F.least(c.cast("bigint"), F.lit((1 << bits) - 1))
