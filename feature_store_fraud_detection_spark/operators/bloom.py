"""Bloom-filter semi-join pruning: filter a huge fact table against a key
set that is too large to ship as a raw broadcast ``isin`` list, using a
fixed-size bitmap built with k xxhash64 probes per key.

The pattern at 100 TB: a semi-join ``fact SEMI JOIN keys`` normally shuffles
the fact table on the key. When ``keys`` has millions of entries, a raw
broadcast of the key set is too big — but a Bloom BITMAP of them is a few
hundred KB regardless of key count. Shipping the bitmap to every task turns
the expensive shuffle into a scan-stage filter on the fact side that
discards non-matching rows BEFORE any exchange; the exact semi-join that
follows only sees survivors, so the answer is identical to the plain
semi-join (Bloom filters have false positives, never false negatives).

Spark's own engine applies the same idea automatically in some shapes
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, InjectRuntimeFilter);
this operator makes it an explicit, composable step — usable when the key
side is the output of an arbitrary subplan, with a deterministic layout.

Hash choice: xxhash64 (JVM-native, whole-stage-codegen'd) — NOT md5 — because
the bitmap never leaves this engine and never needs cross-engine parity; the
correctness oracle for the composed operator is the plain semi-join itself.

Implementation notes:
- The bitmap is packed 64 bits/bigint and embedded as a LITERAL array in the
  probe expression (one ~m/8-byte constant per plan, evaluated with
  ``getbit``) — the probe therefore fuses into the parquet scan's filter
  stage with no join operator at all. An earlier draft carried the bitmap
  through a broadcast nested-loop join as an array column; that copies the
  array into every joined row — 131072 booleans per fact row — and was 10x
  slower. The literal is materialized once per task.
- Building the bitmap does ONE driver collect of the distinct set bit
  positions. That is bounded by m (default 2^17 rows ≈ 1 MB) REGARDLESS of
  key count — the same bounded-driver-metadata budget as the repo's sampler
  configs — and the heavy key side is reduced map-side: only distinct
  positions cross the wire.
- fpr ≈ (1 - e^(-k*n/m))^k: at m=2^17, k=5, n=10^4 that is ~1e-7. Size m to
  the expected key count; the probe cost is k getbits per row either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.functions.numeric import (
    lit_bigint_array,
)


def _positions(key: Column, m_bits: int, k: int, salt: str) -> list[Column]:
    """k bit positions in [0, m_bits) per key — independent seeded xxhash64
    probes (seed folded in as a literal column, so each probe is a distinct
    hash function)."""
    return [
        F.pmod(F.xxhash64(F.lit(f"bloom|{salt}|{i}"), key), F.lit(m_bits))
        for i in range(k)
    ]


def bloom_bits(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 17,
    k: int = 5,
    salt: str = "",
) -> list[int]:
    """Compute the packed Bloom bitmap (``m_bits // 64`` signed 64-bit words)
    over the distinct values of ``keys.key_col``.

    Distributed part: explode k positions per key (narrow) + a distinct on
    at most m_bits values (partial-aggregated — the exchange carries set
    POSITIONS, never keys). Driver part: one bounded collect (≤ m_bits rows)
    and the bit packing.
    """
    pos_rows = (
        keys.select(F.col(key_col).alias("bk"))
        .where(F.col("bk").isNotNull())
        .select(
            F.explode(F.array(*_positions(F.col("bk"), m_bits, k, salt))).alias("pos")
        )
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in pos_rows:
        p = r["pos"]
        words[p >> 6] |= 1 << (p & 63)
    # two's-complement to signed 64-bit (Spark LongType literals)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(
    fact_key: str | Column,
    words: list[int],
    m_bits: int,
    k: int = 5,
    salt: str = "",
) -> Column:
    """The probe predicate: true iff all k probe bits are set. A pure
    column expression over a literal array — fuses into the scan filter."""
    key = F.col(fact_key) if isinstance(fact_key, str) else fact_key
    # explicit array<bigint>: the packing is 64-bit words, but a literal
    # list whose values all happen to fit an int32 infers array<int> —
    # getbit then rejects positions >= 32 and any probe with p % 64 in
    # [32, 64) crashes on valid input (round-11 property-sweep finding).
    # Built as ONE expression string: F.lit(list) paid a py4j round-trip
    # per element — ~1.7 s of driver time per query at m_bits=2^17 (r12)
    arr = lit_bigint_array(words)
    cond = key.isNotNull()
    for p in _positions(key, m_bits, k, salt):
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        cond = cond & (F.getbit(word, p % 64) == 1)
    return cond


def bloom_semi_join(
    fact: DataFrame,
    fact_key: str,
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 17,
    k: int = 5,
    salt: str = "",
) -> DataFrame:
    """Exact semi-join ``fact ⋉ keys`` with a Bloom pre-filter on the fact
    side: probe a packed literal bitmap in the SCAN stage, then run the
    exact semi-join on the survivors.

    Result is identical to ``fact.join(keys, on, "left_semi")`` — the Bloom
    stage only removes rows the semi-join would drop anyway. At scale the
    win is shuffle volume: the exchange after the filter carries ~|matches|
    rows instead of |fact|.
    """
    words = bloom_bits(keys, key_col, m_bits=m_bits, k=k, salt=salt)
    candidates = fact.where(
        bloom_might_contain(fact_key, words, m_bits, k=k, salt=salt)
    )
    key_side = keys.select(F.col(key_col).alias(fact_key)).distinct()
    return candidates.join(key_side, fact_key, "left_semi")
