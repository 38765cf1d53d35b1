"""Property sweep: Bloom-filter semi-join pruning vs the plain exact
semi-join on arbitrary small fact/key tables — round 11's sweep of the
last unswept families (VERDICT r10 task 4). Deliberately tiny bitmaps
(m_bits down to 64) force heavy collision/false-positive pressure: the
composed operator must still be EXACT (the Bloom stage may only discard
rows the semi-join would drop anyway), keys present in the set must
always pass the probe (no false negatives), and NULL fact keys never
match.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)

_fact = st.lists(
    st.tuples(st.integers(0, 30), st.one_of(st.none(), st.integers(0, 15))),
    min_size=0,
    max_size=30,
)
_keys = st.lists(
    st.one_of(st.none(), st.integers(0, 15)), min_size=0, max_size=12
)


@SET
@given(_fact, _keys, st.sampled_from([64, 128, 1024]), st.integers(1, 4))
def test_bloom_semi_join_equals_plain_semi_join_under_collisions(
    spark, fact_rows, key_vals, m_bits, k
):
    from feature_store_fraud_detection_spark.operators.bloom import (
        bloom_semi_join,
    )

    fact = spark.createDataFrame(
        fact_rows or [(0, None)], "rid long, fk long"
    )
    if not fact_rows:
        fact = fact.filter("rid < 0")
    keys = spark.createDataFrame(
        [(v,) for v in key_vals] or [(None,)], "kv long"
    )
    if not key_vals:
        keys = keys.filter("kv IS NOT NULL")
    got = sorted(
        (r.rid, r.fk)
        for r in bloom_semi_join(
            fact, "fk", keys, "kv", m_bits=m_bits, k=k, salt="s"
        ).collect()
    )
    expect = sorted(
        (rid, fk)
        for rid, fk in (fact_rows or [])
        if fk is not None and fk in {v for v in key_vals if v is not None}
    )
    assert got == expect


@SET
@given(_keys, st.sampled_from([64, 256]), st.integers(1, 5))
def test_bloom_probe_has_no_false_negatives(spark, key_vals, m_bits, k):
    from feature_store_fraud_detection_spark.operators.bloom import (
        bloom_bits,
        bloom_might_contain,
    )

    present = sorted({v for v in key_vals if v is not None})
    keys = spark.createDataFrame(
        [(v,) for v in key_vals] or [(None,)], "kv long"
    )
    if not key_vals:
        keys = keys.filter("kv IS NOT NULL")
    words = bloom_bits(keys, "kv", m_bits=m_bits, k=k, salt="s")
    assert len(words) == m_bits // 64
    probe_df = spark.createDataFrame(
        [(v,) for v in present] or [(None,)], "kv long"
    )
    if not present:
        probe_df = probe_df.filter("kv IS NOT NULL")
    passed = probe_df.where(
        bloom_might_contain("kv", words, m_bits, k=k, salt="s")
    ).count()
    assert passed == len(present)  # every present key must pass


@SET
@given(_keys)
def test_bloom_null_fact_keys_never_pass(spark, key_vals):
    from feature_store_fraud_detection_spark.operators.bloom import (
        bloom_bits,
        bloom_might_contain,
    )

    keys = spark.createDataFrame(
        [(v,) for v in key_vals] or [(None,)], "kv long"
    )
    if not key_vals:
        keys = keys.filter("kv IS NOT NULL")
    words = bloom_bits(keys, "kv", m_bits=64, k=2, salt="s")
    nulls = spark.createDataFrame([(None,)], "kv long")
    assert (
        nulls.where(bloom_might_contain("kv", words, 64, k=2, salt="s")).count()
        == 0
    )
