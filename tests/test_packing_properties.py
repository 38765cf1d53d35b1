"""Property sweep: sequence packing vs a brute-force pure-Python twin —
round 11's sweep of the last unswept families (VERDICT r10 task 4).
Checks the full placement table (shard, n_tokens, shard_offset,
pack_id, pack_offset, spans_boundary) on arbitrary small corpora,
including empty/whitespace-only texts (token_count of '' is 1: split
yields ['']), plus the packing invariants: per-shard offsets telescope
and pack arithmetic is exact integer div/mod.
"""

from __future__ import annotations

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)

_texts = st.lists(
    st.sampled_from(
        ["a", "ab ba", "x y z", "", "  ", "one two three four", "w  w"]
    ),
    min_size=1,
    max_size=16,
)


def _n_tokens(text: str) -> int:
    # twin of text_analysis.tokens: split(lower(trim(x)), '\s+') — the
    # empty string still yields one element ('')
    return len(re.split(r"\s+", text.strip().lower()))


def _shard(doc_id: int, n_shards: int) -> int:
    h = hashlib.md5(str(doc_id).encode()).hexdigest()[:15]
    return int(h, 16) % n_shards


def _brute(docs, capacity, n_shards):
    per_shard: dict[int, list[int]] = {}
    for doc_id, _ in docs:
        per_shard.setdefault(_shard(doc_id, n_shards), []).append(doc_id)
    expect = {}
    toks = dict(docs)
    for shard, ids in per_shard.items():
        off = 0
        for doc_id in sorted(ids):
            n = toks[doc_id]
            expect[doc_id] = (
                shard,
                n,
                off,
                off // capacity,
                off % capacity,
                int(off % capacity + n > capacity),
            )
            off += n
    return expect


@SET
@given(_texts, st.integers(2, 7), st.integers(1, 4))
def test_pack_sequences_matches_bruteforce(spark, texts, capacity, n_shards):
    from feature_store_fraud_detection_spark.operators.packing import (
        pack_sequences,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(
        df, "doc_id", "text", capacity=capacity, n_shards=n_shards
    ).collect()
    got = {
        r.doc_id: (
            r.shard,
            r.n_tokens,
            r.shard_offset,
            r.pack_id,
            r.pack_offset,
            r.spans_boundary,
        )
        for r in out
    }
    docs = [(i, _n_tokens(t)) for i, t in rows]
    assert got == _brute(docs, capacity, n_shards)


@SET
@given(_texts)
def test_pack_sequences_offsets_telescope_and_are_append_stable(spark, texts):
    """Within a shard, each doc's shard_offset equals the previous doc's
    offset + tokens (no token wasted, none double-counted); and because
    shard assignment is a pure id hash, re-running on a repartitioned
    input yields byte-identical placement."""
    from feature_store_fraud_detection_spark.operators.packing import (
        pack_sequences,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, "doc_id", "text", capacity=5, n_shards=3)
    placed = sorted(
        (r.shard, r.doc_id, r.shard_offset, r.n_tokens) for r in out.collect()
    )
    prev_shard, running = None, 0
    for shard, _, off, n in placed:
        if shard != prev_shard:
            prev_shard, running = shard, 0
        assert off == running
        running += n
    again = pack_sequences(
        df.repartition(7), "doc_id", "text", capacity=5, n_shards=3
    )
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, out.collect())
    )
