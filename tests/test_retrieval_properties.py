"""Property-based checks of the retrieval + feature-screen family:
BM25 scoring, reciprocal-rank fusion, the in-plan MMR greedy fold, and
the quantile-binned mutual-information / WoE screens vs brute-force
pure-Python implementations on arbitrary small inputs — round 10's
fourth sweep batch.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)


def _round4(x: float) -> float:
    return math.floor(x * 10000 + 0.5) / 10000.0


_VOCAB = ["alpha", "beta", "gamma", "delta", "echo", "fox"]
_QUERY = ["alpha", "gamma", "fox"]


@SET
@given(
    st.lists(
        st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=8),
        min_size=1,
        max_size=10,
    )
)
def test_bm25_matches_bruteforce(spark, docs):
    from feature_store_fraud_detection_spark.operators.retrieval import (
        bm25_topk,
    )

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "id long, text string")
    out = bm25_topk(df, "id", "text", _QUERY, n=100).collect()

    # twin: tokens == whitespace split of the trimmed lowercase text
    # (an empty doc tokenizes to one empty token, dl = 1)
    toks = [t.strip().lower().split() or [""] for _, t in rows]
    n_docs = len(toks)
    total_dl = sum(len(t) for t in toks)
    avgdl = total_dl / n_docs
    dfc = {
        q: sum(1 for t in toks if q in t) for q in _QUERY
    }
    k1, b = 1.2, 0.75
    expect = {}
    for i, t in enumerate(toks):
        matched = [q for q in _QUERY if q in t]
        if not matched:
            continue
        score = 0.0
        for q in _QUERY:  # literal query order, absent terms add 0.0
            tf = t.count(q)
            if tf == 0:
                score = score + 0.0
                continue
            idf = math.log(
                (n_docs - dfc[q] + 0.5) / (dfc[q] + 0.5) + 1.0
            )
            score = score + idf * (
                tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
            )
        expect[i] = (len(matched), _round4(score))
    assert {r.id: (r.n_matched_terms, r.score) for r in out} == {
        i: (m, s) for i, (m, s) in expect.items()
    }
    # top-n ordering: rounded score desc, id asc
    order = sorted(expect, key=lambda i: (-expect[i][1], i))
    assert [r.id for r in out] == order


@SET
@given(
    st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=8,
             unique=True),
    st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=8,
             unique=True),
)
def test_rrf_fuse_matches_bruteforce(spark, list_a, list_b):
    from feature_store_fraud_detection_spark.operators.retrieval import (
        rrf_fuse,
    )

    ra = spark.createDataFrame(
        [(x, i + 1) for i, x in enumerate(list_a)], "id long, rank long"
    )
    rb = spark.createDataFrame(
        [(x, i + 1) for i, x in enumerate(list_b)], "id long, rank long"
    )
    out = rrf_fuse([ra, rb], "id", k=60, top_n=100).collect()

    pos_a = {x: i + 1 for i, x in enumerate(list_a)}
    pos_b = {x: i + 1 for i, x in enumerate(list_b)}
    ids = set(pos_a) | set(pos_b)
    expect = {}
    for x in ids:
        score = (1.0 / (60 + pos_a[x]) if x in pos_a else 0.0) + (
            1.0 / (60 + pos_b[x]) if x in pos_b else 0.0
        )
        expect[x] = (
            pos_a.get(x),
            pos_b.get(x),
            (x in pos_a) + (x in pos_b),
            _round4(score),
        )
    assert {
        r.id: (r.rank_1, r.rank_2, r.n_lists, r.rrf_score) for r in out
    } == expect
    order = sorted(ids, key=lambda x: (-expect[x][3], x))
    got_order = [r.id for r in sorted(out, key=lambda r: r.fused_rank)]
    assert got_order == order


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),  # rel in 1e-1 units
            st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=4),
        ),
        min_size=1,
        max_size=7,
    )
)
def test_mmr_rerank_matches_bruteforce(spark, cands):
    from feature_store_fraud_detection_spark.operators.retrieval import (
        mmr_rerank,
    )

    rows = [
        (i, rel / 10.0, sorted(set(t))) for i, (rel, t) in enumerate(cands)
    ]
    df = spark.createDataFrame(
        rows, "id long, rel double, toks array<string>"
    )
    out = mmr_rerank(df, "id", "rel", "toks", n_select=3, lam=0.7).collect()

    remaining = {i: (rel, set(t)) for i, (rel, t) in
                 ((r[0], (r[1], r[2])) for r in rows)}
    selected = []
    lam, mu = 0.7, 1.0 - 0.7
    for _ in range(min(3, len(rows))):
        best = None
        for i, (rel, t) in sorted(remaining.items()):
            if selected:
                sim = max(
                    len(t & ts) / len(t | ts) for _, ts in selected
                )
            else:
                sim = 0.0
            key = -math.floor((lam * rel - mu * sim) * 10000 + 0.5)
            if best is None or (key, i) < best[:2]:
                best = (key, i, rel, t)
        key, i, rel, t = best
        selected.append((i, t))
        remaining.pop(i)
        rank = len(selected)
        r = out[rank - 1]
        assert (r.id, r.mmr_rank) == (i, rank)
        assert abs(r.rel - rel) < 1e-9
        assert abs(r.mmr_score - (-key / 10000.0)) < 1e-9
    assert len(out) == min(3, len(rows))


def _spark_percentile(sorted_vals, q):
    """Spark/DuckDB exact percentile: linear interpolation at q*(n-1)."""
    n = len(sorted_vals)
    pos = q * (n - 1)
    lo = int(math.floor(pos))
    frac = pos - lo
    if lo + 1 < n:
        return sorted_vals[lo] + frac * (sorted_vals[lo + 1] - sorted_vals[lo])
    return float(sorted_vals[lo])


def _bins(vals, n_bins):
    sv = sorted(vals)
    cuts = [_spark_percentile(sv, i / n_bins) for i in range(1, n_bins)]
    return [sum(1 for c in cuts if v > c) for v in vals]


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.integers(min_value=0, max_value=1),
        ),
        min_size=2,
        max_size=30,
    )
)
def test_mutual_information_matches_bruteforce(spark, obs):
    from feature_store_fraud_detection_spark.operators.stats import (
        mutual_information_binned,
    )

    df = spark.createDataFrame(obs, "v long, y long")
    out = {
        (r.bin, r.label): (r.n, r.mi_term)
        for r in mutual_information_binned(df, "v", "y", n_bins=4).collect()
    }
    bins = _bins([v for v, _ in obs], 4)
    joint: dict[tuple[int, int], int] = {}
    for b, (_, y) in zip(bins, obs):
        joint[(b, y)] = joint.get((b, y), 0) + 1
    nt = len(obs)
    nx = {b: sum(c for (bb, _), c in joint.items() if bb == b)
          for b in {b for b, _ in joint}}
    ny = {y: sum(c for (_, yy), c in joint.items() if yy == y)
          for y in {y for _, y in joint}}
    expect = {}
    for (b, y), c in joint.items():
        p_xy, p_x, p_y = c / nt, nx[b] / nt, ny[y] / nt
        expect[(b, y)] = (c, _round4(p_xy * math.log(p_xy / (p_x * p_y))))
    assert set(out) == set(expect)
    for key_, (c, term) in expect.items():
        assert out[key_][0] == c
        assert abs(out[key_][1] - term) < 1e-3


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.integers(min_value=0, max_value=1),
        ),
        min_size=2,
        max_size=30,
    )
)
def test_woe_iv_matches_bruteforce(spark, obs):
    from feature_store_fraud_detection_spark.operators.stats import (
        woe_iv_binned,
    )

    df = spark.createDataFrame(obs, "v long, y long")
    out = {
        r.bin: (r.n_pos, r.n_neg, r.woe, r.iv_term)
        for r in woe_iv_binned(df, "v", "y", n_bins=4).collect()
    }
    bins = _bins([v for v, _ in obs], 4)
    per: dict[int, list[int]] = {}
    for b, (_, y) in zip(bins, obs):
        per.setdefault(b, [0, 0])
        per[b][y] += 1  # [neg, pos]? careful: index by label
    # per[b] = [count(y==0), count(y==1)]
    tp = sum(p[1] for p in per.values())
    tn = sum(p[0] for p in per.values())
    k = len(per)
    assert set(out) == set(per)
    for b, (n_neg, n_pos) in ((b, (p[0], p[1])) for b, p in per.items()):
        sp = (n_pos + 0.5) / (tp + k / 2.0)
        sn = (n_neg + 0.5) / (tn + k / 2.0)
        woe = math.log(sp / sn)
        got = out[b]
        assert (got[0], got[1]) == (n_pos, n_neg)
        assert abs(got[2] - woe) < 1e-3
        assert abs(got[3] - (sp - sn) * woe) < 1e-3
