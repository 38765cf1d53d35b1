"""Property-based checks of the corpus-statistics family: Zipf
frequency spectrum + log-log OLS slope, PMI collocations and Dunning
G2 keyness vs brute-force pure-Python twins on arbitrary small corpora
— round 10's eighth sweep batch.
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


_WORDS = ["ant", "bee", "cat", "dog", "elk"]

_docs_strategy = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=8),
    min_size=1,
    max_size=8,
)


@SET
@given(_docs_strategy)
def test_token_frequency_spectrum_matches_bruteforce(spark, docs):
    from feature_store_fraud_detection_spark.operators.text_analysis import (
        token_frequency_spectrum,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "id long, text string")
    res = token_frequency_spectrum(df, "id", "text")

    counts: dict[str, int] = {}
    for ws in docs:
        for w in ws:
            counts[w] = counts.get(w, 0) + 1
    spectrum: dict[int, int] = {}
    for c in counts.values():
        spectrum[c] = spectrum.get(c, 0) + 1
    if not spectrum:
        assert res.collect() == []
        return
    n = len(spectrum)
    pts = [(math.log(c), math.log(m)) for c, m in spectrum.items()]
    sx = sum(sorted(x for x, _ in pts))
    sy = sum(sorted(y for _, y in pts))
    sxx = sum(sorted(x * x for x, _ in pts))
    sxy = sum(sorted(x * y for x, y in pts))
    denom = n * sxx - sx * sx
    # r["count"], not r.count — Row.count is the tuple method
    out = {r["count"]: (r.n_tokens, r.zipf_slope) for r in res.collect()}
    assert {c: m for c, (m, _) in out.items()} == spectrum
    if denom > 0:
        slope = (n * sxy - sx * sy) / denom
        for _, got_slope in out.values():
            assert abs(got_slope - slope) < 1e-3
    else:
        # single-frequency spectrum (e.g. every token unique): the OLS
        # slope is undefined — NULL, never an unnamed engine error
        for _, got_slope in out.values():
            assert got_slope is None


@SET
@given(_docs_strategy)
def test_pmi_collocations_matches_bruteforce(spark, docs):
    from feature_store_fraud_detection_spark.operators.text_analysis import (
        pmi_collocations,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "id long, text string")
    out = pmi_collocations(df, "id", "text", min_count=1, top_k=1000)

    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    for ws in docs:
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    nu = sum(uni.values())
    nb = sum(bi.values())
    expect = {}
    for (a, b), c in bi.items():
        pmi = math.log(
            (c / nb) / ((uni[a] / nu) * (uni[b] / nu))
        )
        expect[(a, b)] = (c, _round4(pmi))
    got = {(r.w1, r.w2): (r.n_pair, r.pmi) for r in out.collect()}
    assert got == expect
    order = sorted(expect, key=lambda p: (-expect[p][1], p[0], p[1]))
    got_order = [(r.w1, r.w2) for r in out.collect()]
    assert got_order == order


@SET
@given(_docs_strategy, _docs_strategy)
def test_keyness_g2_matches_bruteforce(spark, docs_a, docs_b):
    from feature_store_fraud_detection_spark.operators.text_analysis import (
        keyness_g2,
    )

    rows = [("A", " ".join(ws)) for ws in docs_a] + [
        ("B", " ".join(ws)) for ws in docs_b
    ]
    df = spark.createDataFrame(rows, "g string, text string")
    res = keyness_g2(df, "text", "g", "A", "B", min_count=1, top_k=1000)

    ca: dict[str, int] = {}
    cb: dict[str, int] = {}
    for ws in docs_a:
        for w in ws:
            ca[w] = ca.get(w, 0) + 1
    for ws in docs_b:
        for w in ws:
            cb[w] = cb.get(w, 0) + 1
    na, nb = sum(ca.values()), sum(cb.values())
    vocab = set(ca) | set(cb)
    if not vocab:
        assert res.collect() == []
        return
    if na == 0 or nb == 0:
        # one corpus contributes no tokens: named fail-loud (the
        # logrank_test degenerate-cohorts convention)
        import pytest

        with pytest.raises(Exception, match="keyness_g2"):
            res.collect()
        return
    expect = {}
    for w in vocab:
        a, b = ca.get(w, 0), cb.get(w, 0)
        ea = na * (a + b) / (na + nb)
        eb = nb * (a + b) / (na + nb)
        g2 = 2.0 * (
            (a * math.log(a / ea) if a > 0 else 0.0)
            + (b * math.log(b / eb) if b > 0 else 0.0)
        )
        expect[w] = (a, b, _round4(g2), a / na > b / nb)
    got = {
        r.token: (r.n_a, r.n_b, r.g2, r.overused_in_a)
        for r in res.collect()
    }
    assert got == expect
    order = sorted(expect, key=lambda w: (-expect[w][2], w))
    got_order = [r.token for r in res.collect()]
    assert got_order == order


def test_keyness_g2_empty_corpus_fails_loud(spark):
    """Deterministic pin of the degenerate edge the sweep's random draw
    may miss: group A present but contributing zero tokens."""
    import pytest

    from feature_store_fraud_detection_spark.operators.text_analysis import (
        keyness_g2,
    )

    df = spark.createDataFrame(
        [("A", ""), ("B", "ant bee ant")], "g string, text string"
    )
    with pytest.raises(Exception, match="keyness_g2"):
        keyness_g2(df, "text", "g", "A", "B", min_count=1).collect()
