"""Property sweep: corpus curation + decontamination vs brute-force
pure-Python twins on arbitrary small corpora — round 11's continuation
of the sweep program past the five verdict-named families. Covers
chunk-level dedup (first-occurrence election + retention stats),
canonical-representative selection over connected components,
incremental batch-vs-corpus dedup, the cluster-safe split (plus its
monotonicity-in-train_fraction contract), benchmark contamination and
split novelty (shingle-overlap arithmetic and round4 gating).
"""

from __future__ import annotations

import hashlib
import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)

_texts = st.lists(
    st.sampled_from(
        [
            "a b c d e",
            "a b c",
            "c d e a b",
            "x y z a b c d",
            "a a a a a a",
            "p q",
            "",
            "a b c d e f g h",
        ]
    ),
    min_size=1,
    max_size=10,
)


def _round4(x: float) -> float:
    return math.floor(x * 10000 + 0.5) / 10000.0


def _tokens(text: str) -> list[str]:
    return re.split(r"\s+", text.strip().lower())


def _shingles(text: str, k: int = 3) -> set[str]:
    toks = _tokens(text)
    if len(toks) < k:
        return set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


@SET
@given(_texts, st.integers(2, 4))
def test_chunk_dedup_matches_bruteforce(spark, texts, chunk_size):
    from feature_store_fraud_detection_spark.operators.corpus import (
        chunk_dedup,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_chunks, r.n_dup_chunks, r.kept_tokens, r.dup_ratio)
        for r in chunk_dedup(
            df, "doc_id", "text", chunk_size=chunk_size
        ).collect()
    }
    # brute force: non-overlapping chunks, global first-occurrence by
    # (doc_id, chunk_idx) on identical chunk text
    chunks = []  # (doc_id, idx, text, n_tokens)
    for i, t in enumerate(texts):
        if not t.strip():
            continue
        toks = _tokens(t)
        for s in range(0, len(toks), chunk_size):
            part = toks[s : s + chunk_size]
            chunks.append((i, s // chunk_size, " ".join(part), len(part)))
    first: dict[str, tuple[int, int]] = {}
    for i, idx, txt, _ in sorted(chunks):
        first.setdefault(txt, (i, idx))
    expect: dict[int, tuple[int, int, int, float]] = {}
    per_doc: dict[int, list[tuple[int, str, int]]] = {}
    for i, idx, txt, n in chunks:
        per_doc.setdefault(i, []).append((idx, txt, n))
    for i, cs in per_doc.items():
        n_chunks = len(cs)
        dups = sum(1 for idx, txt, _ in cs if first[txt] != (i, idx))
        kept = sum(n for idx, txt, n in cs if first[txt] == (i, idx))
        expect[i] = (n_chunks, dups, kept, _round4(dups / n_chunks))
    assert got == expect


def _components(n_ids: list[int], pairs: list[tuple[int, int]]):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        if a in parent and b in parent:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in n_ids}


_pairs = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
        lambda p: p[0] < p[1]
    ),
    min_size=0,
    max_size=12,
)


@SET
@given(st.integers(3, 10), _pairs, st.lists(st.integers(0, 50), min_size=10, max_size=10))
def test_canonical_docs_matches_bruteforce(spark, n_docs, pairs, ranks):
    from feature_store_fraud_detection_spark.operators.corpus import (
        canonical_docs,
    )

    ids = list(range(n_docs))
    pairs = [(a, b) for a, b in pairs if a < n_docs and b < n_docs]
    docs = spark.createDataFrame(
        [(i, ranks[i]) for i in ids], "doc_id long, rank long"
    )
    pdf = spark.createDataFrame(
        pairs or [(None, None)], "id_a long, id_b long"
    )
    if not pairs:
        pdf = pdf.filter("id_a IS NOT NULL")
    got = {
        r.canonical_id: (r.doc_id, r.cluster_size, r.rank)
        for r in canonical_docs(docs, pdf, "doc_id", "rank").collect()
    }
    comp = _components(ids, pairs)
    clusters: dict[int, list[int]] = {}
    for i, c in comp.items():
        clusters.setdefault(c, []).append(i)
    expect = {}
    for c, members in clusters.items():
        keeper = min(members, key=lambda i: (-ranks[i], i))
        expect[c] = (keeper, len(members), ranks[keeper])
    assert got == expect


@SET
@given(_texts, _texts)
def test_incremental_corpus_dedup_matches_bruteforce(spark, batch, corpus):
    from feature_store_fraud_detection_spark.operators.corpus import (
        incremental_corpus_dedup,
    )

    bdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(batch)], "doc_id long, text string"
    )
    cdf = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(corpus)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id
        for r in incremental_corpus_dedup(bdf, cdf, "doc_id", "text").collect()
    }
    corpus_digests = {hashlib.md5(t.encode()).hexdigest() for t in corpus}
    first_by_digest: dict[str, int] = {}
    for i, t in enumerate(batch):
        first_by_digest.setdefault(hashlib.md5(t.encode()).hexdigest(), i)
    expect = {
        i
        for d, i in first_by_digest.items()
        if d not in corpus_digests
    }
    assert got == expect


@SET
@given(st.integers(3, 10), _pairs)
def test_cluster_safe_split_matches_hash_and_is_monotone(spark, n_docs, pairs):
    from feature_store_fraud_detection_spark.operators.corpus import (
        cluster_safe_split,
    )

    ids = list(range(n_docs))
    pairs = [(a, b) for a, b in pairs if a < n_docs and b < n_docs]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    pdf = spark.createDataFrame(
        pairs or [(None, None)], "id_a long, id_b long"
    )
    if not pairs:
        pdf = pdf.filter("id_a IS NOT NULL")
    comp = _components(ids, pairs)

    def side(canonical: int, frac: float) -> str:
        h = hashlib.md5(f"split|{canonical}".encode()).hexdigest()[:15]
        return "train" if int(h, 16) < int(frac * (16**15)) else "test"

    got = {
        r.doc_id: (r.canonical_id, r.split)
        for r in cluster_safe_split(
            docs, pdf, "doc_id", train_fraction=0.5
        ).collect()
    }
    assert got == {i: (comp[i], side(comp[i], 0.5)) for i in ids}
    # same cluster -> same side, and raising the fraction only moves
    # clusters test -> train
    wider = {
        r.doc_id: r.split
        for r in cluster_safe_split(
            docs, pdf, "doc_id", train_fraction=0.9
        ).collect()
    }
    for i in ids:
        if got[i][1] == "train":
            assert wider[i] == "train"


@SET
@given(_texts, _texts, st.sampled_from([0.2, 0.5, 0.8]))
def test_benchmark_contamination_matches_bruteforce(
    spark, texts, bench, threshold
):
    from feature_store_fraud_detection_spark.operators.decontaminate import (
        benchmark_contamination,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    bdf = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(bench)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_shingles, r.n_overlap, r.overlap_ratio, r.contaminated)
        for r in benchmark_contamination(
            docs, bdf, "doc_id", "text", k=3, threshold=threshold
        ).collect()
    }
    bench_sh = set().union(*(_shingles(t) for t in bench)) if bench else set()
    expect = {}
    for i, t in enumerate(texts):
        sh = _shingles(t)
        if not sh:
            continue  # zero-shingle docs are absent from the output
        ov = len(sh & bench_sh)
        ratio = _round4(ov / len(sh))
        expect[i] = (len(sh), ov, ratio, int(ratio >= threshold))
    assert got == expect


@SET
@given(_texts, _texts)
def test_split_novelty_matches_bruteforce(spark, train, test):
    from feature_store_fraud_detection_spark.operators.decontaminate import (
        split_novelty,
    )

    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train)], "doc_id long, text string"
    )
    edf = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(test)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_shingles, r.n_seen, r.novelty)
        for r in split_novelty(tdf, edf, "doc_id", "text", k=3).collect()
    }
    train_sh = set().union(*(_shingles(t) for t in train)) if train else set()
    expect = {}
    for i, t in enumerate(test):
        sh = _shingles(t)
        if not sh:
            continue
        seen = len(sh & train_sh)
        expect[100 + i] = (len(sh), seen, _round4(1.0 - seen / len(sh)))
    assert got == expect
