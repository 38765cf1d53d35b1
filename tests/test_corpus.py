"""Corpus-curation operators: hand-computed fixtures for chunk-level dedup,
canonical selection, incremental ingest dedup, and cluster-safe splitting
(operators/corpus.py). The registry oracles cross-check vs DuckDB at sf;
these tests pin the SEMANTICS on inputs where the answer is known by hand.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.operators.corpus import (
    canonical_docs,
    chunk_dedup,
    cluster_safe_split,
    incremental_corpus_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, n_chars bigint")


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a bigint, id_b bigint")


def test_chunk_dedup_first_occurrence_wins(spark):
    # chunk_size=2: doc 1 = [a b][c d], doc 2 = [a b][x y], doc 3 = [c d]
    docs = _docs(
        spark,
        [(1, "a b c d", 7), (2, "a b x y", 7), (3, "c d", 3)],
    )
    out = {
        r["doc_id"]: r
        for r in chunk_dedup(docs, "doc_id", "text", chunk_size=2).collect()
    }
    assert out[1]["n_chunks"] == 2 and out[1]["n_dup_chunks"] == 0
    assert out[1]["kept_tokens"] == 4
    # doc 2's first chunk duplicates doc 1's
    assert out[2]["n_dup_chunks"] == 1 and out[2]["kept_tokens"] == 2
    assert out[2]["dup_ratio"] == 0.5
    # doc 3 is entirely a duplicate of doc 1's second chunk
    assert out[3]["n_dup_chunks"] == 1 and out[3]["kept_tokens"] == 0
    assert out[3]["dup_ratio"] == 1.0


def test_chunk_dedup_short_tail_chunk_is_distinct(spark):
    # trailing partial chunk ("e") is its own content, not a dup of "e f"
    docs = _docs(spark, [(1, "e f", 3), (2, "e", 1)])
    out = {
        r["doc_id"]: r
        for r in chunk_dedup(docs, "doc_id", "text", chunk_size=2).collect()
    }
    assert out[2]["n_dup_chunks"] == 0 and out[2]["kept_tokens"] == 1


def test_canonical_docs_keeps_longest_min_id_tiebreak(spark):
    docs = _docs(
        spark,
        [
            (1, "short", 5),
            (2, "longer text", 11),
            (3, "also eleven", 11),
            (9, "singleton", 9),
        ],
    )
    pairs = _pairs(spark, [(1, 2), (2, 3)])
    out = {r["canonical_id"]: r for r in canonical_docs(docs, pairs, "doc_id", "n_chars").collect()}
    # cluster {1,2,3}: longest is 11 chars, tie between 2 and 3 -> min id 2
    assert out[1]["doc_id"] == 2 and out[1]["cluster_size"] == 3
    assert out[1]["n_chars"] == 11
    # singleton survives as its own keeper
    assert out[9]["doc_id"] == 9 and out[9]["cluster_size"] == 1


def test_incremental_dedup_batch_vs_corpus(spark):
    batch = _docs(spark, [(10, "aaa", 3), (11, "bbb", 3), (12, "aaa", 3)])
    corpus = _docs(spark, [(1, "bbb", 3), (2, "ccc", 3)])
    kept = incremental_corpus_dedup(batch, corpus, "doc_id", "text").collect()
    # "bbb" exists in corpus; "aaa" twice in batch -> min id 10 only
    assert [(r["doc_id"]) for r in kept] == [10]


def test_cluster_safe_split_no_straddle_and_monotone(spark):
    docs = _docs(spark, [(i, f"doc {i}", 5) for i in range(1, 21)])
    pairs = _pairs(spark, [(1, 2), (2, 3), (5, 6)])
    out = cluster_safe_split(docs, pairs, "doc_id", train_fraction=0.5)
    rows = out.collect()
    side = {r["doc_id"]: r["split"] for r in rows}
    # near-dups never straddle the split
    assert side[1] == side[2] == side[3]
    assert side[5] == side[6]
    # monotone: growing the fraction only moves clusters INTO train
    train_small = {r["doc_id"] for r in rows if r["split"] == "train"}
    rows_big = cluster_safe_split(docs, pairs, "doc_id", train_fraction=0.9).collect()
    train_big = {r["doc_id"] for r in rows_big if r["split"] == "train"}
    assert train_small <= train_big


def test_chunk_dedup_total_chunks_conserved(spark, sf_dir):
    """On real data: kept + dup chunk counts add up, and every duplicated
    chunk's content appears at least twice in the corpus-wide chunk set."""
    from feature_store_fraud_detection_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    out = chunk_dedup(docs, "doc_id", "text", chunk_size=32)
    agg = out.agg(
        F.sum("n_chunks").alias("total"),
        F.sum("n_dup_chunks").alias("dups"),
    ).collect()[0]
    assert agg["total"] > 0 and 0 <= agg["dups"] < agg["total"]


# --------------------------------------------------------------------------
# Incremental MinHash-LSH index
# --------------------------------------------------------------------------


def test_minhash_index_roundtrip_and_probe(spark, tmp_path):
    """The LSH index state survives a parquet round-trip (the 'sketch the
    corpus once' path) and a probe batch finds its planted near-duplicate
    without touching corpus text."""
    from feature_store_fraud_detection_spark.operators.dedup import (
        minhash_doc_state,
        minhash_probe,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different words about spark shuffles here")],
        "doc_id bigint, text string",
    )
    state = minhash_doc_state(corpus, "doc_id", "text")
    path = str(tmp_path / "lsh_index")
    state.write.mode("overwrite").parquet(path)
    corpus_state = spark.read.parquet(path)

    batch = spark.createDataFrame(
        [(10, base + " tonight"), (11, "nothing in common with anything at all")],
        "doc_id bigint, text string",
    )
    new_state = minhash_doc_state(batch, "doc_id", "text")
    got = minhash_probe(new_state, corpus_state, "doc_id", threshold=0.2).collect()
    pairs = {(r["new_id"], r["corpus_id"]) for r in got}
    assert (10, 1) in pairs
    assert all(n != 11 for n, _ in pairs)


def test_minhash_probe_equals_batch_lsh_on_cross_pairs(spark, sf_dir):
    """Probing batch-vs-corpus must find exactly the CROSS pairs the full
    minhash_lsh_pairs run finds on the union (restricted to batch x corpus),
    with equal jaccard values."""
    from pyspark.sql import functions as F

    from feature_store_fraud_detection_spark.operators.dedup import (
        minhash_doc_state,
        minhash_lsh_pairs,
        minhash_probe,
    )
    from feature_store_fraud_detection_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    got = {
        (r["new_id"], r["corpus_id"]): r["jaccard"]
        for r in minhash_probe(
            minhash_doc_state(batch, "doc_id", "text"),
            minhash_doc_state(corpus, "doc_id", "text"),
            "doc_id",
            threshold=0.2,
        ).collect()
    }
    full = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.2).collect()
    want = {}
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    for r in full:
        a, b = r["id_a"], r["id_b"]
        if (a in batch_ids) != (b in batch_ids):
            key = (a, b) if a in batch_ids else (b, a)
            want[key] = r["jaccard"]
    assert got == want


# --------------------------------------------------------------------------
# chunk_dedup vs a pure-Python reference (property test)
# --------------------------------------------------------------------------


def test_chunk_dedup_matches_python_reference_on_random_corpora(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = ["alpha", "beta", "gamma", "delta"]
    doc_strategy = st.lists(
        st.sampled_from(words), min_size=1, max_size=12
    ).map(" ".join)

    @settings(max_examples=10, deadline=None)
    @given(st.lists(doc_strategy, min_size=1, max_size=8))
    def run(texts):
        docs = spark.createDataFrame(
            [(i, t, len(t)) for i, t in enumerate(texts)],
            "doc_id bigint, text string, n_chars bigint",
        )
        got = {
            r["doc_id"]: (r["n_chunks"], r["n_dup_chunks"], r["kept_tokens"])
            for r in chunk_dedup(docs, "doc_id", "text", chunk_size=3).collect()
        }
        # reference: first global occurrence of each chunk content wins,
        # ordered by (doc_id, chunk_idx)
        seen: set[str] = set()
        want: dict[int, tuple[int, int, int]] = {}
        for i, t in enumerate(texts):
            toks = t.lower().split()
            chunks = [toks[s : s + 3] for s in range(0, len(toks), 3)]
            n_dup = kept = 0
            for c in chunks:
                key = " ".join(c)
                if key in seen:
                    n_dup += 1
                else:
                    seen.add(key)
                    kept += len(c)
            want[i] = (len(chunks), n_dup, kept)
        assert got == want

    run()


def test_canonical_docs_exactly_one_keeper_per_cluster_property(spark):
    """Property over random pair graphs: every document's cluster has
    exactly one keeper, and keepers have maximal n_chars in their cluster."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(1, 15), st.integers(1, 15)).filter(
                lambda p: p[0] != p[1]
            ),
            max_size=12,
        )
    )
    def run(edge_list):
        docs = _docs(spark, [(i, f"doc {i}", (i * 7) % 13) for i in range(1, 16)])
        pairs = (
            _pairs(spark, edge_list)
            if edge_list
            else _pairs(spark, []).limit(0)
        )
        keep = canonical_docs(docs, pairs, "doc_id", "n_chars").collect()
        # union-find ground truth
        parent = {i: i for i in range(1, 16)}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edge_list:
            parent[find(a)] = find(b)
        clusters = {}
        for i in range(1, 16):
            clusters.setdefault(find(i), []).append(i)
        assert len(keep) == len(clusters)
        got = {}
        for r in keep:
            members = clusters[find(r["doc_id"])]
            assert r["cluster_size"] == len(members)
            best = max(members, key=lambda i: ((i * 7) % 13, -i))
            assert r["doc_id"] == best
            got[find(r["doc_id"])] = r["doc_id"]
        assert len(got) == len(clusters)

    run()


def test_minhash_probe_fanout_cap_is_per_bucket_not_per_doc(spark):
    """max_bucket_fanout drops degenerate CORPUS buckets, never a probe
    document's matches: a new doc that near-dups SEVERAL corpus docs (its
    band keys hit many small buckets, and hit them in many bands) must keep
    all its matches — the old per-new_id pre-distinct count would have
    cleared them, admitting the most-duplicated documents past the filter."""
    from feature_store_fraud_detection_spark.operators.dedup import (
        minhash_doc_state,
        minhash_probe,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = spark.createDataFrame(
        [
            (1, base + " alpha"),
            (2, base + " beta"),
            (3, "completely unrelated corpus text about joins and scans"),
        ],
        "doc_id bigint, text string",
    )
    corpus_state = minhash_doc_state(corpus, "doc_id", "text")
    probe = spark.createDataFrame([(10, base)], "doc_id bigint, text string")
    new_state = minhash_doc_state(probe, "doc_id", "text")

    # every (band, band_key) bucket holds at most 2 corpus docs here, so a
    # cap of 4 must not drop anything — even though doc 10 matches 2 corpus
    # docs through ~16 bands each (the old row count would be ~32 > 4)
    got = {
        (r["new_id"], r["corpus_id"])
        for r in minhash_probe(
            new_state, corpus_state, "doc_id", threshold=0.2, max_bucket_fanout=4
        ).collect()
    }
    assert got == {(10, 1), (10, 2)}

    # a genuinely degenerate bucket (5 identical corpus docs -> every bucket
    # they occupy has size 5) IS dropped by a cap of 4: pairs against the
    # clones vanish, pairs against small buckets survive
    clones = spark.createDataFrame(
        [(i, base + " alpha") for i in range(20, 25)] + [(3, "unique words "
         "entirely different content about buckets and probes tonight")],
        "doc_id bigint, text string",
    )
    clone_state = minhash_doc_state(clones, "doc_id", "text")
    probe2 = spark.createDataFrame(
        [(11, "unique words entirely different content about buckets and "
          "probes today")],
        "doc_id bigint, text string",
    )
    got2 = {
        (r["new_id"], r["corpus_id"])
        for r in minhash_probe(
            minhash_doc_state(probe2, "doc_id", "text"),
            clone_state,
            "doc_id",
            threshold=0.2,
            max_bucket_fanout=4,
        ).collect()
    }
    assert got2 == {(11, 3)}


def test_prefix_filter_pairs_equals_uncapped_exact_jaccard(spark):
    """Prefix filtering guarantees NO false negatives: its output must
    equal the full inverted-index exact Jaccard at the same threshold."""
    from feature_store_fraud_detection_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " lambda"),                       # near-dup of 1
            (3, "one two three four five six seven"),
            (4, "one two three four five six eight"),    # near-dup of 3
            (5, "totally different words everywhere here now ok"),
        ],
        "doc_id bigint, text string",
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["n_inter"], r["jaccard"])
        for r in prefix_filter_pairs(
            docs, "doc_id", "text", threshold=0.5
        ).collect()
    )
    want = sorted(
        (r["id_a"], r["id_b"], r["n_inter"], r["jaccard"])
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.5
        ).collect()
    )
    assert got == want
    assert [(a, b) for a, b, *_ in got] == [(1, 2), (3, 4)]


def test_lsh_recall_report_detects_band_misses(spark):
    """The report must MEASURE recall loss: with aggressive banding
    (rows_per_band=4) borderline pairs stop colliding and show up in
    n_missed; with r=1 banding the same corpus scores full recall."""
    from feature_store_fraud_detection_spark.operators.dedup import (
        lsh_recall_report,
    )

    # ~0.33-Jaccard pairs: 12 shared tokens, 12 unique each side
    docs = []
    for g in range(12):
        shared = " ".join(f"s{g}_{j}" for j in range(12))
        docs.append((2 * g, shared + " " + " ".join(f"a{g}_{j}" for j in range(12))))
        docs.append((2 * g + 1, shared + " " + " ".join(f"b{g}_{j}" for j in range(12))))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    loose = lsh_recall_report(
        df, "doc_id", "text", threshold=0.1, rows_per_band=1
    ).collect()[0]
    tight = lsh_recall_report(
        df, "doc_id", "text", threshold=0.1, rows_per_band=4
    ).collect()[0]
    assert loose["n_truth"] == tight["n_truth"] >= 12
    assert loose["recall"] == 1.0 and loose["n_missed"] == 0
    # r=4 bands at J~0.2 shingle similarity: most pairs never collide
    assert tight["n_missed"] > 0
    assert tight["recall"] < 1.0


def test_simhash_pairs_pigeonhole_no_false_negatives(spark):
    """Every pair within the Hamming bound must appear (band guarantee),
    and verification must reject pairs beyond it — checked against a
    brute-force Hamming computation over all fingerprint pairs."""
    from feature_store_fraud_detection_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_pairs,
    )

    docs = [
        (1, "alpha beta gamma delta epsilon common tokens here"),
        (2, "alpha beta gamma delta epsilon common tokens here now"),
        (3, "alpha beta gamma delta epsilon common words here"),
        (4, "completely different vocabulary entirely unrelated doc"),
        (5, "another unrelated text with its own distinct words"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in simhash_fingerprints(df, "doc_id", "text").collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(df, "doc_id", "text", max_hamming=3).collect()
    }
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = sum(x != y for x, y in zip(sigs[a], sigs[b]))
            if ham <= 3:
                assert got[(a, b)] == ham, f"missed pair {(a, b)}"
            else:
                assert (a, b) not in got


def test_simhash_64bit_extends_32bit_prefix(spark):
    """The 64-bit fingerprint's first 32 chars must BE the 32-bit
    fingerprint (same nibble-bit layout over hex digits 0-7; digits 8-15
    only append) — so widening the fingerprint never reshuffles existing
    band keys, and the pigeonhole guarantee carries to d=3 with 4 x
    16-bit bands."""
    from feature_store_fraud_detection_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_pairs,
    )

    docs = [
        (1, "alpha beta gamma delta epsilon common tokens here"),
        (2, "alpha beta gamma delta epsilon common tokens here now"),
        (3, "alpha beta gamma delta epsilon common words here"),
        (4, "completely different vocabulary entirely unrelated doc"),
        (5, "another unrelated text with its own distinct words"),
        (6, "alpha beta gamma delta epsilon common tokens nearby"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    s32 = {
        r["doc_id"]: r["simhash"]
        for r in simhash_fingerprints(df, "doc_id", "text", bits=32).collect()
    }
    s64 = {
        r["doc_id"]: r["simhash"]
        for r in simhash_fingerprints(df, "doc_id", "text", bits=64).collect()
    }
    for d in s32:
        assert len(s64[d]) == 64 and set(s64[d]) <= {"0", "1"}
        assert s64[d][:32] == s32[d]

    # pigeonhole no-false-negative property at 64 bits / d=3
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(
            df, "doc_id", "text", bits=64, max_hamming=3
        ).collect()
    }
    ids = sorted(s64)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = sum(x != y for x, y in zip(s64[a], s64[b]))
            if ham <= 3:
                assert got[(a, b)] == ham, f"missed pair {(a, b)}"
            else:
                assert (a, b) not in got
