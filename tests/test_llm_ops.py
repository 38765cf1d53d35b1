"""Dedup / similarity / text-analysis / multimodal operators on hand fixtures."""

from __future__ import annotations


import pytest
from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
)
from feature_store_fraud_detection_spark.operators.multimodal import (
    decode_image,
    extract_binary_features,
    with_binary_payload,
)
from feature_store_fraud_detection_spark.operators.similarity import cosine_topk
from feature_store_fraud_detection_spark.operators.text_analysis import text_profile


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank"),
        (1, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of 0
        (2, "completely different words about database engines and query plans"),
        (3, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(spark):
    out = exact_dedup(_docs(spark), "doc_id", "text").collect()
    groups = {r.canonical_id: r.n_dupes for r in out}
    assert groups[0] == 2  # docs 0 and 3 share a fingerprint
    assert len(out) == 3


def test_ngram_jaccard_and_minhash_agree(spark):
    docs = _docs(spark)
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.2).collect()
    }
    # exact dup pair has jaccard 1.0; near-dup pair is high but < 1
    assert exact[(0, 3)] == 1.0
    assert 0.5 < exact[(0, 1)] < 1.0
    lsh = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.2).collect()
    }
    assert lsh == exact  # K=16 r=1 banding recalls everything on this fixture
    # r=2 banding: high-J pairs still found (J=1.0 certain; J~0.8 whp)
    lsh2 = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.2, rows_per_band=2
        ).collect()
    }
    assert (0, 3) in lsh2 and lsh2[(0, 3)] == 1.0
    assert (0, 1) in lsh2


def test_dedup_clusters_connected_components(spark):
    from feature_store_fraud_detection_spark.operators.dedup import dedup_clusters

    # chain 1-2-3 plus pair 5-6; 4 isolated -> clusters {1,2,3},{5,6},{4}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    ids = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    out = {r.doc_id: r.canonical_id for r in dedup_clusters(pairs, ids, "doc_id").collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5}


def test_simhash_identical_docs_equal(spark):
    fps = {r.doc_id: r.simhash for r in simhash_fingerprints(_docs(spark), "doc_id", "text").collect()}
    assert fps[0] == fps[3]
    assert len(fps[0]) == 32 and set(fps[0]) <= {"0", "1"}
    assert fps[0] != fps[2]


def test_cosine_topk_identical_vector_ranks_first(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0]),   # identical to 0
        (2, [0.0, 1.0, 0.0]),   # orthogonal
        (3, [0.9, 0.1, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cosine_topk(df, "vec_id", "embedding", query_max_id=1, top_k=3).collect()
    by_rank = {r.rank: r for r in out}
    assert by_rank[1].neighbor_id == 1 and by_rank[1].cosine == 1.0
    assert by_rank[3].neighbor_id == 2 and abs(by_rank[3].cosine) < 1e-9


def test_text_profile_values(spark):
    out = {
        r.doc_id: r
        for r in text_profile(_docs(spark), "doc_id", "text").collect()
    }
    r0 = out[0]
    assert r0.n_tokens == 13
    assert r0.lang_pred == "en"  # 'the' appears 3x
    assert 0 < r0.quality <= 1
    assert out[3].fingerprint == r0.fingerprint


def test_winnowing_and_bpe(spark):
    from feature_store_fraud_detection_spark.operators.text_analysis import (
        bpe_token_count,
        winnowing_fingerprints,
    )

    docs = _docs(spark)
    fps = winnowing_fingerprints(docs, "doc_id", "text").collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert by_doc[0] == by_doc[3]                    # identical docs
    shared = by_doc[0] & by_doc[1]
    assert len(shared) / len(by_doc[0]) > 0.5        # near-dups share most
    assert not (by_doc[0] & by_doc[2])               # unrelated share none
    counts = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", bpe_token_count("text").alias("n")
        ).collect()
    }
    assert counts[0] == 13  # pure word tokens, no punctuation/contractions


def test_label_centroids_values(spark):
    from feature_store_fraud_detection_spark.operators.similarity import (
        label_centroids,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 3.0]), (0, [3.0, 5.0]), (1, [2.0, 2.0])],
        "label int, embedding array<float>",
    )
    out = {(r.label, r.d): r.c for r in label_centroids(df, "label", "embedding").collect()}
    assert out == {(0, 1): 2.0, (0, 2): 4.0, (1, 1): 2.0, (1, 2): 2.0}


def test_multimodal_plumbing(spark):
    feats = extract_binary_features(
        with_binary_payload(_docs(spark), "doc_id", "text")
    ).collect()
    by_id = {r.doc_id: r for r in feats}
    assert by_id[0].byte_len == len(
        "the quick brown fox jumps over the lazy dog near the river bank"
    )
    assert by_id[0].digest == by_id[3].digest
    assert by_id[0].head_bytes == ",".join(str(ord(c)) for c in "the ")
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_frame_sample_fanout_and_narrow_plan(spark):
    import hashlib

    from feature_store_fraud_detection_spark.operators.multimodal import (
        resize_payload,
        sample_frames,
    )

    text = "abcdefghij" * 25  # 250 chars -> frames 0,1,2 (width 100); keep 0,2
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    frames = sample_frames(df, "doc_id", "text", frame_width=100, step=2)
    rows = {r.frame_idx: r for r in frames.collect()}
    assert set(rows) == {0, 2}
    assert rows[0].frame_len == 100 and rows[2].frame_len == 50
    assert rows[2].frame_digest == hashlib.md5(text[200:].encode()).hexdigest()
    # one narrow stage: the 1->N fan-out happens inside the Arrow batch
    assert "Exchange" not in frames._jdf.queryExecution().executedPlan().toString()

    thumbs = resize_payload(df, "doc_id", "text", target=64).collect()
    assert thumbs[0].thumb_head == text[:8]
    assert thumbs[0].thumb_digest == hashlib.md5(text[:64].encode()).hexdigest()
    short = resize_payload(
        spark.createDataFrame([(2, "hi")], "doc_id long, text string"),
        "doc_id",
        "text",
        target=8,
    ).collect()[0]
    assert short.thumb_digest == hashlib.md5(b"hi......").hexdigest()


def test_minhash_bucket_cap_drops_degenerate_buckets(spark):
    from feature_store_fraud_detection_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    # 6 identical docs (one degenerate bucket of 6) + one distinct near-pair
    rows = [(i, "common boilerplate header text repeated everywhere") for i in range(6)]
    rows += [
        (10, "the quick brown fox jumps over the lazy dog today"),
        (11, "the quick brown fox jumps over the lazy dog tonight"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = minhash_lsh_pairs(df, "doc_id", "text", threshold=0.2)
    capped = minhash_lsh_pairs(
        df, "doc_id", "text", threshold=0.2, max_bucket_size=4
    )
    unc = {(r.id_a, r.id_b) for r in uncapped.collect()}
    cap = {(r.id_a, r.id_b) for r in capped.collect()}
    # uncapped finds the 15 identical pairs plus the fox pair
    assert (10, 11) in unc and len(unc) == 16
    # cap=4 drops the 6-doc bucket entirely; the fox pair survives
    assert cap == {(10, 11)}


def test_chunk_documents_overlap_and_tail(spark):
    from feature_store_fraud_detection_spark.operators.text_analysis import (
        chunk_documents,
    )

    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, text), (2, "solo"), (3, "   ")], "doc_id long, text string"
    )
    out = chunk_documents(df, "doc_id", "text", chunk_size=4, stride=3)
    rows = {(r.doc_id, r.chunk_idx): (r.chunk_text, r.n_tokens) for r in out.collect()}
    # 10 tokens, stride 3 -> starts 0,3,6,9; overlapping size-4 windows
    assert rows[(1, 0)] == ("w0 w1 w2 w3", 4)
    assert rows[(1, 1)] == ("w3 w4 w5 w6", 4)
    assert rows[(1, 3)] == ("w9", 1)  # tail shorter than chunk_size
    assert rows[(2, 0)] == ("solo", 1)
    # whitespace-only doc emits nothing
    assert not any(d == 3 for d, _ in rows)


def test_repetition_profile_values(spark):
    from feature_store_fraud_detection_spark.operators.text_analysis import (
        repetition_profile,
    )

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),  # bigram 'spam spam' x3 of 3 -> 1.0
            (2, "a b c d"),  # all bigrams distinct -> 1/3
            (3, "single"),  # <2 tokens -> 0.0
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_tokens, r.top_bigram_frac) for r in repetition_profile(
        df, "doc_id", "text"
    ).collect()}
    assert got[1] == (4, 1.0)
    assert got[2] == (4, 0.3333)
    assert got[3] == (1, 0.0)


def test_benchmark_contamination_flags_and_ratio(spark):
    from feature_store_fraud_detection_spark.operators.decontaminate import (
        benchmark_contamination,
    )

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),      # exact: every shingle overlaps
            (2, "alpha beta gamma zeta eta"),   # 1 of 3 shingles overlaps
            (3, "one two three four five"),     # disjoint
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in benchmark_contamination(
            docs, bench, "doc_id", "text", k=3, threshold=0.5
        ).collect()
    }
    assert out[1].overlap_ratio == 1.0 and out[1].contaminated == 1
    assert out[2].n_overlap == 1 and out[2].n_shingles == 3
    assert out[2].contaminated == 0
    assert out[3].n_overlap == 0 and out[3].overlap_ratio == 0.0


def test_sq8_quantization_codes_and_rank_parity(spark):
    from feature_store_fraud_detection_spark.operators.similarity import (
        cosine_topk,
        sq8_quantize,
        sq8_topk,
    )

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 2.0]),
            (1, [1.0, 0.0, 2.0]),    # identical to the query
            (2, [-1.0, 0.5, -2.0]),  # opposite direction
            (3, [0.5, -0.5, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    codes = {r.vec_id: r["__codes"] for r in sq8_quantize(df, "vec_id", "embedding").collect()}
    # scale per dim = (1.0, 0.5, 2.0); vec 0 -> codes (127, 0, 127)
    assert codes[0] == [127, 0, 127]
    assert codes[2] == [-127, 127, -127]

    sq = sq8_topk(df, "vec_id", "embedding", query_max_id=1, top_k=3).collect()
    exact = cosine_topk(df, "vec_id", "embedding", query_max_id=1, top_k=3).collect()
    # identical vector still ranks first; rank order survives quantization
    assert [r.neighbor_id for r in sq] == [r.neighbor_id for r in exact]
    assert sq[0].neighbor_id == 1 and abs(sq[0].qcosine - 1.0) < 1e-9


def test_duplicate_ngram_stats_fractions(spark):
    from feature_store_fraud_detection_spark.operators.dedup import (
        duplicate_ngram_stats,
    )

    out = {
        r.doc_id: r
        for r in duplicate_ngram_stats(_docs(spark), "doc_id", "text").collect()
    }
    # docs 0 and 3 are identical: every 3-gram duplicated
    assert out[0].n_dup_ngrams == out[0].n_ngrams
    assert out[0].dup_fraction == 1.0
    assert out[3].dup_fraction == 1.0
    # doc 2 shares nothing with anyone
    assert out[2].n_dup_ngrams == 0 and out[2].dup_fraction == 0.0
    # doc 1 differs from 0/3 only in the last word: all 3-grams except the
    # final two (which contain "bend") are duplicated
    assert 0 < out[1].n_dup_ngrams < out[1].n_ngrams


def test_clean_corpus_redacts_and_counts(spark):
    from feature_store_fraud_detection_spark.operators.text_cleaning import (
        clean_corpus,
    )

    rows = [
        (0, "mail me at alice@example.org  or visit https://ex.com/a now"),
        (1, "call 555-123-4567   twice"),
        (2, "plain prose with no contact info"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in clean_corpus(df, "doc_id", "text").collect()}
    assert out[0].n_emails == 1 and out[0].n_urls == 1 and out[0].n_phones == 0
    assert "<EMAIL>" in out[0].clean_text and "<URL>" in out[0].clean_text
    assert "alice@example.org" not in out[0].clean_text
    assert "  " not in out[0].clean_text  # whitespace collapsed
    assert out[1].n_phones == 1 and "<PHONE>" in out[1].clean_text
    assert out[2].clean_text == rows[2][1]
    assert out[2].n_chars_clean == out[2].n_chars_raw


def test_weighted_hash_sample_bounds_and_monotone(spark):
    from feature_store_fraud_detection_spark.operators.sampling import (
        weighted_hash_sample,
    )

    df = spark.range(500).select(
        F.col("id"),
        F.lit(0.0).alias("w0"),
        F.lit(1.0).alias("w1"),
        (F.col("id") % 10 / 10.0).alias("wv"),
    )
    assert weighted_hash_sample(df, "id", "w0").count() == 0
    assert weighted_hash_sample(df, "id", "w1").count() == 500
    # monotone in the weight: the low-weight sample is a subset of the
    # sample drawn with every weight doubled
    low = {r.id for r in weighted_hash_sample(df, "id", "wv").collect()}
    doubled = df.withColumn("wv", F.col("wv") * 2)
    high = {r.id for r in weighted_hash_sample(doubled, "id", "wv").collect()}
    assert low <= high


def test_pack_sequences_offsets_and_boundaries(spark):
    from feature_store_fraud_detection_spark.operators.packing import pack_sequences

    rows = [
        (0, "a b c"),          # 3 tokens
        (1, "d e f g"),        # 4 tokens
        (2, "h i"),            # 2 tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in pack_sequences(
            df, "doc_id", "text", capacity=5, n_shards=1
        ).collect()
    }
    assert [out[i].shard_offset for i in range(3)] == [0, 3, 7]
    assert [out[i].pack_id for i in range(3)] == [0, 0, 1]
    assert [out[i].pack_offset for i in range(3)] == [0, 3, 2]
    # doc 1 starts at offset 3 and runs 4 tokens past capacity 5
    assert [out[i].spans_boundary for i in range(3)] == [0, 1, 0]


def test_pack_sequences_shards_are_dense_prefixes(spark):
    from feature_store_fraud_detection_spark.operators.packing import pack_sequences

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w "), F.repeat(F.lit("x "), (F.col("id") % 7).cast("int"))).alias("text"),
    )
    out = pack_sequences(df, "doc_id", "text", capacity=10, n_shards=4)
    # within every shard, offsets are the exclusive prefix sums in id order
    for shard_rows in (
        out.groupBy("shard")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "n_tokens", "shard_offset"))).alias("rs"))
        .collect()
    ):
        run = 0
        for r in shard_rows.rs:
            assert r.shard_offset == run
            run += r.n_tokens


def test_bm25_ranking_and_exact_score(spark):
    import math

    from feature_store_fraud_detection_spark.operators.retrieval import bm25_topk

    rows = [
        (0, "apple apple apple banana"),
        (1, "apple banana cherry date"),
        (2, "banana cherry"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(df, "doc_id", "text", ["apple"], n=10).collect()
    ids = [r.doc_id for r in out]
    assert ids == [0, 1]  # doc 2 matches nothing; doc 0 has higher tf
    # hand-computed Okapi/Lucene score for doc 0
    n_docs, docfreq, tf, dl, avgdl, k1, b = 3, 2, 3, 4, 10 / 3, 1.2, 0.75
    idf = math.log((n_docs - docfreq + 0.5) / (docfreq + 0.5) + 1.0)
    expected = idf * (tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)))
    assert out[0].score == math.floor(expected * 10000 + 0.5) / 10000
    assert out[0].n_matched_terms == 1


def test_unigram_nll_orders_rare_docs_higher(spark):
    import math

    from feature_store_fraud_detection_spark.operators.text_analysis import (
        unigram_nll,
    )

    rows = [
        (0, "common common common common"),
        (1, "common common rare1 rare2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in unigram_nll(df, "doc_id", "text").collect()}
    # corpus: common x6, rare1 x1, rare2 x1, total 8
    nll0 = -math.log(6 / 8)
    contribs1 = sorted([2 * math.log(6 / 8), math.log(1 / 8), math.log(1 / 8)])
    nll1 = -sum(contribs1) / 4
    assert out[0].n_tokens == 4 and out[1].n_tokens == 4
    assert out[0].nll == math.floor(nll0 * 10000 + 0.5) / 10000
    assert out[1].nll == math.floor(nll1 * 10000 + 0.5) / 10000
    assert out[1].nll > out[0].nll  # rare-token doc is less likely


def test_hashed_vectors_identical_docs_and_ranking(spark):
    from feature_store_fraud_detection_spark.operators.retrieval import (
        hashed_doc_vectors,
        hashed_vector_topk,
    )

    docs = _docs(spark)
    vecs = hashed_doc_vectors(docs, "doc_id", "text", dim=16)
    v0 = {(r.bucket, r.w) for r in vecs.filter("doc_id = 0").collect()}
    v3 = {(r.bucket, r.w) for r in vecs.filter("doc_id = 3").collect()}
    assert v0 == v3 and len(v0) > 0  # identical text -> identical vector

    top = hashed_vector_topk(
        docs, "doc_id", "text", query_max_id=4, dim=16, top_k=3
    ).collect()
    by_query = {}
    for r in top:
        by_query.setdefault(r.query_id, []).append(r)
    # doc 0's nearest neighbor is its exact duplicate 3 at cosine 1.0
    assert by_query[0][0].neighbor_id == 3 and by_query[0][0].cosine == 1.0
    # the near-duplicate doc 1 ranks its twins 0/3 above the unrelated doc 2
    n1 = [r.neighbor_id for r in sorted(by_query[1], key=lambda r: r.rank)]
    assert set(n1[:2]) == {0, 3}


def test_fuzzy_pairs_blocking_and_distance(spark):
    from feature_store_fraud_detection_spark.operators.dedup import fuzzy_pairs

    rows = [
        (0, "transaction batch alpha"),
        (1, "transactiom batch alpha"),   # 1 substitution within prefix 12
        (2, "transfer batch alpha"),      # shares block 'tran', dist > 3
        (3, "zebra payment"),             # different block entirely
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.id_a, r.id_b): r.edit_dist for r in fuzzy_pairs(
        df, "doc_id", "text", max_dist=3, prefix_len=12, block_len=4
    ).collect()}
    assert out == {(0, 1): 1}
    # degenerate-block cap drops oversized blocks before pair expansion
    big = spark.createDataFrame(
        [(i, "same prefix words") for i in range(10)], "doc_id long, text string"
    )
    assert fuzzy_pairs(
        big, "doc_id", "text", max_block_size=5
    ).count() == 0


def test_ngram_jaccard_max_df_drops_planted_stop_shingle(spark):
    """Hot-shingle cap: a boilerplate k-gram planted in every document
    must not manufacture candidate pairs once its document frequency
    exceeds max_df; surviving pairs score Jaccard over the capped
    vocabulary (true stopword-removed Jaccard, not an approximation)."""
    boiler = "all rights reserved"
    rows = [
        # two near-dup docs sharing real content + the boilerplate
        (1, f"{boiler} alpha beta gamma delta epsilon zeta"),
        (2, f"{boiler} alpha beta gamma delta epsilon eta"),
    ] + [
        # unrelated docs that share ONLY the boilerplate shingle
        (i, f"{boiler} unique{i} token{i} word{i} филлер{i}")
        for i in range(3, 23)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = ngram_jaccard_pairs(
        docs, "doc_id", "text", k=3, threshold=0.01
    )
    capped = ngram_jaccard_pairs(
        docs, "doc_id", "text", k=3, threshold=0.01, max_df=5
    )
    # without the cap the boilerplate shingle links every doc pair
    assert uncapped.count() == 22 * 21 // 2
    got = {(r.id_a, r.id_b): (r.n_inter, r.jaccard) for r in capped.collect()}
    # with it, only the genuinely-overlapping pair survives
    assert set(got) == {(1, 2)}
    # docs 1/2 each have 6 shingles minus the boilerplate-prefixed hot
    # ones; intersection/union computed over the capped vocabulary
    n_inter, jac = got[(1, 2)]
    assert n_inter >= 1 and 0 < jac <= 1.0


def test_ngram_containment_catches_quoted_subset(spark):
    """A short doc fully quoted inside a long one scores containment 1.0
    while its Jaccard is far below any dedup threshold — the directional
    signal this operator exists for. Orientation: the SMALLER shingle set
    is the contained side."""
    from feature_store_fraud_detection_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog tonight"
    filler = " ".join(f"filler{i} word{i} extra{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, quote),
            (2, filler + " " + quote + " " + filler.replace("filler", "pad")),
            (3, "entirely unrelated text about spark and shuffles here"),
        ],
        "doc_id bigint, text string",
    )
    got = {
        (r["id_contained"], r["id_container"]): r["containment"]
        for r in ngram_containment_pairs(
            docs, "doc_id", "text", k=3, threshold=0.8
        ).collect()
    }
    assert got == {(1, 2): 1.0}
    # the same pair is invisible to Jaccard at any realistic threshold
    jac = ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.2)
    assert jac.filter("id_a = 1 AND id_b = 2").count() == 0


def test_vocab_growth_monotone_and_heaps_range(spark, sf_dir):
    """Vocabulary and token counts must be non-decreasing across prefixes,
    and the fitted Heaps exponent must land in (0, 1) on real text — the
    sublinear-vocabulary-growth law."""
    from feature_store_fraud_detection_spark.plans.registry import (
        _q_vocab_growth,
    )

    r = _q_vocab_growth(spark, sf_dir).collect()[0]
    assert r["vocab_25"] <= r["vocab_50"] <= r["vocab_75"] <= r["vocab_100"]
    assert r["tokens_25"] <= r["tokens_50"] <= r["tokens_75"] <= r["tokens_100"]
    assert r["vocab_100"] <= r["tokens_100"]
    # synthetic corpora draw from a FIXED word list, so the vocabulary
    # saturates and the exponent legitimately hits 0.0 (the flattening
    # curve is exactly the "new data adds no vocabulary" signal); real
    # text lands strictly inside (0, 1)
    assert 0.0 <= r["heaps_exp"] < 1.0


def test_curriculum_stages_bands_are_disjoint_and_cover(spark):
    from feature_store_fraud_detection_spark.operators.text_analysis import (
        curriculum_stages,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["tok%d" % ((i * j) % 17) for j in range(12)])) for i in range(40)],
        "doc_id bigint, text string",
    )
    got = {r["stage"]: r for r in curriculum_stages(docs, "doc_id", "text").collect()}
    assert set(got) == {1, 2, 3, 4}
    assert sum(r["n_docs"] for r in got.values()) == 40
    # value bands never overlap: a tie group lands wholly in one stage
    for s in (1, 2, 3):
        assert got[s + 1]["min_nll"] > got[s]["max_nll"]
    # easier stages have lower NLL
    assert got[1]["avg_nll"] < got[4]["avg_nll"]


def test_next_event_training_pairs_hand_fixture(spark):
    from feature_store_fraud_detection_spark.operators.funnel import (
        next_event_training_pairs,
    )

    rows = [
        (1, t, 1_700_000_000 + i, i)
        for i, t in enumerate(["a", "b", "c", "d", "e"])
    ] + [(2, "x", 1_700_000_000, 100), (2, "y", 1_700_000_001, 101)]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts_raw bigint, event_id bigint"
    ).select("user_id", "event_type", F.timestamp_seconds("ts_raw").alias("ts"), "event_id")
    got = sorted(
        (r["user_id"], r["event_id"], r["context"], r["target"])
        for r in next_event_training_pairs(
            df, "user_id", "event_type", "ts", "event_id", context_len=3
        ).collect()
    )
    # user 1: targets d (ctx a>b>c) and e (ctx b>c>d); user 2: too short
    assert got == [(1, 3, "a>b>c", "d"), (1, 4, "b>c>d", "e")]


def test_pmi_collocations_finds_fixed_phrase(spark):
    from feature_store_fraud_detection_spark.operators.text_analysis import (
        pmi_collocations,
    )

    # "san francisco" always co-occurs; filler pairs occur < min_count
    # times (quadratic/cubic residues spread them thin), so only the fixed
    # phrase and its boundary pairs survive the count floor
    docs = [
        (i, f"san francisco w{(i * i) % 31} w{(i * i * i) % 29}")
        for i in range(40)
    ] + [(100, "x"), (101, "")]  # 1-token and empty docs must not break
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = pmi_collocations(df, "doc_id", "text", min_count=5, top_k=5).collect()
    assert got[0]["w1"] == "san" and got[0]["w2"] == "francisco"
    # the fixed phrase has the highest PMI in the corpus
    assert got[0]["pmi"] == max(r["pmi"] for r in got)


def test_token_frequency_spectrum_counts(spark):
    from feature_store_fraud_detection_spark.operators.text_analysis import (
        token_frequency_spectrum,
    )

    # a: 4 times, b: 2, c: 2, d: 1  -> spectrum {4:1, 2:2, 1:1}
    df = spark.createDataFrame(
        [(1, "a a b c d"), (2, "a a b c")], "doc_id bigint, text string"
    )
    got = {
        r["count"]: r["n_tokens"]
        for r in token_frequency_spectrum(df, "doc_id", "text").collect()
    }
    assert got == {4: 1, 2: 2, 1: 1}


def test_nb_lang_classify_separable_and_edge_docs(spark):
    from feature_store_fraud_detection_spark.operators.text_analysis import (
        nb_lang_classify,
    )

    # three labels with disjoint core vocabularies + shared noise words;
    # a trained NB must recover them perfectly on held-out docs
    vocab = {
        "aa": ["red", "green", "blue", "crimson"],
        "bb": ["dog", "cat", "bird", "wolf"],
        "cc": ["one", "two", "three", "four"],
    }
    rows = []
    i = 0
    for lab, words in vocab.items():
        for k in range(30):
            body = [words[(k * (j + 1) + j) % len(words)] for j in range(8)]
            rows.append((i, " ".join(body + ["the", "and"]), lab))
            i += 1
    # featureless docs must be EXCLUDED, not crash: empty + whitespace
    rows += [(900, "", "aa"), (901, "   ", "bb")]
    df = spark.createDataFrame(rows, "id long, text string, lab string")
    tr = df.filter(F.col("id") % 2 == 0)
    te = df.filter(F.col("id") % 2 == 1)
    pred = nb_lang_classify(tr, te, "id", "text", "lab", mode="word")
    got = {r["id"]: (r["lab"], r["predicted"]) for r in pred.collect()}
    assert 901 not in got  # whitespace-only doc has no features
    scored = {i for i, (t, _) in got.items()}
    assert scored == {r[0] for r in rows if r[0] % 2 == 1 and r[1].strip()}
    assert all(t == p for t, p in got.values())  # separable -> perfect
    # char mode: same contract, one prediction per scorable doc
    pred_c = nb_lang_classify(tr, te, "id", "text", "lab", mode="char", gram=2)
    assert pred_c.groupBy("id").count().filter("count > 1").count() == 0
    # UNLABELED scoring (the primary use of a classifier): score_df
    # without the label column gets (id, predicted) with identical
    # predictions to the labeled run
    pred_u = nb_lang_classify(
        tr, te.drop("lab"), "id", "text", "lab", mode="word"
    )
    assert pred_u.columns == ["id", "predicted"]
    got_u = {r["id"]: r["predicted"] for r in pred_u.collect()}
    assert got_u == {i: p for i, (_, p) in got.items()}


def test_nb_lang_classify_prior_decides_featureless_overlap(spark):
    from feature_store_fraud_detection_spark.operators.text_analysis import (
        nb_lang_classify,
    )

    # every doc is the same text -> likelihoods tie across labels; the
    # class PRIOR (3 "maj" train docs vs 1 "min") must decide, with the
    # label tiebreak never reached
    rows = [(0, "x y", "maj"), (2, "x y", "maj"), (4, "x y", "maj"),
            (6, "x y", "min"), (1, "x y", "min"), (3, "x y", "maj")]
    df = spark.createDataFrame(rows, "id long, text string, lab string")
    tr = df.filter(F.col("id") % 2 == 0)
    te = df.filter(F.col("id") % 2 == 1)
    got = nb_lang_classify(tr, te, "id", "text", "lab", mode="word").collect()
    assert {r["predicted"] for r in got} == {"maj"}


def test_readability_scores_hand_fixture(spark):
    from feature_store_fraud_detection_spark.operators.text_analysis import (
        readability_scores,
    )

    # "The cat sat. The dog ran!" : W=6, S=2, Syl=6 (one vowel group per
    # word) -> flesch = 206.835 - 1.015*3 - 84.6*1 = 119.19
    #          fk    = 0.39*3 + 11.8*1 - 15.59 = -2.62
    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in readability_scores(df, "doc_id", "text").collect()}
    r = out[1]
    assert (r.n_words, r.n_sentences, r.n_syllables) == (6, 2, 6)
    assert abs(r.flesch - 119.19) < 1e-9
    assert abs(r.fk_grade - (-2.62)) < 1e-9
    # harder text scores lower ease / higher grade
    df2 = spark.createDataFrame(
        [(3, "Extraordinary organizational responsibilities materialized.")],
        "doc_id long, text string",
    )
    r3 = readability_scores(df2, "doc_id", "text").collect()[0]
    assert r3.flesch < r.flesch and r3.fk_grade > r.fk_grade


def test_textrank_keywords_ranks_hub_word_first(spark):
    from feature_store_fraud_detection_spark.operators.text_analysis import (
        textrank_keywords,
    )

    # 'spark' co-occurs with every satellite (hub); satellites only ever
    # touch the hub and one neighbor -> TextRank must rank the hub first
    sats = ["alpha", "beta", "gamma", "delta", "epsilon"]
    docs = []
    i = 0
    for s in sats:
        for _ in range(6):
            docs.append((i, f"{s} spark {s}")); i += 1
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = textrank_keywords(df, "doc_id", "text", min_count=5, top_k=10).collect()
    assert out[0]["word"] == "spark"
    assert out[0]["rank_scaled"] > out[1]["rank_scaled"]
    assert {r["word"] for r in out} == {"spark", *sats}


def test_textrank_weighted_prefers_strong_ties(spark):
    from feature_store_fraud_detection_spark.operators.text_analysis import (
        textrank_keywords,
    )

    # 'pivot' splits its mass between two otherwise-identical
    # neighbors: 'heavy' co-occurs with it 20x, 'light' 6x. Unweighted
    # PageRank splits pivot's rank equally (heavy == light); the
    # weighted form must route more mass to the stronger tie
    docs = []
    i = 0
    for _ in range(20):
        docs.append((i, "pivot heavy")); i += 1
    for _ in range(6):
        docs.append((i, "pivot light")); i += 1
    df = spark.createDataFrame(docs, "doc_id long, text string")
    unw = {r.word: r.rank_scaled for r in textrank_keywords(
        df, "doc_id", "text", min_count=5, top_k=10).collect()}
    wtd = {r.word: r.rank_scaled for r in textrank_keywords(
        df, "doc_id", "text", min_count=5, top_k=10, weighted=True).collect()}
    assert unw["heavy"] == unw["light"]  # equal split unweighted
    assert wtd["heavy"] > wtd["light"]   # strong tie wins weighted
    assert wtd["pivot"] == max(wtd.values())  # hub still on top
    # weights change ranks but never the node set
    assert set(unw) == set(wtd)
