"""BPE tokenizer training (operators/bpe.py): the learned merge table must
equal a pure-Python reference implementation of textbook BPE on a hand
fixture, and the encoder's token counts must shrink monotonically as merges
apply (never across word boundaries).
"""

from __future__ import annotations

from collections import Counter

from feature_store_fraud_detection_spark.operators.bpe import (
    bpe_encode_counts,
    bpe_train,
)


def _python_bpe(word_counts: dict[str, int], num_merges: int):
    """Reference BPE: overlapping pair counts, argmax (count desc, l, r),
    greedy left-to-right merge."""
    words = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for step in range(1, num_merges + 1):
        pairs = Counter()
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (l, r), pc = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((step, l, r, l + r, pc))
        new_words = {}
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + c
        words = new_words
    return merges


def test_bpe_train_matches_python_reference(spark):
    texts = [
        "low lower lowest",
        "low low newer newest",
        "wider wide wide new",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")
    got = [
        (r["step"], r["left_sym"], r["right_sym"], r["merged"], r["pair_count"])
        for r in bpe_train(df, "text", num_merges=5).orderBy("step").collect()
    ]
    wc = Counter(w for t in texts for w in t.split())
    want = _python_bpe(dict(wc), 5)
    assert got == want


def test_bpe_train_overlapping_run_merges_greedily(spark):
    # 'aaaa' under rule (a,a): greedy LTR gives [aa, aa]; next round the
    # top pair must therefore be (aa, aa)
    df = spark.createDataFrame([(1, "aaaa aaaa")], "id int, text string")
    got = bpe_train(df, "text", num_merges=2).orderBy("step").collect()
    assert (got[0]["left_sym"], got[0]["right_sym"]) == ("a", "a")
    assert (got[1]["left_sym"], got[1]["right_sym"]) == ("aa", "aa")


def test_bpe_encode_counts_shrink_and_word_boundaries(spark):
    df = spark.createDataFrame(
        [(1, "ab ab"), (2, "ba")], "id int, text string"
    )
    # no merges: counts = character counts per doc
    base = {r["id"]: r["bpe_tokens"] for r in bpe_encode_counts(df, "id", "text", []).collect()}
    assert base == {1: 4, 2: 2}
    # merge (a,b): doc 1 -> [ab, ab] (2 tokens); doc 2 'ba' unaffected; and
    # the trailing 'b' of word1 + leading 'a' of word2 must NOT merge
    m = {r["id"]: r["bpe_tokens"] for r in bpe_encode_counts(df, "id", "text", [("a", "b")]).collect()}
    assert m == {1: 2, 2: 2}


def test_bpe_train_stops_when_no_pairs_left(spark):
    df = spark.createDataFrame([(1, "a b c")], "id int, text string")
    got = bpe_train(df, "text", num_merges=4).collect()
    assert got == []  # all words are single symbols; no pair ever exists


def test_bpe_train_batched_exact_when_top_pairs_disjoint(spark):
    # top pairs (x,y) and (z,w) share no symbols, so one batched round of 2
    # must equal two sequential rounds — rules AND counts
    df = spark.createDataFrame(
        [(1, "xy xy xy zw zw")], "id int, text string"
    )
    seq = [
        (r["step"], r["left_sym"], r["right_sym"], r["merged"], r["pair_count"])
        for r in bpe_train(df, "text", num_merges=2).orderBy("step").collect()
    ]
    batched = [
        (r["step"], r["left_sym"], r["right_sym"], r["merged"], r["pair_count"])
        for r in bpe_train(df, "text", num_merges=2, merges_per_round=2)
        .orderBy("step")
        .collect()
    ]
    assert seq == batched == [(1, "x", "y", "xy", 3), (2, "z", "w", "zw", 2)]


def test_bpe_train_batched_64_merges_in_bounded_jobs(spark):
    """The scale path: 64 merges at merges_per_round=8 must finish in <=16
    Spark jobs (8 candidate collects + periodic checkpoints), vs 64+ for the
    sequential loop — the per-merge driver round-trip is the one compounding
    driver-side pattern a 32k-merge vocabulary would hit."""
    # deterministic corpus with wide pair diversity: 120 distinct words over
    # a 12-letter alphabet, Zipf-ish repetition so argmaxes are distinct
    letters = "abcdefghijkl"
    words = []
    for i in range(120):
        # base-12 digits make every word distinct; the tail characters add
        # intra-word pair diversity so 64 distinct argmaxes exist
        w = (
            letters[i % 12]
            + letters[(i // 12) % 12]
            + letters[(i * i) % 12]
            + letters[(i * i * i + 7) % 12]
            + letters[(5 * i + 3) % 12]
            + letters[(7 * i + 1) % 12]
        )
        words.extend([w] * (1 + (120 - i) // 10))
    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "id int, text string")
    sc = spark.sparkContext
    # AQE materializes every shuffle stage as its own job (~3 jobs/round
    # here) without adding driver round-trips; turn it off so the job count
    # measures what the bound is about — one candidate collect per ROUND
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.setJobGroup("bpe-batched-64", "batched BPE training")
    try:
        got = bpe_train(df, "text", num_merges=64, merges_per_round=8).collect()
    finally:
        sc.setJobGroup(None, None)
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
    jobs = sc.statusTracker().getJobIdsForGroup("bpe-batched-64")
    assert len(got) == 64
    assert [r["step"] for r in sorted(got, key=lambda r: r["step"])] == list(
        range(1, 65)
    )
    # merged symbols are unique and rules well-formed
    assert len({r["merged"] for r in got}) == 64
    assert all(r["merged"] == r["left_sym"] + r["right_sym"] for r in got)
    assert len(jobs) <= 16, f"expected <=16 Spark jobs, ran {len(jobs)}"
    # the learned rules actually compress: encoding with all 64 rules must
    # strictly shrink the token count vs no rules
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in sorted(got, key=lambda r: r["step"])
    ]
    base = bpe_encode_counts(df, "id", "text", []).collect()[0]["bpe_tokens"]
    enc = bpe_encode_counts(df, "id", "text", merges).collect()[0]["bpe_tokens"]
    assert enc < base


def test_bpe_encode_counts_empty_and_whitespace_text_is_zero(spark):
    """Empty/whitespace-only documents encode to 0 tokens: Spark's split
    yields [''] there and an unguarded _word_repr would emit 2 phantom
    symbols per empty word (sequence(1, 0) counts DOWN), diverging from the
    SQL oracle's range(1, 1) = []."""
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "ab ab"), (4, None)],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode_counts(df, "doc_id", "text", [("a", "b")]).collect()
    }
    assert got[1] == 0 and got[2] == 0
    assert got[3] == 2  # 'ab' merged once per word
