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
