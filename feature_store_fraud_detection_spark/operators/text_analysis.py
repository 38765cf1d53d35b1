"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's surface (per the build brief): language ID, quality
scoring, token counting, and document fingerprinting over a ``documents``
table. All pure Column expressions — JVM-side, no Python in the hot path —
so they scan 100 TB of text at parquet-read speed.

Cross-engine portability notes (for the DuckDB oracle):
- tokenization is ``split(lower(trim(text)), '\\s+')`` — same regex semantics
  in Java regex and RE2;
- hashes use md5 hex strings (identical in both engines); "numeric" hashing
  needs (min over hex strings == min over the numbers they encode, since
  fixed-length lowercase hex compares lexicographically like the value).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny marker-word sets per language for the n-gram/stopword heuristic.
# Real deployments would plug a trained model via the same column contract.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "in"),
    "es": ("el", "la", "de", "los", "que"),
    "de": ("der", "die", "das", "und", "ist"),
}

STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")

PUNCT_PATTERN = "[.,!?;:]"


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of normalized text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def stopword_ratio(text: Column | str) -> Column:
    toks = tokens(text)
    hits = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    )
    return hits / F.size(toks)


def punct_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(c, PUNCT_PATTERN, "")
    return (F.length(c) - F.length(stripped)) / F.length(c)


def avg_token_len(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return total / F.size(toks)


def quality_score(text: Column | str) -> Column:
    """Composite quality heuristic in [0,1]-ish: rewards moderate length and
    stopword presence, penalizes punctuation soup. Deterministic, portable."""
    n = token_count(text).cast("double")
    length_term = F.least(n / F.lit(50.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * 5.0, F.lit(1.0))
    punct_term = F.greatest(F.lit(1.0) - punct_ratio(text) * 10.0, F.lit(0.0))
    return (length_term + stop_term + punct_term) / F.lit(3.0)


def lang_id(text: Column | str) -> Column:
    """Marker-word language ID: per-language marker hit counts, argmax with
    alphabetical tie-break, 'und' when nothing matches."""
    toks = tokens(text)

    def marker_hits(markers: tuple[str, ...]):
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    scores = {lang: marker_hits(markers) for lang, markers in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    result = F.lit("und")
    # alphabetical order, first max wins -> iterate reversed so earlier
    # languages overwrite later ones in the when-chain
    for lang in sorted(scores, reverse=True):
        result = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(
            result
        )
    return result


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct word k-gram shingles (0-based transform over the token
    array). The shared substrate for Jaccard / MinHash dedup.

    The token array is LAMBDA-BOUND (wrapped in a 1-element array and
    referenced through the lambda variable, see shingles_from_tokens) so the
    regex split runs once per row — inlining ``tokens()`` at each of its
    3k+1 references in this tree made the split dominate the operator
    (measured ~5x slowdown).
    """
    return shingles_from_tokens(tokens(text), k)


def doc_fingerprint(text: Column | str) -> Column:
    """Whole-document fingerprint: md5 of the raw text bytes."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.encode(c, "UTF-8"))


def winnow_fingerprint(text: Column | str, k: int = 3) -> Column:
    """Shingle-level fingerprint: the minimum shingle hash (a 1-permutation
    MinHash) — equal for documents sharing their 'rarest' shingle; the
    building block the winnowing/MinHash family shares."""
    sh = word_shingles(text, k)
    hashes = F.transform(sh, lambda s: F.md5(F.encode(s, "UTF-8")))
    return F.array_min(hashes)


def shingles_from_tokens(toks_col: Column, k: int = 3) -> Column:
    """word_shingles over an already-materialized token array column."""

    def build(tb: Column) -> Column:
        idx = F.when(F.size(tb) >= k, F.sequence(F.lit(0), F.size(tb) - k)).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(tb, i + j + 1) for j in range(k)]
            ),
        )

    return F.array_distinct(F.flatten(F.transform(F.array(toks_col), build)))


# GPT-2-flavored pre-tokenizer regex, lookaround-free so it behaves the same
# under Java regex (Spark) and RE2 (DuckDB): contractions, letter runs,
# digit runs, punctuation runs — each with optional leading space.
BPE_TOKEN_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+"


def bpe_token_count(text: Column | str) -> Column:
    """Subword-style token count: whitespace counting underestimates real
    tokenizer load; this BPE-ish split approximates it engine-portably."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_PATTERN), F.lit(0)))


def winnowing_fingerprints(
    df: DataFrame, id_col: str, text_col: str, gram: int = 8, window: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (rolling-hash family, Schleimer et
    al.): hash every character ``gram``-gram, keep the minimum hash of each
    sliding ``window`` of consecutive positions, output the distinct minima
    per document. Near-identical documents share most fingerprints, and the
    selection is position-robust (the standard plagiarism/near-dup scheme).

    All array-local per row (hash positions -> windowed minima -> distinct)
    — a narrow stage; only (id, fingerprint) rows leave the scan. Portable:
    md5 hex minima, same trick as MinHash.
    """

    def over_hashes(hb: Column) -> Column:
        # hb is the lambda-bound hash array: evaluated once, referenced
        # cheaply per window (inlining it would recompute every md5 per
        # window position)
        win_starts = F.when(
            F.size(hb) >= window, F.sequence(F.lit(0), F.size(hb) - window)
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            win_starts, lambda w: F.array_min(F.slice(hb, w + 1, window))
        )

    def fps(tb: Column) -> Column:
        n = F.length(tb)
        starts = F.when(
            n >= gram, F.sequence(F.lit(1), n - gram + 1)
        ).otherwise(F.array().cast("array<int>"))
        hashes = F.transform(
            starts, lambda i: F.md5(F.encode(F.substring(tb, i, gram), "UTF-8"))
        )
        return F.flatten(F.transform(F.array(hashes), over_hashes))

    return df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.flatten(F.transform(F.array(F.col(text_col)), fps)))
        ).alias("fingerprint"),
    )


def text_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One-pass text profile: counts, ratios, quality, language, fingerprints.

    Staged projections materialize the token array and each hit-count ONCE;
    the naive form (each metric calling tokens(text)) re-ran the regex split
    ~20x per row. Values are identical to the standalone metric functions.
    """
    txt = F.col("__text")
    toks = F.col("__toks")
    staged = df.select(
        F.col(id_col),
        F.col(text_col).alias("__text"),
        tokens(text_col).alias("__toks"),
    ).select(
        F.col(id_col),
        F.size(toks).alias("__n"),
        F.length(txt).alias("__len"),
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).alias("__stop_hits"),
        F.length(F.regexp_replace(txt, PUNCT_PATTERN, "")).alias("__stripped_len"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("__tok_len_sum"),
        *[
            F.size(
                F.filter(toks, (lambda m: lambda t: t.isin(*m))(markers))
            ).alias(f"__hits_{lang}")
            for lang, markers in LANG_MARKERS.items()
        ],
        F.md5(F.encode(txt, "UTF-8")).alias("fingerprint"),
        F.array_min(
            F.transform(
                shingles_from_tokens(toks), lambda s: F.md5(F.encode(s, "UTF-8"))
            )
        ).alias("winnow_fp"),
    )
    n = F.col("__n").cast("double")
    stop_ratio = F.col("__stop_hits") / F.col("__n")
    p_ratio = (F.col("__len") - F.col("__stripped_len")) / F.col("__len")
    best = F.greatest(*[F.col(f"__hits_{lang}") for lang in LANG_MARKERS])
    lang_pred = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        lang_pred = F.when(
            (F.col(f"__hits_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(lang_pred)
    return staged.select(
        F.col(id_col),
        F.col("__n").alias("n_tokens"),
        F.col("__len").alias("n_chars_measured"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(p_ratio, 4).alias("punct_ratio"),
        F.round(F.col("__tok_len_sum") / F.col("__n"), 4).alias("avg_token_len"),
        F.round(
            (
                F.least(n / F.lit(50.0), F.lit(1.0))
                + F.least(stop_ratio * 5.0, F.lit(1.0))
                + F.greatest(F.lit(1.0) - p_ratio * 10.0, F.lit(0.0))
            )
            / F.lit(3.0),
            4,
        ).alias("quality"),
        lang_pred.alias("lang_pred"),
        "fingerprint",
        "winnow_fp",
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document into token windows of ``chunk_size`` with step
    ``stride`` (overlapping when stride < chunk_size) — the packing step of
    an LLM training-data pipeline. Emits (id, chunk_idx, chunk_text,
    n_tokens); empty documents emit nothing.

    Array-local: the token array is built once per row and every chunk is a
    ``slice`` of it — a NARROW stage (posexplode fans out rows but needs no
    shuffle). At 100 TB this runs at scan speed; the output is ~size/stride
    larger than the input, which the downstream writer re-partitions.
    """
    toks = tokens(text_col)
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(stride)),
        lambda s: s < F.size(toks),
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / stride).cast("int").alias("chunk_idx"),
            F.concat_ws(" ", F.slice(toks, s + 1, chunk_size)).alias("chunk_text"),
            F.least(F.lit(chunk_size), F.size(toks) - s).alias("n_tokens"),
        ),
    )
    return (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(id_col, "c.chunk_idx", "c.chunk_text", "c.n_tokens")
    )


def repetition_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: the fraction
    of adjacent-bigram occurrences taken by the single most frequent bigram
    (boilerplate/spam marker) plus token counts. Documents with fewer than
    2 tokens report 0.0.

    Relational formulation — explode bigrams, count per (doc, bigram), max
    per doc — so the heavy mode-finding is a hash aggregate on (doc,
    bigram) keys, never an O(n^2)-per-document array pass. Shuffle rows are
    (id, 16-byte md5 of the bigram), not the text.
    """
    toks = tokens(text_col)
    bigrams = F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda t, i: F.md5(
            F.concat_ws(" ", t, F.element_at(toks, i + 2))
        ),
    )
    pairs = (
        df.select(F.col(id_col), F.size(toks).alias("n_tokens"), bigrams.alias("__bg"))
        .filter(F.size("__bg") > 0)
        .select(id_col, "n_tokens", F.explode("__bg").alias("__b"))
    )
    per_bigram = pairs.groupBy(id_col, "n_tokens", "__b").agg(
        F.count(F.lit(1)).alias("__c")
    )
    from feature_store_fraud_detection_spark.functions.numeric import round4_stable

    per_doc = per_bigram.groupBy(id_col, "n_tokens").agg(
        F.max("__c").alias("__top"), F.sum("__c").alias("__total")
    )
    short = df.select(
        F.col(id_col), F.size(toks).alias("n_tokens")
    ).filter(F.size(toks) < 2)
    return per_doc.select(
        id_col,
        "n_tokens",
        round4_stable(F.col("__top") / F.col("__total")).alias("top_bigram_frac"),
    ).unionByName(
        short.withColumn("top_bigram_frac", F.lit(0.0))
    )


def unigram_nll(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus's own
    unigram language model — the CCNet-style LM quality signal (docs with
    high NLL are out-of-distribution noise; low NLL is repetitive
    boilerplate), with the corpus itself standing in for an external KenLM.

    p(term) = corpus_count(term) / total_tokens; score(doc) =
    -(1/dl) * sum over tokens of ln(p(term)).

    Scale design: term counts and per-doc tf are hash aggregates keyed by
    term; their join is co-partitioned on term (no broadcast needed — the
    vocabulary can be arbitrarily large). The per-doc reduction folds the
    SORTED contribution list (the repo's fixed-IEEE-order rule for float
    sums, see similarity.label_centroids); its size is bounded by the doc's
    distinct-term count.
    """
    from feature_store_fraud_detection_spark.functions.numeric import round4_stable

    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    tc = tok.groupBy("term").agg(F.count(F.lit(1)).alias("ct"))
    # r12 optimization (guide §2.4): the token total re-derives from the
    # term-count table exactly (sum of per-term counts == token count,
    # both BIGINT — the bigram_nll total-from-unigrams identity), so the
    # third full tokenize+explode+count evaluation becomes a per-term
    # re-aggregation whose exchange is map-side-combined to the distinct
    # terms per partition. A tc.persist() variant measured 0.72 -> 3.85 s
    # at sf0.1 (the batch-2 regime-2 effect: the broadcast total subquery
    # then serializes behind the cache materialization's block locks)
    # and was reverted — the parallel duplicate evaluation is cheaper.
    tot = tc.agg(F.sum("ct").alias("total_tokens"))
    contribs = (
        tf.join(tc, "term")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col(id_col),
            F.col("tf"),
            (F.col("tf") * F.log(F.col("ct") / F.col("total_tokens"))).alias("c"),
        )
    )
    s = F.aggregate(
        F.array_sort(F.collect_list("c")), F.lit(0.0), lambda acc, x: acc + x
    )
    return contribs.groupBy(id_col).agg(
        F.sum("tf").alias("n_tokens"),
        round4_stable((-s) / F.sum("tf")).alias("nll"),
    )


def bigram_nll(
    lm_df: DataFrame,
    score_df: DataFrame,
    id_col: str,
    text_col: str,
    alpha: float = 0.4,
) -> DataFrame:
    """Per-document mean NLL under a BIGRAM language model with Stupid
    Backoff, trained on one corpus and scoring another — the held-out LM
    quality filter (CCNet trains KenLM on Wikipedia to score Common Crawl;
    here ``lm_df`` stands in for the clean corpus). Unlike
    :func:`unigram_nll`'s self-scoring, the train/score split makes the
    backoff path real: scored bigrams genuinely missing from the LM fall
    back to ``alpha *`` the unigram probability, and unknown words to
    ``alpha / T``::

        P(w2|w1) = count(w1 w2) / count(w1)      if the bigram is in the LM
                 = alpha * count(w2) / T          else if w2 is in the LM
                 = alpha / T                      else (OOV floor)

    score(doc) = -(1/n_bigrams) * sum over bigram positions of ln P.
    Documents with fewer than 2 tokens are excluded (no bigram events).

    Scale design: LM bigram/unigram counts and per-doc bigram tf are hash
    aggregates keyed by the terms; their joins are co-partitioned on those
    same keys (the LM is NEVER broadcast — a web-scale LM has billions of
    bigrams). Bigram extraction is array-local (slice + transform, zero
    row explosion before the tf aggregate); the per-doc reduction folds
    the sorted contribution list (fixed-IEEE-order float sum rule).
    """
    from feature_store_fraud_detection_spark.functions.numeric import round4_stable

    def bigram_table(df: DataFrame) -> DataFrame:
        toks = tokens(text_col)
        bgs = F.transform(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda t, i: F.struct(
                t.alias("w1"), F.element_at(toks, i + 2).alias("w2")
            ),
        )
        return (
            df.filter(F.size(tokens(text_col)) >= 2)
            .select(F.col(id_col), F.explode(bgs).alias("b"))
            .select(id_col, "b.w1", "b.w2")
        )

    lm_bg = bigram_table(lm_df).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("cb")
    )
    lm_toks = lm_df.select(F.explode(tokens(text_col)).alias("term"))
    # r12 optimization (guide §5 / §2.4): lm_uni feeds BOTH join sides
    # (w1 contexts, w2 continuations) and the token total — before the
    # persist each re-ran the LM-corpus tokenize + explode + aggregate
    # (the LM side evaluated 4x per action). The unigram table is
    # bounded (one row per distinct term); the total re-derives from it
    # exactly (sum of per-term counts == token count, both BIGINT), so
    # the scored probabilities are bit-identical. Not unpersisted (the
    # returned lazy frame reads it).
    lm_uni = (
        lm_toks.groupBy("term").agg(F.count(F.lit(1)).alias("cu")).persist()
    )
    lm_ctx = lm_uni.select(F.col("term").alias("w1"), F.col("cu").alias("c1"))
    lm_next = lm_uni.select(F.col("term").alias("w2"), F.col("cu").alias("c2"))
    total = lm_uni.agg(F.sum("cu").alias("t"))

    tf = bigram_table(score_df).groupBy(id_col, "w1", "w2").agg(
        F.count(F.lit(1)).alias("tf")
    )
    p = (
        tf.join(lm_bg, ["w1", "w2"], "left")
        .join(lm_ctx, "w1", "left")
        .join(lm_next, "w2", "left")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.col("tf"),
            F.when(
                F.col("cb").isNotNull(), F.col("cb") / F.col("c1")
            )
            .when(
                F.col("c2").isNotNull(),
                F.lit(alpha) * F.col("c2") / F.col("t"),
            )
            .otherwise(F.lit(alpha) / F.col("t"))
            .alias("prob"),
        )
    )
    contribs = p.select(
        F.col(id_col), F.col("tf"), (F.col("tf") * F.log("prob")).alias("c")
    )
    s = F.aggregate(
        F.array_sort(F.collect_list("c")), F.lit(0.0), lambda acc, x: acc + x
    )
    return contribs.groupBy(id_col).agg(
        F.sum("tf").alias("n_bigrams"),
        round4_stable((-s) / F.sum("tf")).alias("nll"),
    )


def gopher_quality_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 8,
    max_tokens: int = 100_000,
    min_avg_token_len: float = 2.0,
    max_avg_token_len: float = 12.0,
    min_stopword_ratio: float = 0.02,
    max_symbol_ratio: float = 0.10,
) -> DataFrame:
    """Gopher-style hard quality gates (Rae et al. 2021 §A1.1, adapted to
    this corpus's stopword list): per document, one boolean per rule plus
    the conjunction ``keep`` — the standard pre-filter a web corpus passes
    before any model-based scoring.

    Rules: token count within [min, max]; mean token length within a sane
    band; stopword ratio above a floor (gibberish/markup pages have none);
    symbol(punctuation)-to-char ratio below a cap.

    Pure column expressions over one scan — no shuffle, no UDF; the gate
    composes with ``sampling.source_mix_sample`` and ``corpus.chunk_dedup``
    into a full curation pass at scan speed.
    """
    n = token_count(text_col).cast("int")
    avg_len = avg_token_len(text_col)
    stop_r = stopword_ratio(text_col)
    sym_r = punct_ratio(text_col)
    f_len = (n >= min_tokens) & (n <= max_tokens)
    f_avg = (avg_len >= min_avg_token_len) & (avg_len <= max_avg_token_len)
    f_stop = stop_r >= min_stopword_ratio
    f_sym = sym_r <= max_symbol_ratio
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        f_len.alias("len_ok"),
        f_avg.alias("avg_token_len_ok"),
        f_stop.alias("stopword_ok"),
        f_sym.alias("symbol_ok"),
        (f_len & f_avg & f_stop & f_sym).alias("keep"),
    )


def curriculum_stages(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_stages: int = 4,
) -> DataFrame:
    """Difficulty-staged curriculum construction: score every document with
    the corpus-unigram NLL (:func:`unigram_nll` — low = easy/repetitive,
    high = hard/out-of-distribution) and split the corpus into
    ``n_stages`` difficulty bands at EXACT order-statistic boundaries
    (``percentile_disc`` — an actual data value, no interpolation, so the
    boundaries and therefore the staging are bit-reproducible
    cross-engine). Returns per-stage (stage, n_docs, n_tokens, min_nll,
    max_nll) — the curriculum schedule a staged training run consumes.

    Ties share a stage (band membership is a pure value comparison), so
    stage sizes can deviate from exact quarters when many docs share a
    rounded NLL — the price of determinism over ntile's global sort, which
    would also be a single-partition scale problem.

    Scale: the NLL frame is one row per doc; boundaries are ONE aggregate
    over it (broadcast back as a k-1-element array); staging is a scan
    projection; the final rollup has ``n_stages`` rows. No global window.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    # r12 optimization (guide §5 caching): the NLL frame feeds BOTH the
    # stage-boundary aggregate (a broadcast subquery) and the staged
    # projection — without the persist the whole unigram-LM pipeline
    # (tokenize + explode + two keyed aggregates + join) evaluated twice.
    # One row per doc, the collapsed table; not unpersisted (the returned
    # lazy frame reads it — the linkage convention; bench clears cache).
    nll = unigram_nll(df, id_col, text_col).persist()
    qs = [i / n_stages for i in range(1, n_stages)]
    bounds = nll.agg(
        F.array(
            *[
                F.expr(
                    f"percentile_disc({q}) WITHIN GROUP (ORDER BY nll)"
                )
                for q in qs
            ]
        ).alias("__bounds")
    )
    staged = nll.crossJoin(F.broadcast(bounds)).select(
        F.col(id_col),
        "n_tokens",
        "nll",
        (
            F.lit(1)
            + F.size(F.filter("__bounds", lambda b: F.col("nll") > b))
        ).alias("stage"),
    )
    return staged.groupBy("stage").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min("nll").alias("min_nll"),
        F.max("nll").alias("max_nll"),
        round4_stable(
            F.aggregate(
                F.array_sort(F.collect_list("nll")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.count(F.lit(1))
        ).alias("avg_nll"),
    )


def token_frequency_spectrum(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Zipf diagnostic for the corpus: the token frequency SPECTRUM
    (how many distinct tokens occur exactly c times) plus the log-log OLS
    slope over it — the text twin of ``degree_distribution``'s power-law
    screen. A healthy natural-language corpus shows a near-linear log-log
    spectrum; machine-generated/templated text bends it.

    Returns (count, n_tokens, zipf_slope) — one row per distinct
    frequency, slope repeated (broadcast 1-row join).

    Scale: token counts are one keyed aggregate; the spectrum is an
    aggregate over the (bounded: distinct counts << vocabulary) count
    table; the OLS moments fold SORTED ln-value lists (the repo's
    fixed-IEEE-order float-sum rule — unordered double sums differ
    between engines in the last bit).
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    tok = df.select(F.explode(tokens(F.col(text_col))).alias("t")).filter(
        F.length("t") > 0
    )
    counts = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    spectrum = counts.groupBy("c").agg(F.count(F.lit(1)).alias("n_tokens"))
    lx = F.ln(F.col("c").cast("double"))
    ly = F.ln(F.col("n_tokens").cast("double"))
    fold = lambda col: F.aggregate(  # noqa: E731
        F.array_sort(F.collect_list(col)), F.lit(0.0), lambda a, x: a + x
    )
    m = spectrum.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        fold(lx).alias("sx"),
        fold(ly).alias("sy"),
        fold(lx * lx).alias("sxx"),
        fold(lx * ly).alias("sxy"),
    )
    # single-frequency spectrum (e.g. a tiny corpus where every token is
    # unique): the log-log OLS has zero x-variance and the slope is
    # undefined — NULL, never an ANSI divide-by-zero (round-10
    # property-sweep finding, the anova_f zero-denominator class)
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        denom > 0.0,
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / denom,
    )
    return spectrum.join(
        F.broadcast(m.select(round4_stable(slope).alias("zipf_slope")))
    ).select(F.col("c").alias("count"), "n_tokens", "zipf_slope")


def pmi_collocations(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Top collocations by pointwise mutual information — the classic
    phrase-discovery screen (PMI(w1,w2) = ln(p_xy / (p_x * p_y)) with
    p_xy from adjacent-bigram counts and marginals from unigram counts).
    High-PMI pairs are phrases a tokenizer/phrase-merger should learn;
    boilerplate shows up as high-count low-PMI pairs.

    Returns top_k rows (w1, w2, n_pair, pmi) by (pmi desc, w1, w2), pairs
    below ``min_count`` excluded (PMI is noise-dominated at tiny counts).

    Scale: bigram extraction is array-local (no explode before the keyed
    count aggregate... the explode emits one row per POSITION, combined
    map-side); the two marginal joins key on the words; the final top-k
    is a TakeOrdered, never a global sort. PMI ordering uses the ROUNDED
    value (+ word tiebreaks) so ranks are reproducible cross-engine.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    toks = F.filter(tokens(F.col(text_col)), lambda t: F.length(t) > 0)
    # guard docs with < 2 tokens: Spark's sequence(1, 0) counts DOWN and
    # element_at(toks, 0) is an error, not an empty list
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array())
    pairs = df.select(F.explode(bigrams).alias("p")).select("p.w1", "p.w2")
    uni = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    n_uni = uni.agg(F.sum("cu").alias("nu"))
    bi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    n_bi = bi.agg(F.sum("n_pair").alias("nb"))
    scored = (
        bi.filter(F.col("n_pair") >= min_count)
        .join(uni.select(F.col("w").alias("w1"), F.col("cu").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("cu").alias("c2")), "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            "w1",
            "w2",
            "n_pair",
            round4_stable(
                F.ln(
                    (F.col("n_pair") / F.col("nb").cast("double"))
                    / (
                        (F.col("c1") / F.col("nu").cast("double"))
                        * (F.col("c2") / F.col("nu").cast("double"))
                    )
                )
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), "w1", "w2"
    ).limit(top_k)


def keyness_g2(
    df: DataFrame,
    text_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Corpus-comparison keyness by Dunning's log-likelihood ratio (G2) —
    which tokens are characteristically over/under-used in one source
    relative to another. The standard corpus-linguistics screen for
    source-specific boilerplate, topic drift between crawls, and
    templated text (complements event_mix_drift, which compares category
    MIXES; this compares token USAGE between two document populations).

    G2 = 2 * (a*ln(a/Ea) + b*ln(b/Eb)) with expected counts
    Ea = Na*(a+b)/(Na+Nb), Eb = Nb*(a+b)/(Na+Nb); zero-count terms
    contribute 0 (lim x->0 of x*ln x). ``overused_in_a`` flags direction.
    Returns top_k rows (token, n_a, n_b, g2, overused_in_a) ordered by
    (rounded g2 desc, token) — a reproducible total order.

    Scale: two keyed token counts (map-side combined), a full-outer join
    on the (vocabulary-sized, not corpus-sized) count tables, broadcast
    scalar totals, TakeOrdered top-k — no global sort, no data-row join.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    toks = F.filter(tokens(F.col(text_col)), lambda t: F.length(t) > 0)
    base = df.filter(
        F.col(group_col).isin([group_a, group_b])
    ).select(F.col(group_col).alias("__g"), F.explode(toks).alias("token"))
    counts = base.groupBy("token").agg(
        F.sum((F.col("__g") == group_a).cast("bigint")).alias("n_a"),
        F.sum((F.col("__g") == group_b).cast("bigint")).alias("n_b"),
    )
    tot = counts.agg(
        F.sum("n_a").alias("__na"), F.sum("n_b").alias("__nb")
    )
    j = counts.filter(
        (F.col("n_a") + F.col("n_b")) >= min_count
    ).crossJoin(F.broadcast(tot))

    # degenerate-corpus guard (round-10 property-sweep finding, the
    # logrank_test convention): a group with ZERO total tokens has no
    # usage rate — every expected count and the direction flag divide by
    # it, so fail loud with the operator's name instead of an unnamed
    # ANSI divide-by-zero. The guard lives INSIDE the denominators.
    def _tot_ok(col: str):
        return F.when(
            (F.col("__na") > 0) & (F.col("__nb") > 0), F.col(col)
        ).otherwise(
            F.raise_error(
                F.format_string(
                    "keyness_g2: empty corpus (tokens_a=%s, tokens_b=%s)"
                    " — both groups need at least one token",
                    F.coalesce(F.col("__na").cast("string"), F.lit("0")),
                    F.coalesce(F.col("__nb").cast("string"), F.lit("0")),
                )
            ).cast("bigint")
        )

    na, nb = _tot_ok("__na").cast("double"), _tot_ok("__nb").cast("double")
    a, b = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ea = na * (a + b) / (na + nb)
    eb = nb * (a + b) / (na + nb)
    term_a = F.when(F.col("n_a") > 0, a * F.log(a / ea)).otherwise(F.lit(0.0))
    term_b = F.when(F.col("n_b") > 0, b * F.log(b / eb)).otherwise(F.lit(0.0))
    scored = j.select(
        "token",
        "n_a",
        "n_b",
        round4_stable(F.lit(2.0) * (term_a + term_b)).alias("g2"),
        (a / na > b / nb).alias("overused_in_a"),
    )
    return scored.orderBy(F.col("g2").desc(), "token").limit(top_k)


def nb_lang_classify(
    train_df: DataFrame,
    score_df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    mode: str = "word",
    gram: int = 2,
) -> DataFrame:
    """Multinomial Naive Bayes over word unigrams (``mode="word"``) or
    character ``gram``-grams (``mode="char"``): train on one corpus,
    predict the label of another — the TRAINED twin of the marker-list
    heuristic in :func:`lang_id` (fastText-style langid is a linear model
    over exactly these features). Laplace-1 smoothing::

        score(d, l) = ln P(l) + sum_g tf_dg * ln((c_lg + 1) / (T_l + V))

    decomposed as ``prior + sum_matched tf*ln(c_lg+1) - n_tok*ln(T_l+V)``
    so zero-count (g, l) pairs never materialize (ln(0+1) = 0): the model
    join stays on OBSERVED (label, gram) counts, not the dense V x L
    matrix. Returns one row per scored doc: (id, predicted), plus the
    true label carried through as ``label_col`` IF ``score_df`` has that
    column — scoring genuinely unlabeled data (the primary use of a
    classifier) needs no label column; the confusion-matrix path is just
    "carry the label, then groupBy(label, predicted)".

    Quality note (measured, round 7): on the synthetic registry corpus
    the per-language word mixtures are nearly identical (pairwise KL
    0.006-0.027 over a 31-word vocabulary), and NO classifier beats the
    all-'en' majority baseline (0.440) there: this NB scores 0.368,
    an NB fit on train+test (the cheating upper bound) 0.488, and an
    L2 multinomial logistic regression converges exactly to the
    majority predictor (0.440). The operator is correct — the planted-
    separability fixture classifies perfectly — the corpus is simply
    near-inseparable, so the registry row is an EVALUATOR of the
    confusion matrix, not a deployable language-ID model. For real
    language ID use :func:`lang_id` (marker heuristic) or train on a
    separable corpus.

    Determinism (the repo's cross-engine rules): ln of integer counts is
    bit-stable across engines; the per-(doc, label) matched sum folds the
    SORTED contribution list (fixed IEEE order); the argmax tie-breaks on
    the label string, so predictions — and the confusion counts built
    from them — hash-check exactly. No float ever reaches the output.

    Scale: gram extraction is array-local per doc; model counts and
    per-doc tf are keyed hash aggregates joined on the gram (the model is
    NEVER broadcast — char-V is small but word-gram vocabularies are
    not); only the L-row per-label stats table (prior, ln(T_l+V)) is
    broadcast into the scoring fan-out. Docs with no features (shorter
    than ``gram`` chars / zero tokens) are excluded (same rule both
    engines).
    """
    if mode not in ("word", "char"):
        raise ValueError(f"mode must be 'word' or 'char', got {mode!r}")
    t = F.lower(F.trim(F.col(text_col)))
    if mode == "word":
        feats = F.filter(F.split(t, r"\s+"), lambda w: F.length(w) > 0)
    else:
        feats = F.when(
            F.length(t) >= gram,
            F.transform(
                F.sequence(F.lit(1), F.length(t) - (gram - 1)),
                lambda i: F.substring(t, i, gram),
            ),
        ).otherwise(F.array())

    def gram_rows(df: DataFrame, *keep: str) -> DataFrame:
        return (
            df.filter(F.size(feats) >= 1)
            .select(*keep, F.explode(feats).alias("g"))
        )

    cnt = gram_rows(train_df, label_col).groupBy(label_col, "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = cnt.groupBy(label_col).agg(F.sum("c").alias("tl"))
    vocab = cnt.select("g").distinct().agg(F.count(F.lit(1)).alias("v"))
    pri = (
        train_df.filter(F.size(feats) >= 1)
        .groupBy(label_col)
        .agg(F.count(F.lit(1)).alias("nd"))
    )
    n_all = pri.agg(F.sum("nd").alias("n"))
    lstats = (
        pri.join(tot, label_col)
        .crossJoin(F.broadcast(n_all))
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(label_col).alias("__l"),
            (
                F.log(F.col("nd").cast("double"))
                - F.log(F.col("n").cast("double"))
            ).alias("prior_ln"),
            F.log((F.col("tl") + F.col("v")).cast("double")).alias("ln_tv"),
        )
    )

    # score-side label is OPTIONAL: unlabeled data — the primary use of
    # a classifier — scores without it; when present it rides along for
    # the confusion-matrix path
    carry = [label_col] if label_col in score_df.columns else []
    tf = gram_rows(score_df, id_col, *carry).groupBy(
        id_col, *carry, "g"
    ).agg(F.count(F.lit(1)).alias("tf"))
    ntok = tf.groupBy(id_col, *carry).agg(F.sum("tf").alias("n_tok"))
    contrib = tf.join(
        cnt.select(F.col(label_col).alias("__l"), "g", "c"), "g"
    ).select(
        F.col(id_col),
        F.col("__l"),
        (F.col("tf") * F.log((F.col("c") + 1).cast("double"))).alias("cx"),
    )
    matched = contrib.groupBy(id_col, "__l").agg(
        F.aggregate(
            F.array_sort(F.collect_list("cx")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("m")
    )
    scores = (
        ntok.crossJoin(F.broadcast(lstats))
        .join(matched, [id_col, "__l"], "left")
        .select(
            F.col(id_col),
            *[F.col(c) for c in carry],
            F.col("__l"),
            (
                F.col("prior_ln")
                + F.coalesce(F.col("m"), F.lit(0.0))
                - F.col("n_tok") * F.col("ln_tv")
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("__l"))
    return (
        scores.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(id_col, *carry, F.col("__l").alias("predicted"))
    )


def readability_scores(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Flesch reading ease + Flesch-Kincaid grade per document — the
    classic curation readability screen (too-hard and too-trivial text
    both get filtered or routed to curriculum stages). Counts are pure
    regex aggregates: words from the shared whitespace tokenizer,
    sentences from terminal-punctuation runs ``[.!?]+`` (floored at 1 —
    unpunctuated corpora degrade to one-sentence docs, honestly), and
    the standard vowel-group syllable approximation ``[aeiouy]+``::

        flesch   = 206.835 - 1.015*(W/S) - 84.6*(Syl/W)
        fk_grade = 0.39*(W/S) + 11.8*(Syl/W) - 15.59

    Integer counts + fixed-order double arithmetic -> both scores
    hash-check cross-engine. Zero-word docs are excluded. Scale: one
    projection, no shuffle at all until the caller aggregates.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    toks = tokens(F.col(text_col))
    syl = F.size(
        F.expr(f"regexp_extract_all(lower({text_col}), '[aeiouy]+', 0)")
    )
    sent = F.greatest(
        F.size(F.expr(f"regexp_extract_all({text_col}, '[.!?]+', 0)")),
        F.lit(1),
    )
    base = df.select(
        F.col(id_col),
        F.size(toks).alias("n_words"),
        sent.alias("n_sentences"),
        syl.alias("n_syllables"),
    ).filter(F.col("n_words") >= 1)
    wps = F.col("n_words").cast("double") / F.col("n_sentences").cast("double")
    spw = (
        F.col("n_syllables").cast("double") / F.col("n_words").cast("double")
    )
    return base.select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        round4_stable(
            F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
        ).alias("flesch"),
        round4_stable(
            F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
        ).alias("fk_grade"),
    )


def textrank_keywords(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 5,
    iterations: int = 3,
    top_k: int = 30,
    weighted: bool = False,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau): PageRank over the
    adjacent-word co-occurrence graph — words that keep company with
    other central words rank up, a structural signal frequency alone
    misses. Composes the engine's own exact scaled-BIGINT
    :func:`~feature_store_fraud_detection_spark.operators.graph.pagerank`
    (symmetric, fixed iterations), so every rank is integer-exact and
    the top-k order (rank desc, word) is total.

    Words below ``min_count`` occurrences are dropped BEFORE the graph
    is built — the standard TextRank vocabulary floor, and the lever
    that bounds |V| on web-scale corpora (the co-occurrence graph of a
    100 TB corpus over an unfloored vocabulary is mostly hapax noise).

    ``weighted=True`` uses the published form: co-occurrence COUNTS as
    edge weights (weight(a,b) = adjacencies in either direction), via
    the integer-exact weighted pagerank — frequent-pair structure then
    outranks mere connectivity.

    Returns (word, rank_scaled): divide by 1e12 for conventional mass.
    """
    from feature_store_fraud_detection_spark.operators.graph import pagerank

    toks = F.filter(tokens(F.col(text_col)), lambda t: F.length(t) > 0)
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array())
    pairs = (
        df.select(F.explode(bigrams).alias("p"))
        .select("p.w1", "p.w2")
        .filter(F.col("w1") != F.col("w2"))
    )
    uni = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cu"))
        .filter(F.col("cu") >= min_count)
    )
    kept = (
        pairs.join(uni.select(F.col("w").alias("w1")), "w1")
        .join(uni.select(F.col("w").alias("w2")), "w2")
    )
    if weighted:
        # directed adjacency counts, mirrored; pagerank's weighted path
        # sums duplicate (src, dst) rows, yielding the undirected
        # either-direction co-occurrence weight. Mirroring is a 2-element
        # struct explode — NOT a self-union, which would evaluate the
        # aggregate subtree twice (r12 optimization, guide §2.4; the
        # _trade_edges single-pass symmetric-explode idiom)
        wts = kept.groupBy("w1", "w2").agg(
            F.count(F.lit(1)).cast("long").alias("cw")
        )
        edges = wts.select(
            F.explode(
                F.array(
                    F.struct(F.col("w1"), F.col("w2"), F.col("cw")),
                    F.struct(
                        F.col("w2").alias("w1"),
                        F.col("w1").alias("w2"),
                        F.col("cw"),
                    ),
                )
            ).alias("e")
        ).select("e.w1", "e.w2", "e.cw")
        ranked = pagerank(
            edges, "w1", "w2", iterations=iterations,
            symmetric=True, weight_col="cw",
        )
    else:
        # same single-pass symmetric explode: the tokenize + explode +
        # two-vocab-join subtree behind `kept` runs ONCE (the old
        # self-union re-ran it for the mirrored half — broadcast joins
        # leave no exchange for ReuseExchange to share)
        edges = (
            kept.select(
                F.explode(
                    F.array(
                        F.struct(F.col("w1"), F.col("w2")),
                        F.struct(
                            F.col("w2").alias("w1"), F.col("w1").alias("w2")
                        ),
                    )
                ).alias("e")
            )
            .select("e.w1", "e.w2")
            .distinct()
        )
        ranked = pagerank(
            edges, "w1", "w2", iterations=iterations,
            assume_distinct=True, symmetric=True,
        )
    return (
        ranked.select(F.col("node").alias("word"), "rank_scaled")
        .orderBy(F.col("rank_scaled").desc(), "word")
        .limit(top_k)
    )


def dsir_logratio(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    top_k: int | None = None,
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every corpus
    document by its log importance ratio under two unigram bag-of-words
    LMs — ``target`` (the in-domain sample you want more of) vs the
    corpus itself — and rank. Documents whose token mix looks like the
    target float up; selecting the top slice importance-resamples the
    corpus toward the target distribution. The published method hashes
    n-grams into a fixed feature space; the unigram/exact-vocab form here
    is the same estimator with the hashing collision noise removed.

    log_ratio(doc) = sum over tokens of tf_w * (ln p_tgt(w) - ln p_src(w)),
    both LMs Laplace-smoothed over the SHARED vocabulary V (so
    target-unseen words contribute a finite negative preference)::

        p(w) = (count(w) + 1) / (total_tokens + |V|)

    Determinism: counts and totals are exact integers; each (doc, term)
    contribution takes two ``ln`` calls (measured cross-engine-stable,
    unlike ``exp`` — see sequential_ab's probe) in fixed op order; the
    per-doc reduction folds the SORTED contribution list (the repo's
    fixed-IEEE-order rule). Ranking breaks ties by doc id.

    Scale: term stats are hash aggregates keyed by term; their join onto
    per-doc tf is co-partitioned on term (vocabulary never broadcast, it
    can be arbitrarily large); the two scalar totals broadcast. One
    shuffle family on term, one on doc id — the unigram_nll profile with
    a second (bounded, target-sized) count table joined in.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    tok_c = corpus.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    )
    tok_t = target.select(F.explode(tokens(text_col)).alias("term"))
    tf = tok_c.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    src_ct = tok_c.groupBy("term").agg(F.count(F.lit(1)).alias("c_src"))
    tgt_ct = tok_t.groupBy("term").agg(F.count(F.lit(1)).alias("c_tgt"))
    # shared vocab = the corpus vocab (target-only terms never appear in
    # a scored doc, so they cannot contribute); |V| still counts them out
    # of the target mass via the totals below
    stats = src_ct.join(tgt_ct, "term", "left").select(
        "term", "c_src", F.coalesce("c_tgt", F.lit(0)).alias("c_tgt")
    )
    totals = stats.agg(
        F.sum("c_src").alias("t_src"),
        F.sum("c_tgt").alias("t_tgt"),
        F.count(F.lit(1)).alias("v"),
    )
    contribs = (
        tf.join(stats, "term")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.col("tf"),
            (
                F.col("tf")
                * (
                    F.log(
                        (F.col("c_tgt") + F.lit(1)).cast("double")
                        / (F.col("t_tgt") + F.col("v")).cast("double")
                    )
                    - F.log(
                        (F.col("c_src") + F.lit(1)).cast("double")
                        / (F.col("t_src") + F.col("v")).cast("double")
                    )
                )
            ).alias("c"),
        )
    )
    s = F.aggregate(
        F.array_sort(F.collect_list("c")), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = contribs.groupBy(id_col).agg(
        F.sum("tf").alias("n_tokens"),
        round4_stable(s / F.sum("tf")).alias("log_ratio_per_tok"),
    )
    if top_k is not None:
        scored = scored.orderBy(
            F.col("log_ratio_per_tok").desc(), F.col(id_col)
        ).limit(int(top_k))
    return scored
