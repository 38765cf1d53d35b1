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

from pyspark.sql import Column, DataFrame
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
    array). The shared substrate for Jaccard / MinHash dedup."""
    toks = tokens(text)
    # k-gram start positions 0..size-k (empty array when the doc is too short)
    idx = F.when(F.size(toks) >= k, F.sequence(F.lit(0), F.size(toks) - k)).otherwise(
        F.array().cast("array<int>")
    )
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j + 1) for j in range(k)]
    )
    return F.array_distinct(F.transform(idx, lambda i: gram(i)))


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


def text_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One-pass text profile: counts, ratios, quality, language, fingerprints."""
    return df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars_measured"),
        F.round(stopword_ratio(text_col), 4).alias("stopword_ratio"),
        F.round(punct_ratio(text_col), 4).alias("punct_ratio"),
        F.round(avg_token_len(text_col), 4).alias("avg_token_len"),
        F.round(quality_score(text_col), 4).alias("quality"),
        lang_id(text_col).alias("lang_pred"),
        doc_fingerprint(text_col).alias("fingerprint"),
        winnow_fingerprint(text_col).alias("winnow_fp"),
    )
