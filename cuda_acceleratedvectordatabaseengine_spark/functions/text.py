"""Text-analysis expression builders for the LLM-pipeline surface.

These are pure Catalyst expressions (JVM, whole-stage codegen) — no Python
UDFs in any hot path. They exist beyond the reference's capability set (the
reference has no string functions at all, SURVEY.md §2.6) as the
training-data-pipeline extension: tokenization, shingling, quality scoring,
language-ID heuristics, and content fingerprints.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# ---------------------------------------------------------------------------
# tokenization / shingling
# ---------------------------------------------------------------------------


def tokens_expr(text: Column | str) -> Column:
    """Whitespace tokenization with the empty-string guard (split('') yields
    [''] otherwise)."""
    t = F.trim(_as_col(text))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count_expr(text: Column | str) -> Column:
    return F.size(tokens_expr(text))


def word_shingles_expr(text: Column | str, n: int = 3, distinct: bool = True) -> Column:
    """n-word shingles as strings; documents shorter than n words yield [].

    Built as n-1 zip_with concats over shifted slices — O(tokens) total,
    ~2x faster than the transform(sequence)+per-index slice form, which
    re-slices the token array for every shingle position."""
    w = tokens_expr(text)
    cnt = F.greatest(F.size(w) - (n - 1), F.lit(0))
    sh = F.slice(w, 1, cnt)
    for i in range(2, n + 1):
        sh = F.zip_with(
            sh, F.slice(w, i, cnt), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.array_distinct(sh) if distinct else sh


# GPT-style subword-ish pre-tokenization: contractions, letter runs,
# digit runs capped at 3 (the cl100k convention), punctuation singles.
# Ordered alternation behaves identically in Java regex (Spark) and RE2
# (DuckDB), so the same pattern string serves both engines' oracles.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]"


def bpe_tokens_expr(text: Column | str) -> Column:
    """BPE-ish pre-tokenization (regex pass only — no merges table): the
    standard cheap token-count estimator for LLM pipeline budgeting."""
    return F.regexp_extract_all(_as_col(text), F.lit(BPE_ISH_PATTERN), F.lit(0))


def bpe_token_count_expr(text: Column | str) -> Column:
    return F.size(bpe_tokens_expr(text))


def char_ngrams_expr(text: Column | str, n: int = 3) -> Column:
    """Character n-grams over the lowercased, whitespace-normalized text."""
    t = F.regexp_replace(F.lower(F.trim(_as_col(text))), r"\s+", " ")
    return F.when(
        F.length(t) < n, F.array().cast("array<string>")
    ).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(t) - n + 1),
                lambda i: t.substr(i, F.lit(n)),
            )
        )
    )


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

EN_STOPWORDS = tuple(
    "the a an and or of to in is are was were be been it this that for on with".split()
)


def non_alpha_ratio_expr(text: Column | str) -> Column:
    """Share of characters outside [a-z ] after lowercasing; 0 for empty."""
    t = F.lower(_as_col(text))
    return F.when(F.length(t) == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace(t, "[a-z ]", "")).cast("double") / F.length(t)
    )


def stopword_ratio_expr(text: Column | str, stopwords: tuple[str, ...] = None) -> Column:
    toks = tokens_expr(text)
    sw = list(stopwords or EN_STOPWORDS)
    hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(sw)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(toks)
    )


def quality_score_expr(text: Column | str) -> Column:
    """Deterministic composite in [0, 1]: length saturation x alphabetic
    cleanliness. Fixed formula so it is SQL-oracle-able:
    LEAST(1, tokens/100) * (1 - non_alpha_ratio)."""
    return F.least(
        F.lit(1.0), token_count_expr(text).cast("double") / 100.0
    ) * (F.lit(1.0) - non_alpha_ratio_expr(text))


QUALITY_SCORE_ORACLE_SQL = (
    # the exact DuckDB spelling of quality_score_expr, for oracle pairing
    "LEAST(1.0, CASE WHEN length(trim(text)) = 0 THEN 0 ELSE "
    "length(regexp_split_to_array(trim(text), '\\s+')) END / 100.0) * "
    "(1.0 - CASE WHEN length(text) = 0 THEN 0.0 ELSE "
    "CAST(length(regexp_replace(lower(text), '[a-z ]', '', 'g')) AS DOUBLE) "
    "/ length(text) END)"
)


# ---------------------------------------------------------------------------
# language identification (n-gram/stopword heuristic)
# ---------------------------------------------------------------------------

_LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "es": ("el", "la", "los", "las", "de", "que", "y", "en", "un", "una", "es"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"),
    "fr": ("le", "la", "les", "de", "et", "est", "un", "une", "que", "dans"),
}


def cjk_ratio_expr(text: Column | str) -> Column:
    t = _as_col(text)
    cjk = F.length(t) - F.length(F.regexp_replace(t, r"[一-鿿]", ""))
    return F.when(F.length(t) == 0, F.lit(0.0)).otherwise(
        cjk.cast("double") / F.length(t)
    )


def lang_id_expr(text: Column | str) -> Column:
    """Heuristic language ID: CJK char ratio decides 'zh'; otherwise the
    Latin language whose stopword list scores the most token hits; 'und'
    when nothing matches. Deterministic tie-break by language code order."""
    toks = F.transform(tokens_expr(text), lambda t: F.lower(t))
    scores = []
    for pos, code in enumerate(sorted(_LANG_STOPWORDS)):  # deterministic order
        sw = list(_LANG_STOPWORDS[code])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: t.isin(sw))).alias("hits"),
                # struct max compares fields in order: ties on hits fall to
                # neg_pos, where a GREATER negated position means an EARLIER
                # code — so ascending code order wins deterministically
                F.lit(-pos).alias("neg_pos"),
                F.lit(code).alias("code"),
            )
        )
    best = F.array_max(F.array(*scores))
    return (
        F.when(cjk_ratio_expr(text) > 0.2, F.lit("zh"))
        .when(best["hits"] > 0, best["code"])
        .otherwise(F.lit("und"))
    )


# ---------------------------------------------------------------------------
# fingerprints
# ---------------------------------------------------------------------------


def normalized_text_expr(text: Column | str) -> Column:
    return F.regexp_replace(F.lower(F.trim(_as_col(text))), r"\s+", " ")


def doc_fingerprint_expr(text: Column | str) -> Column:
    """Content fingerprint: md5 of the normalized text (exact-dedup key).
    md5 spells identically in DuckDB, keeping the oracle trivial."""
    return F.md5(normalized_text_expr(text))


def content_hash64_expr(text: Column | str) -> Column:
    """64-bit rolling-hash-style fingerprint (xxhash64 of normalized text)."""
    return F.xxhash64(normalized_text_expr(text))
