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


# ---------------------------------------------------------------------------
# HTML -> text extraction (crawled-corpus ingestion, C4/RefinedWeb-class)
# ---------------------------------------------------------------------------

# Ordered regexp strip steps. Patterns use only the regex subset Java
# (Spark) and RE2 (DuckDB) agree on — inline (?is) flags, lazy
# quantifiers, NO backreferences/lookaround — so the Catalyst chain and
# the SQL oracle are the same program. Script/style/comment bodies drop
# BEFORE generic tag stripping; entity decoding happens AFTER (a decoded
# '&lt;p&gt;' must render as literal text, never as a strippable tag).
HTML_STRIP_STEPS: "tuple[tuple[str, str], ...]" = (
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]*>", " "),
)

# Common named/numeric entities decoded as LITERAL replacements (no regex
# dialect risk). Full numeric-entity decoding needs chr() and lives in the
# mapInPandas fallback (sources.documents.decode_html_entities).
HTML_ENTITY_MAP: "tuple[tuple[str, str], ...]" = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&#34;", '"'),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # LAST: '&amp;lt;' decodes to '&lt;', not '<'
)


def html_to_text_expr(html: Column | str) -> Column:
    """Pure-Catalyst HTML -> visible text: drop script/style/comment
    bodies, strip tags, decode common entities, normalize whitespace.
    Runs at scan speed (whole-stage codegen, no Python); for full
    entity fidelity use ``sources.documents.decode_html_entities``."""
    out = _as_col(html)
    for pat, rep in HTML_STRIP_STEPS:
        out = F.regexp_replace(out, pat, rep)
    for ent, ch in HTML_ENTITY_MAP:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def html_to_text_oracle_sql(expr: str) -> str:
    """The exact DuckDB spelling of ``html_to_text_expr`` over ``expr``."""
    out = expr
    for pat, rep in HTML_STRIP_STEPS:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    for ent, ch in HTML_ENTITY_MAP:
        ch_sql = ch.replace("'", "''")
        out = f"replace({out}, '{ent}', '{ch_sql}')"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"


# ---------------------------------------------------------------------------
# PII detection / redaction (curation-stage scrub, pure Catalyst)
# ---------------------------------------------------------------------------

# class -> (pattern, replacement token). Same Java/RE2-common subset
# discipline as HTML_STRIP_STEPS (character classes, alternation, bounded
# quantifiers, \b word boundaries — both engines agree). Ordered: classes
# are applied in this sequence, so ip/ssn run before phone (whose digit
# runs could otherwise swallow them).
PII_PATTERNS: "tuple[tuple[str, str, str], ...]" = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (
        "ipv4",
        r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
        r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\b",
        "<IP>",
    ),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    (
        "phone",
        r"\+[0-9]{1,3}[ \-]?\(?[0-9]{2,4}\)?[ \-]?[0-9]{3,4}[ \-]?[0-9]{3,4}",
        "<PHONE>",
    ),
)

PII_CLASSES: "tuple[str, ...]" = tuple(c for c, _p, _t in PII_PATTERNS)


def pii_count_expr(text: Column | str, pii_class: str) -> Column:
    """Number of matches of one PII class (0 for clean text)."""
    pats = {c: p for c, p, _t in PII_PATTERNS}
    return F.regexp_count(_as_col(text), F.lit(pats[pii_class]))


def pii_redact_expr(
    text: Column | str, classes: "tuple[str, ...] | None" = None
) -> Column:
    """Text with every selected PII class replaced by its token, applied
    in PII_PATTERNS order."""
    keep = set(classes) if classes is not None else set(PII_CLASSES)
    out = _as_col(text)
    for cls, pat, tok in PII_PATTERNS:
        if cls in keep:
            out = F.regexp_replace(out, pat, tok)
    return out


def pii_count_oracle_sql(expr: str, pii_class: str) -> str:
    """DuckDB spelling of ``pii_count_expr`` (len of extract_all)."""
    pats = {c: p for c, p, _t in PII_PATTERNS}
    pat = pats[pii_class].replace("'", "''")
    return f"len(regexp_extract_all({expr}, '{pat}'))"


def pii_redact_oracle_sql(
    expr: str, classes: "tuple[str, ...] | None" = None
) -> str:
    """DuckDB spelling of ``pii_redact_expr``."""
    keep = set(classes) if classes is not None else set(PII_CLASSES)
    out = expr
    for cls, pat, tok in PII_PATTERNS:
        if cls in keep:
            p = pat.replace("'", "''")
            out = f"regexp_replace({out}, '{p}', '{tok}', 'g')"
    return out
