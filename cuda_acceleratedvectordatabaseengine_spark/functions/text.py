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


def shingles_from_tokens(w: Column, n: int) -> Column:
    """n-word shingles from an ALREADY-TOKENIZED array column — the shared
    builder behind ``word_shingles_expr`` (its only caller). The factoring
    is retained from a refuted experiment: a single-scan nine-length
    gopher n-gram projection built on it measured 0.25x vs the streamed
    union branches and was not shipped (OPTIMIZATION_r14.md).

    Built as n-1 zip_with concats over shifted slices — O(tokens) total,
    ~2x faster than the transform(sequence)+per-index slice form, which
    re-slices the token array for every shingle position."""
    cnt = F.greatest(F.size(w) - (n - 1), F.lit(0))
    sh = F.slice(w, 1, cnt)
    for i in range(2, n + 1):
        sh = F.zip_with(
            sh, F.slice(w, i, cnt), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return sh


def word_shingles_expr(text: Column | str, n: int = 3, distinct: bool = True) -> Column:
    """n-word shingles as strings; documents shorter than n words yield []."""
    sh = shingles_from_tokens(tokens_expr(text), n)
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


# ---------------------------------------------------------------------------
# C4 line-level cleaning (Raffel et al. 2020 §2.2 — the published rules)
# ---------------------------------------------------------------------------

# The C4 pipeline cleans crawled pages LINE-wise before any corpus-level
# pass: keep a line only if it ends in terminal punctuation, has at
# least 5 words, and does not mention javascript; then drop the whole
# page if fewer than 3 lines survive or the page smells like template
# junk ("lorem ipsum") or code ('{'). Everything below is the
# Java/RE2-common twin-template discipline of HTML_STRIP_STEPS: the
# Spark Column chain and the DuckDB oracle SQL are the same program.

C4_MIN_LINE_WORDS = 5
C4_MIN_LINES = 3
# terminal punctuation incl. closing quote, per the paper
_C4_PUNCT_RE = "[.!?\"']$"


def _ws_trim(c: Column) -> Column:
    # true whitespace trim (tabs included) — SQL trim() strips only
    # spaces, in BOTH engines, which is wrong for crawled text
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def _c4_line_pred(line: Column) -> Column:
    words = F.split(line, r"\s+")
    return (
        line.rlike(_C4_PUNCT_RE)
        & (F.size(words) >= C4_MIN_LINE_WORDS)
        & ~F.lower(line).contains("javascript")
    )


def c4_kept_lines_expr(text: Column | str) -> Column:
    """Array of trimmed lines surviving the C4 line filter."""
    lines = F.transform(F.split(_as_col(text), "\n"), lambda x: _ws_trim(x))
    return F.filter(lines, _c4_line_pred)


def c4_clean_text_expr(text: Column | str) -> Column:
    """Page text after C4 line-level cleaning (kept lines re-joined)."""
    return F.array_join(c4_kept_lines_expr(text), "\n")


def c4_keep_expr(text: Column | str) -> Column:
    """C4 page-level keep: >= 3 surviving lines, no 'lorem ipsum', no
    curly brace anywhere in the RAW page."""
    raw = _as_col(text)
    return (
        (F.size(c4_kept_lines_expr(text)) >= C4_MIN_LINES)
        & ~F.lower(raw).contains("lorem ipsum")
        & ~raw.contains("{")
    )


def _c4_line_pred_sql(x: str) -> str:
    return (
        f"regexp_matches({x}, '[.!?\"'']$')"
        f" AND length(regexp_split_to_array({x}, '\\s+')) >= {C4_MIN_LINE_WORDS}"
        f" AND NOT contains(lower({x}), 'javascript')"
    )


_WS_TRIM_SQL = "regexp_replace({x}, '^\\s+|\\s+$', '', 'g')"


def c4_kept_lines_oracle_sql(expr: str) -> str:
    """DuckDB spelling of ``c4_kept_lines_expr`` over ``expr``."""
    t = _WS_TRIM_SQL.format(x="x")
    return (
        f"list_filter(list_transform(string_split({expr}, chr(10)),"
        f" x -> {t}), x -> {_c4_line_pred_sql('x')})"
    )


def c4_clean_text_oracle_sql(expr: str) -> str:
    """DuckDB spelling of ``c4_clean_text_expr`` (coalesce: DuckDB's
    array_to_string NULLs out on the empty list, Spark yields '')."""
    return (
        f"coalesce(array_to_string({c4_kept_lines_oracle_sql(expr)},"
        " chr(10)), '')"
    )


def c4_keep_oracle_sql(expr: str) -> str:
    """DuckDB spelling of ``c4_keep_expr``."""
    return (
        f"(length({c4_kept_lines_oracle_sql(expr)}) >= {C4_MIN_LINES}"
        f" AND NOT contains(lower({expr}), 'lorem ipsum')"
        f" AND NOT contains({expr}, chr(123)))"
    )


# ---------------------------------------------------------------------------
# Gopher document-quality rules (Rae et al. 2021, table A1 — published)
# ---------------------------------------------------------------------------

GOPHER_STOPWORDS: "tuple[str, ...]" = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)

GOPHER_RULES: "tuple[str, ...]" = (
    "word_count",        # 50 <= words <= 100000
    "mean_word_length",  # 3 <= chars/word <= 10
    "symbol_ratio",      # (# + ellipsis) / words <= 0.1
    "bullet_lines",      # <= 90% of lines start with a bullet
    "ellipsis_lines",    # <= 30% of lines end with ...
    "alpha_words",       # >= 80% of words contain a letter
    "stopwords",         # >= 2 of the 8 required stopwords present
    # the paper's repetition table, line rules (n-gram repetition
    # signals live in textops.repetition_stats): a duplicate line is an
    # occurrence beyond the first of an identical trimmed non-empty line
    "dup_line_frac",       # duplicate lines / lines <= 0.30
    "dup_line_char_frac",  # chars in duplicate lines / chars <= 0.20
)


def gopher_rules_expr(text: Column | str) -> "dict[str, Column]":
    """The seven Gopher repetition-free quality rules as named boolean
    Columns (True = rule passes). All pure Catalyst built-ins; the
    DuckDB twin is :func:`gopher_rule_oracle_sql`.

    Every ratio threshold is evaluated by INTEGER cross-multiplication
    (e.g. alpha_words >= 0.8 becomes 5*n_alpha >= 4*n_words): exact at
    the boundary, immune to float-rounding dialect drift, and safe under
    ANSI mode (no division, so no divide-by-zero on empty text)."""
    raw = _as_col(text)
    trimmed = _ws_trim(raw)
    words = F.split(trimmed, r"\s+")
    n_words = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(words)
    )
    n_chars = F.length(F.regexp_replace(raw, r"\s+", ""))
    lines = F.transform(F.split(raw, "\n"), lambda x: _ws_trim(x))
    n_lines = F.size(lines)  # >= 1 always (split of '' is [''])
    n_bullet = F.size(F.filter(lines, lambda x: x.rlike("^[-*•]")))
    n_ell_end = F.size(F.filter(lines, lambda x: x.rlike(r"\.\.\.$")))
    n_hash = F.length(raw) - F.length(F.replace(raw, F.lit("#"), F.lit("")))
    # 3x the ellipsis count (length delta of stripping '...'), kept
    # integer; the 0.1 threshold is scaled to match below
    n_ell3 = F.length(raw) - F.length(
        F.replace(raw, F.lit("..."), F.lit(""))
    )
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
    low = F.transform(words, lambda w: F.lower(w))
    n_sw = sum(
        (F.array_contains(low, s).cast("int") for s in GOPHER_STOPWORDS),
        F.lit(0),
    )
    # duplicate-line accounting, all O(lines) scalar array ops: extra
    # occurrences = total - distinct; their chars = the length delta of
    # joining all vs joining distinct lines
    lines_ne = F.filter(lines, lambda x: x != "")
    n_l = F.size(lines_ne)
    n_ld = F.size(F.array_distinct(lines_ne))
    ch_all = F.length(F.array_join(lines_ne, ""))
    ch_dist = F.length(F.array_join(F.array_distinct(lines_ne), ""))
    nz = n_words > 0
    return {
        "word_count": (n_words >= 50) & (n_words <= 100000),
        # 3 <= chars/words <= 10
        "mean_word_length": nz
        & (n_chars >= 3 * n_words)
        & (n_chars <= 10 * n_words),
        # (n_hash + n_ell3/3) / n_words <= 0.1  ==  30*hash + 10*ell3 <= 3*n
        "symbol_ratio": nz & (30 * n_hash + 10 * n_ell3 <= 3 * n_words),
        # bullet_lines/lines <= 0.9  ==  10*bullet <= 9*lines
        "bullet_lines": 10 * n_bullet <= 9 * n_lines,
        # ellipsis_lines/lines <= 0.3  ==  10*ell <= 3*lines
        "ellipsis_lines": 10 * n_ell_end <= 3 * n_lines,
        # alpha/words >= 0.8  ==  5*alpha >= 4*words
        "alpha_words": nz & (5 * n_alpha >= 4 * n_words),
        "stopwords": n_sw >= 2,
        # (n_l - n_ld)/n_l <= 0.3  ==  10*(n_l - n_ld) <= 3*n_l
        # (0 lines: 0 <= 0 passes — word_count already fails empty docs)
        "dup_line_frac": 10 * (n_l - n_ld) <= 3 * n_l,
        # (ch_all - ch_dist)/ch_all <= 0.2  ==  5*(delta) <= ch_all
        "dup_line_char_frac": 5 * (ch_all - ch_dist) <= ch_all,
    }


def gopher_keep_expr(text: Column | str) -> Column:
    """AND of every Gopher rule."""
    rules = gopher_rules_expr(text)
    out = F.lit(True)
    for name in GOPHER_RULES:
        out = out & rules[name]
    return out


def gopher_rule_oracle_sql(expr: str, rule: str) -> str:
    """DuckDB spelling of one Gopher rule boolean over ``expr`` — the
    same integer cross-multiplication program as the Catalyst form."""
    trimmed = _WS_TRIM_SQL.format(x=expr)
    nw = (
        f"(CASE WHEN length({trimmed}) = 0 THEN 0"
        f" ELSE length(regexp_split_to_array({trimmed}, '\\s+')) END)"
    )
    nc = f"length(regexp_replace({expr}, '\\s+', '', 'g'))"
    line_trim = _WS_TRIM_SQL.format(x="x")
    lines = (
        f"list_transform(string_split({expr}, chr(10)), x -> {line_trim})"
    )
    nl = f"length({lines})"
    words = f"regexp_split_to_array({trimmed}, '\\s+')"
    if rule == "word_count":
        return f"({nw} >= 50 AND {nw} <= 100000)"
    if rule == "mean_word_length":
        return f"({nw} > 0 AND {nc} >= 3 * {nw} AND {nc} <= 10 * {nw})"
    if rule == "symbol_ratio":
        n_hash = f"(length({expr}) - length(replace({expr}, '#', '')))"
        n_ell3 = f"(length({expr}) - length(replace({expr}, '...', '')))"
        return (
            f"({nw} > 0 AND 30 * {n_hash} + 10 * {n_ell3} <= 3 * {nw})"
        )
    if rule == "bullet_lines":
        n_b = (
            f"length(list_filter({lines},"
            " x -> regexp_matches(x, '^[-*•]')))"
        )
        return f"(10 * {n_b} <= 9 * {nl})"
    if rule == "ellipsis_lines":
        n_e = (
            f"length(list_filter({lines},"
            " x -> regexp_matches(x, '\\.\\.\\.$')))"
        )
        return f"(10 * {n_e} <= 3 * {nl})"
    if rule == "alpha_words":
        n_a = (
            f"length(list_filter({words},"
            " w -> regexp_matches(w, '[a-zA-Z]')))"
        )
        return f"({nw} > 0 AND 5 * {n_a} >= 4 * {nw})"
    if rule == "stopwords":
        low = f"list_transform({words}, w -> lower(w))"
        hits = " + ".join(
            f"(CASE WHEN list_contains({low}, '{s}') THEN 1 ELSE 0 END)"
            for s in GOPHER_STOPWORDS
        )
        return (
            f"(CASE WHEN length({trimmed}) = 0 THEN 0"
            f" ELSE ({hits}) END) >= 2"
        )
    lines_ne = f"list_filter({lines}, x -> x <> '')"
    if rule == "dup_line_frac":
        n_l = f"length({lines_ne})"
        n_ld = f"length(list_distinct({lines_ne}))"
        return f"(10 * ({n_l} - {n_ld}) <= 3 * {n_l})"
    if rule == "dup_line_char_frac":
        ch_all = f"length(coalesce(array_to_string({lines_ne}, ''), ''))"
        ch_dist = (
            "length(coalesce(array_to_string("
            f"list_distinct({lines_ne}), ''), ''))"
        )
        return f"(5 * ({ch_all} - {ch_dist}) <= {ch_all})"
    raise ValueError(f"unknown gopher rule {rule!r}")


def gopher_keep_oracle_sql(expr: str) -> str:
    """DuckDB spelling of ``gopher_keep_expr``."""
    return "(" + " AND ".join(
        gopher_rule_oracle_sql(expr, r) for r in GOPHER_RULES
    ) + ")"


# ---------------------------------------------------------------------------
# HTML -> LINES extraction (block-aware; feeds the C4 line rules)
# ---------------------------------------------------------------------------

# Block-boundary tags become newlines BEFORE generic tag stripping, so
# the extracted text keeps the page's line structure — without this,
# ``html_to_text_expr``'s whitespace normalization collapses the page to
# one line and the C4 line-level rules have nothing to operate on.
# Same Java/RE2-common regex subset as HTML_STRIP_STEPS.
HTML_BLOCK_BREAK_RE = (
    r"(?i)<(?:br|/p|/div|/li|/h[1-6]|/tr|/table|/ul|/ol|/blockquote)[^>]*>"
)


def html_to_lines_expr(html: Column | str) -> Column:
    """HTML -> visible text WITH line structure: script/style/comment
    bodies drop, block-closing tags become newlines, remaining tags
    strip, common entities decode, spaces collapse per line, empty lines
    drop. The output feeds :func:`c4_clean_text_expr` directly."""
    out = _as_col(html)
    for pat, rep in HTML_STRIP_STEPS[:3]:  # script/style/comment bodies
        out = F.regexp_replace(out, pat, rep)
    out = F.regexp_replace(out, HTML_BLOCK_BREAK_RE, "\n")
    out = F.regexp_replace(out, r"<[^>]*>", " ")
    for ent, ch in HTML_ENTITY_MAP:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    lines = F.transform(
        F.split(out, "\n"),
        lambda x: _ws_trim(F.regexp_replace(x, r"[ \t]+", " ")),
    )
    return F.array_join(F.filter(lines, lambda x: x != ""), "\n")


def html_to_lines_oracle_sql(expr: str) -> str:
    """The exact DuckDB spelling of ``html_to_lines_expr``."""
    out = expr
    for pat, rep in HTML_STRIP_STEPS[:3]:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    out = f"regexp_replace({out}, '{HTML_BLOCK_BREAK_RE}', chr(10), 'g')"
    out = f"regexp_replace({out}, '<[^>]*>', ' ', 'g')"
    for ent, ch in HTML_ENTITY_MAP:
        ch_sql = ch.replace("'", "''")
        out = f"replace({out}, '{ent}', '{ch_sql}')"
    t = _WS_TRIM_SQL.format(x="regexp_replace(x, '[ \t]+', ' ', 'g')")
    return (
        f"coalesce(array_to_string(list_filter(list_transform("
        f"string_split({out}, chr(10)), x -> {t}), x -> x <> ''),"
        " chr(10)), '')"
    )
