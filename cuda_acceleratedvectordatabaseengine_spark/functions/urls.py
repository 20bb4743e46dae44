"""URL canonicalization — the key join/dedup step for crawled corpora.

Web-scale training pipelines (C4, RefinedWeb, CCNet) dedup and join by
URL before any content pass, and raw crawl URLs carry noise that breaks
the equality join: scheme/host case, default ports, fragments, tracking
query parameters, unsorted query strings, trailing slashes. The
reference engine has no crawl surface (this is north-star scope, like
the HTML/PII stages); everything here is public-spec behavior
(RFC 3986 §6 normalization + the de-facto tracking-param strip).

Canonicalization semantics (documented contract, applied in order):

1. fragment stripped (``#...``);
2. scheme lowercased;
3. authority (host[:port]) lowercased;
4. default ports dropped (``:80`` for http, ``:443`` for https);
5. query parsed on ``&``; empty params and tracking params
   (``utm_*``, ``fbclid``, ``gclid``) dropped; survivors sorted
   lexicographically and rejoined — so param ORDER never splits a URL;
6. path: trailing slashes stripped, empty path becomes ``/``;
7. reassembled as ``scheme://host[:port]path[?query]``.

Input must be an absolute ``http(s)://`` URL; percent-encoding is NOT
decoded (%-triples are case-preserved — decoding safely needs the
reserved-set rules and is out of scope for an equality key).

The whole chain is ONE scalar expression over string/array built-ins
that exist with identical semantics in Spark SQL and DuckDB, so the
same template serves the Catalyst plan (whole-stage codegen, scan
speed, no Python) and the DuckDB value oracle — the html/pii twin-
template discipline (functions/text.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Anchored to the key boundary: utm_* matches any utm_-prefixed key, but
# fbclid/gclid must be the WHOLE key ('fbclid=..' or bare 'fbclid') —
# 'gclid2=x' / 'fbclids=y' are distinct params and must survive.
TRACKING_PARAM_RE = "^(utm_|(fbclid|gclid)(=|$))"

# Dialect-divergent spellings; every other function in the template
# (lower/length/substring/split_part/regexp_extract/regexp_replace/
# instr/CASE/||/CAST AS STRING) is spelled identically in both engines
# and verified to agree (tests/test_urls.py).
_DIALECTS = {
    "spark": dict(
        split="split({q}, '&')",
        filt="filter({arr}, x -> NOT (x = '' OR x RLIKE '{re}'))",
        sort="array_sort({arr})",
        join="array_join({arr}, '&')",
    ),
    "duckdb": dict(
        split="string_split({q}, '&')",
        filt="list_filter({arr}, x -> NOT (x = '' OR regexp_matches(x, '{re}')))",
        sort="list_sort({arr})",
        # coalesce: DuckDB's list_sort/array_to_string NULL out on the
        # empty list (no surviving params); Spark's array_join yields ''.
        join="coalesce(array_to_string({arr}, '&'), '')",
    ),
}


def canonical_url_sql(u: str, dialect: str = "spark") -> str:
    """The canonicalization as one SQL scalar expression over input
    expression ``u`` (a column name or any string-typed SQL expression).
    ``dialect`` picks the array-function spellings; the semantics are
    identical by construction and pinned by cross-engine tests."""
    if dialect not in _DIALECTS:
        raise ValueError(f"dialect must be one of {sorted(_DIALECTS)}, got {dialect!r}")
    d = _DIALECTS[dialect]
    nofrag = f"split_part(trim({u}), '#', 1)"
    scheme = f"lower(split_part({nofrag}, '://', 1))"
    rest = f"substring({nofrag}, length(split_part({nofrag}, '://', 1)) + 4)"
    auth = f"lower(regexp_extract({rest}, '^[^/?]*', 0))"
    auth2 = (
        f"CASE WHEN {scheme} = 'http' AND {auth} LIKE '%:80' "
        f"THEN substring({auth}, 1, length({auth}) - 3) "
        f"WHEN {scheme} = 'https' AND {auth} LIKE '%:443' "
        f"THEN substring({auth}, 1, length({auth}) - 4) "
        f"ELSE {auth} END"
    )
    pathq = f"substring({rest}, length(regexp_extract({rest}, '^[^/?]*', 0)) + 1)"
    path = f"split_part({pathq}, '?', 1)"
    query = (
        f"CASE WHEN instr({pathq}, '?') > 0 "
        f"THEN substring({pathq}, instr({pathq}, '?') + 1) ELSE '' END"
    )
    params = d["filt"].format(arr=d["split"].format(q=query), re=TRACKING_PARAM_RE)
    qcanon = d["join"].format(arr=d["sort"].format(arr=params))
    path_n = (
        f"CASE WHEN regexp_replace({path}, '/+$', '') = '' THEN '/' "
        f"ELSE regexp_replace({path}, '/+$', '') END"
    )
    return (
        f"{scheme} || '://' || ({auth2}) || ({path_n}) || "
        f"(CASE WHEN ({qcanon}) = '' THEN '' ELSE '?' || ({qcanon}) END)"
    )


def canonical_url_expr(u: str) -> Column:
    """Catalyst Column form of :func:`canonical_url_sql` over column name
    or SQL expression ``u`` — pure built-ins, whole-stage codegen."""
    return F.expr(canonical_url_sql(u, "spark"))


# ---------------------------------------------------------------------------
# Host + registrable-domain extraction (domain mixing / blocklists)
# ---------------------------------------------------------------------------

# Two-level public-suffix heuristic: the common second-level labels under
# two-letter cc-TLDs ('bbc.co.uk' -> registrable 'bbc.co.uk', not
# 'co.uk'). The full Public Suffix List is a data file, not logic — at
# production scale load it as a broadcast join table; this compact
# heuristic covers the dominant cc-SLD families and keeps the expression
# pure-Catalyst (and exactly twinned in DuckDB).
CC_SLDS: "tuple[str, ...]" = ("co", "com", "org", "net", "ac", "gov", "edu")


def url_host_sql(u: str, dialect: str = "spark") -> str:
    """Lowercased host (no port) of an absolute http(s) URL — identical
    spelling in both dialects (string built-ins only)."""
    if dialect not in _DIALECTS:
        raise ValueError(f"dialect must be one of {sorted(_DIALECTS)}, got {dialect!r}")
    nofrag = f"split_part(trim({u}), '#', 1)"
    rest = f"substring({nofrag}, length(split_part({nofrag}, '://', 1)) + 4)"
    return f"lower(split_part(regexp_extract({rest}, '^[^/?]*', 0), ':', 1))"


def url_host_expr(u: str) -> Column:
    return F.expr(url_host_sql(u, "spark"))


def registrable_domain_sql(host_expr: str, dialect: str = "spark") -> str:
    """Registrable domain of a HOST expression (use ``url_host_sql`` first
    when starting from a URL): last two labels, or last three when the
    second-to-last is a known cc-SLD under a two-letter TLD. Bare hosts
    (<= 2 labels) and IPv4 literals pass through unchanged."""
    if dialect == "spark":
        arr = f"split({host_expr}, '\\\\.')"
        n = f"size({arr})"

        def el(i: int) -> str:
            return f"element_at({arr}, {i})"

        is_num = "{x} RLIKE '^[0-9]+$'"
    elif dialect == "duckdb":
        arr = f"string_split({host_expr}, '.')"
        n = f"length({arr})"

        def el(i: int) -> str:
            return f"list_extract({arr}, {i})"

        is_num = "regexp_matches({x}, '^[0-9]+$')"
    else:
        raise ValueError(f"dialect must be spark or duckdb, got {dialect!r}")
    slds = ", ".join(f"'{s}'" for s in CC_SLDS)
    return (
        f"CASE WHEN {n} <= 2 THEN {host_expr} "
        f"WHEN {is_num.format(x=el(-1))} THEN {host_expr} "
        f"WHEN {el(-2)} IN ({slds}) AND length({el(-1)}) = 2 "
        f"THEN concat_ws('.', {el(-3)}, {el(-2)}, {el(-1)}) "
        f"ELSE concat_ws('.', {el(-2)}, {el(-1)}) END"
    )


def registrable_domain_expr(host: str) -> Column:
    """Catalyst Column form of :func:`registrable_domain_sql` over a host
    column/expression."""
    return F.expr(registrable_domain_sql(host, "spark"))


def url_domain_expr(u: str) -> Column:
    """Registrable domain straight from a URL column."""
    return F.expr(
        registrable_domain_sql(url_host_sql(u, "spark"), "spark")
    )


def url_domain_sql(u: str, dialect: str = "duckdb") -> str:
    """The oracle twin of :func:`url_domain_expr`."""
    return registrable_domain_sql(url_host_sql(u, dialect), dialect)
