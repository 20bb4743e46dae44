"""SQL-registered surface: the engine's scalar functions as Spark
*SQL-body* temporary functions, plus the temp-view recipe over an ACTIVE
epoch — so a user who lives in ``spark.sql`` can run every §2.7 query
shape (Q2-Q4 kNN, gates, canonicalization) as pure SQL strings without
importing the Python API.

Two design rules:

1. **SQL bodies, not Python UDFs.** Every function is registered via
   ``CREATE OR REPLACE TEMPORARY FUNCTION ... RETURNS ... RETURN
   <expression>`` (Spark 4 SQL scalar UDFs). The body inlines into the
   caller's plan: whole-stage codegen, predicate pushdown through it,
   zero Python workers, zero serialization — unlike ``spark.udf.register``
   of a Python callable, which would put a row-at-a-time interpreter in
   the hot path (the package-wide zero-row-UDF invariant,
   tests/test_no_row_udfs.py).
2. **Bodies mirror the certified Column builders** in
   ``functions/distance.py`` / ``functions/text.py`` / ``functions/urls.py``
   term-for-term (same cast discipline, same integer
   cross-multiplication thresholds). tests/test_sql_surface.py proves
   value equality against the builders over the real sf0.001 corpus, so
   the SQL spellings cannot drift silently.

Reference parity: the SQL surface exposes S1-S4
(`engine/kernels.cuh:36-113,357-385`) by name, per SURVEY §4's
"register distance functions so declared SQL queries can call
l2_sq(a,b)".

Two Spark 4.1 SQL-UDF caveats (both pinned by tests):

- a SQL UDF cannot be applied to a **lambda variable** of a
  higher-order function (MISSING_ATTRIBUTES at inline time) — bodies
  inline their helpers inside ``transform``/``filter`` lambdas;
- a SQL UDF call cannot sit directly in ``ORDER BY``
  (UNSUPPORTED_SQL_UDF_USAGE in Sort) — project it to an alias first,
  then sort on the alias (see the nprobe recipe in
  :func:`register_index_views`).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .functions import urls as U
from .functions.distance import COSINE_EPS, NORMALIZE_EPS
from .functions.text import (
    C4_MIN_LINE_WORDS,
    C4_MIN_LINES,
    GOPHER_STOPWORDS,
)

# ---------------------------------------------------------------------------
# SQL spellings (Spark dialect). NOTE on regexes: inside a Spark SQL
# single-quoted literal a backslash escapes, so the SQL text needs
# ``'\\s+'`` to mean the regex \s+ — in these Python strings that is a
# doubled backslash.
# ---------------------------------------------------------------------------

# true whitespace trim (tabs/newlines too — SQL trim() is space-only)
_WS_TRIM = "regexp_replace({x}, '^\\\\s+|\\\\s+$', '')"


def _helper_defs() -> "list[tuple[str, str]]":
    """(name, CREATE ... sql) for the shared internal helpers. Public
    functions call these by name — SQL UDF bodies resolve other
    temporary functions at invocation time, so composition works."""
    trim = _WS_TRIM.format(x="t")
    return [
        (
            "cavde_dot",
            """CREATE OR REPLACE TEMPORARY FUNCTION cavde_dot(
                   a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
               RETURN aggregate(zip_with(a, b, (x, y) -> x * y),
                                CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""",
        ),
        (
            "cavde_norm_sq",
            """CREATE OR REPLACE TEMPORARY FUNCTION cavde_norm_sq(
                   a ARRAY<DOUBLE>) RETURNS DOUBLE
               RETURN aggregate(transform(a, x -> x * x),
                                CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""",
        ),
        (
            "cavde_ws_trim",
            f"""CREATE OR REPLACE TEMPORARY FUNCTION cavde_ws_trim(
                    t STRING) RETURNS STRING
                RETURN {trim}""",
        ),
        (
            "cavde_lines",
            # trimmed lines of the raw page (gopher/C4 line accounting).
            # NB the trim is INLINED, not cavde_ws_trim(x): Spark 4.1's
            # SQL-UDF inliner cannot resolve a SQL UDF applied to a
            # lambda variable (MISSING_ATTRIBUTES on x)
            f"""CREATE OR REPLACE TEMPORARY FUNCTION cavde_lines(
                    t STRING) RETURNS ARRAY<STRING>
                RETURN transform(split(t, chr(10)),
                                 x -> {_WS_TRIM.format(x='x')})""",
        ),
        (
            "cavde_words",
            """CREATE OR REPLACE TEMPORARY FUNCTION cavde_words(
                   t STRING) RETURNS ARRAY<STRING>
               RETURN split(cavde_ws_trim(t), '\\\\s+')""",
        ),
        (
            "cavde_n_words",
            # the empty-string guard: split('') yields [''] otherwise
            """CREATE OR REPLACE TEMPORARY FUNCTION cavde_n_words(
                   t STRING) RETURNS INT
               RETURN CASE WHEN length(cavde_ws_trim(t)) = 0 THEN 0
                           ELSE size(cavde_words(t)) END""",
        ),
        (
            "cavde_c4_lines",
            # C4 surviving lines: ends in terminal punct, >= 5 words,
            # no 'javascript' (functions/text.py:_c4_line_pred)
            f"""CREATE OR REPLACE TEMPORARY FUNCTION cavde_c4_lines(
                    t STRING) RETURNS ARRAY<STRING>
                RETURN filter(cavde_lines(t),
                    x -> x RLIKE '[.!?"\\']$'
                         AND size(split(x, '\\\\s+')) >= {C4_MIN_LINE_WORDS}
                         AND NOT contains(lower(x), 'javascript'))""",
        ),
        (
            "cavde_norm_text",
            # normalized_text_expr: lower, space-trim, collapse runs
            """CREATE OR REPLACE TEMPORARY FUNCTION cavde_norm_text(
                   t STRING) RETURNS STRING
               RETURN regexp_replace(lower(trim(t)), '\\\\s+', ' ')""",
        ),
    ]


def _public_defs() -> "list[tuple[str, str]]":
    cos_eps = repr(COSINE_EPS)
    nrm_eps = repr(NORMALIZE_EPS)
    sw_sum = " + ".join(
        "CAST(array_contains(transform(cavde_words(t), w -> lower(w)), "
        f"'{s}') AS INT)"
        for s in GOPHER_STOPWORDS
    )
    # duplicate-line accounting over non-empty trimmed lines
    lines_ne = "filter(cavde_lines(t), x -> x != '')"
    n_chars = "length(regexp_replace(t, '\\\\s+', ''))"
    gopher_body = f"""
        cavde_n_words(t) >= 50 AND cavde_n_words(t) <= 100000
        AND cavde_n_words(t) > 0
        AND {n_chars} >= 3 * cavde_n_words(t)
        AND {n_chars} <= 10 * cavde_n_words(t)
        AND 30 * (length(t) - length(replace(t, '#', '')))
            + 10 * (length(t) - length(replace(t, '...', '')))
            <= 3 * cavde_n_words(t)
        AND 10 * size(filter(cavde_lines(t), x -> x RLIKE '^[-*•]'))
            <= 9 * size(cavde_lines(t))
        AND 10 * size(filter(cavde_lines(t), x -> x RLIKE '\\\\.\\\\.\\\\.$'))
            <= 3 * size(cavde_lines(t))
        AND 5 * size(filter(cavde_words(t), w -> w RLIKE '[a-zA-Z]'))
            >= 4 * cavde_n_words(t)
        AND ({sw_sum}) >= 2
        AND 10 * (size({lines_ne}) - size(array_distinct({lines_ne})))
            <= 3 * size({lines_ne})
        AND 5 * (length(array_join({lines_ne}, ''))
                 - length(array_join(array_distinct({lines_ne}), '')))
            <= length(array_join({lines_ne}, ''))
    """
    return [
        (
            "l2_sq",
            # S1: squared L2, no sqrt (engine/kernels.cuh:36-47)
            """CREATE OR REPLACE TEMPORARY FUNCTION l2_sq(
                   a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
               RETURN aggregate(
                   zip_with(a, b, (x, y) -> (x - y) * (x - y)),
                   CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""",
        ),
        (
            "vec_dot",
            """CREATE OR REPLACE TEMPORARY FUNCTION vec_dot(
                   a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
               RETURN cavde_dot(a, b)""",
        ),
        (
            "neg_ip",
            # S2: negated inner product (engine/kernels.cuh:50-60)
            """CREATE OR REPLACE TEMPORARY FUNCTION neg_ip(
                   a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
               RETURN -cavde_dot(a, b)""",
        ),
        (
            "cosine_dist",
            # S3: 1 - cos with the reference's eps (engine/kernels.cuh:76)
            f"""CREATE OR REPLACE TEMPORARY FUNCTION cosine_dist(
                    a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
                RETURN CAST(1.0 AS DOUBLE) - cavde_dot(a, b)
                       / (sqrt(cavde_norm_sq(a)) * sqrt(cavde_norm_sq(b))
                          + {cos_eps})""",
        ),
        (
            "l2_normalize",
            # S4: v/sqrt(||v||^2+eps), float out (kernels.cuh:357-385)
            f"""CREATE OR REPLACE TEMPORARY FUNCTION l2_normalize(
                    a ARRAY<DOUBLE>) RETURNS ARRAY<FLOAT>
                RETURN transform(a, x -> CAST(
                    x * (CAST(1.0 AS DOUBLE)
                         / sqrt(cavde_norm_sq(a) + {nrm_eps})) AS FLOAT))""",
        ),
        (
            "token_count",
            """CREATE OR REPLACE TEMPORARY FUNCTION token_count(
                   t STRING) RETURNS INT
               RETURN CASE WHEN length(trim(t)) = 0 THEN 0
                           ELSE size(split(trim(t), '\\\\s+')) END""",
        ),
        (
            "quality_score",
            # LEAST(1, tokens/100) * (1 - non_alpha_ratio)
            """CREATE OR REPLACE TEMPORARY FUNCTION quality_score(
                   t STRING) RETURNS DOUBLE
               RETURN least(CAST(1.0 AS DOUBLE),
                            CAST(token_count(t) AS DOUBLE) / 100.0)
                      * (CAST(1.0 AS DOUBLE)
                         - CASE WHEN length(lower(t)) = 0
                                THEN CAST(0.0 AS DOUBLE)
                                ELSE CAST(length(regexp_replace(
                                         lower(t), '[a-z ]', '')) AS DOUBLE)
                                     / length(lower(t)) END)""",
        ),
        (
            "doc_fingerprint",
            """CREATE OR REPLACE TEMPORARY FUNCTION doc_fingerprint(
                   t STRING) RETURNS STRING
               RETURN md5(cavde_norm_text(t))""",
        ),
        (
            "content_hash64",
            """CREATE OR REPLACE TEMPORARY FUNCTION content_hash64(
                   t STRING) RETURNS BIGINT
               RETURN xxhash64(cavde_norm_text(t))""",
        ),
        (
            "canonical_url",
            f"""CREATE OR REPLACE TEMPORARY FUNCTION canonical_url(
                    u STRING) RETURNS STRING
                RETURN {U.canonical_url_sql('u', 'spark')}""",
        ),
        (
            "url_host",
            f"""CREATE OR REPLACE TEMPORARY FUNCTION url_host(
                    u STRING) RETURNS STRING
                RETURN {U.url_host_sql('u', 'spark')}""",
        ),
        (
            "url_domain",
            f"""CREATE OR REPLACE TEMPORARY FUNCTION url_domain(
                    u STRING) RETURNS STRING
                RETURN {U.registrable_domain_sql(U.url_host_sql('u', 'spark'), 'spark')}""",
        ),
        (
            "c4_clean_text",
            """CREATE OR REPLACE TEMPORARY FUNCTION c4_clean_text(
                   t STRING) RETURNS STRING
               RETURN array_join(cavde_c4_lines(t), chr(10))""",
        ),
        (
            "c4_keep",
            f"""CREATE OR REPLACE TEMPORARY FUNCTION c4_keep(
                    t STRING) RETURNS BOOLEAN
                RETURN size(cavde_c4_lines(t)) >= {C4_MIN_LINES}
                       AND NOT contains(lower(t), 'lorem ipsum')
                       AND NOT contains(t, chr(123))""",
        ),
        (
            "gopher_keep",
            f"""CREATE OR REPLACE TEMPORARY FUNCTION gopher_keep(
                    t STRING) RETURNS BOOLEAN
                RETURN {gopher_body}""",
        ),
    ]


#: every name register_sql() creates (helpers first — bodies reference them)
SQL_FUNCTIONS: "tuple[str, ...]" = tuple(
    name for name, _ in _helper_defs() + _public_defs()
)


def register_sql(spark: SparkSession) -> "list[str]":
    """Register the full SQL function surface on ``spark``; idempotent
    (CREATE OR REPLACE). Returns the registered names."""
    names = []
    for name, ddl in _helper_defs() + _public_defs():
        spark.sql(ddl)
        names.append(name)
    return names


def register_index_views(
    spark: SparkSession,
    index,
    prefix: str = "cavde",
) -> "dict[str, str]":
    """Temp views over an IVFIndex handle (ACTIVE epoch unless the handle
    pins one): ``<prefix>_vectors`` (id, vector, list_id) and
    ``<prefix>_centroids`` (list_id, centroid) — with :func:`register_sql`
    this makes the §2.7 shapes runnable verbatim, e.g.::

        SELECT id, l2_sq(vector, (SELECT vector FROM cavde_vectors
                                  WHERE id = 0)) AS dist
        FROM cavde_vectors ORDER BY dist LIMIT 10

    and the nprobe-pruned form by joining ``<prefix>_centroids`` first.
    Views are lazy pointers at the epoch's parquet: list_id partition
    pruning and column pruning flow through them unchanged."""
    vname, cname = f"{prefix}_vectors", f"{prefix}_centroids"
    index.vectors.createOrReplaceTempView(vname)
    rows = [
        (int(i), [float(x) for x in c]) for i, c in enumerate(index.centroids)
    ]
    spark.createDataFrame(
        rows, "list_id int, centroid array<double>"
    ).createOrReplaceTempView(cname)
    return {"vectors": vname, "centroids": cname}
