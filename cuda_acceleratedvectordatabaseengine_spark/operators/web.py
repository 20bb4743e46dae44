"""Crawl-manifest operators: domain accounting and blocklist filtering.

The crawl-side stages that run BEFORE any payload read (they need only
the URL column): per-registrable-domain accounting feeds the domain-mix
planner (``sampling.domain_mix_plan`` with ``group_col='domain'``), and
blocklist filtering is the standard C4/RefinedWeb "bad domain" scrub.
No reference analog (the reference is a vector engine); north-star
crawl scope like functions/urls.py.

Scale posture: domain extraction is a pure-Catalyst scalar expression
(scan speed, plan-guarded with the other corpus gates); domain stats is
one hash-groupBy on a low-cardinality key; the blocklist filter is
either a literal IN-filter (small lists) or a broadcast anti-join
(DataFrame blocklists) — never a shuffle of the corpus side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import urls as U


def web_enrich(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add ``canonical_url``, ``host``, ``domain`` columns — the three
    crawl keys every downstream stage joins or groups on."""
    return df.withColumns(
        {
            "canonical_url": U.canonical_url_expr(url_col),
            "host": U.url_host_expr(url_col),
            "domain": U.url_domain_expr(url_col),
        }
    )


def domain_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-registrable-domain accounting over a crawl manifest:
    {domain, n_urls, n_hosts, n_canonical}. The n_urls column is the
    weight column for ``sampling.domain_mix_plan``; n_canonical vs
    n_urls exposes the URL-dedup opportunity per domain."""
    return (
        df.select(
            U.url_domain_expr(url_col).alias("domain"),
            U.url_host_expr(url_col).alias("host"),
            U.canonical_url_expr(url_col).alias("cu"),
        )
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("host").alias("n_hosts"),
            F.countDistinct("cu").alias("n_canonical"),
        )
    )


def filter_domain_blocklist(
    df: DataFrame,
    blocked,
    url_col: str = "url",
) -> DataFrame:
    """Drop rows whose registrable domain is blocklisted.

    ``blocked`` is either a small in-memory sequence of domains (compiled
    into a literal ``IN`` filter — no join at all) or a DataFrame with a
    ``domain`` column (broadcast LEFT ANTI join — the corpus side never
    shuffles; use this for real blocklists, which run to millions of
    rows)."""
    dom = U.url_domain_expr(url_col)
    if isinstance(blocked, DataFrame):
        keyed = df.withColumn("__dom", dom)
        out = keyed.join(
            F.broadcast(blocked.select(F.col("domain").alias("__dom"))),
            "__dom",
            "left_anti",
        )
        return out.drop("__dom")
    blocked = [str(b).lower() for b in blocked]
    if not blocked:
        return df
    return df.filter(~dom.isin(blocked))


def ingest_stats(
    manifest: DataFrame,
    blocked=(),
    url_col: str = "url",
    html_col: str = "html",
    id_col: str = "doc_id",
    pii_classes: "tuple[str, ...] | None" = None,
) -> DataFrame:
    """The crawl-side ingest funnel as ONE LAZY PLAN: raw manifest ->
    domain blocklist -> URL-level dedup -> HTML->lines extraction +
    C4 line cleaning (pages transform; failing pages drop) ->
    PII redaction (transforms, never drops) -> Gopher quality gate.
    Returns the per-stage accounting table
    (stage int, name string, n_docs long, n_tokens long).

    Unlike ``curation.curation_funnel`` (an eager EXECUTION verb with
    wall-clock attribution), this composes to a single DataFrame plan:
    nothing runs until an action, and the result re-derives from the
    manifest. n_tokens counts whitespace tokens of each stage's CURRENT
    text form — the raw HTML for the manifest stages, the extracted/
    cleaned text afterwards — so the extraction stage shows the
    boilerplate token drop, the redaction stage shows token-count moves
    at flat n_docs.

    Every stage is an already-oracled verb; the whole chain is pure
    Catalyst (plan-guarded with the other corpus gates), so at 100 TB
    each stage aggregate is a scan + map-side-combined count — the
    lineage is evaluated once per stage branch (cache the manifest
    upstream if the six branch scans matter)."""
    from ..functions import text as TXT

    def agg_of(i: int, name: str, df: DataFrame, col: str) -> DataFrame:
        tok = TXT.token_count_expr(col).cast("long")
        return df.agg(
            F.lit(i).cast("int").alias("stage"),
            F.lit(name).alias("name"),
            F.count("*").alias("n_docs"),
            F.coalesce(F.sum(tok), F.lit(0)).cast("long").alias("n_tokens"),
        )

    stages = ingest_chain(
        manifest,
        blocked,
        url_col=url_col,
        html_col=html_col,
        id_col=id_col,
        pii_classes=pii_classes,
    )
    out = None
    for i, (name, df, col) in enumerate(stages):
        a = agg_of(i, name, df, col)
        out = a if out is None else out.unionByName(a)
    return out


def ingest_chain(
    manifest: DataFrame,
    blocked=(),
    url_col: str = "url",
    html_col: str = "html",
    id_col: str = "doc_id",
    pii_classes: "tuple[str, ...] | None" = None,
) -> "list[tuple[str, DataFrame, str]]":
    """The six funnel stages as (name, frame, current-text-column)
    triples — the shared spine of ``ingest`` (the cleaned corpus) and
    ``ingest_stats`` (the attrition accounting)."""
    from ..functions import text as TXT
    from . import dedup as D
    from . import textops

    s1 = filter_domain_blocklist(manifest, blocked, url_col=url_col)
    s2 = D.dedup_by_url(s1, url_col=url_col, id_col=id_col)
    s3 = textops.c4_clean(
        s2.withColumn("text", TXT.html_to_lines_expr(html_col)),
        text_col="text",
        keep_only=True,
    ).drop("n_lines_kept")
    s4 = textops.pii_redact(
        s3, classes=tuple(pii_classes) if pii_classes else None
    ).drop("n_pii")
    s5 = textops.gopher_filter(s4)
    return [
        ("raw", manifest, html_col),
        ("blocklist", s1, html_col),
        ("url_dedup", s2, html_col),
        ("c4_extract", s3, "text"),
        ("pii_redact", s4, "text"),
        ("gopher", s5, "text"),
    ]


def ingest(
    manifest: DataFrame,
    blocked=(),
    url_col: str = "url",
    html_col: str = "html",
    id_col: str = "doc_id",
    pii_classes: "tuple[str, ...] | None" = None,
) -> DataFrame:
    """The CLEANED CORPUS the crawl funnel accepts: the final
    Gopher-kept frame, with ``text`` holding the extracted/C4-cleaned/
    PII-redacted form (the manifest's other columns ride along). Same
    lazy chain as ``ingest_stats`` — run both off one cached manifest
    when you need the corpus and its attrition accounting together."""
    return ingest_chain(
        manifest,
        blocked,
        url_col=url_col,
        html_col=html_col,
        id_col=id_col,
        pii_classes=pii_classes,
    )[-1][1]
