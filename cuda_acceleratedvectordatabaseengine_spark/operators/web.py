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
