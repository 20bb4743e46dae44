"""URL canonicalization: the twin-dialect contract (functions/urls.py).

The load-bearing property is that the Spark and DuckDB spellings of the
chain compute the IDENTICAL canonical form — that is what makes
web_url_dedup an exact value-match row — so the core test runs BOTH
engines over the same adversarial literal URLs and diffs the outputs.
"""
from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cuda_acceleratedvectordatabaseengine_spark.functions import urls as U
from cuda_acceleratedvectordatabaseengine_spark.operators import dedup

CASES = [
    # (raw, expected canonical)
    ("http://example.com/path", "http://example.com/path"),
    ("HTTP://Example.COM/path", "http://example.com/path"),
    ("http://example.com:80/path", "http://example.com/path"),
    ("https://example.com:443/path", "https://example.com/path"),
    ("http://example.com:8080/path", "http://example.com:8080/path"),
    ("https://example.com:80/path", "https://example.com:80/path"),
    ("http://example.com/path#frag", "http://example.com/path"),
    ("http://example.com/path/", "http://example.com/path"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/", "http://example.com/"),
    ("http://example.com///", "http://example.com/"),
    ("http://example.com/CaseKept/Path", "http://example.com/CaseKept/Path"),
    ("http://example.com/p?b=2&a=1", "http://example.com/p?a=1&b=2"),
    ("http://example.com/p?a=1&b=2", "http://example.com/p?a=1&b=2"),
    (
        "http://example.com/p?utm_source=x&a=1&fbclid=22&gclid=3",
        "http://example.com/p?a=1",
    ),
    ("http://example.com/p?utm_source=x", "http://example.com/p"),
    # key-boundary anchoring: fbclid/gclid strip only as the WHOLE key —
    # 'gclid2' / 'fbclids' are distinct params and must survive (bare
    # 'fbclid' with no '=' still strips).
    (
        "http://example.com/p?gclid2=x&fbclids=y&fbclid&gclid=z",
        "http://example.com/p?fbclids=y&gclid2=x",
    ),
    ("http://example.com/p?", "http://example.com/p"),
    ("http://example.com?a=1", "http://example.com/?a=1"),
    ("  http://example.com/p  ", "http://example.com/p"),
    ("http://example.com/p?flag&a=1", "http://example.com/p?a=1&flag"),
    (
        "http://example.com/a%2Fb?x=%20Y",
        "http://example.com/a%2Fb?x=%20Y",  # percent-encoding untouched
    ),
]


def test_spark_expr_hand_cases(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)], "i long, url string")
    got = {
        r["i"]: r["cu"]
        for r in df.select("i", U.canonical_url_expr("url").alias("cu")).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"spark: {raw!r} -> {got[i]!r}, want {want!r}"


def test_duckdb_dialect_matches_spark(spark):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE u AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{u}')" for i, (u, _) in enumerate(CASES))
        + ") t(i, url)"
    )
    duck = dict(
        con.execute(
            f"SELECT i, {U.canonical_url_sql('url', 'duckdb')} FROM u"
        ).fetchall()
    )
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)], "i long, url string")
    sp = {
        r["i"]: r["cu"]
        for r in df.select("i", U.canonical_url_expr("url").alias("cu")).collect()
    }
    assert duck == sp


def test_canonical_url_sql_validation():
    with pytest.raises(ValueError, match="dialect"):
        U.canonical_url_sql("url", "postgres")


def test_url_duplicate_stats_and_dedup_by_url(spark):
    rows = [
        (0, "http://a.com/x"),
        (1, "HTTP://A.COM:80/x/"),          # same canonical as 0
        (2, "http://a.com/x?utm_source=f"),  # same canonical as 0
        (3, "http://a.com/y?b=2&a=1"),
        (4, "http://a.com/y?a=1&b=2"),       # same canonical as 3
        (5, "http://b.com/z"),               # unique
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    groups = {
        r["canonical_url"]: (r["n_urls"], r["n_raw_forms"])
        for r in dedup.url_duplicate_stats(df).collect()
    }
    assert groups == {
        "http://a.com/x": (3, 3),
        "http://a.com/y?a=1&b=2": (2, 2),
    }
    kept = sorted(
        r["doc_id"] for r in dedup.dedup_by_url(df).select("doc_id").collect()
    )
    assert kept == [0, 3, 5]
    # survivors keep their original columns untouched
    assert dedup.dedup_by_url(df).columns == ["doc_id", "url"]


# -- registrable domains + blocklist (operators/web.py) ----------------------

DOMAIN_CASES = [
    ("http://example.com/p", "example.com", "example.com"),
    ("http://WWW.Example.COM/p", "www.example.com", "example.com"),
    ("http://a.b.example.com/p", "a.b.example.com", "example.com"),
    ("http://news.bbc.co.uk/p", "news.bbc.co.uk", "bbc.co.uk"),
    ("http://bbc.co.uk/p", "bbc.co.uk", "bbc.co.uk"),
    ("http://co.uk/p", "co.uk", "co.uk"),
    ("http://x.ac.jp/p", "x.ac.jp", "x.ac.jp"),
    ("http://sub.x.com.au/p", "sub.x.com.au", "x.com.au"),
    ("http://x.company.de/p", "x.company.de", "company.de"),
    ("http://192.168.0.1:8080/p", "192.168.0.1", "192.168.0.1"),
    ("http://intranet/p", "intranet", "intranet"),
    ("https://host.example.org:443/p#f", "host.example.org", "example.org"),
]


def test_domain_hand_cases_both_engines(spark):
    import duckdb as dk

    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(DOMAIN_CASES)],
        "i long, url string",
    )
    sp = {
        r["i"]: (r["h"], r["d"])
        for r in df.select(
            "i",
            U.url_host_expr("url").alias("h"),
            U.url_domain_expr("url").alias("d"),
        ).collect()
    }
    con = dk.connect()
    con.execute("CREATE TABLE u(i BIGINT, url VARCHAR)")
    con.executemany(
        "INSERT INTO u VALUES (?, ?)",
        [(i, u) for i, (u, _, _) in enumerate(DOMAIN_CASES)],
    )
    du = {
        i: (h, d)
        for i, h, d in con.execute(
            f"SELECT i, {U.url_host_sql('url', 'duckdb')},"
            f" {U.url_domain_sql('url', 'duckdb')} FROM u"
        ).fetchall()
    }
    for i, (raw, host, dom) in enumerate(DOMAIN_CASES):
        assert sp[i] == (host, dom), f"spark: {raw}"
        assert du[i] == (host, dom), f"duckdb: {raw}"


def test_filter_domain_blocklist_both_paths(spark):
    from cuda_acceleratedvectordatabaseengine_spark.operators import web

    rows = [
        (0, "http://spam.example.com/x"),
        (1, "http://good.org/x"),
        (2, "http://sub.spam.example.com/y"),  # same registrable domain
        (3, "http://ham.co.uk/z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    # literal IN path
    kept = sorted(
        r["doc_id"]
        for r in web.filter_domain_blocklist(df, ["example.com"]).collect()
    )
    assert kept == [1, 3]
    # broadcast anti-join path (DataFrame blocklist), same semantics
    bl = spark.createDataFrame([("example.com",)], "domain string")
    kept2 = sorted(
        r["doc_id"] for r in web.filter_domain_blocklist(df, bl).collect()
    )
    assert kept2 == [1, 3]
    # empty blocklist is the identity
    assert web.filter_domain_blocklist(df, []).count() == 4
    # columns untouched on survivors
    assert web.filter_domain_blocklist(df, bl).columns == ["doc_id", "url"]


def test_web_enrich_and_domain_stats(spark):
    from cuda_acceleratedvectordatabaseengine_spark.operators import web

    rows = [
        (0, "http://A.Example.com:80/x/"),
        (1, "http://b.example.com/x?utm_source=t"),
        (2, "http://b.example.com/x"),  # canonical-dup of 1
        (3, "http://other.org/y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    enr = web.web_enrich(df)
    assert {"canonical_url", "host", "domain"} <= set(enr.columns)
    stats = {
        r["domain"]: (r["n_urls"], r["n_hosts"], r["n_canonical"])
        for r in web.domain_stats(df).collect()
    }
    assert stats == {"example.com": (3, 2, 2), "other.org": (1, 1, 1)}
