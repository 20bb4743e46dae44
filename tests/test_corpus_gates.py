"""C4 line-level cleaning + Gopher quality rules (functions/text.py,
operators/textops.py).

Three independent implementations must agree: the Spark Column chain,
the DuckDB oracle SQL, and a pure-Python reference written here from
the published rule statements (Raffel et al. 2020 §2.2; Rae et al. 2021
table A1). The battery includes texts firing each rule individually.
"""
from __future__ import annotations

import re

import duckdb
from pyspark.sql import functions as F

from cuda_acceleratedvectordatabaseengine_spark.functions import text as TXT
from cuda_acceleratedvectordatabaseengine_spark.operators import textops

GOOD = "One two three four five six seven words here."
SHORT = "Too short."
NOPUNCT = "five words but no terminal punctuation at all"
JS = "Please enable javascript to view this page content now."

C4_PAGES = [
    "\n".join([GOOD, GOOD, GOOD]),                      # keep: 3 lines
    "\n".join([GOOD, GOOD]),                            # drop: 2 lines
    "\n".join([GOOD, SHORT, GOOD, NOPUNCT, GOOD]),      # keep: 3 survive
    "\n".join([GOOD, JS, GOOD, GOOD]),                  # keep: js line drops
    "\n".join([GOOD, GOOD, GOOD, "code { body }"]),     # drop: brace
    "\n".join([GOOD, GOOD, GOOD, "We love Lorem Ipsum today, friends."]),
    "",                                                  # drop: empty
    "\n".join([GOOD + '"', GOOD[:-1] + "!", GOOD[:-1] + "?"]),  # punct set
    "  " + GOOD + "  \n" + GOOD + "\n\t" + GOOD,         # whitespace trim
]

GOPHER_TEXTS = [
    # passes everything: 56 words, normal lengths, stopwords present
    " ".join(["the quick brown fox jumps over to be of and that have"] * 5)
    + " with more plain text",
    "only ten words live here in this tiny document now",  # word_count fail
    " ".join(["a"] * 60),            # mean_word_length + stopwords fail
    " ".join(["the"] * 30 + ["supercalifragilisticexpialidocious"] * 30),
    " ".join(["the", "of"] * 30) + " ### ## # " + "... " * 9,  # symbols
    "\n".join(["- bullet line with the usual words of it"] * 10),  # bullets
    "\n".join(
        ["the end of this line trails off ..."] * 5
        + ["a normal line with the usual words of it"] * 5
    ),
    " ".join(["12345", "67890"] * 30),  # alpha_words + stopwords fail
    "",                                  # empty: every n>0 rule fails
    " ".join(["the", "be", "to", "of", "and", "words", "words", "words"] * 8),
    # dup_line_frac fail: the same line over and over
    "\n".join(["the usual words of it appear right here"] * 8
              + ["a unique closing line with the usual words of it"]),
    # dup_line_char_frac fail ONLY: one long line duplicated once among
    # many short distinct lines (1/9 dup lines passes 0.3; its chars
    # dominate and fail 0.2)
    "\n".join(
        ["the very long line with many of the usual words repeated here "
         "to make its character mass dominate the whole document easily"]
        * 2
        + [f"tiny line {i} of it" for i in range(7)]
    ),
]


def _ref_c4(page: str):
    lines = [ln.strip() for ln in page.split("\n")]
    kept = [
        ln
        for ln in lines
        if re.search(r"[.!?\"']$", ln)
        and len(re.split(r"\s+", ln)) >= TXT.C4_MIN_LINE_WORDS
        and "javascript" not in ln.lower()
    ]
    keep = (
        len(kept) >= TXT.C4_MIN_LINES
        and "lorem ipsum" not in page.lower()
        and "{" not in page
    )
    return "\n".join(kept), len(kept), keep


def _ref_gopher(t: str):
    tt = t.strip()
    words = re.split(r"\s+", tt) if tt else []
    n = len(words)
    chars = len(re.sub(r"\s+", "", t))
    lines = [ln.strip() for ln in t.split("\n")]
    nl = len(lines)
    n_bullet = sum(bool(re.match(r"^[-*•]", ln)) for ln in lines)
    n_ell = sum(bool(re.search(r"\.\.\.$", ln)) for ln in lines)
    n_hash = t.count("#")
    n_ell3 = len(t) - len(t.replace("...", ""))  # 3x the ellipsis count
    n_alpha = sum(bool(re.search(r"[a-zA-Z]", w)) for w in words)
    low = [w.lower() for w in words]
    n_sw = sum(1 for s in TXT.GOPHER_STOPWORDS if s in low)
    lines_ne = [ln for ln in lines if ln != ""]
    nl2, nd = len(lines_ne), len(set(lines_ne))
    ch_all = sum(len(ln) for ln in lines_ne)
    ch_dist = sum(len(ln) for ln in set(lines_ne))
    # integer cross-multiplied thresholds, same program as both engines
    return {
        "word_count": 50 <= n <= 100000,
        "mean_word_length": n > 0 and 3 * n <= chars <= 10 * n,
        "symbol_ratio": n > 0 and 30 * n_hash + 10 * n_ell3 <= 3 * n,
        "bullet_lines": 10 * n_bullet <= 9 * nl,
        "ellipsis_lines": 10 * n_ell <= 3 * nl,
        "alpha_words": n > 0 and 5 * n_alpha >= 4 * n,
        "stopwords": n_sw >= 2,
        "dup_line_frac": 10 * (nl2 - nd) <= 3 * nl2,
        "dup_line_char_frac": 5 * (ch_all - ch_dist) <= ch_all,
    }


def _duck_table(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, txt VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    return con


def test_c4_spark_matches_reference(spark):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(C4_PAGES)], "i long, txt string"
    )
    got = {
        r["i"]: (r["clean_text"], r["n_lines_kept"], r["c4_keep"])
        for r in textops.c4_clean(df, text_col="txt").collect()
    }
    for i, page in enumerate(C4_PAGES):
        assert got[i] == _ref_c4(page), f"page {i}: {page!r}"


def test_c4_duckdb_matches_reference():
    con = _duck_table(list(enumerate(C4_PAGES)))
    rows = con.execute(
        f"SELECT i, {TXT.c4_clean_text_oracle_sql('txt')},"
        f" length({TXT.c4_kept_lines_oracle_sql('txt')}),"
        f" {TXT.c4_keep_oracle_sql('txt')} FROM t"
    ).fetchall()
    for i, clean, n, keep in rows:
        assert (clean, n, keep) == _ref_c4(C4_PAGES[i]), f"page {i}"


def test_gopher_spark_matches_reference(spark):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(GOPHER_TEXTS)], "i long, txt string"
    )
    out = textops.gopher_rules(df, text_col="txt").collect()
    for r in out:
        want = _ref_gopher(GOPHER_TEXTS[r["i"]])
        got = {name: r[name] for name in TXT.GOPHER_RULES}
        assert got == want, f"text {r['i']}: {GOPHER_TEXTS[r['i']][:60]!r}"
        assert r["gopher_keep"] == all(want.values())
        assert r["failed_rules"] == ",".join(
            name for name in TXT.GOPHER_RULES if not want[name]
        )


def test_gopher_duckdb_matches_reference():
    con = _duck_table(list(enumerate(GOPHER_TEXTS)))
    cols = ", ".join(
        TXT.gopher_rule_oracle_sql("txt", r) for r in TXT.GOPHER_RULES
    )
    rows = con.execute(
        f"SELECT i, {cols}, {TXT.gopher_keep_oracle_sql('txt')} FROM t"
    ).fetchall()
    for row in rows:
        i, *vals = row
        want = _ref_gopher(GOPHER_TEXTS[i])
        got = dict(zip(TXT.GOPHER_RULES, vals[:-1]))
        assert got == want, f"text {i}"
        assert vals[-1] == all(want.values())


def test_rule_battery_covers_each_rule():
    """Every Gopher rule must FAIL on at least one battery text and PASS
    on at least one — otherwise the parity tests prove nothing for it."""
    per_rule = {r: set() for r in TXT.GOPHER_RULES}
    for t in GOPHER_TEXTS:
        for r, ok in _ref_gopher(t).items():
            per_rule[r].add(ok)
    for r, seen in per_rule.items():
        assert seen == {True, False}, f"rule {r} not exercised both ways"


def test_c4_keep_only_swaps_cleaned_text(spark):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(C4_PAGES)], "i long, txt string"
    )
    kept = textops.c4_clean(df, text_col="txt", keep_only=True)
    assert set(kept.columns) == {"i", "txt", "n_lines_kept"}
    got = {r["i"]: r["txt"] for r in kept.collect()}
    want = {
        i: _ref_c4(p)[0]
        for i, p in enumerate(C4_PAGES)
        if _ref_c4(p)[2]
    }
    assert got == want


def test_gopher_filter_matches_keep(spark):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(GOPHER_TEXTS)], "i long, txt string"
    )
    kept = sorted(
        r["i"] for r in textops.gopher_filter(df, text_col="txt").collect()
    )
    want = sorted(
        i
        for i, t in enumerate(GOPHER_TEXTS)
        if all(_ref_gopher(t).values())
    )
    assert kept == want


# -- block-aware HTML -> lines + the web ingest funnel ------------------------

HTML_CASES = [
    (
        "<html><body><h1>Title goes here for the page now.</h1>"
        "<p>First paragraph has plenty of words to keep around.</p>"
        "<p>Second &amp; final paragraph also has enough words here.</p>"
        "<script>var x=1;</script><div>Menu</div></body></html>",
        "Title goes here for the page now.\n"
        "First paragraph has plenty of words to keep around.\n"
        "Second & final paragraph also has enough words here.\n"
        "Menu",
    ),
    # <br> breaks a line; inline tags do not
    (
        "<p>alpha <b>bold</b> beta<br>gamma delta</p>",
        "alpha bold beta\ngamma delta",
    ),
    # empty lines from consecutive blocks collapse away
    ("<p></p><p>only line</p><div></div>", "only line"),
    ("", ""),
    # entity decoding happens after tag stripping
    ("<p>&lt;p&gt; stays literal</p>", "<p> stays literal"),
]


def test_html_to_lines_both_engines(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(HTML_CASES)], "i long, txt string"
    )
    sp = {
        r["i"]: r["t"]
        for r in df.select(
            "i", TXT.html_to_lines_expr("txt").alias("t")
        ).collect()
    }
    con = _duck_table([(i, h) for i, (h, _) in enumerate(HTML_CASES)])
    du = dict(
        con.execute(
            f"SELECT i, {TXT.html_to_lines_oracle_sql('txt')} FROM t"
        ).fetchall()
    )
    for i, (html, want) in enumerate(HTML_CASES):
        assert sp[i] == want, f"spark case {i}: {html[:50]!r}"
        assert du[i] == want, f"duckdb case {i}: {html[:50]!r}"


def test_web_ingest_stats_attrition(spark):
    from cuda_acceleratedvectordatabaseengine_spark.operators import web

    page = (
        "<h1>The story about all of it begins right now.</h1>"
        "<p>The quick brown fox jumps over the lazy dog to be sure.</p>"
        "<p>We have more words with the usual stopwords of and to be "
        "here now today my friends in this very fine place indeed with "
        "plenty of extra words to clear the gopher minimum threshold "
        "for sure so that this document passes every single rule.</p>"
    )
    rows = [
        (0, "http://ok.com/a", page),
        (1, "http://ok.com/a?utm_source=x", page),   # canonical dup of 0
        (2, "http://spam.bad.com/b", page),          # blocklisted
        (3, "http://ok.com/c", "<p>tiny page.</p>"), # C4 drops (1 line)
        (4, "http://ok.com/d", page + "<p>Email me at a@b.co today for "
            "all the details of it.</p>"),           # PII redacted
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, html string")
    got = {
        r["name"]: (r["stage"], r["n_docs"])
        for r in web.ingest_stats(df, blocked=["bad.com"]).collect()
    }
    assert [n for n, (s, _) in sorted(got.items(), key=lambda kv: kv[1][0])] == [
        "raw", "blocklist", "url_dedup", "c4_extract", "pii_redact", "gopher"
    ]
    assert got["raw"][1] == 5
    assert got["blocklist"][1] == 4      # doc 2 dropped
    assert got["url_dedup"][1] == 3      # doc 1 folded into doc 0
    assert got["c4_extract"][1] == 2     # doc 3 dropped (one line)
    assert got["pii_redact"][1] == 2     # transforms, never drops
    assert got["gopher"][1] == 2         # both survivors pass
    # the email is actually gone from doc 4's final text
    final = web.ingest_stats(df, blocked=["bad.com"])  # recompute is lazy
    assert final.filter(F.col("name") == "pii_redact").count() == 1


# -- corpus-level boilerplate line removal ------------------------------------


def test_remove_boilerplate_lines(spark):
    cookie = "Cookie Notice: We Use Cookies."
    rows = [
        (0, f"{cookie}\nalpha body zero\nfooter menu"),
        (1, f"{cookie}\nbeta body one\nfooter menu"),
        (2, f"  cookie notice:   we use COOKIES.\ngamma body two\nfooter menu"),
        (3, "delta body three\nunique closing line"),
        (4, cookie),  # every line is boilerplate -> survives empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in textops.remove_boilerplate_lines(df, min_docs=3).collect()
    }
    # cookie variants normalize to one key seen in docs 0,1,2,4 (>=3);
    # 'footer menu' seen in docs 0,1,2 (==3); body lines are unique
    assert got == {
        0: "alpha body zero",
        1: "beta body one",
        2: "gamma body two",
        3: "delta body three\nunique closing line",
        4: "",
    }
    # order preserved when multiple lines survive (doc 3), and the
    # operator keeps all other columns / the full doc set
    assert sorted(got) == [0, 1, 2, 3, 4]


def test_remove_boilerplate_threshold_edge(spark):
    rows = [
        (0, "shared line\nkeep zero"),
        (1, "shared line\nkeep one"),
        (2, "solo two"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # min_docs=3: 'shared line' appears in only 2 docs -> kept everywhere
    got3 = {
        r["doc_id"]: r["text"]
        for r in textops.remove_boilerplate_lines(df, min_docs=3).collect()
    }
    assert got3[0] == "shared line\nkeep zero"
    # min_docs=2: now it is boilerplate
    got2 = {
        r["doc_id"]: r["text"]
        for r in textops.remove_boilerplate_lines(df, min_docs=2).collect()
    }
    assert got2 == {0: "keep zero", 1: "keep one", 2: "solo two"}


# -- Gopher n-gram repetition rules -------------------------------------------


def _ref_ngram(t: str):
    tt = t.strip().lower()
    words = re.split(r"\s+", tt) if tt else []
    out = {}
    for name, (n, thr, kind) in textops.GOPHER_NGRAM_RULES.items():
        grams = [
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        ]
        if not grams:
            out[name] = True
            continue
        counts = {}
        for g in grams:
            counts[g] = counts.get(g, 0) + 1
        total = len(grams)
        mass = (
            max(counts.values())
            if kind == "top"
            else total - len(counts)
        )
        out[name] = 100 * mass <= thr * total
    return out


NGRAM_TEXTS = [
    "buy now " * 12 + "and some other words to close it",   # top2g fails
    "the same long seven word phrase again and again " * 3,  # dup5-10 fail
    "all distinct words here with no repeats at any scale",  # all pass
    "",                                                       # empty: pass
    "short one",                                              # no 3+-grams
]


def test_gopher_ngram_rules_matches_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(NGRAM_TEXTS)], "i long, txt string"
    )
    got = {
        r["i"]: {k: r[k] for k in textops.GOPHER_NGRAM_RULES}
        for r in textops.gopher_ngram_rules(
            df, text_col="txt", id_col="i"
        ).collect()
    }
    hit_false = False
    for i, t in enumerate(NGRAM_TEXTS):
        want = _ref_ngram(t)
        assert got[i] == want, f"text {i}: {t[:50]!r}"
        hit_false |= not all(want.values())
    assert hit_false, "battery never fails a rule — proves nothing"


def test_gopher_ngram_keep_and_columns(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(NGRAM_TEXTS)], "i long, txt string"
    )
    out = textops.gopher_ngram_rules(df, text_col="txt", id_col="i")
    rows = {r["i"]: r for r in out.collect()}
    for i in rows:
        want = all(_ref_ngram(NGRAM_TEXTS[i]).values())
        assert rows[i]["ngram_keep"] == want
    # original columns survive the join
    assert {"i", "txt"} <= set(out.columns)


def test_staged_gopher_equals_expression_form(spark, sf_dir):
    """The staged operator form must be bit-identical to the single-
    expression twin (gopher_rules_expr) the DuckDB oracles mirror —
    over the adversarial battery AND real corpus documents."""
    battery = spark.createDataFrame(
        [(i, t) for i, t in enumerate(GOPHER_TEXTS)], "doc_id long, text string"
    )
    from cuda_acceleratedvectordatabaseengine_spark.sources import tables

    real = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    for df in (battery, real):
        exprs = TXT.gopher_rules_expr("text")
        want = {
            r["doc_id"]: tuple(r[n] for n in TXT.GOPHER_RULES)
            for r in df.select(
                "doc_id", *[exprs[n].alias(n) for n in TXT.GOPHER_RULES]
            ).collect()
        }
        got_rows = textops.gopher_rules(df).collect()
        got = {
            r["doc_id"]: tuple(r[n] for n in TXT.GOPHER_RULES)
            for r in got_rows
        }
        assert got == want
        for r in got_rows:
            assert r["gopher_keep"] == all(want[r["doc_id"]])
        kept = {r["doc_id"] for r in textops.gopher_filter(df).collect()}
        assert kept == {i for i, v in want.items() if all(v)}


def test_web_ingest_returns_cleaned_corpus(spark):
    """web.ingest (r7) yields the actual cleaned frame — same chain as
    ingest_stats, so survivors/columns must be consistent with the
    funnel's final stage."""
    from cuda_acceleratedvectordatabaseengine_spark.operators import web

    page = (
        "<h1>The story about all of it begins right now.</h1>"
        "<p>The quick brown fox jumps over the lazy dog to be sure.</p>"
        "<p>We have more words with the usual stopwords of and to be "
        "here now today my friends in this very fine place indeed with "
        "plenty of extra words to clear the gopher minimum threshold "
        "for sure so that this document passes every single rule.</p>"
    )
    rows = [
        (0, "http://ok.com/a", page),
        (1, "http://ok.com/a?utm_source=x", page),
        (2, "http://spam.bad.com/b", page),
        (3, "http://ok.com/c", "<p>tiny page.</p>"),
        (4, "http://ok.com/d", page + "<p>Email me at a@b.co today for "
            "all the details of it.</p>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, html string")
    out = web.ingest(df, blocked=["bad.com"]).collect()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == [0, 4]  # matches ingest_stats' final gopher stage
    by_id = {r["doc_id"]: r for r in out}
    assert "text" in by_id[0].asDict()
    assert "<" not in by_id[0]["text"]          # HTML gone
    assert "a@b.co" not in by_id[4]["text"]     # PII redacted
    assert by_id[4]["url"] == "http://ok.com/d"  # manifest cols ride along
