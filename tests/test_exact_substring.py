"""Exact substring dedup (Lee et al. 2022 ExactSubstr) — differential
tests against a brute-force Python reference, plus the documented
relation to the window-mass approximation (duplicated_span_stats).

The distributed algorithm relies on the window equivalence: a position
lies in a repeated substring of >= L tokens iff some repeated length-L
window covers it.  The brute reference here checks that claim directly
by enumerating ALL substrings of length >= L.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cuda_acceleratedvectordatabaseengine_spark.operators import dedup


def brute_covered_positions(docs: dict[str, str], min_len: int):
    """Token positions inside ANY substring of >= min_len tokens that
    occurs >= 2 times in the corpus (across or within documents) —
    enumerated directly, no window trick."""
    toks = {d: t.lower().split() for d, t in docs.items()}
    from collections import Counter

    # occurrence count of every length-min_len window (a substring of
    # length M >= L is repeated iff one of its L-windows repeats at the
    # matching alignment; enumerating L-windows IS the brute force for
    # coverage — but to be independent of the production shortcut we
    # enumerate all lengths up to the longest doc)
    cover: dict[str, set[int]] = {d: set() for d in docs}
    maxlen = max((len(t) for t in toks.values()), default=0)
    for L in range(min_len, maxlen + 1):
        cnt = Counter()
        for t in toks.values():
            for i in range(len(t) - L + 1):
                cnt[tuple(t[i : i + L])] += 1
        hit = False
        for d, t in toks.items():
            for i in range(len(t) - L + 1):
                if cnt[tuple(t[i : i + L])] >= 2:
                    cover[d].update(range(i, i + L))
                    hit = True
        if not hit:  # no repeated substring this long -> none longer
            break
    return cover


def spans_from_cover(cover: set[int]):
    spans, cur = [], None
    for p in sorted(cover):
        if cur and p == cur[1]:
            cur[1] = p + 1
        else:
            cur = [p, p + 1]
            spans.append(cur)
    return [(a, b) for a, b in spans]


FIXTURE = {
    # d0/d1 share an 8-token run; d2 repeats one internally; d3 clean;
    # d4 has two overlapping repeats that must merge into one span;
    # d5 shares a 7-token run with d6 (below L=8 -> must NOT be flagged)
    "d0": "alpha beta gamma delta epsilon zeta eta theta unique0 tail0",
    "d1": "head1 alpha beta gamma delta epsilon zeta eta theta tail1",
    "d2": (
        "x0 rep one two three four five six seven x1 "
        "rep one two three four five six seven x2"
    ),
    "d3": "only singular tokens appear here nothing repeats at all ever",
    "d4": (
        "p q r s t u v w x y z filler "
        "p q r s t u v w x y z trailer"
    ),
    "d5": "m1 m2 m3 m4 m5 m6 m7 distinct5 pad5a pad5b",
    "d6": "m1 m2 m3 m4 m5 m6 m7 distinct6 pad6a pad6b",
}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(k, v) for k, v in FIXTURE.items()], ["doc_id", "text"]
    )


def test_spans_match_brute_force(spark, docs):
    got = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in dedup.exact_duplicated_spans(docs, min_len=8).collect()
    }
    cover = brute_covered_positions(FIXTURE, 8)
    # d4: the repeated 11-token run appears twice; overlapping windows
    # merge into ONE maximal span per occurrence region
    for d, c in cover.items():
        expect = spans_from_cover(c)
        if not expect:
            assert d not in got, f"{d} should have no spans"
    # every covered position is inside a reported span and vice versa
    all_spans = {}
    for r in dedup.exact_duplicated_spans(docs, min_len=8).collect():
        all_spans.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    for d in FIXTURE:
        got_pos = set()
        for a, b in all_spans.get(d, []):
            got_pos.update(range(a, b))
        assert got_pos == cover[d], f"{d}: {got_pos} != {cover[d]}"


def test_spans_are_maximal_and_disjoint(spark, docs):
    rows = dedup.exact_duplicated_spans(docs, min_len=8).collect()
    per = {}
    for r in rows:
        per.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    for d, spans in per.items():
        spans.sort()
        for (a1, b1), (a2, b2) in zip(spans, spans[1:]):
            assert b1 < a2, f"{d}: spans {spans} not disjoint/maximal"


def test_below_min_len_not_flagged(spark, docs):
    rows = dedup.exact_duplicated_spans(docs, min_len=8).collect()
    flagged = {r["doc_id"] for r in rows}
    assert "d5" not in flagged and "d6" not in flagged  # 7-token share
    assert "d3" not in flagged


def test_stats_cover_all_docs_and_agree_with_spans(spark, docs):
    stats = {
        r["doc_id"]: r
        for r in dedup.exact_substring_stats(docs, min_len=8).collect()
    }
    assert set(stats) == set(FIXTURE)  # 0-coverage docs included
    cover = brute_covered_positions(FIXTURE, 8)
    for d, r in stats.items():
        assert r["dup_tokens"] == len(cover[d])
        assert r["total_tokens"] == len(FIXTURE[d].split())
        if r["total_tokens"]:
            assert r["dup_ratio"] == pytest.approx(
                len(cover[d]) / r["total_tokens"]
            )


def test_trim_removes_exactly_covered_positions(spark, docs):
    out = {
        r["doc_id"]: r
        for r in dedup.trim_duplicated_spans(docs, min_len=8).collect()
    }
    cover = brute_covered_positions(FIXTURE, 8)
    for d, text in FIXTURE.items():
        toks = text.lower().split()
        kept = [t for i, t in enumerate(toks) if i not in cover[d]]
        assert out[d]["text"] == " ".join(kept)
        assert out[d]["removed_tokens"] == len(cover[d])


def test_trim_preserves_other_columns(spark):
    df = spark.createDataFrame(
        [("a", "w1 w2", 7), ("b", "w1 w3", 9)], ["doc_id", "text", "meta"]
    )
    out = dedup.trim_duplicated_spans(df, min_len=8)
    assert set(out.columns) == {"doc_id", "text", "meta", "removed_tokens"}
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows["a"]["meta"] == 7 and rows["b"]["meta"] == 9
    assert rows["a"]["text"] == "w1 w2"  # nothing >= 8 tokens repeats


def test_trim_empty_and_fully_duplicated_docs(spark):
    eight = "c1 c2 c3 c4 c5 c6 c7 c8"
    df = spark.createDataFrame(
        [("e", ""), ("f", eight), ("g", eight)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in dedup.trim_duplicated_spans(
        df, min_len=8).collect()}
    assert out["e"]["text"] == "" and out["e"]["removed_tokens"] == 0
    # f and g are each ONE duplicated 8-token window -> fully trimmed
    assert out["f"]["text"] == "" and out["f"]["removed_tokens"] == 8
    assert out["g"]["text"] == "" and out["g"]["removed_tokens"] == 8


def test_window_mass_vs_exact_coverage_relation(spark, docs):
    """The documented recall relation: a document's window-mass dup share
    is nonzero iff its exact coverage is nonzero (same window table), and
    exact coverage >= the count of duplicated windows' distinct start
    positions (each dup window contributes >= 1 new covered token)."""
    approx = {
        r["doc_id"]: r
        for r in dedup.duplicated_span_stats(docs, n=8).collect()
    }
    exact = {
        r["doc_id"]: r
        for r in dedup.exact_substring_stats(docs, min_len=8).collect()
    }
    for d in FIXTURE:
        a_dup = approx[d]["dup_spans"] if d in approx else 0
        e_dup = exact[d]["dup_tokens"]
        assert (a_dup > 0) == (e_dup > 0)
        if a_dup:
            # coverage of k duplicated windows of length 8 is in
            # [k+7, 8k] (distinct starts per island; islands disjoint)
            assert a_dup + 7 <= e_dup <= 8 * a_dup
