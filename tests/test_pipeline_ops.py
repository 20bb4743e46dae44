"""decontam / sampling / repetition — the training-data hygiene operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cuda_acceleratedvectordatabaseengine_spark.operators import (
    decontam,
    sampling,
    textops,
)
from cuda_acceleratedvectordatabaseengine_spark.sources import tables


# -- decontamination --------------------------------------------------------


@pytest.fixture(scope="module")
def contam_docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "completely unrelated text about spark engines here"),
        # doc 10 contains ALL of doc 0's 3-grams (contaminated)
        (10, "prefix words the quick brown fox jumps over the lazy dog suffix"),
        # doc 11 shares a partial window with doc 0
        (11, "the quick brown fox sat still"),
        (12, "nothing in common at all whatsoever"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_report_containment(spark, contam_docs):
    bench = contam_docs.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    corpus = contam_docs.filter(F.col("doc_id") >= 10)
    rep = {
        (r["doc_id"], r["bench_id"]): (r["overlap"], r["containment"])
        for r in decontam.contamination_report(
            corpus, bench, n=3, min_containment=0.0
        ).collect()
    }
    # doc 0 has 7 distinct 3-grams, all inside doc 10
    assert rep[(10, 0)][0] == 7 and abs(rep[(10, 0)][1] - 1.0) < 1e-12
    # doc 11 shares exactly 2 of them ("the quick brown", "quick brown fox")
    assert rep[(11, 0)][0] == 2
    assert (12, 0) not in rep and (10, 1) not in rep


def test_decontaminate_drops_flagged(spark, contam_docs):
    bench = contam_docs.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    corpus = contam_docs.filter(F.col("doc_id") >= 10)
    kept = decontam.decontaminate(corpus, bench, n=3, min_containment=0.5)
    assert {r["doc_id"] for r in kept.collect()} == {11, 12}


def test_contamination_validation(spark, contam_docs):
    with pytest.raises(ValueError, match="min_containment"):
        decontam.contamination_report(contam_docs, contam_docs, min_containment=2.0)


# -- sampling ---------------------------------------------------------------


def test_sampling_deterministic_and_rate(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    a = sampling.weighted_sample(docs, F.lit(0.3), salt="s")
    b = sampling.weighted_sample(docs, F.lit(0.3), salt="s")
    ids_a = {r["doc_id"] for r in a.select("doc_id").collect()}
    ids_b = {r["doc_id"] for r in b.select("doc_id").collect()}
    assert ids_a == ids_b  # content-addressed: identical across runs
    n = docs.count()
    assert 0.15 * n <= len(ids_a) <= 0.45 * n  # loose binomial bounds


def test_sampling_partition_invariant(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    a = {r["doc_id"] for r in
         sampling.weighted_sample(docs, F.lit(0.4)).select("doc_id").collect()}
    b = {r["doc_id"] for r in
         sampling.weighted_sample(docs.repartition(17), F.lit(0.4))
         .select("doc_id").collect()}
    assert a == b


def test_sampling_edge_fractions(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    assert sampling.weighted_sample(docs, F.lit(1.0)).count() == docs.count()
    assert sampling.weighted_sample(docs, F.lit(0.0)).count() == 0
    # weights above 1 clamp to always-keep (the >= 1.0 branch)
    assert sampling.weighted_sample(docs, F.lit(3.5)).count() == docs.count()


def test_sampling_salt_decorrelates(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    a = {r["doc_id"] for r in
         sampling.weighted_sample(docs, F.lit(0.5), salt="x").select("doc_id").collect()}
    b = {r["doc_id"] for r in
         sampling.weighted_sample(docs, F.lit(0.5), salt="y").select("doc_id").collect()}
    assert a != b  # same rate, different draw


def test_stratified_rates(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    kept = sampling.stratified_sample(
        docs, {"en": 1.0}, default_rate=0.0, group_col="lang"
    )
    assert kept.count() == docs.filter(F.col("lang") == "en").count()
    with pytest.raises(ValueError, match="rates"):
        sampling.stratified_sample(docs, {"en": 1.5})


# -- repetition -------------------------------------------------------------


def test_repetition_stats_hand_computed(spark):
    rows = [
        (0, "a b a b a b"),          # 2-grams: ab ba ab ba ab -> 5 total, 2 distinct
        (1, "w x y z"),              # 3 total, 3 distinct
        (2, "solo"),                 # no 2-grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in textops.repetition_stats(df, n=2).collect()}
    assert got[0]["total_ngrams"] == 5 and got[0]["distinct_ngrams"] == 2
    assert abs(got[0]["dup_ngram_ratio"] - (1 - 2 / 5)) < 1e-12
    assert abs(got[0]["top_ngram_mass"] - 3 / 5) < 1e-12
    assert got[1]["dup_ngram_ratio"] == 0.0
    assert got[2]["total_ngrams"] == 0 and got[2]["dup_ngram_ratio"] == 0.0


# -- domain mix -------------------------------------------------------------


def test_domain_mix_plan_fractions(spark):
    rows = [(i, f"s{i % 4}") for i in range(400)]  # 100 docs per source
    df = spark.createDataFrame(rows, "doc_id long, source string")
    plan = {
        r["source"]: (r["n_docs"], r["frac"])
        for r in sampling.domain_mix_plan(
            df, {"s0": 4.0, "s1": 2.0, "s2": 1.0}, group_col="source"
        ).collect()
    }
    # binding group s0 keeps all; s1 half; s2 quarter; s3 (weight 0) dropped
    assert plan["s0"] == (100, 1.0)
    assert plan["s1"] == (100, 0.5)
    assert plan["s2"] == (100, 0.25)
    assert plan["s3"] == (100, 0.0)


def test_domain_mix_plan_uniform_default(spark):
    rows = [(i, "a") for i in range(90)] + [(100 + i, "b") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    plan = {
        r["source"]: r["frac"]
        for r in sampling.domain_mix_plan(df, None, group_col="source").collect()
    }
    # uniform target: the smaller group binds, the bigger downsamples to it
    assert plan["b"] == 1.0
    assert plan["a"] == pytest.approx(30 / 90)


def test_domain_mix_sample_deterministic_and_proportional(spark):
    rows = [(i, f"s{i % 2}") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept1 = sampling.domain_mix_sample(df, {"s0": 3.0, "s1": 1.0})
    kept2 = sampling.domain_mix_sample(df.repartition(7), {"s0": 3.0, "s1": 1.0})
    ids1 = sorted(r["doc_id"] for r in kept1.collect())
    assert ids1 == sorted(r["doc_id"] for r in kept2.collect())
    by_src = {
        r["source"]: r["n"]
        for r in kept1.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src["s0"] == 1000  # binding group keeps everything
    # md5 thresholding is uniform: ~1/3 of s1 survives
    assert 260 <= by_src["s1"] <= 400


# -- unigram LM scoring -----------------------------------------------------


def test_unigram_logprob_hand_computed(spark):
    import math

    # corpus tokens: a a a b  -> p(a)=3/4, p(b)=1/4
    df = spark.createDataFrame(
        [(0, "a a"), (1, "a b")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
        for r in textops.unigram_logprob(df).collect()
    }
    assert got[0] == (2, pytest.approx(math.log(0.75)))
    assert got[1][0] == 2
    assert got[1][1] == pytest.approx((math.log(0.75) + math.log(0.25)) / 2)


def test_unigram_logprob_empty_docs_drop(spark):
    df = spark.createDataFrame(
        [(0, "x y"), (1, "   "), (2, "")], "doc_id long, text string"
    )
    assert [r["doc_id"] for r in textops.unigram_logprob(df).collect()] == [0]


# -- sequence packing -------------------------------------------------------


@pytest.fixture(scope="module")
def pack_docs(spark):
    docs = tables.load(spark, "/root/testdata/sf0.001", "documents")
    return docs.select("doc_id", "text")


def test_pack_sequences_conserves_tokens(spark, pack_docs):
    from cuda_acceleratedvectordatabaseengine_spark.functions import text as TXT
    from cuda_acceleratedvectordatabaseengine_spark.operators import packing

    budget = 128
    seqs = packing.pack_sequences(pack_docs, budget=budget).collect()
    total = pack_docs.select(
        F.sum(TXT.token_count_expr("text")).alias("t")
    ).first()["t"]
    assert sum(r["n_tokens"] for r in seqs) == total
    # every sequence but the last is exactly full
    by_id = sorted(seqs, key=lambda r: r["seq_id"])
    assert [r["seq_id"] for r in by_id] == list(range(len(by_id)))
    assert all(r["n_tokens"] == budget for r in by_id[:-1])
    assert 0 < by_id[-1]["n_tokens"] <= budget


def test_pack_sequences_bucket_invariance(spark, pack_docs):
    from cuda_acceleratedvectordatabaseengine_spark.operators import packing

    one = sorted(
        packing.pack_sequences(pack_docs, budget=200, num_buckets=1).collect()
    )
    many = sorted(
        packing.pack_sequences(pack_docs, budget=200, num_buckets=16).collect()
    )
    assert one == many


def test_pack_sequences_doc_straddles_boundary(spark):
    from cuda_acceleratedvectordatabaseengine_spark.operators import packing

    # doc 0: 3 tokens, doc 1: 4 tokens, budget 5 -> doc 1 straddles seqs 0/1
    df = spark.createDataFrame(
        [(0, "t t t"), (1, "u u u u")], "doc_id long, text string"
    )
    seqs = {r["seq_id"]: r for r in packing.pack_sequences(df, budget=5).collect()}
    assert seqs[0]["n_docs"] == 2 and seqs[0]["n_tokens"] == 5
    assert seqs[1]["n_docs"] == 1 and seqs[1]["n_tokens"] == 2
    assert seqs[1]["first_doc"] == 1


# -- duplicated substring spans ---------------------------------------------


def test_duplicated_span_stats_planted(spark):
    from cuda_acceleratedvectordatabaseengine_spark.operators import dedup

    shared = "one two three four five six seven eight"  # exactly one 8-gram
    rows = [
        (0, shared + " tail0 alpha beta"),
        (1, "head1 lead " + shared),
        (2, "totally different words with no overlap at all here today"),
        (3, "short doc"),  # < 8 tokens: no windows, drops out
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["total_spans"], r["dup_spans"])
        for r in dedup.duplicated_span_stats(df, n=8).collect()
    }
    assert 3 not in got
    assert got[2][1] == 0
    # docs 0 and 1 each contain the shared window once
    assert got[0][1] >= 1 and got[1][1] >= 1
    # the shared window is the ONLY duplicated one (11 and 10 tokens ->
    # 4 and 3 sliding windows)
    assert got[0] == (4, 1) and got[1] == (3, 1)


# -- curation funnel --------------------------------------------------------


def test_curation_funnel_monotone(spark):
    from cuda_acceleratedvectordatabaseengine_spark.operators import curation

    docs = tables.load(spark, "/root/testdata/sf0.001", "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    bench = docs.filter(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    rows = sorted(
        curation.curation_funnel(corpus, bench).collect(),
        key=lambda r: r["stage"],
    )
    assert [r["name"] for r in rows] == list(curation.STAGES)
    # every stage consumes the previous stage's survivors: both counts
    # are monotone non-increasing, and nothing is negative
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_docs"] <= prev["n_docs"]
        assert cur["n_tokens"] <= prev["n_tokens"]
    assert rows[0]["n_docs"] == corpus.count()
    assert rows[-1]["n_docs"] >= 0
    # per-stage wall-clock diagnostics: present, non-negative, rounded
    for r in rows:
        assert r["stage_sec"] >= 0.0


def test_curation_funnel_c4_and_gopher_stages(spark):
    from cuda_acceleratedvectordatabaseengine_spark.operators import (
        curation,
        textops,
    )

    # distinct variants: identical lines would (correctly) trip the
    # Gopher dup_line_frac rule
    good_lines = [
        "the quick brown fox jumps over to be of and that have with "
        f"more plain words in sentence number {i} now."
        for i in range(3)
    ]
    nosw_line = (
        "quick brown fox jumps high above green fields seeking small "
        "prey under bright skies every single morning."
    )
    rows = [
        # passes C4 (3 good lines), quality, gopher
        (1, "\n".join(good_lines) + " alpha.", "en", "web"),
        # fails C4 page rule: only 2 surviving lines
        (2, "\n".join(good_lines[:2]) + " beta.", "en", "web"),
        # passes C4 + quality but FAILS gopher (no required stopwords)
        (3, "\n".join([nosw_line] * 3) + " gamma.", "en", "web"),
        # fails C4 page rule: brace
        (4, "\n".join(good_lines) + " { delta.", "en", "web"),
        # passes C4 but wrong language
        (5, "\n".join(good_lines) + " epsilon.", "de", "web"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    bench = spark.createDataFrame(
        [(100, "held out benchmark text nothing shares these shingles")],
        "bench_id long, text string",
    )
    funnel = {
        r["name"]: r["n_docs"]
        for r in curation.curation_funnel(
            docs, bench, c4_rules=True, gopher=True
        ).collect()
    }
    names = list(funnel)
    assert names[:5] == ["raw", "c4_clean", "lang", "quality", "gopher"]
    assert funnel["raw"] == 5
    # manual composition of the same operators
    c4 = textops.c4_clean(docs, keep_only=True).drop("n_lines_kept")
    assert funnel["c4_clean"] == c4.count() == 3  # docs 1, 3, 5
    lang = c4.filter(F.col("lang") == "en")
    assert funnel["lang"] == lang.count() == 2  # docs 1, 3
    assert funnel["gopher"] == textops.gopher_filter(
        lang
    ).count() == 1  # doc 3 drops (no required stopwords); doc 1 survives
    # c4_clean TRANSFORMS the text: survivors carry the cleaned form
    kept_text = {r["doc_id"]: r["text"] for r in c4.collect()}
    assert kept_text[1] == "\n".join(good_lines[:2] + [good_lines[2] + " alpha."])


# -- randomized differentials vs Python reference implementations -----------


def test_pack_sequences_matches_python_reference(spark):
    import random

    from cuda_acceleratedvectordatabaseengine_spark.operators import packing

    rng = random.Random(7)
    # sparse, shuffled-magnitude ids; token counts spanning 1..3*budget so
    # plenty of docs straddle multiple sequences
    ids = sorted(rng.sample(range(100_000), 300))
    docs = [(i, " ".join("t" for _ in range(rng.randint(1, 380)))) for i in ids]
    budget = 128
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["seq_id"]: (r["n_docs"], r["n_tokens"], r["first_doc"], r["last_doc"])
        for r in packing.pack_sequences(df, budget=budget, num_buckets=13).collect()
    }
    # python reference: exclusive prefix sum in id order, explode overlaps
    want = {}
    start = 0
    for i, text in docs:
        tc = len(text.split())
        for seq in range(start // budget, (start + tc - 1) // budget + 1):
            lo, hi = seq * budget, (seq + 1) * budget
            ov = min(start + tc, hi) - max(start, lo)
            n, t, fd, ld = want.get(seq, (0, 0, i, i))
            want[seq] = (n + 1, t + ov, min(fd, i), max(ld, i))
        start += tc
    assert got == want


def test_domain_mix_matches_python_reference(spark):
    import hashlib
    import random

    from cuda_acceleratedvectordatabaseengine_spark.operators import sampling

    rng = random.Random(11)
    weights = {"a": 2.5, "b": 1.0, "c": 0.5}
    rows = [(i, rng.choice("abcd")) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(
        r["doc_id"]
        for r in sampling.domain_mix_sample(
            df, weights, group_col="source", salt="ref"
        ).collect()
    )
    # python reference of plan + md5 predicate
    counts = {}
    for _, s in rows:
        counts[s] = counts.get(s, 0) + 1
    scale_k = min(counts[s] / w for s, w in weights.items())
    frac = {
        s: (min(1.0, scale_k * weights[s] / counts[s]) if s in weights else 0.0)
        for s in counts
    }
    want = []
    for i, s in rows:
        f = frac[s]
        if f >= 1.0:
            want.append(i)
        elif f > 0.0:
            hx = hashlib.md5(f"{i}:ref".encode()).hexdigest()[:8]
            if hx < format(int(f * 4294967296), "08x"):
                want.append(i)
    assert got == sorted(want)


# -- table profiling --------------------------------------------------------


def test_profile_table_exact_counts(spark):
    from cuda_acceleratedvectordatabaseengine_spark.operators import profile

    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", 5.0), (3, None, 7.5), (3, "b", 7.5)],
        "id long, s string, v double",
    )
    got = {r["col_name"]: r for r in profile.profile_table(df, exact=True).collect()}
    assert got["id"]["n_rows"] == 4 and got["id"]["n_null"] == 0
    assert got["id"]["n_distinct"] == 3
    assert got["id"]["min_value"] == "1" and got["id"]["max_value"] == "3"
    assert got["s"]["n_null"] == 1 and got["s"]["n_distinct"] == 2
    assert got["v"]["n_null"] == 1 and got["v"]["n_distinct"] == 2
    assert got["v"]["max_value"] == "7.5"


def test_profile_table_single_job(spark):
    """One scan regardless of column count: the plan contains exactly one
    aggregate over the source (no per-column subplans)."""
    import io
    from contextlib import redirect_stdout

    from cuda_acceleratedvectordatabaseengine_spark.operators import profile

    docs = tables.load(spark, "/root/testdata/sf0.001", "documents")
    buf = io.StringIO()
    with redirect_stdout(buf):
        profile.profile_table(docs).explain("formatted")
    plan = buf.getvalue()
    # formatted output lists each node in the tree AND a detail section;
    # count detail headers "(n) Scan parquet" = number of actual scans
    import re

    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1


# -- token-budget mix -------------------------------------------------------


def test_token_budget_mix_plan_caps_and_budgets(spark):
    # src a: 100 docs x 10 tokens = 1000; src b: 10 docs x 10 = 100
    rows = [(i, "a", "t " * 10) for i in range(100)] + [
        (1000 + i, "b", "t " * 10) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    plan = {
        r["source"]: r
        for r in sampling.token_budget_mix_plan(
            df, 400, {"a": 1.0, "b": 1.0}
        ).collect()
    }
    # each source gets a 200-token budget: a downsamples to 0.2, b is
    # starved (only 100 tokens available) and caps at 1.0
    assert plan["a"]["n_tokens"] == 1000 and plan["a"]["frac"] == 0.2
    assert plan["b"]["frac"] == 1.0
    assert plan["a"]["token_budget"] == 200.0


def test_token_budget_mix_hits_budget_in_expectation(spark):
    rows = [(i, "a", "t " * 20) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept = sampling.token_budget_mix(df, 8000, {"a": 1.0})
    # 40000 tokens available, 8000 budget -> frac 0.2 -> ~400 docs
    n = kept.count()
    assert 300 <= n <= 500
    with pytest.raises(ValueError, match="total_tokens"):
        sampling.token_budget_mix_plan(df, 0)


# -- curriculum bins --------------------------------------------------------


def test_curriculum_bins_exact_vs_approx(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    exact = {r["bin"]: r for r in textops.curriculum_bins(docs, 4, exact=True).collect()}
    approx = {r["bin"]: r for r in textops.curriculum_bins(docs, 4, exact=False).collect()}
    n = docs.count()
    assert sum(r["n_docs"] for r in exact.values()) == n
    assert sum(r["n_docs"] for r in approx.values()) == n
    # exact tiles are equal-count within 1; bin 1 is the top-quality tier
    sizes = [exact[b]["n_docs"] for b in sorted(exact)]
    assert max(sizes) - min(sizes) <= 1
    assert exact[1]["min_quality"] >= exact[max(exact)]["max_quality"]
    # approx path agrees with exact on which quality range each tier spans
    # to within the sketch tolerance: top tier's floor above bottom's cap
    assert approx[1]["min_quality"] >= approx[max(approx)]["max_quality"]
    with pytest.raises(ValueError, match="n_bins"):
        textops.curriculum_bins(docs, 0)


# -- embedding shift --------------------------------------------------------


def test_embedding_shift_detects_planted_offset(spark):
    from cuda_acceleratedvectordatabaseengine_spark.operators import ann

    import random

    rng = random.Random(3)
    a = [(i, [rng.gauss(0.0, 1.0), rng.gauss(0.0, 1.0)]) for i in range(400)]
    # snapshot b: dimension 1 shifted by +2 sigma, dimension 2 unchanged
    b = [
        (1000 + i, [rng.gauss(2.0, 1.0), rng.gauss(0.0, 1.0)])
        for i in range(400)
    ]
    dfa = spark.createDataFrame(a, "vec_id long, embedding array<float>")
    dfb = spark.createDataFrame(b, "vec_id long, embedding array<float>")
    got = {r["pos"]: r for r in ann.embedding_shift(dfa, dfb).collect()}
    assert got[1]["smd"] > 1.5  # planted 2-sigma shift flagged
    assert got[2]["smd"] < 0.3  # unchanged dimension quiet
    assert got[1]["n_a"] == 400 and got[1]["n_b"] == 400


def test_curation_funnel_pii_stage(spark):
    """pii_classes inserts a pii_redact stage after quality: n_docs is
    flat across it (transform, never drop), n_tokens reflects the
    redacted text, and downstream exact-dedup operates on redacted text
    (docs differing only in their PII spans collapse)."""
    from cuda_acceleratedvectordatabaseengine_spark.functions import text as TXT
    from cuda_acceleratedvectordatabaseengine_spark.operators import curation

    base = "the quick brown fox jumps over the lazy dog " * 15
    docs = spark.createDataFrame(
        [
            (1, base + "contact alice@ex.io", "en", "web"),
            (2, base + "contact bob@corp.net", "en", "web"),
            (3, base + "nothing private", "en", "web"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    bench = spark.createDataFrame(
        [(100, "held out benchmark text")], "bench_id long, text string"
    )
    rows = {
        r["name"]: r
        for r in curation.curation_funnel(
            docs, bench, pii_classes=TXT.PII_CLASSES
        ).collect()
    }
    assert set(rows) == set(curation.STAGES) | {"pii_redact"}
    assert rows["pii_redact"]["stage"] == 3
    assert rows["pii_redact"]["n_docs"] == rows["quality"]["n_docs"] == 3
    # docs 1 and 2 differ ONLY in their email span -> after redaction
    # they are exact duplicates and one is dropped
    assert rows["exact_dedup"]["n_docs"] == 2
    # default call: classic stage list, no pii stage, no dedup collapse
    classic = {
        r["name"]: r for r in curation.curation_funnel(docs, bench).collect()
    }
    assert set(classic) == set(curation.STAGES)
    assert classic["exact_dedup"]["n_docs"] == 3


def test_corpus_drift_hand_computed(spark):
    from cuda_acceleratedvectordatabaseengine_spark.operators import profile

    a = spark.createDataFrame(
        [(i, "en") for i in range(6)] + [(10 + i, "de") for i in range(2)],
        "doc_id long, lang string",
    )
    # B: en 4, de 2, fr 2 -> shares A (0.75, 0.25, 0) vs B (0.5, 0.25, 0.25)
    b = spark.createDataFrame(
        [(i, "en") for i in range(4)] + [(20 + i, "de") for i in range(2)]
        + [(30 + i, "fr") for i in range(2)],
        "doc_id long, lang string",
    )
    got = {
        r["metric"]: r["value"]
        for r in profile.corpus_drift(a, b, group_col="lang").collect()
    }
    assert got["share_delta:en"] == -0.25
    assert got["share_delta:de"] == 0.0  # -0.0 normalized
    assert str(got["share_delta:de"]) == "0.0"
    assert got["share_delta:fr"] == 0.25
    assert got["tv_distance"] == 0.25
    # identical snapshots -> all zeros
    same = {
        r["metric"]: r["value"]
        for r in profile.corpus_drift(a, a, group_col="lang").collect()
    }
    assert set(same.values()) == {0.0}


def test_corpus_drift_null_group_single_row(spark):
    """ADVICE r7: NULL group keys never equi-join — without the
    sentinel coalesce a NULL group present in both snapshots split
    into two full-outer rows (double-counted in tv_distance) with a
    NULL metric label. It must be ONE ordinary '<null>' group."""
    from cuda_acceleratedvectordatabaseengine_spark.operators import profile

    a = spark.createDataFrame(
        [(1, "en"), (2, None), (3, None)], "doc_id long, lang string"
    )
    b = spark.createDataFrame(
        [(1, "en"), (2, None), (3, "de")], "doc_id long, lang string"
    )
    rows = profile.corpus_drift(a, b, group_col="lang").collect()
    got = {r["metric"]: r["value"] for r in rows}
    assert len(rows) == len(got)  # no duplicate labels
    assert None not in [r["metric"] for r in rows]
    # A: en 1/3, null 2/3; B: en 1/3, null 1/3, de 1/3
    assert got["share_delta:<null>"] == round(1 / 3 - 2 / 3, 6)
    assert got["share_delta:de"] == round(1 / 3, 6)
    assert got["share_delta:en"] == 0.0
    assert got["tv_distance"] == round(1 / 3, 6)


def test_temperature_mix_plan_and_sample(spark):
    from cuda_acceleratedvectordatabaseengine_spark.operators import sampling

    # 400 en / 100 de / 25 fr: alpha=0.5 weights 20/10/5; binding group =
    # min(n/w) = fr (25/5=5) vs de (10) vs en (20) -> K=5, fracs =
    # en 5*20/400=0.25, de 5*10/100=0.5, fr 1.0
    rows = (
        [(i, "en") for i in range(400)]
        + [(1000 + i, "de") for i in range(100)]
        + [(2000 + i, "fr") for i in range(25)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    plan = {
        r["lang"]: (r["n_docs"], r["frac"])
        for r in sampling.temperature_mix_plan(
            df, alpha=0.5, group_col="lang"
        ).collect()
    }
    assert plan["en"] == (400, 0.25)
    assert plan["de"] == (100, 0.5)
    assert plan["fr"] == (25, 1.0)
    # alpha=1 reproduces natural proportions (frac 1.0 everywhere)
    nat = sampling.temperature_mix_plan(df, alpha=1.0, group_col="lang")
    assert all(r["frac"] == 1.0 for r in nat.collect())
    # alpha=0 -> uniform target: every group downsamples to min count
    uni = {
        r["lang"]: r["frac"]
        for r in sampling.temperature_mix_plan(
            df, alpha=0.0, group_col="lang"
        ).collect()
    }
    assert uni["fr"] == 1.0 and abs(uni["en"] - 25 / 400) < 1e-12
    # the sampler keeps ~frac per group, deterministically
    kept = sampling.temperature_mix_sample(
        df, alpha=0.5, group_col="lang", salt="t0"
    )
    again = sampling.temperature_mix_sample(
        df, alpha=0.5, group_col="lang", salt="t0"
    )
    a = sorted(r["doc_id"] for r in kept.collect())
    assert a == sorted(r["doc_id"] for r in again.collect())
    counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    assert counts["fr"] == 25
    assert 0.15 * 400 < counts["en"] < 0.35 * 400
    import pytest

    with pytest.raises(ValueError, match="alpha"):
        sampling.temperature_mix_plan(df, alpha=1.5)


def test_corpus_drift_null_not_merged_with_literal_sentinel(spark):
    """ADVICE r8: a group literally named '<null>' must NOT merge its
    counts with the NULL group — the sentinel is only the output label
    (two share_delta:<null> rows, distinct values, is the documented
    collision shape)."""
    from cuda_acceleratedvectordatabaseengine_spark.operators import profile

    a = spark.createDataFrame(
        [(1, "<null>"), (2, "<null>"), (3, None), (4, "en")],
        "doc_id long, lang string",
    )
    b = spark.createDataFrame(
        [(1, "<null>"), (2, None), (3, None), (4, "en")],
        "doc_id long, lang string",
    )
    rows = profile.corpus_drift(a, b, group_col="lang").collect()
    sentinel = sorted(
        r["value"] for r in rows if r["metric"] == "share_delta:<null>"
    )
    # literal group: 2/4 -> 1/4 (delta -0.25); NULL group: 1/4 -> 2/4 (+0.25)
    assert sentinel == [-0.25, 0.25]
    tv = [r["value"] for r in rows if r["metric"] == "tv_distance"][0]
    assert tv == 0.25


def test_curation_funnel_near_dedup_scale_knobs_pass_through(spark):
    """r14: the funnel exposes minhash_dedup_pairs' two quadratic-term
    bounds (max_bucket_size, max_shingle_doc_freq). A draconian bucket
    cap of 1 drops EVERY multi-doc band bucket, so no candidate pairs
    form and near_dedup keeps everything exact_dedup kept — observable
    from the funnel itself on a corpus with planted near-dups."""
    from cuda_acceleratedvectordatabaseengine_spark.operators import curation

    # quality gate needs >= ~100 clean tokens for a 0.5 score
    base = ("the quick brown fox jumps over the lazy dog and it runs "
            "far away into the green field this is a fine day for a "
            "walk in the park and the sun is out now ") * 4
    rows = [(i, base + f"tail{i % 3}", "en", "src0") for i in range(30)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    bench = spark.createDataFrame(
        [(999, "completely unrelated benchmark text")],
        "bench_id long, text string",
    )
    by_name = lambda res: {r["name"]: r for r in res.collect()}  # noqa: E731

    open_caps = by_name(
        curation.curation_funnel(docs, bench, near_threshold=0.5)
    )
    capped = by_name(
        curation.curation_funnel(
            docs, bench, near_threshold=0.5, near_max_bucket_size=1
        )
    )
    # with open caps the three near-identical families collapse; with
    # bucket cap 1 no LSH bucket survives, so near_dedup drops nothing
    assert open_caps["near_dedup"]["n_docs"] < open_caps["exact_dedup"]["n_docs"]
    assert capped["near_dedup"]["n_docs"] == capped["exact_dedup"]["n_docs"]
