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
