"""Trained quality classifier: distributed IRLS vs the driver-side
reference, JVM-scoring parity, and separation sanity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuda_acceleratedvectordatabaseengine_spark.operators import classifier as C


def _labeled_docs(spark, n=400, seed=5):
    """Synthetic corpus where the label genuinely depends on the features:
    'good' docs are long fluent sentences with stopwords; 'bad' docs are
    short symbol-heavy fragments."""
    rng = np.random.default_rng(seed)
    good_words = ("the quick brown fox jumps over a lazy dog while it and "
                  "of to in is was for on with that").split()
    rows = []
    for i in range(n):
        if i % 2 == 0:
            k = int(rng.integers(30, 80))
            text = " ".join(rng.choice(good_words, size=k))
            label = 1
        else:
            k = int(rng.integers(2, 8))
            text = " ".join(
                "".join(rng.choice(list("#$%@!123xyz"), size=5)) for _ in range(k)
            )
            label = 0
        rows.append((i, text, label))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


@pytest.fixture(scope="module")
def docs(spark):
    return _labeled_docs(spark).repartition(8).cache()


def test_distributed_irls_matches_reference(spark, docs):
    """The partial-sums path computes the SAME Newton iterations as the
    dense driver-side reference on the same features."""
    w = C.train_quality_model(docs, "label")
    pdf = docs.select(
        F.col("label").cast("double").alias("y"), *C.feature_exprs("text")
    ).toPandas()
    X = np.hstack(
        [np.ones((len(pdf), 1)), pdf[[n for n, _ in C.FEATURES]].to_numpy()]
    )
    want = C.irls_reference(X, pdf["y"].to_numpy())
    assert np.allclose(w, want, atol=1e-8), (w, want)


def test_training_is_partitioning_invariant(spark, docs):
    w1 = C.train_quality_model(docs.repartition(3), "label")
    w2 = C.train_quality_model(docs.repartition(17), "label")
    assert np.allclose(w1, w2, atol=1e-8)


def test_jvm_scoring_matches_numpy_sigmoid(spark, docs):
    """quality_prob_expr (pure Catalyst) must equal sigmoid(X @ w) from
    the same feature matrix — the single-source-of-truth contract."""
    w = C.train_quality_model(docs, "label")
    pdf = (
        C.score_documents(docs, w)
        .select("doc_id", "quality_prob", *C.feature_exprs("text"))
        .toPandas()
        .sort_values("doc_id")
    )
    X = np.hstack(
        [np.ones((len(pdf), 1)), pdf[[n for n, _ in C.FEATURES]].to_numpy()]
    )
    want = 1.0 / (1.0 + np.exp(-(X @ w)))
    assert np.allclose(pdf["quality_prob"].to_numpy(), want, atol=1e-9)


def test_classifier_separates_good_from_bad(spark, docs):
    w = C.train_quality_model(docs, "label")
    rows = C.score_documents(docs, w).select("doc_id", "quality_prob").collect()
    acc = np.mean(
        [(r["quality_prob"] >= 0.5) == (r["doc_id"] % 2 == 0) for r in rows]
    )
    assert acc >= 0.95, acc


def test_validation(spark, docs):
    with pytest.raises(ValueError, match="weights"):
        C.quality_prob_expr(np.zeros(3))
    empty = docs.filter(F.lit(False))
    with pytest.raises(ValueError, match="empty training set"):
        C.train_quality_model(empty, "label")


def test_binary_classification_report_hand_cases(spark):
    """Exact AUC (tie-aware Mann-Whitney) + threshold metrics against
    hand-computed values: perfect separation, known mixed case with
    ties, all-one-score (AUC=0.5), and one-class NULLs."""
    def report(rows):
        df = spark.createDataFrame(rows, "y int, s double")
        return C.binary_classification_report(df, "y", "s").collect()[0]

    r = report([(1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)])
    assert r["auc"] == 1.0 and r["accuracy"] == 1.0
    assert r["precision"] == 1.0 and r["recall"] == 1.0 and r["f1"] == 1.0

    # mixed with a tie across classes: pairs = 2*2 = 4
    #   (0.9 vs 0.4)=1, (0.9 vs 0.5)=1, (0.5 vs 0.4)=1, (0.5 vs 0.5)=0.5
    r = report([(1, 0.9), (1, 0.5), (0, 0.5), (0, 0.4)])
    assert abs(r["auc"] - 3.5 / 4.0) < 1e-12
    # threshold 0.5: predicted positive = {0.9, 0.5, 0.5} -> tp=2 fp=1
    assert abs(r["precision"] - 2 / 3) < 1e-12
    assert r["recall"] == 1.0
    assert abs(r["f1"] - (2 * (2 / 3) * 1.0 / (2 / 3 + 1.0))) < 1e-12

    r = report([(1, 0.7), (0, 0.7), (1, 0.7), (0, 0.7)])
    assert abs(r["auc"] - 0.5) < 1e-12

    r = report([(1, 0.9), (1, 0.1)])  # no negatives
    assert r["auc"] is None and r["n_neg"] == 0 and r["recall"] == 0.5

    r = report([(0, 0.1), (0, 0.2)])  # no positives, nothing predicted
    assert r["auc"] is None and r["precision"] is None and r["f1"] is None


def test_binary_classification_report_matches_rank_reference(spark):
    """On a random score/label table the exact AUC equals the O(n^2)
    pairwise definition computed in python."""
    import numpy as np

    rng = np.random.default_rng(3)
    y = (rng.random(300) < 0.4).astype(int)
    s = np.round(rng.random(300) * (0.4 + 0.6 * y), 3)  # ties guaranteed
    df = spark.createDataFrame(
        [(int(a), float(b)) for a, b in zip(y, s)], "y int, s double"
    )
    got = C.binary_classification_report(df, "y", "s").collect()[0]
    pos, neg = s[y == 1], s[y == 0]
    cmp = (pos[:, None] > neg[None, :]).sum() + 0.5 * (
        pos[:, None] == neg[None, :]
    ).sum()
    want = cmp / (len(pos) * len(neg))
    assert abs(got["auc"] - want) < 1e-12
