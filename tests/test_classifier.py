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
