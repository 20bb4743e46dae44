"""Trained document-quality classifier — logistic regression fit by
distributed IRLS over JVM-side text features.

The heuristic quality gate (functions/text.quality_score_expr) is a fixed
formula; production curation pipelines (CCNet, RefinedWeb, FineWeb) train
a LEARNED quality model on labeled seed data instead. This module is that
verb, Spark-first:

- the FEATURES are pure Catalyst expressions (token count, non-alpha
  ratio, stopword ratio, mean token length, char count — all bounded to
  [0, 1]); scoring a corpus is one JVM projection with zero Python in the
  path, so the gate runs at scan speed on 100 TB;
- TRAINING is IRLS (Newton's method on the logistic log-likelihood):
  each iteration is ONE distributed pass producing the (d+1)x(d+1)
  ``X'WX`` and ``X'Wz`` partial sums via mapInArrow (map-side combined —
  only O(d^2) doubles per partition reach the driver), then a driver-side
  ridge-regularized solve. Driver state is O(d^2) regardless of corpus
  size; d is len(FEATURES) = 5;
- DETERMINISTIC: zero init, fixed iteration count, ridge
  regularization, no sampling — same weights on any partitioning (up to
  float-sum associativity).

Features are materialized ONCE by Catalyst into an array column and the
same expression list drives both training and scoring — a single source
of truth, so the trained weights and the JVM scoring expression can never
disagree about what a feature means.

No reference analog (the reference is a vector database engine); this is
LLM-training-data-pipeline extension surface (SURVEY §2.6b).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as TXT

# (name, expr builder) — every feature bounded to [0, 1] for conditioning.
FEATURES = (
    ("tokens_per_100", lambda t: F.least(
        F.lit(1.0), TXT.token_count_expr(t).cast("double") / F.lit(100.0))),
    ("non_alpha_ratio", TXT.non_alpha_ratio_expr),
    ("stopword_ratio", TXT.stopword_ratio_expr),
    ("mean_token_len_per_10", lambda t: F.least(
        F.lit(1.0),
        (F.length(TXT.normalized_text_expr(t)).cast("double")
         / F.greatest(TXT.token_count_expr(t).cast("double"), F.lit(1.0)))
        / F.lit(10.0))),
    ("chars_per_1000", lambda t: F.least(
        F.lit(1.0), F.length(t if isinstance(t, Column) else F.col(t))
        .cast("double") / F.lit(1000.0))),
)


def feature_exprs(text_col: str = "text") -> "list[Column]":
    return [build(text_col).alias(name) for name, build in FEATURES]


def feature_array_expr(text_col: str = "text") -> Column:
    return F.array(*[b(text_col) for _n, b in FEATURES]).alias("features")


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def irls_reference(X: np.ndarray, y: np.ndarray, max_iter: int = 8,
                   ridge: float = 1e-6) -> np.ndarray:
    """Driver-side reference IRLS on a dense (n, d+1) design matrix —
    the exact algorithm the distributed path computes via partial sums
    (shared here so tests can differential the two)."""
    n, p = X.shape
    w = np.zeros(p)
    for _ in range(max_iter):
        eta = X @ w
        mu = _sigmoid(eta)
        wt = np.maximum(mu * (1.0 - mu), 1e-9)
        z = eta + (y - mu) / wt
        A = (X * wt[:, None]).T @ X + ridge * np.eye(p)
        b = (X * wt[:, None]).T @ z
        w = np.linalg.solve(A, b)
    return w


def train_quality_model(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    max_iter: int = 8,
    ridge: float = 1e-6,
) -> np.ndarray:
    """Fit logistic weights (d+1: intercept first) on ``docs`` with a
    binary ``label_col`` (0/1). One distributed partial-sums pass per
    IRLS iteration; O(d^2) driver state."""
    d = len(FEATURES)
    p = d + 1
    # persist the materialized features for the iteration loop: every IRLS
    # pass reads the SAME (y, features) relation, and without the cache
    # each of the max_iter passes would re-scan the source and re-run the
    # tokenization expressions (measured 8 redundant feature passes)
    feats = docs.select(
        F.col(label_col).cast("double").alias("y"),
        feature_array_expr(text_col),
    ).persist()
    w = np.zeros(p)
    for _ in range(max_iter):
        w_cur = w.copy()

        def scan(batches, w_cur=w_cur):
            from ..functions import arrowkit as AK

            A = np.zeros((p, p))
            b = np.zeros(p)
            seen = False
            for rb in batches:
                if rb.num_rows == 0:
                    continue
                seen = True
                Xf = AK.list_matrix(rb, "features")
                X = np.hstack([np.ones((len(Xf), 1)), Xf])
                y = AK.column(rb, "y", np.float64)
                eta = X @ w_cur
                mu = _sigmoid(eta)
                wt = np.maximum(mu * (1.0 - mu), 1e-9)
                z = eta + (y - mu) / wt
                Xw = X * wt[:, None]
                A += Xw.T @ X
                b += Xw.T @ z
            if seen:
                import pyarrow as pa

                flat = np.concatenate([A.reshape(-1), b])
                yield AK.batch(ab=pa.array([flat], type=pa.list_(pa.float64())))

        parts = feats.mapInArrow(
            scan, schema="ab array<double>"
        ).collect()
        if not parts:
            feats.unpersist()
            raise ValueError("empty training set")
        total = np.sum([np.asarray(r["ab"]) for r in parts], axis=0)
        A = total[: p * p].reshape(p, p) + ridge * np.eye(p)
        b = total[p * p:]
        w = np.linalg.solve(A, b)
    feats.unpersist()
    return w


def quality_prob_expr(weights: np.ndarray, text_col: str = "text") -> Column:
    """sigmoid(w0 + sum_i w_i * feature_i) as a pure Catalyst expression —
    the production scoring path (no UDF, vectorized by Tungsten)."""
    w = np.asarray(weights, dtype=np.float64)
    if w.shape != (len(FEATURES) + 1,):
        raise ValueError(
            f"expected {len(FEATURES) + 1} weights (intercept first), "
            f"got shape {w.shape}"
        )
    z = F.lit(float(w[0]))
    for wi, (_name, build) in zip(w[1:], FEATURES):
        z = z + F.lit(float(wi)) * build(text_col)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def score_documents(
    docs: DataFrame,
    weights: np.ndarray,
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    return docs.withColumn(out_col, quality_prob_expr(weights, text_col))


def binary_classification_report(
    df: DataFrame,
    label_col: str,
    score_col: str,
    threshold: float = 0.5,
    score_round: int = 9,
) -> DataFrame:
    """One-row evaluation of a scorer against binary labels:
    (n_pos, n_neg, auc, accuracy, precision, recall, f1) — the report a
    quality-gate owner reads before trusting a model (or the heuristic)
    to curate a corpus.

    AUC is the exact Mann-Whitney rank statistic with tie handling
    (average ranks): scores are grouped by DISTINCT value (rounded to
    ``score_round`` decimals — the knob that bounds the distinct-value
    relation), a running count over the ordered distinct-score groups
    yields each group's average rank, and

        AUC = (sum of positives' avg ranks - npos(npos+1)/2) / (npos*nneg)

    The one ordered scan runs over the DISTINCT-score aggregate, not the
    corpus: rows reaching the window = unique rounded scores (bounded by
    ``score_round``; at 100 TB round to 4-6 decimals), the corpus-sized
    pass is the map-side-combined groupBy. Threshold metrics (accuracy /
    precision / recall / f1 at ``threshold``, applied to the ROUNDED
    score so oracle comparisons are exact) come from the same single
    aggregate. AUC/precision/f1 are NULL when undefined (one class
    absent / no positive predictions)."""
    from pyspark.sql import Window

    s = F.round(F.col(score_col).cast("double"), score_round)
    scored = df.select(
        s.alias("s"), F.col(label_col).cast("int").alias("y")
    )
    g = scored.groupBy("s").agg(
        F.count("*").alias("n"), F.sum("y").alias("np")
    )
    w = (
        Window.orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = g.withColumn("n_less", F.coalesce(F.sum("n").over(w), F.lit(0)))
    thr = F.col("s") >= float(threshold)
    rep = c.agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum(F.col("n") - F.col("np")).cast("long").alias("n_neg"),
        F.sum(
            F.col("np") * (F.col("n_less") + (F.col("n") + 1) / 2.0)
        ).alias("rank_sum"),
        F.sum(F.when(thr, F.col("np")).otherwise(F.lit(0))).alias("tp"),
        F.sum(
            F.when(thr, F.col("n") - F.col("np")).otherwise(F.lit(0))
        ).alias("fp"),
    )
    npos, nneg = F.col("n_pos"), F.col("n_neg")
    tp, fp = F.col("tp"), F.col("fp")
    fn = npos - tp
    tn = nneg - fp
    auc = F.when(
        (npos > 0) & (nneg > 0),
        (F.col("rank_sum") - npos * (npos + 1) / 2.0) / (npos * nneg),
    )
    precision = F.when(tp + fp > 0, tp / (tp + fp))
    recall = F.when(npos > 0, tp / npos)
    f1 = F.when(
        (tp + fp > 0) & (npos > 0) & (tp > 0),
        2.0 * (tp / (tp + fp)) * (tp / npos)
        / (tp / (tp + fp) + tp / npos),
    )
    return rep.select(
        "n_pos",
        "n_neg",
        auc.alias("auc"),
        ((tp + tn) / (npos + nneg)).alias("accuracy"),
        precision.alias("precision"),
        recall.alias("recall"),
        f1.alias("f1"),
    )
