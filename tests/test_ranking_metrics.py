"""Ranked-retrieval quality metrics (metrics.ranking_metrics): nDCG@k
with Burges exponential gain, MRR@k, hit_rate@k — hand-computed cases,
edge discipline (no-relevance queries, k truncation, missing pairs),
and the binary-relevance-from-exact derivation."""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cuda_acceleratedvectordatabaseengine_spark import metrics as M


def _results(spark, rows):
    return spark.createDataFrame(rows, "query_id long, rank int, id long")


def _rel(spark, rows):
    return spark.createDataFrame(rows, "query_id long, id long, rel double")


def test_ndcg_mrr_hit_hand_computed(spark):
    # q1: retrieved a(1), b(2), c(3); rel: b=2, c=1, d=3 (d missed)
    res = _results(spark, [(1, 1, 100), (1, 2, 101), (1, 3, 102)])
    rel = _rel(spark, [(1, 101, 2.0), (1, 102, 1.0), (1, 103, 3.0)])
    out = {r["query_id"]: r for r in M.ranking_metrics(res, rel, k=3).collect()}
    dcg = 0.0 + 3.0 / math.log2(3) + 1.0 / math.log2(4)
    idcg = 7.0 / math.log2(2) + 3.0 / math.log2(3) + 1.0 / math.log2(4)
    assert out[1]["ndcg"] == pytest.approx(dcg / idcg, rel=1e-12)
    assert out[1]["mrr"] == pytest.approx(0.5)
    assert out[1]["hit_rate"] == 1.0


def test_no_relevance_scores_zero_not_null(spark):
    res = _results(spark, [(7, 1, 1), (7, 2, 2)])
    rel = _rel(spark, [(8, 1, 1.0)])  # other query only
    out = M.ranking_metrics(res, rel, k=5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["ndcg"], r["mrr"], r["hit_rate"]) == (0.0, 0.0, 0.0)


def test_k_truncates_both_dcg_and_ideal(spark):
    # relevant only at rank 4 — invisible at k=3, visible at k=4
    res = _results(spark, [(1, r, 100 + r) for r in range(1, 6)])
    rel = _rel(spark, [(1, 104, 2.0)])
    at3 = M.ranking_metrics(res, rel, k=3).collect()[0]
    assert (at3["ndcg"], at3["mrr"], at3["hit_rate"]) == (0.0, 0.0, 0.0)
    at4 = M.ranking_metrics(res, rel, k=4).collect()[0]
    # dcg = 3/log2(5); idcg = 3/log2(2) = 3
    assert at4["ndcg"] == pytest.approx((3.0 / math.log2(5)) / 3.0)
    assert at4["mrr"] == pytest.approx(0.25)
    assert at4["hit_rate"] == 1.0


def test_perfect_ranking_is_one(spark):
    res = _results(spark, [(1, 1, 10), (1, 2, 11), (1, 3, 12)])
    rel = _rel(spark, [(1, 10, 3.0), (1, 11, 2.0), (1, 12, 1.0)])
    r = M.ranking_metrics(res, rel, k=3).collect()[0]
    assert r["ndcg"] == pytest.approx(1.0)
    assert r["mrr"] == 1.0 and r["hit_rate"] == 1.0


def test_ideal_truncation_uses_best_rels(spark):
    # 12 relevant docs (rel 1..12); retrieval surfaces the WORST ten in
    # reverse order — idcg must use the BEST ten, not the retrieved ones
    res = _results(spark, [(1, r, r) for r in range(1, 11)])  # ids 1..10
    rel = _rel(spark, [(1, i, float(i)) for i in range(1, 13)])
    r = M.ranking_metrics(res, rel, k=10).collect()[0]
    dcg = sum((2.0 ** i - 1) / math.log2(i + 1) for i in range(1, 11))
    idcg = sum(
        (2.0 ** rel - 1) / math.log2(ir + 1)
        for ir, rel in enumerate(range(12, 2, -1), start=1)
    )
    assert r["ndcg"] == pytest.approx(dcg / idcg, rel=1e-12)
    assert 0 < r["ndcg"] < 1


def test_quality_report_macro_average(spark):
    res = _results(
        spark,
        [(1, 1, 10), (1, 2, 11), (2, 1, 20), (2, 2, 21)],
    )
    rel = _rel(spark, [(1, 10, 1.0), (2, 21, 1.0)])
    got = {
        r["metric"]: r["value"]
        for r in M.ranking_quality_report(res, rel, k=2).collect()
    }
    assert set(got) == {"ndcg@2", "mrr@2", "hit_rate@2"}
    assert got["hit_rate@2"] == 1.0
    assert got["mrr@2"] == pytest.approx((1.0 + 0.5) / 2)
    # q1 ndcg = 1; q2 dcg = 1/log2(3), idcg = 1
    assert got["ndcg@2"] == pytest.approx((1.0 + 1.0 / math.log2(3)) / 2)


def test_binary_relevance_from_exact(spark):
    exact = spark.createDataFrame(
        [(1, 1, 10, 0.0), (1, 2, 11, 0.1), (1, 2, 11, 0.1)],
        "query_id long, rank int, id long, distance double",
    )
    rel = M.binary_relevance_from_exact(exact).collect()
    assert sorted((r["query_id"], r["id"], r["rel"]) for r in rel) == [
        (1, 10, 1.0),
        (1, 11, 1.0),
    ]


def test_k_validation(spark):
    res = _results(spark, [(1, 1, 10)])
    rel = _rel(spark, [(1, 10, 1.0)])
    with pytest.raises(ValueError, match="k must be positive"):
        M.ranking_metrics(res, rel, k=0)


def test_quality_sweep_monotone_and_consistent(spark, sf_dir, tmp_path):
    """quality_sweep over a real index: full probe is perfect on every
    metric; metrics are monotone-ish in nprobe (recall exactly monotone;
    ndcg/hit within epsilon of it); ndcg <= recall-style bounds hold
    (binary-relevance ndcg is rank-discounted recall, so ndcg <= 1 and
    hit_rate >= recall for k-sized lists)."""
    from cuda_acceleratedvectordatabaseengine_spark.functions import distance as D
    from cuda_acceleratedvectordatabaseengine_spark.operators import ivf, kmeans
    from cuda_acceleratedvectordatabaseengine_spark.sources import tables

    emb = tables.load(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    )
    init = kmeans.label_centroids(emb)
    idx = ivf.IVFIndex.build(
        corpus, str(tmp_path), "qs", nlist=init.shape[0], metric=D.L2,
        init=init, train=False,
    )
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    rows = M.quality_sweep(
        idx, corpus, queries, k=10, nprobes=(1, 2, idx.manifest.nlist)
    ).collect()
    assert [r["nprobe"] for r in rows] == [1, 2, idx.manifest.nlist]
    full = rows[-1]
    assert full["mean_recall"] == pytest.approx(1.0)
    assert full["ndcg"] == pytest.approx(1.0)
    assert full["mrr"] == pytest.approx(1.0)
    assert full["hit_rate"] == pytest.approx(1.0)
    recalls = [r["mean_recall"] for r in rows]
    assert all(b >= a - 1e-12 for a, b in zip(recalls, recalls[1:]))
    for r in rows:
        assert 0.0 <= r["ndcg"] <= 1.0 + 1e-12
        assert r["hit_rate"] + 1e-12 >= r["mean_recall"]


def test_all_ranks_past_k_scores_zero_not_dropped(spark):
    """ADVICE r8: a query whose result rows ALL sit past rank k must
    score 0 on every metric, not vanish from the per-query output (and
    hence from the macro average)."""
    res = _results(spark, [(1, 1, 100), (2, 6, 200), (2, 7, 201)])
    rel = _rel(spark, [(1, 100, 1.0), (2, 200, 1.0)])
    out = {r["query_id"]: r for r in M.ranking_metrics(res, rel, k=5).collect()}
    assert set(out) == {1, 2}
    assert out[1]["hit_rate"] == 1.0
    assert out[2]["ndcg"] == 0.0
    assert out[2]["mrr"] == 0.0
    assert out[2]["hit_rate"] == 0.0
