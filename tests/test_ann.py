"""Blocked all-pairs and LSH near-dup tests.

Strategy: the blocked dense kernel must agree exactly with a direct SQL
all-pairs oracle (it is exact math, only the execution shape differs); the
LSH path is approximate, so it is scored for recall against the exact
kernel — with planted near-identical vectors, recall over the planted
pairs must be 1.0 at the chosen amplification."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cuda_acceleratedvectordatabaseengine_spark.functions import distance as D
from cuda_acceleratedvectordatabaseengine_spark.operators import ann
from cuda_acceleratedvectordatabaseengine_spark.sources import tables

TAU_L2 = 1.15
TAU_COS = 0.55


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return tables.load(spark, sf_dir, "embeddings")


def _exact_pairs_via_sql(emb, tau, metric):
    a = emb.select(F.col("vec_id").alias("vec_id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("vec_id_b"), F.col("embedding").alias("vb"))
    d2 = D.distance_expr(metric, "va", "vb")
    return (
        a.join(b, F.col("vec_id_a") < F.col("vec_id_b"))
        .select("vec_id_a", "vec_id_b", d2.alias("d2"))
        .filter(F.col("d2") < tau)
    )


@pytest.mark.parametrize("metric,tau", [(D.L2, TAU_L2), (D.COSINE, TAU_COS)])
def test_blocked_matches_rowwise(spark, emb, metric, tau):
    got = {
        (r.vec_id_a, r.vec_id_b): r.d2
        for r in ann.blocked_all_pairs(emb, tau=tau, metric=metric).collect()
    }
    want = {
        (r.vec_id_a, r.vec_id_b): r.d2
        for r in _exact_pairs_via_sql(emb, tau, metric).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_blocked_block_count_invariance(spark, emb):
    """Partitioning must not change results."""
    r4 = sorted(
        (r.vec_id_a, r.vec_id_b)
        for r in ann.blocked_all_pairs(emb, tau=TAU_L2, metric=D.L2, n_blocks=4).collect()
    )
    r16 = sorted(
        (r.vec_id_a, r.vec_id_b)
        for r in ann.blocked_all_pairs(emb, tau=TAU_L2, metric=D.L2, n_blocks=16).collect()
    )
    assert r4 == r16 and len(r4) > 0
    # auto-sizing (n_blocks=None probes count+dim) must agree too
    rauto = sorted(
        (r.vec_id_a, r.vec_id_b)
        for r in ann.blocked_all_pairs(
            emb, tau=TAU_L2, metric=D.L2, n_blocks=None
        ).collect()
    )
    assert rauto == r4


def test_lsh_recall_on_near_pairs(spark, emb):
    exact = ann.blocked_all_pairs(emb, tau=TAU_COS, metric=D.COSINE)
    # tau=0.55 pairs are ~63deg apart (p~0.65/plane) -> weak-similarity
    # regime: 4 planes x 16 tables, expected recall ~0.96 (module docstring)
    approx = ann.lsh_near_dup_pairs(
        emb, tau=TAU_COS, metric=D.COSINE, n_planes=4, n_tables=16
    )
    n_exact = exact.count()
    assert n_exact > 0
    hits = exact.join(
        approx.select("vec_id_a", "vec_id_b"), ["vec_id_a", "vec_id_b"]
    ).count()
    assert hits / n_exact >= 0.6
    # every reported pair must be a true positive (verification is exact)
    extra = approx.join(
        exact.select("vec_id_a", "vec_id_b"), ["vec_id_a", "vec_id_b"], "left_anti"
    ).count()
    assert extra == 0


def test_lsh_deterministic(spark, emb):
    a = sorted(
        (r.vec_id_a, r.vec_id_b)
        for r in ann.lsh_near_dup_pairs(emb, tau=TAU_COS, seed=7).collect()
    )
    b = sorted(
        (r.vec_id_a, r.vec_id_b)
        for r in ann.lsh_near_dup_pairs(emb, tau=TAU_COS, seed=7).collect()
    )
    assert a == b


def test_lsh_empty_input_clear_error(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        ann.lsh_bucket_keys(empty)
    # explicit dim sidesteps inference and yields an empty keyed frame
    assert ann.lsh_bucket_keys(empty, dim=4).count() == 0


def test_lsh_bucket_cap_bounds_degenerate_cluster(spark):
    """An identical-vector cluster larger than max_bucket_size is dropped
    from the candidate join (every table), while small buckets still pair."""
    import numpy as np

    rng = np.random.default_rng(0)
    v1 = rng.standard_normal(16)
    v2 = rng.standard_normal(16)
    rows = [(i, [float(x) for x in v1]) for i in range(30)]
    rows += [(100, [float(x) for x in v2]),
             (101, [float(x) for x in v2 * 1.001])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    ann.shared_cache.release()
    capped = ann.lsh_near_dup_pairs(
        df, tau=0.05, n_planes=4, n_tables=4, max_bucket_size=10
    ).collect()
    assert {(r["vec_id_a"], r["vec_id_b"]) for r in capped} == {(100, 101)}

    ann.shared_cache.release()
    uncapped = ann.lsh_near_dup_pairs(
        df, tau=0.05, n_planes=4, n_tables=4, max_bucket_size=None
    ).collect()
    assert len(uncapped) == 435 + 1
    ann.shared_cache.release()


def test_label_separation_planted_clusters(spark):
    from cuda_acceleratedvectordatabaseengine_spark.operators import ann

    # two tight clusters far apart + one diffuse cluster between them
    rows = []
    vid = 0
    for k, (cx, spread) in enumerate([(0.0, 0.01), (100.0, 0.01), (50.0, 5.0)]):
        for j in range(20):
            rows.append((vid, [cx + spread * ((j % 5) - 2), float(j % 3)], k))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {r["label"]: r for r in ann.label_separation_stats(df).collect()}
    assert set(got) == {0, 1, 2} and all(got[k]["n_vecs"] == 20 for k in got)
    # tight clusters: tiny intra spread; their nearest neighbor is the
    # diffuse middle cluster, not each other
    assert got[0]["intra_mean"] < 2.0 and got[1]["intra_mean"] < 2.0
    assert got[0]["nearest_label"] == 2 and got[1]["nearest_label"] == 2
    # diffuse cluster spreads wider and sits equidistant: ratio is larger
    assert got[2]["separation_ratio"] > got[0]["separation_ratio"]
    assert got[0]["separation_ratio"] < 0.1


def test_cluster_assign_keys_nearest_first(spark, emb):
    import numpy as np

    from cuda_acceleratedvectordatabaseengine_spark.operators import kmeans

    C = kmeans.label_centroids(emb)
    keys = ann.cluster_assign_keys(emb, C, assign_m=2).collect()
    by_vec = {}
    for r in keys:
        by_vec.setdefault(r["vec_id"], []).append(r["list_id"])
    V = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
         for r in emb.collect()}
    assert all(len(v) == 2 for v in by_vec.values())
    for vid, lists in by_vec.items():
        d = ((C - V[vid]) ** 2).sum(axis=1)
        order = np.lexsort((np.arange(len(C)), d))[:2]
        assert sorted(lists) == sorted(int(x) for x in order)


def test_cluster_assign_m_bounds(spark, emb):
    from cuda_acceleratedvectordatabaseengine_spark.operators import kmeans

    C = kmeans.label_centroids(emb)
    with pytest.raises(ValueError, match="assign_m"):
        ann.cluster_assign_keys(emb, C, assign_m=0)
    with pytest.raises(ValueError, match="assign_m"):
        ann.cluster_assign_keys(emb, C, assign_m=len(C) + 1)


def test_cluster_near_dup_full_assignment_is_exact(spark, emb):
    """assign_m = nlist makes every pair share a bucket — the cluster
    blocker degenerates to the exact all-pairs result (recall = 1)."""
    from cuda_acceleratedvectordatabaseengine_spark.operators import kmeans

    C = kmeans.label_centroids(emb)
    got = {
        (r.vec_id_a, r.vec_id_b): r.d2
        for r in ann.cluster_near_dup_pairs(
            emb, C, tau=TAU_COS, metric=D.COSINE, assign_m=len(C)
        ).collect()
    }
    want = {
        (r.vec_id_a, r.vec_id_b): r.d2
        for r in _exact_pairs_via_sql(emb, TAU_COS, D.COSINE).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_cluster_near_dup_precision_and_recall(spark, emb):
    """Precision is structural 1.0 (exact verify); recall is bucket-
    boundary-dependent but must be real signal at m=2 and monotone in m
    (more probes can only add shared buckets)."""
    from cuda_acceleratedvectordatabaseengine_spark.operators import kmeans

    C = kmeans.label_centroids(emb)

    def pairs(m):
        return {
            (r.vec_id_a, r.vec_id_b)
            for r in ann.cluster_near_dup_pairs(
                emb, C, tau=TAU_COS, metric=D.COSINE, assign_m=m
            ).collect()
        }

    want = {
        (r.vec_id_a, r.vec_id_b)
        for r in _exact_pairs_via_sql(emb, TAU_COS, D.COSINE).collect()
    }
    got2, got4 = pairs(2), pairs(4)
    assert got2 <= want and got4 <= want  # no false positives, ever
    assert got2 <= got4  # monotone candidate coverage in assign_m
    assert len(got2) >= 0.6 * len(want)  # tau=0.55 is WEAK similarity —
    # boundary-straddling pairs are expected; raise assign_m for recall


def test_semantic_dedup_groups_and_survivors(spark, sf_dir):
    """semantic_dedup labels every input id, keeps exactly the canonical
    minimum-id member per near-dup group, and its survivor set matches
    resolving the pair graph by hand."""
    from cuda_acceleratedvectordatabaseengine_spark.operators import ann, kmeans
    from cuda_acceleratedvectordatabaseengine_spark.sources import tables

    base = tables.load(spark, sf_dir, "embeddings")
    # plant guaranteed near-duplicate groups: exact copies of three
    # existing vectors under new ids (cosine distance 0, same bucket)
    clones = base.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    emb = base.select("vec_id", "embedding", "label").unionByName(clones)
    C = kmeans.label_centroids(base)
    tau = 0.35
    rows = ann.semantic_dedup(
        emb, C, tau=tau, assign_m=2, assign_metric="l2"
    ).collect()
    n = emb.count()
    assert len(rows) == n  # every id labeled, singletons included
    by_id = {r["vec_id"]: r for r in rows}
    # hand-resolve the same pair graph
    pairs = ann.cluster_near_dup_pairs(
        emb, C, tau=tau, assign_m=2, assign_metric="l2"
    ).collect()
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for p in pairs:
        a, b = find(p["vec_id_a"]), find(p["vec_id_b"])
        if a != b:
            parent[max(a, b)] = min(a, b)
    for r in rows:
        want = find(r["vec_id"])
        assert r["component"] == want
        assert r["keep"] == (r["vec_id"] == want)
    # at least one real multi-member group at this tau, and per group
    # exactly one survivor = the minimum id
    groups: dict = {}
    for r in rows:
        groups.setdefault(r["component"], []).append(r)
    multi = [g for g in groups.values() if len(g) > 1]
    assert multi
    for g in multi:
        keepers = [r["vec_id"] for r in g if r["keep"]]
        assert keepers == [min(r["vec_id"] for r in g)]


def test_semantic_dedup_accepts_precomputed_pairs(spark, sf_dir):
    """The pairs= seam: handing semantic_dedup the edges it would have
    generated yields identical output (catalog rows share one persisted
    pair graph through this)."""
    from cuda_acceleratedvectordatabaseengine_spark.operators import ann, kmeans
    from cuda_acceleratedvectordatabaseengine_spark.sources import tables

    emb = tables.load(spark, sf_dir, "embeddings")
    C = kmeans.label_centroids(emb)
    tau = 0.35
    pairs = ann.cluster_near_dup_pairs(
        emb, C, tau=tau, assign_m=2, assign_metric="l2"
    )
    own = ann.semantic_dedup(
        emb, C, tau=tau, assign_m=2, assign_metric="l2"
    ).collect()
    given = ann.semantic_dedup(
        emb, C, tau=tau, assign_m=2, assign_metric="l2", pairs=pairs
    ).collect()
    key = lambda r: (r["vec_id"], r["component"], r["keep"])
    assert sorted(map(key, own)) == sorted(map(key, given))
