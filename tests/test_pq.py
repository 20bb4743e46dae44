from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuda_acceleratedvectordatabaseengine_spark.functions import distance as D
from cuda_acceleratedvectordatabaseengine_spark.metrics import mean_recall
from cuda_acceleratedvectordatabaseengine_spark.operators import ivf, kmeans, knn, pq
from cuda_acceleratedvectordatabaseengine_spark.sources import tables


@pytest.fixture(scope="module")
def emb_corpus(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings")
    return emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))


@pytest.fixture(scope="module")
def emb_queries(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


@pytest.fixture(scope="module")
def pq_index(spark, sf_dir, emb_corpus, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("pq_indexes"))
    emb = tables.load(spark, sf_dir, "embeddings")
    init = kmeans.label_centroids(emb)
    base_ivf = ivf.IVFIndex.build(
        emb_corpus, base, "emb_pq", nlist=10, metric=D.L2, init=init, train=False
    )
    return pq.IVFPQIndex.build_from_ivf(base_ivf, m=16, nbits=8, seed=42)


def test_codebook_shapes(pq_index):
    assert pq_index.codebooks.shape == (16, 256, 4)  # d=64, m=16 -> dsub=4
    assert pq_index.codes.count() == pq_index.vectors.count()


def test_adc_equals_reconstructed_distance(pq_index):
    # ADC distance(q, v) must EXACTLY equal exact distance(q, reconstruct(v))
    # — that's the definition of the T5/T6 decomposition
    rows = pq_index.codes.limit(50).collect()
    codes = np.frombuffer(b"".join(r["codes"] for r in rows), dtype=np.uint8).reshape(
        len(rows), 16
    )
    rng = np.random.default_rng(0)
    Q = rng.normal(size=(3, 64))
    lut = pq.adc_tables(Q, pq_index.codebooks, D.L2)
    recon = pq.reconstruct(codes, pq_index.codebooks)
    for qi in range(3):
        adc = pq.adc_scan_batch(codes, lut[qi])
        direct = ((recon - Q[qi]) ** 2).sum(axis=1)
        assert np.allclose(adc, direct, atol=1e-8)


def test_pq_search_recall_and_rerank(spark, pq_index, emb_corpus, emb_queries):
    exact = knn.exact_knn(emb_corpus, emb_queries, k=10, metric=D.L2)
    approx = pq_index.search(emb_queries, k=10, nprobe=10)
    r_pq = mean_recall(approx, exact)
    reranked = pq_index.search(
        emb_queries, k=10, nprobe=10, rerank_exact=True, rerank_k=50
    )
    r_rr = mean_recall(reranked, exact)
    # m=16/nbits=8 on 64-d is a fine quantizer; rerank must not hurt
    assert r_pq > 0.6, r_pq
    assert r_rr >= r_pq, (r_rr, r_pq)
    assert r_rr > 0.9, r_rr


def test_rerank_distances_are_exact(spark, pq_index, emb_corpus, emb_queries):
    reranked = pq_index.search(
        emb_queries, k=5, nprobe=10, rerank_exact=True, rerank_k=50
    )
    exact = knn.exact_knn(emb_corpus, emb_queries, k=200, metric=D.L2)
    e = {(r["query_id"], r["id"]): r["distance"] for r in exact.collect()}
    for r in reranked.collect():
        key = (r["query_id"], r["id"])
        if key in e:
            assert abs(r["distance"] - e[key]) < 1e-9


def test_pq_exact_when_quantizer_lossless(spark):
    # 16 distinct vectors, ks=256 codewords, m=d: every vector becomes its
    # own codeword -> ADC degenerates to exact search (SURVEY §7 validation)
    rng = np.random.default_rng(5)
    V = rng.normal(size=(16, 8)).astype(np.float32)
    rows = [(i, [float(x) for x in V[i]], 0) for i in range(16)]
    df = spark.createDataFrame(rows, "id long, vector array<float>, list_id int")
    codebooks = pq.train_pq(df, m=8, nbits=8, seed=1)
    codes_df = pq.encode(df, codebooks)
    rows2 = codes_df.orderBy("id").collect()
    codes = np.frombuffer(b"".join(r["codes"] for r in rows2), dtype=np.uint8).reshape(
        16, 8
    )
    recon = pq.reconstruct(codes, codebooks)
    assert np.allclose(recon, V.astype(np.float64), atol=1e-6)


def test_cosine_rejected_for_adc(pq_index, emb_queries):
    with pytest.raises(ValueError, match="normalize"):
        pq_index.search(emb_queries, k=5, metric="cosine")


def test_manifest_records_pq(pq_index):
    m = pq_index.manager.read_manifest(pq_index.epoch)
    assert m.pq == {
        "m": 16, "nbits": 8, "scope": "chain", "rotated": False,
        "residual": False,
    }


def test_rerank_sparse_large_query_ids(spark, pq_index):
    # rerank must map query ids positionally: huge sparse int64 ids must not
    # allocate O(max_id) nor mis-route scores (ADVICE r01)
    base = pq_index.vectors.limit(3).collect()
    rows = [
        ((1 << 40) + i * 7919, [float(x) for x in r["vector"]])
        for i, r in enumerate(base)
    ]
    qdf = spark.createDataFrame(rows, "query_id long, qvec array<float>")
    res = pq_index.search(qdf, k=1, nprobe=10, rerank_exact=True, rerank_k=20)
    got = {r["query_id"]: (r["id"], r["distance"]) for r in res.collect()}
    for (qid, _), r in zip(rows, base):
        assert got[qid][0] == r["id"]
        assert got[qid][1] < 1e-9  # each query IS a corpus vector


def test_codebook_build_deterministic_under_thread_pool(spark, emb_corpus):
    """B5 codebooks are trained per-subspace on a thread pool; the k-means++
    inits stay sequential on the ONE seeded rng, so two builds with the same
    seed must produce bit-identical codebooks (and two different seeds must
    not)."""
    src = emb_corpus.orderBy("id").limit(500)
    a = pq.train_pq(src, m=16, nbits=4, seed=42)
    b = pq.train_pq(src, m=16, nbits=4, seed=42)
    c = pq.train_pq(src, m=16, nbits=4, seed=7)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_pq_encode_over_chained_epoch(spark, emb_corpus, tmp_path):
    """build_from_ivf on a delta-chained epoch encodes the full UNIONED
    corpus into the delta epoch's codes dir — PQ search over a chain works
    after re-encoding, reaching both generations."""
    mid = emb_corpus.agg(F.expr("percentile(id, 0.5)")).collect()[0][0]
    init = np.asarray(
        [r["vector"] for r in emb_corpus.orderBy("id").limit(10).collect()],
        dtype=np.float64,
    )
    base = ivf.IVFIndex.build(
        emb_corpus.filter(F.col("id") < mid), str(tmp_path), "pq_chain",
        nlist=10, metric=D.L2, init=init, train=False,
    )
    chained = base.add(emb_corpus.filter(F.col("id") >= mid))
    pq_idx = pq.IVFPQIndex.build_from_ivf(chained, m=16, nbits=8, seed=42)
    assert pq_idx.codes.count() == emb_corpus.count()  # full union encoded

    probe_delta = emb_corpus.agg(F.max("id")).collect()[0][0]
    q = emb_corpus.filter(F.col("id") == probe_delta).select(
        F.col("id").alias("query_id"), F.col("vector").alias("qvec")
    )
    got = pq_idx.search(q, k=3, nprobe=10, rerank_exact=True, rerank_k=10).collect()
    assert got and got[0]["id"] == probe_delta  # delta vector reachable, top-1


def test_train_pq_distributed_matches_driver(spark, emb_corpus):
    """Past the driver ceiling the Lloyd iterations run distributed
    (partial-sums reduce); same seed + same sample must give the same
    codebooks as the driver path — the init stream is shared and the
    update is the same mean, only the summation is distributed."""
    src = emb_corpus.orderBy("id").limit(400)
    a = pq.train_pq(src, m=16, nbits=4, seed=42)
    b = pq.train_pq(src, m=16, nbits=4, seed=42, driver_threshold=0)
    assert a.shape == b.shape
    assert np.allclose(a, b, rtol=1e-9, atol=1e-9)


# -- OPQ-lite (rotated PQ) ---------------------------------------------------


def _correlated_df(spark, n=2000, d=32, latent=4, seed=7):
    """Strongly correlated corpus: a low-rank latent mixed across all d
    dims — the case where raw subspaces quantize poorly and a
    decorrelating rotation should help."""
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(latent, d))
    Z = rng.normal(size=(n, latent))
    V = (Z @ A + 0.05 * rng.normal(size=(n, d))).astype(np.float32)
    rows = [(i, [float(x) for x in V[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "id long, vector array<float>").repartition(8),
        V,
    )


def test_train_rotation_is_orthonormal_and_deterministic(spark):
    df, _ = _correlated_df(spark)
    R1 = pq.train_rotation(df, m=4)
    R2 = pq.train_rotation(df, m=4)
    assert R1.shape == (32, 32)
    assert np.allclose(R1 @ R1.T, np.eye(32), atol=1e-8)
    assert np.array_equal(R1, R2)
    with pytest.raises(ValueError, match="divisible"):
        pq.train_rotation(df, m=5)


def test_rotation_balances_subspace_variance(spark):
    """Eigenvalue allocation: per-subspace variance of the ROTATED data is
    orders of magnitude more balanced than plain PCA ordering (which
    stuffs the whole low-rank latent into the first block)."""
    df, V = _correlated_df(spark)
    m, dsub = 4, 8

    def spread(W):
        P = (V - V.mean(0)) @ W.T
        var = P.var(axis=0).reshape(m, dsub).sum(axis=1)
        return var.max() / max(var.min(), 1e-12)

    R = pq.train_rotation(df, m=m)
    from cuda_acceleratedvectordatabaseengine_spark.operators import pca

    plain = pca.train_pca(df, n_components=32).components  # PCA order
    assert spread(R) < spread(plain) / 10


def test_rotate_vectors_preserves_distances(spark):
    df, V = _correlated_df(spark, n=200)
    R = pq.train_rotation(df, m=4)
    rot = {r["id"]: np.array(r["vector"]) for r in
           pq.rotate_vectors(df, R, list_col=None).collect()}
    P = np.stack([rot[i] for i in range(len(V))])
    G0 = V.astype(np.float64) @ V.astype(np.float64).T
    G1 = P @ P.T
    assert np.allclose(G0, G1, atol=1e-3)  # Gram matrix -> L2 + IP preserved


@pytest.fixture(scope="module")
def opq_pair(spark, tmp_path_factory):
    """Plain-PQ and rotated-PQ indexes over the same correlated corpus."""
    base = str(tmp_path_factory.mktemp("opq_indexes"))
    df, V = _correlated_df(spark)
    init = kmeans.train(df.limit(500), 4, seed=1).centroids
    plain_ivf = ivf.IVFIndex.build(
        df, base, "plain", nlist=4, metric=D.L2, init=init, train=False
    )
    rot_ivf = ivf.IVFIndex.build(
        df, base, "rot", nlist=4, metric=D.L2, init=init, train=False
    )
    plain = pq.IVFPQIndex.build_from_ivf(plain_ivf, m=8, nbits=4, seed=42)
    rot = pq.IVFPQIndex.build_from_ivf(
        rot_ivf, m=8, nbits=4, seed=42, rotate=True
    )
    qdf = df.filter(F.col("id") < 8).select(
        F.col("id").alias("query_id"), F.col("vector").alias("qvec")
    )
    return df, qdf, plain, rot, base


def test_opq_recall_beats_plain_pq_on_correlated_data(spark, opq_pair):
    df, qdf, plain, rot, _ = opq_pair
    exact = knn.exact_knn(df, qdf, k=10, metric=D.L2)
    r_plain = mean_recall(plain.search(qdf, k=10, nprobe=4), exact)
    r_rot = mean_recall(rot.search(qdf, k=10, nprobe=4), exact)
    # the rotation exists to shrink quantization error on exactly this
    # data shape; equality would mean the rotation did nothing
    assert r_rot > r_plain, (r_rot, r_plain)
    assert rot.manifest.pq["rotated"] is True
    assert plain.manifest.pq["rotated"] is False


def test_opq_roundtrip_load_and_delta_inherit(spark, opq_pair):
    df, qdf, _plain, rot, base = opq_pair
    loaded = pq.IVFPQIndex.load(spark, base, "rot")
    assert loaded.rotation is not None
    assert np.allclose(loaded.rotation, rot.rotation)
    want = sorted(
        (r["query_id"], r["rank"], r["id"])
        for r in rot.search(qdf, k=5, nprobe=4).collect()
    )
    got = sorted(
        (r["query_id"], r["rank"], r["id"])
        for r in loaded.search(qdf, k=5, nprobe=4).collect()
    )
    assert got == want

    # delta add inherits the rotation: new ids reachable, manifest rotated
    ivf_rot = ivf.IVFIndex.load(spark, base, "rot")
    delta = df.filter(F.col("id") < 5).select(
        (F.col("id") + 10_000).alias("id"), "vector"
    )
    tip = ivf_rot.add(delta, activate=True)
    pq_tip = pq.IVFPQIndex.encode_delta(tip)
    assert pq_tip.manifest.pq["rotated"] is True
    probe = df.filter(F.col("id") == 2).select(
        F.col("id").alias("query_id"), F.col("vector").alias("qvec")
    )
    hits = {r["id"] for r in pq_tip.search(probe, k=3, nprobe=4).collect()}
    assert 10_002 in hits or 2 in hits  # clone pair dominates the top


def test_opq_inner_product_metric_consistent(spark, tmp_path):
    """Rotation preserves inner products, so a rotated index searched
    under IP must (a) rank by rotated-ADC scores consistent with exact IP
    after rerank, and (b) match the PLAIN index's reranked result exactly
    (both rerank against the same raw vectors)."""
    base = str(tmp_path)
    df, _ = _correlated_df(spark, n=600, seed=21)
    init = kmeans.train(df.limit(300), 4, seed=2, metric=D.INNER_PRODUCT).centroids
    mk = lambda name, rot: pq.IVFPQIndex.build_from_ivf(
        ivf.IVFIndex.build(
            df, base, name, nlist=4, metric=D.INNER_PRODUCT,
            init=init, train=False,
        ),
        m=8, nbits=4, seed=42, rotate=rot,
    )
    plain, rot = mk("p_ip", False), mk("r_ip", True)
    qdf = df.filter(F.col("id") < 5).select(
        F.col("id").alias("query_id"), F.col("vector").alias("qvec")
    )
    exact = knn.exact_knn(df, qdf, k=5, metric=D.INNER_PRODUCT)
    kw = dict(k=5, nprobe=4, rerank_exact=True, rerank_k=60)
    got_rot = sorted(
        (r["query_id"], r["rank"], r["id"], round(r["distance"], 9))
        for r in rot.search(qdf, **kw).collect()
    )
    got_plain = sorted(
        (r["query_id"], r["rank"], r["id"], round(r["distance"], 9))
        for r in plain.search(qdf, **kw).collect()
    )
    want = sorted(
        (r["query_id"], r["rank"], r["id"], round(r["distance"], 9))
        for r in exact.collect()
    )
    assert got_rot == want
    assert got_plain == want


# ---------------------------------------------------------------------------
# residual IVF-PQ (FAISS-standard: quantize v - coarse_centroid)
# ---------------------------------------------------------------------------
def _clustered_df(spark, n=1500, d=32, k=5, seed=11):
    """Well-separated clusters with small within-cluster spread — the
    regime where residual encoding pays: cluster offsets dominate raw
    vectors, so plain PQ wastes codewords re-describing them."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=8.0, size=(k, d))
    lab = rng.integers(0, k, size=n)
    V = (centers[lab] + 0.5 * rng.normal(size=(n, d))).astype(np.float32)
    rows = [(i, [float(x) for x in V[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "id long, vector array<float>")
        .repartition(8),
        V,
    )


@pytest.fixture(scope="module")
def residual_pair(spark, tmp_path_factory):
    """Plain and residual PQ indexes over the same clustered corpus,
    identical coarse structure and code budget."""
    base = str(tmp_path_factory.mktemp("respq_indexes"))
    df, V = _clustered_df(spark)
    init = kmeans.train(df.limit(800), 5, seed=3).centroids
    plain_ivf = ivf.IVFIndex.build(
        df, base, "plain", nlist=5, metric=D.L2, init=init, train=False
    )
    res_ivf = ivf.IVFIndex.build(
        df, base, "res", nlist=5, metric=D.L2, init=init, train=False
    )
    plain = pq.IVFPQIndex.build_from_ivf(plain_ivf, m=8, nbits=4, seed=42)
    res = pq.IVFPQIndex.build_from_ivf(
        res_ivf, m=8, nbits=4, seed=42, residual=True
    )
    qdf = df.filter(F.col("id") < 8).select(
        F.col("id").alias("query_id"), F.col("vector").alias("qvec")
    )
    return df, qdf, plain, res, base


def test_residual_recall_beats_plain_on_clustered_data(spark, residual_pair):
    df, qdf, plain, res, _base = residual_pair
    assert res.residual and not plain.residual
    assert res.manifest.pq["residual"] is True
    exact = knn.exact_knn(df, qdf, k=10, metric=D.L2)
    r_plain = mean_recall(plain.search(qdf, k=10, nprobe=5), exact)
    r_res = mean_recall(res.search(qdf, k=10, nprobe=5), exact)
    # clear dominance, not just a tie (measured 0.41 vs 0.26 at this
    # budget; the gap is the cluster offsets plain PQ wastes codes on)
    assert r_res >= r_plain + 0.1, (r_res, r_plain)


def test_residual_adc_equals_reconstructed_distance(spark, residual_pair):
    """Residual ADC distance == exact distance to the RECONSTRUCTED
    vector (centroid + decoded residual) for both L2 and IP — the
    defining identity of the encoding."""
    df, qdf, _plain, res, _base = residual_pair
    codes = {
        r["id"]: (r["list_id"], np.frombuffer(bytes(r["codes"]), np.uint8))
        for r in res.codes.collect()
    }
    qv = {r["query_id"]: np.array(r["qvec"], np.float64) for r in qdf.collect()}
    got = {
        (r["query_id"], r["id"]): r["distance"]
        for r in res.search(qdf, k=1000, nprobe=5).collect()
    }
    assert got
    checked = 0
    for (q, i), dist in list(got.items())[:500]:
        lid, c = codes[i]
        recon = res.centroids[lid] + pq.reconstruct(
            c[None, :], res.codebooks
        )[0]
        want = float(((qv[q] - recon) ** 2).sum())
        assert abs(dist - want) < 1e-6
        checked += 1
    assert checked == 500


def test_residual_ip_metric_constant_shift(spark, tmp_path):
    """IP residual ADC: -(q.v) = -(q.c) - (q.r) — the per-(query, list)
    constant path — equals brute force over reconstructed vectors."""
    df, V = _clustered_df(spark, n=400, d=16, k=3, seed=23)
    init = kmeans.train(df.limit(400), 3, seed=9).centroids
    base_ivf = ivf.IVFIndex.build(
        df, str(tmp_path), "ipres", nlist=3, metric=D.INNER_PRODUCT,
        init=init, train=False,
    )
    res = pq.IVFPQIndex.build_from_ivf(
        base_ivf, m=4, nbits=4, seed=7, residual=True
    )
    qdf = df.filter(F.col("id") < 4).select(
        F.col("id").alias("query_id"), F.col("vector").alias("qvec")
    )
    codes = {
        r["id"]: (r["list_id"], np.frombuffer(bytes(r["codes"]), np.uint8))
        for r in res.codes.collect()
    }
    qv = {r["query_id"]: np.array(r["qvec"], np.float64) for r in qdf.collect()}
    rows = res.search(qdf, k=400, nprobe=3, metric=D.INNER_PRODUCT).collect()
    assert rows
    for r in rows[:200]:
        lid, c = codes[r["id"]]
        recon = res.centroids[lid] + pq.reconstruct(c[None, :], res.codebooks)[0]
        want = -float(qv[r["query_id"]] @ recon)
        assert abs(r["distance"] - want) < 1e-6


def test_residual_delta_inherit_and_roundtrip_load(spark, residual_pair):
    """encode_delta inherits the residual flag (delta codes live in the
    same residual space), the folded chain serves identically to a full
    re-encode, and load() restores the flag from the manifest."""
    df, qdf, _plain, res, base = residual_pair
    delta_src = df.select((F.col("id") + 10000).alias("id"), "vector")
    delta_ivf = res.manager  # reuse manager through the IVF handle
    base_ivf = ivf.IVFIndex.load(spark, base, "res")
    delta = base_ivf.add(delta_src.limit(200))
    chained = pq.IVFPQIndex.encode_delta(delta)
    assert chained.residual and chained.manifest.pq["residual"] is True
    loaded = pq.IVFPQIndex.load(spark, base, "res")
    assert loaded.residual
    got = {
        (r["query_id"], r["rank"], r["id"])
        for r in chained.search(qdf, k=10, nprobe=5).collect()
    }
    # full re-encode of the same chain must rank identically
    full = pq.IVFPQIndex.encode_epoch(
        delta, chained.codebooks, scope="chain", residual=True
    )
    want = {
        (r["query_id"], r["rank"], r["id"])
        for r in full.search(qdf, k=10, nprobe=5).collect()
    }
    assert got == want


def test_pq4_end_to_end_search(spark, sf_dir, emb_corpus, emb_queries, tmp_path):
    """nbits=4 (FAISS PQ4, ks=16) through the FULL path — build, ADC
    identity, search, exact rerank: the low-bit tier was previously only
    train-tested. Rerank from a 4-bit shortlist must recover most of the
    exact top-k even though raw PQ4 recall is weak at d=64/m=16."""
    emb = tables.load(spark, sf_dir, "embeddings")
    init = kmeans.label_centroids(emb)
    base = ivf.IVFIndex.build(
        emb_corpus, str(tmp_path), "emb_pq4", nlist=10, metric=D.L2,
        init=init, train=False,
    )
    idx = pq.IVFPQIndex.build_from_ivf(base, m=16, nbits=4, seed=42)
    assert idx.codebooks.shape == (16, 16, 4)  # ks = 2^4
    # codes stay one byte per subquantizer, values < 16
    rows = idx.codes.limit(20).collect()
    codes = np.frombuffer(
        b"".join(r["codes"] for r in rows), dtype=np.uint8
    ).reshape(len(rows), 16)
    assert codes.max() < 16
    # the T5/T6 ADC identity holds at any nbits
    rng = np.random.default_rng(1)
    Q = rng.normal(size=(2, 64))
    lut = pq.adc_tables(Q, idx.codebooks, D.L2)
    recon = pq.reconstruct(codes, idx.codebooks)
    for qi in range(2):
        adc = pq.adc_scan_batch(codes, lut[qi])
        assert np.allclose(adc, ((recon - Q[qi]) ** 2).sum(axis=1), atol=1e-8)
    exact = knn.exact_knn(emb_corpus, emb_queries, k=10, metric=D.L2)
    reranked = idx.search(
        emb_queries, k=10, nprobe=10, rerank_exact=True, rerank_k=100
    )
    r_rr = mean_recall(reranked, exact)
    assert r_rr > 0.6, r_rr
