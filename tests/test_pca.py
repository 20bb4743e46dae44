from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuda_acceleratedvectordatabaseengine_spark.operators import pca
from cuda_acceleratedvectordatabaseengine_spark.sources import tables


@pytest.fixture(scope="module")
def emb_src(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings")
    return emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))


@pytest.fixture(scope="module")
def emb_matrix(emb_src):
    rows = emb_src.orderBy("id").collect()
    return (
        np.asarray([r["id"] for r in rows]),
        np.asarray([r["vector"] for r in rows], dtype=np.float64),
    )


def test_moments_match_driver(spark, emb_src, emb_matrix):
    _ids, V = emb_matrix
    n, s, G = pca.moments(emb_src)
    assert n == V.shape[0]
    np.testing.assert_allclose(s, V.sum(axis=0), rtol=1e-12)
    np.testing.assert_allclose(G, V.T @ V, rtol=1e-12)


def test_covariance_matches_numpy(spark, emb_src, emb_matrix):
    _ids, V = emb_matrix
    mean, C, n = pca.covariance(emb_src)
    np.testing.assert_allclose(mean, V.mean(axis=0), rtol=1e-12)
    np.testing.assert_allclose(C, np.cov(V, rowvar=False), rtol=1e-9, atol=1e-12)


def test_components_orthonormal_and_descending(spark, emb_src):
    model = pca.train_pca(emb_src, n_components=8)
    WWt = model.components @ model.components.T
    np.testing.assert_allclose(WWt, np.eye(8), atol=1e-9)
    ev = model.explained_variance
    assert all(ev[i] >= ev[i + 1] - 1e-12 for i in range(len(ev) - 1))
    assert (ev >= -1e-12).all()


def test_sign_convention_deterministic(spark, emb_src):
    a = pca.train_pca(emb_src, n_components=4)
    b = pca.train_pca(emb_src, n_components=4)
    np.testing.assert_array_equal(a.components, b.components)
    for row in a.components:
        assert row[np.argmax(np.abs(row))] > 0


def test_transform_matches_driver_projection(spark, emb_src, emb_matrix):
    ids, V = emb_matrix
    model = pca.train_pca(emb_src, n_components=6)
    got = {r["id"]: np.asarray(r["pca"]) for r in pca.transform(emb_src, model).collect()}
    expect = model.project_matrix(V)
    for i, vid in enumerate(ids):
        np.testing.assert_allclose(got[vid], expect[i], rtol=1e-9, atol=1e-12)


def test_reconstruction_error_decreases_with_k(spark, emb_src, emb_matrix):
    _ids, V = emb_matrix
    errs = []
    for k in (2, 8, 32):
        model = pca.train_pca(emb_src, n_components=k)
        P = model.project_matrix(V)
        recon = P @ model.components + model.mean
        errs.append(float(((V - recon) ** 2).sum()))
    assert errs[0] > errs[1] > errs[2]


def test_validation(spark, emb_src):
    with pytest.raises(ValueError, match="n_components"):
        pca.train_pca(emb_src, n_components=0)
    with pytest.raises(ValueError, match="n_components"):
        pca.train_pca(emb_src, n_components=10_000)
    empty = emb_src.filter(F.col("id") < 0)
    with pytest.raises(ValueError, match="empty"):
        pca.moments(empty)
