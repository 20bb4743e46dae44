from __future__ import annotations

import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuda_acceleratedvectordatabaseengine_spark.functions import distance as D
from cuda_acceleratedvectordatabaseengine_spark.operators import ivf, kmeans
from cuda_acceleratedvectordatabaseengine_spark.sources import arrow_ipc, snapshot, tables


@pytest.fixture(scope="module")
def emb_corpus(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings")
    return emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    )


@pytest.fixture(scope="module")
def built(spark, sf_dir, emb_corpus, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("snap_src"))
    emb = tables.load(spark, sf_dir, "embeddings")
    init = kmeans.label_centroids(emb)
    idx = ivf.IVFIndex.build(
        emb_corpus, base, "snap_idx", nlist=10, metric=D.L2, init=init, train=False
    )
    snap_dir = str(tmp_path_factory.mktemp("snap_out") / "snap1")
    summary = snapshot.export_epoch(idx, snap_dir)
    return idx, snap_dir, summary


def test_export_summary_and_layout(built):
    idx, snap_dir, summary = built
    assert summary["num_vectors"] == idx.manifest.num_vectors
    assert summary["nlist"] == idx.manifest.nlist
    assert os.path.isfile(os.path.join(snap_dir, "manifest.json"))
    assert os.path.isfile(os.path.join(snap_dir, "centroids.arrow"))
    lists = os.listdir(os.path.join(snap_dir, "vectors"))
    assert all(d.startswith("list_id=") for d in lists) and lists


def test_import_roundtrip_preserves_everything(spark, built, emb_corpus, tmp_path):
    idx, snap_dir, _ = built
    imported = snapshot.import_snapshot(spark, snap_dir, str(tmp_path), "snap_rt")
    np.testing.assert_array_equal(imported.centroids, idx.centroids)
    a = {
        (r["id"], r["list_id"], tuple(r["vector"]))
        for r in idx.vectors.collect()
    }
    b = {
        (r["id"], r["list_id"], tuple(r["vector"]))
        for r in imported.vectors.collect()
    }
    assert a == b
    qdf = emb_corpus.filter(F.col("id") < 10).select(
        F.col("id").alias("query_id"), F.col("vector").alias("qvec")
    )
    ra = sorted(map(tuple, idx.search(qdf, k=5, nprobe=3).collect()))
    rb = sorted(map(tuple, imported.search(qdf, k=5, nprobe=3).collect()))
    assert ra == rb


def test_snapshot_list_files_use_reference_framing(spark, built):
    # each per-list file parses with the reference IPC reader path
    idx, snap_dir, _ = built
    lists = sorted(os.listdir(os.path.join(snap_dir, "vectors")))
    lid = int(lists[0].split("=")[1])
    got = arrow_ipc.read_vectors(
        spark, os.path.join(snap_dir, "vectors", lists[0])
    )
    expect = idx.vectors.filter(F.col("list_id") == lid)
    g = {(r["id"], tuple(r["vector"])) for r in got.collect()}
    e = {(r["id"], tuple(r["vector"])) for r in expect.collect()}
    assert g == e


def test_truncated_snapshot_fails_import(spark, built, tmp_path):
    _idx, snap_dir, _ = built
    broken = str(tmp_path / "broken")
    shutil.copytree(snap_dir, broken)
    lists = sorted(os.listdir(os.path.join(broken, "vectors")))
    shutil.rmtree(os.path.join(broken, "vectors", lists[0]))
    with pytest.raises(ValueError, match="row mismatch"):
        snapshot.import_snapshot(spark, broken, str(tmp_path), "snap_bad")
