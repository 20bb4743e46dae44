"""Packed float32-binary epoch layout (vector_layout="packed_f32"):
bit-identical search results vs the array<float> layout across the whole
verb surface — search / rerank / range / delta add / delete / compact /
SQ sidecar / retrain / snapshot — since scanners are layout-polymorphic
(arrowkit.list_matrix). The layout exists for Arrow-transfer speed
(~1.9x on the scan shape, scripts/ab_binary_layout.py, PERF.md r9);
this file pins that it changes NOTHING semantically."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cuda_acceleratedvectordatabaseengine_spark.operators import ivf, knn
from cuda_acceleratedvectordatabaseengine_spark.sources import epochs, tables

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return (
        tables.load(spark, SF, "embeddings")
        .select(F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))
    )


def _queries(emb, n=16):
    return emb.orderBy("id").limit(n).select(
        F.col("id").alias("query_id"), F.col("vector").alias("qvec")
    )


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["id"], round(r["distance"], 9))
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def pair(spark, tmp_path_factory):
    """The same corpus built under both layouts with identical centroids."""
    base = str(tmp_path_factory.mktemp("packed_pair"))
    emb = _emb(spark)
    from cuda_acceleratedvectordatabaseengine_spark.operators import kmeans

    model = kmeans.train(emb, 8, seed=7)
    a = ivf.IVFIndex.build(
        emb, base, "lst", nlist=8, init=model.centroids, train=False
    )
    b = ivf.IVFIndex.build(
        emb, base, "pkd", nlist=8, init=model.centroids, train=False,
        vector_layout="packed_f32",
    )
    return a, b


def test_manifest_and_schema(spark, pair):
    a, b = pair
    # the RESOLVED layout is always stamped (r10): an unstamped manifest
    # would make an explicit "list" delta on a packed chain unexpressable
    assert a.manifest.extra["vector_layout"] == "list"
    assert b.manifest.extra["vector_layout"] == "packed_f32"
    assert isinstance(b.vectors.schema["vector"].dataType, T.BinaryType)
    assert isinstance(a.vectors.schema["vector"].dataType, T.ArrayType)
    assert a.vectors.count() == b.vectors.count()


def test_search_identical(spark, pair):
    a, b = pair
    q = _queries(_emb(spark))
    for kwargs in (
        dict(k=10, nprobe=2),
        dict(k=10, nprobe=8),
        dict(k=5, nprobe=3, rerank_exact=True, rerank_k=20),
        dict(k=5, nprobe=8, metric="cosine"),
        dict(k=5, nprobe=8, metric="ip"),
    ):
        assert _rows(a.search(q, **kwargs)) == _rows(b.search(q, **kwargs)), kwargs


def test_filtered_and_range_identical(spark, pair):
    a, b = pair
    q = _queries(_emb(spark), 8)
    fa = a.search(q, k=5, nprobe=8, where="id % 3 = 0")
    fb = b.search(q, k=5, nprobe=8, where="id % 3 = 0")
    assert _rows(fa) == _rows(fb)
    ra = a.range_search(q, radius=2.0)
    rb = b.range_search(q, radius=2.0)
    key = lambda df: sorted(
        (r["query_id"], r["id"], round(r["distance"], 9)) for r in df.collect()
    )
    assert key(ra) == key(rb)


def test_delta_add_delete_compact_chain(spark, pair):
    a, b = pair
    emb = _emb(spark)
    extra = emb.select((F.col("id") + 100_000).alias("id"), "vector").limit(40)
    q = _queries(emb)
    a2, b2 = a.add(extra, activate=False), b.add(extra, activate=False)
    # the delta epoch inherits the chain's layout
    assert b2.manager.chain_vector_layout(b2.epoch) == "packed_f32"
    assert isinstance(b2.vectors.schema["vector"].dataType, T.BinaryType)
    assert _rows(a2.search(q, k=10, nprobe=8)) == _rows(
        b2.search(q, k=10, nprobe=8)
    )
    a3, b3 = a2.delete([1, 3, 100_001], activate=False), b2.delete(
        [1, 3, 100_001], activate=False
    )
    assert _rows(a3.search(q, k=10, nprobe=8)) == _rows(
        b3.search(q, k=10, nprobe=8)
    )
    a4, b4 = a3.compact(activate=False), b3.compact(activate=False)
    assert b4.manifest.extra["vector_layout"] == "packed_f32"
    assert _rows(a4.search(q, k=10, nprobe=8)) == _rows(
        b4.search(q, k=10, nprobe=8)
    )


def test_sq_sidecar_and_mmr(spark, pair):
    from cuda_acceleratedvectordatabaseengine_spark.operators.sq import (
        IVFSQIndex,
    )

    a, b = pair
    q = _queries(_emb(spark), 8)
    IVFSQIndex.build_from_ivf(a)
    IVFSQIndex.build_from_ivf(b)
    ra = ivf.IVFIndex.load(a.spark, a.manager.base_dir, "lst").search(
        q, k=5, nprobe=8, cascade="sq"
    )
    rb = ivf.IVFIndex.load(b.spark, b.manager.base_dir, "pkd").search(
        q, k=5, nprobe=8, cascade="sq"
    )
    assert _rows(ra) == _rows(rb)
    short_a = a.search(q, k=20, nprobe=8).select("query_id", "id", "distance")
    short_b = b.search(q, k=20, nprobe=8).select("query_id", "id", "distance")
    ma = knn.mmr_rerank(a.vectors, short_a, k=5, lam=0.5)
    mb = knn.mmr_rerank(b.vectors, short_b, k=5, lam=0.5)
    assert _rows(ma) == _rows(mb)


def test_layout_migration_via_compact(spark, pair):
    a, _ = pair
    # list -> packed migration in one compaction
    m = a.manager.write_epoch(
        a.vectors.select("id", "vector", "list_id"),
        a.centroids,
        a.manifest.metric,
        activate=False,
        vector_layout="packed_f32",
    )
    migrated = ivf.IVFIndex.load(
        a.spark, a.manager.base_dir, "lst", epoch=m[0]
    )
    assert isinstance(migrated.vectors.schema["vector"].dataType, T.BinaryType)
    q = _queries(_emb(spark), 8)
    assert _rows(a.search(q, k=10, nprobe=8)) == _rows(
        migrated.search(q, k=10, nprobe=8)
    )
    # and back: packed -> list
    back = migrated.manager.write_epoch(
        migrated.vectors.select("id", "vector", "list_id"),
        migrated.centroids,
        migrated.manifest.metric,
        activate=False,
        vector_layout="list",
    )
    unmigrated = ivf.IVFIndex.load(
        a.spark, a.manager.base_dir, "lst", epoch=back[0]
    )
    assert isinstance(
        unmigrated.vectors.schema["vector"].dataType, T.ArrayType
    )
    assert _rows(a.search(q, k=10, nprobe=8)) == _rows(
        unmigrated.search(q, k=10, nprobe=8)
    )


def test_pack_unpack_roundtrip_exact_bits(spark):
    emb = _emb(spark).limit(100)
    packed = epochs.pack_vectors(emb)
    back = epochs.unpack_vectors(packed)
    want = {r["id"]: np.asarray(r["vector"], np.float32) for r in emb.collect()}
    got = {r["id"]: np.asarray(r["vector"], np.float32) for r in back.collect()}
    assert set(got) == set(want)
    for i in want:
        assert np.array_equal(got[i], want[i])  # bit-exact float32
    raw = {r["id"]: r["vector"] for r in packed.collect()}
    d = len(want[next(iter(want))])
    assert all(isinstance(v, (bytes, bytearray)) and len(v) == 4 * d
               for v in raw.values())


def test_snapshot_export_unpacks(spark, pair, tmp_path):
    from cuda_acceleratedvectordatabaseengine_spark.sources import snapshot

    _, b = pair
    out = str(tmp_path / "snap")
    summary = snapshot.export_epoch(b, out)
    assert summary["num_vectors"] == b.vectors.count()
    back = snapshot.read_snapshot_vectors(spark, out)
    assert isinstance(back.schema["vector"].dataType, T.ArrayType)
    assert back.count() == summary["num_vectors"]


def test_retrain_keeps_packed_layout(spark, pair):
    _, b = pair
    from cuda_acceleratedvectordatabaseengine_spark.operators import kmeans

    # build from the packed chain's vectors (train + assign read binary)
    nb = ivf.IVFIndex.build(
        b.vectors.select("id", "vector"),
        b.manager.base_dir,
        "pkd_retrain",
        nlist=8,
        seed=11,
    )
    assert nb.manifest.extra.get("vector_layout") == "packed_f32"
    q = _queries(_emb(spark), 8)
    r = nb.search(q, k=5, nprobe=8)
    assert r.count() == 8 * 5
    # exactness vs brute force through the retrained index at full probe
    exact = knn.exact_knn(
        epochs.unpack_vectors(b.vectors.select("id", "vector")), q, k=5
    )
    assert _rows(nb.search(q, k=5, nprobe=8)) == _rows(exact)


def test_explicit_list_delta_on_packed_chain_is_authoritative(spark, pair):
    """An explicit vector_layout="list" delta on a packed chain must be
    stamped and honored: chain_vector_layout follows the newest stamp, so
    readers normalize to list instead of silently re-packing the list leg
    on every read (r10 fix — previously only packed epochs were stamped
    and the override fell through to the packed ancestor)."""
    _, b = pair
    emb = _emb(spark)
    extra = emb.select((F.col("id") + 200_000).alias("id"), "vector").limit(20)
    from cuda_acceleratedvectordatabaseengine_spark.operators import kmeans

    assigned = kmeans.assign(extra, b.centroids, metric=b.manifest.metric)
    epoch, man = b.manager.write_epoch(
        assigned,
        b.centroids,
        b.manifest.metric,
        activate=False,
        parent_epoch=b.epoch,
        vector_layout="list",
    )
    assert man.extra["vector_layout"] == "list"
    assert b.manager.chain_vector_layout(epoch) == "list"
    chained = ivf.IVFIndex.load(
        spark, b.manager.base_dir, "pkd", epoch=epoch
    )
    # the unioned chain reads back in the LIST layout (no re-pack)
    assert isinstance(chained.vectors.schema["vector"].dataType, T.ArrayType)
    assert chained.vectors.count() == b.vectors.count() + 20


def test_pack_vectors_warns_on_double_source(spark):
    """packed_f32 stores float32 by definition — packing an array<double>
    source downcasts, and must say so (ADVICE r9)."""
    import warnings

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])], "id int, vector array<double>"
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        packed = epochs.pack_vectors(df)
        assert any("downcast" in str(x.message) for x in w)
    assert isinstance(packed.schema["vector"].dataType, T.BinaryType)
    # float sources pack silently
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        epochs.pack_vectors(df.withColumn("vector", F.col("vector").cast("array<float>")))
        assert not any("downcast" in str(x.message) for x in w)

