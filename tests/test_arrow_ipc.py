"""Arrow IPC source/sink round-trips, including reference-produced file
shapes (uint64 id + list<float32>, format/storage.cpp:287-292)."""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from cuda_acceleratedvectordatabaseengine_spark.sources import arrow_ipc, tables


def _reference_style_file(path: str, ids, vecs, stream: bool = False) -> None:
    """Write exactly what the reference's ArrowStorage writes: uint64 ids,
    list<float32> vectors, IPC file framing."""
    schema = pa.schema(
        [pa.field("id", pa.uint64()), pa.field("vector", pa.list_(pa.float32()))]
    )
    t = pa.table(
        {
            "id": pa.array(ids, pa.uint64()),
            "vector": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32())),
        },
        schema=schema,
    )
    with pa.OSFile(path, "wb") as sink:
        w = pa.ipc.new_stream(sink, schema) if stream else pa.ipc.new_file(sink, schema)
        w.write_table(t)
        w.close()


@pytest.mark.parametrize("stream", [False, True])
def test_read_reference_files(spark, stream):
    tmp = tempfile.mkdtemp(prefix="ipc_read_")
    try:
        rng = np.random.default_rng(42)
        vecs = rng.normal(size=(20, 8)).astype(np.float32)
        _reference_style_file(f"{tmp}/a.arrow", range(10), vecs[:10], stream)
        _reference_style_file(f"{tmp}/b.arrow", range(10, 20), vecs[10:], stream)
        df = arrow_ipc.read_vectors(spark, tmp)
        assert df.schema.simpleString() == "struct<id:bigint,vector:array<float>>"
        rows = {r["id"]: np.asarray(r["vector"], np.float32) for r in df.collect()}
        assert sorted(rows) == list(range(20))
        for i in range(20):
            np.testing.assert_array_equal(rows[i], vecs[i])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_write_then_read_roundtrip(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="ipc_rt_")
    try:
        emb = tables.load(spark, sf_dir, "embeddings").select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
        )
        n = arrow_ipc.write_vectors(emb.repartition(4), tmp)
        assert n == emb.count()
        assert len([f for f in os.listdir(tmp) if f.endswith(".arrow")]) >= 1
        back = arrow_ipc.read_vectors(spark, tmp)
        assert back.count() == n
        # value-exact round trip: anti-joins empty both ways on (id, vector)
        a = emb.select("id", F.col("vector").cast("array<float>").alias("vector"))
        assert a.exceptAll(back).count() == 0
        assert back.exceptAll(a).count() == 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_write_preserves_uint64_framing(spark):
    """The sink emits files the REFERENCE could read back: uint64 id +
    list<float32>, valid IPC file framing."""
    tmp = tempfile.mkdtemp(prefix="ipc_fmt_")
    try:
        df = spark.createDataFrame(
            [(1, [1.0, 2.0]), (2, [3.0, 4.0])], "id long, vector array<float>"
        )
        arrow_ipc.write_vectors(df.coalesce(1), tmp)
        files = [f for f in os.listdir(tmp) if f.endswith(".arrow")]
        assert len(files) == 1
        with pa.OSFile(os.path.join(tmp, files[0]), "rb") as f:
            t = pa.ipc.open_file(f).read_all()
        assert t.schema.field("id").type == pa.uint64()
        assert t.schema.field("vector").type == pa.list_(pa.float32())
        assert sorted(t.column("id").to_pylist()) == [1, 2]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_slice_read_matches_reference_semantics(spark):
    """(offset, length) slices each batch like storage.cpp:142-180: rows
    [offset, min(offset+length, n)); length<=0 means to-the-end; a batch
    shorter than offset contributes nothing."""
    tmp = tempfile.mkdtemp(prefix="ipc_slice_")
    try:
        rows = [(i, [float(i), float(i) + 0.5]) for i in range(20)]
        df = spark.createDataFrame(rows, "id long, vector array<float>")
        arrow_ipc.write_vectors(df.repartition(1).sortWithinPartitions("id"), tmp)
        got = sorted(
            r["id"] for r in arrow_ipc.read_vectors(spark, tmp, 5, 7).collect()
        )
        assert got == list(range(5, 12))
        # length beyond EOF clips; length<=0 reads to the end
        assert sorted(
            r["id"] for r in arrow_ipc.read_vectors(spark, tmp, 15, 100).collect()
        ) == list(range(15, 20))
        assert sorted(
            r["id"] for r in arrow_ipc.read_vectors(spark, tmp, 15).collect()
        ) == list(range(15, 20))
        # offset past EOF yields nothing
        assert arrow_ipc.read_vectors(spark, tmp, 50, 10).count() == 0
        with pytest.raises(ValueError, match="offset"):
            arrow_ipc.read_vectors(spark, tmp, -1, 5)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_slice_read_spans_multiple_record_batches(spark):
    """A file holding SEVERAL record batches slices as one contiguous file
    row range (running per-file cursor), not one window per batch — parity
    with storage.cpp:142-180 for multi-batch shards."""
    tmp = tempfile.mkdtemp(prefix="ipc_slice_mb_")
    try:
        schema = pa.schema(
            [pa.field("id", pa.uint64()), pa.field("vector", pa.list_(pa.float32()))]
        )
        with pa.OSFile(os.path.join(tmp, "part-00000.arrow"), "wb") as f:
            with pa.ipc.new_file(f, schema) as w:
                for lo in (0, 7, 14):  # 3 batches of 7/7/6 rows, ids 0..19
                    hi = min(lo + 7, 20)
                    w.write_batch(
                        pa.record_batch(
                            [
                                pa.array(range(lo, hi), pa.uint64()),
                                pa.array(
                                    [[float(i), float(i) + 0.5] for i in range(lo, hi)],
                                    pa.list_(pa.float32()),
                                ),
                            ],
                            schema=schema,
                        )
                    )
        # window [5, 17) crosses both batch boundaries
        got = sorted(
            r["id"] for r in arrow_ipc.read_vectors(spark, tmp, 5, 12).collect()
        )
        assert got == list(range(5, 17))
        # offset inside the second batch, to the end
        assert sorted(
            r["id"] for r in arrow_ipc.read_vectors(spark, tmp, 10).collect()
        ) == list(range(10, 20))
        # window entirely inside the middle batch
        assert sorted(
            r["id"] for r in arrow_ipc.read_vectors(spark, tmp, 8, 3).collect()
        ) == [8, 9, 10]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
