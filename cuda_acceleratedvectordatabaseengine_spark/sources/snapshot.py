"""Portable index snapshots — the save/load verb the reference declares but
never implements (``save``/``load``, engine/ivf_flat_index.h:62-66; the gRPC
layer calls a ``load_from_epoch`` that doesn't exist either,
server/query_service.cpp:222-245).

A snapshot is a self-contained directory materializing an epoch's LIVE view
(delta/tombstone chains folded away):

    snapshot_dir/
      manifest.json              folded Manifest (no parent chain)
      centroids.arrow            {list_id int32, centroid list<float64>} IPC
      vectors/list_id=N/*.arrow  reference vector framing per inverted list

The per-list vector files use the REFERENCE's at-rest schema
(uint64 id + list<float32>, format/storage.cpp:287-292) so each list file
is directly readable by a reference deployment or by ``arrow_ipc.
read_vectors``; the list_id lives in the directory name, mirroring the
epoch layout's hive partitioning. Centroids are an engine sidecar with no
reference schema, kept float64 so a snapshot roundtrip reproduces probe
selection bit-for-bit.

Export writes one file per (routed) partition executor-side; import parses
the files data-parallel via binaryFile + mapInArrow (list_id recovered from
the file path — no join, no shuffle beyond the epoch write's own routing)
and re-materializes a fresh epoch through ``EpochManager.write_epoch``, so
an imported index is indistinguishable from a built one. PQ/SQ codes are
deliberately NOT snapshotted: they are derived artifacts — rebuild with
``IVFPQIndex.build_from_ivf`` (same seed => same codebooks) or
``IVFSQIndex.build_from_ivf`` (deterministic) after import.
"""

from __future__ import annotations

import json
import os
import re
import time
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

from .epochs import EpochManager, Manifest, route_to_list_partitions

_VEC_SCHEMA = pa.schema(
    [pa.field("id", pa.uint64()), pa.field("vector", pa.list_(pa.float32()))]
)


def export_epoch(index, out_dir: str) -> dict:
    """Snapshot ``index`` (an IVFIndex handle) into ``out_dir``. Returns a
    summary dict {num_vectors, nlist, files}."""
    os.makedirs(os.path.join(out_dir, "vectors"), exist_ok=True)
    man = index.manifest
    nlist = man.nlist

    def write_part(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        from ..functions import arrowkit as AK

        ctx = TaskContext.get()
        pid, attempt = ctx.partitionId(), ctx.taskAttemptId()
        writers: dict[int, tuple] = {}
        counts: dict[int, int] = {}
        try:
            for rb in batches:
                if rb.num_rows == 0:
                    continue
                lids = AK.column(rb, "list_id", np.int64)
                t = pa.Table.from_batches(
                    [rb.select(["id", "vector"])]
                ).cast(_VEC_SCHEMA)
                for lid in np.unique(lids):
                    lid = int(lid)
                    if lid not in writers:
                        d = os.path.join(out_dir, "vectors", f"list_id={lid}")
                        os.makedirs(d, exist_ok=True)
                        final = os.path.join(d, f"part-{pid:05d}.arrow")
                        tmp = os.path.join(
                            d, f".part-{pid:05d}.attempt-{attempt}.tmp"
                        )
                        sink = pa.OSFile(tmp, "wb")
                        writers[lid] = (
                            pa.ipc.new_file(sink, _VEC_SCHEMA), tmp, final
                        )
                        counts[lid] = 0
                    sub = t.filter(pa.array(lids == lid))
                    for b in sub.to_batches():
                        writers[lid][0].write_batch(b)
                    counts[lid] += sub.num_rows
            for lid, (w, tmp, final) in writers.items():
                w.close()
                os.replace(tmp, final)  # atomic vs retried attempts
        finally:
            for _w, tmp, _final in writers.values():
                if os.path.exists(tmp):
                    os.remove(tmp)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(sorted(counts), pa.int32()),
                pa.array([counts[k] for k in sorted(counts)], pa.int64()),
            ],
            names=["list_id", "rows"],
        )

    # the hand-off contract is the REFERENCE framing (list<float32>):
    # unpack a packed_f32 epoch back to the logical layout (no-op
    # otherwise) — external consumers never see the storage detail
    from .epochs import unpack_vectors

    routed = route_to_list_partitions(
        unpack_vectors(index.vectors.select("id", "vector", "list_id")),
        nlist,
    )
    stats = routed.mapInArrow(write_part, schema="list_id int, rows long").collect()
    num = sum(r["rows"] for r in stats)

    C = np.asarray(index.centroids, dtype=np.float64)
    offsets = np.arange(C.shape[0] + 1, dtype=np.int32) * C.shape[1]
    ct = pa.table(
        {
            "list_id": pa.array(np.arange(C.shape[0], dtype=np.int32), pa.int32()),
            "centroid": pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(C.reshape(-1))
            ),
        }
    )
    with pa.OSFile(os.path.join(out_dir, "centroids.arrow"), "wb") as sink:
        with pa.ipc.new_file(sink, ct.schema) as w:
            w.write_table(ct)

    folded = Manifest(
        index_name=man.index_name,
        epoch=0,
        dimension=man.dimension,
        metric=man.metric,
        nlist=man.nlist,
        num_vectors=num,
        created_at_ns=time.time_ns(),
        extra={"snapshot_source_epoch": index.epoch},
    )
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        f.write(folded.to_json())
    return {"num_vectors": num, "nlist": nlist, "files": len(stats)}


def read_snapshot_vectors(spark: SparkSession, snapshot_dir: str) -> DataFrame:
    """{id, vector, list_id} from a snapshot's per-list Arrow files —
    data-parallel parse, list_id recovered from each file's path."""
    files = (
        spark.read.format("binaryFile")
        .load(os.path.join(snapshot_dir, "vectors", "*", "*.arrow"))
        .select("path", "content")
    )

    def parse(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        target = pa.schema(
            [
                pa.field("id", pa.int64()),
                pa.field("vector", pa.list_(pa.float32())),
            ]
        )
        for rb in batches:
            paths = rb.column(rb.schema.get_field_index("path"))
            contents = rb.column(rb.schema.get_field_index("content"))
            for row in range(rb.num_rows):
                m = re.search(r"list_id=(\d+)", paths[row].as_py())
                if m is None:
                    raise ValueError(
                        f"snapshot file outside a list_id dir: {paths[row]}"
                    )
                lid = int(m.group(1))
                reader = pa.ipc.open_file(pa.py_buffer(contents[row].as_py()))
                for i in range(reader.num_record_batches):
                    b = reader.get_batch(i)
                    t = pa.Table.from_batches([b]).cast(_VEC_SCHEMA).cast(target)
                    t = t.append_column(
                        "list_id", pa.array(np.full(len(t), lid, np.int32))
                    )
                    yield from t.to_batches()

    return files.mapInArrow(parse, schema="id long, vector array<float>, list_id int")


def import_snapshot(
    spark: SparkSession,
    snapshot_dir: str,
    base_dir: str,
    index_name: str | None = None,
    activate: bool = True,
):
    """Materialize a snapshot as a fresh epoch of ``index_name`` under
    ``base_dir`` and return the loaded IVFIndex handle. The imported row
    count is checked against the snapshot manifest — a partial/corrupt
    snapshot fails loudly instead of serving a truncated corpus."""
    from ..operators.ivf import IVFIndex

    with open(os.path.join(snapshot_dir, "manifest.json")) as f:
        snap_man = Manifest.from_json(f.read())
    with pa.OSFile(os.path.join(snapshot_dir, "centroids.arrow"), "rb") as src:
        ct = pa.ipc.open_file(src).read_all()
    order = np.argsort(ct.column("list_id").to_numpy())
    C = np.asarray(ct.column("centroid").to_pylist(), dtype=np.float64)[order]

    mgr = EpochManager(base_dir, index_name or snap_man.index_name)
    vectors = read_snapshot_vectors(spark, snapshot_dir)
    epoch, manifest = mgr.write_epoch(
        vectors,
        C,
        snap_man.metric,
        activate=activate,
        extra={"imported_from_snapshot": True, **snap_man.extra},
    )
    if manifest.num_vectors != snap_man.num_vectors:
        raise ValueError(
            f"snapshot import row mismatch: manifest says "
            f"{snap_man.num_vectors}, imported {manifest.num_vectors}"
        )
    return IVFIndex(
        spark=spark,
        manager=mgr,
        epoch=epoch,
        manifest=manifest,
        centroids=C,
    )
