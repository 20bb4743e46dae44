"""Distributed Arrow IPC source/sink — the reference engine's at-rest
format (F1/F2, SURVEY.md §2.4): vectors are stored as Arrow IPC files with
schema ``{id: uint64, vector: list<float32>}`` (format/storage.cpp:183-292,
287-292). A reference deployment's data files load here directly, so
migration needs no export step.

Read path: ``spark.read.format("binaryFile")`` distributes the *files*
across executors; a ``mapInArrow`` kernel parses each file's record batches
with pyarrow and re-emits them — so parsing is data-parallel per file, the
driver never touches file contents, and the whole thing scales with the
file count like any parquet directory. Both IPC framings are accepted
(random-access "file" and streaming), matching pyarrow writers and the
reference's ``arrow::ipc::MakeFileWriter`` output.

Write path: per-partition IPC file via ``mapInArrow`` + TaskContext
partition id (one file per partition, the same unit as a parquet part
file). Executors write to a shared filesystem path — on a cluster that is
the mounted DFS/object-store; the layout mirrors the reference's
one-file-per-shard model (format/storage.h:124-173).

Type mapping at the boundary: uint64 ids become int64 (Spark has no
unsigned 64-bit; ids >= 2^63 would wrap — documented limit, SURVEY.md
§1.1), float32 components stay float32.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

VECTOR_SCHEMA = "id long, vector array<float>"


def _open_ipc(buf: pa.Buffer):
    """Accept either IPC framing: file (magic 'ARROW1') or stream."""
    try:
        return pa.ipc.open_file(buf)
    except pa.ArrowInvalid:
        return pa.ipc.open_stream(buf)


def _batches_from_reader(reader) -> Iterator[pa.RecordBatch]:
    if hasattr(reader, "num_record_batches"):  # file reader
        for i in range(reader.num_record_batches):
            yield reader.get_batch(i)
    else:  # stream reader
        yield from reader


def read_vectors(
    spark: SparkSession, path: str, offset: int = 0, length: int = 0
) -> DataFrame:
    """Read a file/directory/glob of Arrow IPC vector files into
    ``{id: long, vector: array<float>}``.

    ``(offset, length)`` reproduce the reference's row-range slice read
    (``format/storage.cpp:142-180``): rows ``[offset, offset+length)`` of
    EACH FILE, counted across all of the file's record batches (a running
    per-file row cursor) — ``length <= 0`` means "to the end". The
    reference writes one record batch per file (``storage.cpp:185-292``);
    this repo's own ``write_vectors`` emits one batch per incoming Arrow
    batch, so multi-batch files slice identically either way. Per-file
    semantics keeps the slice embarrassingly parallel: no global row
    numbering, no cross-file coordination — each executor slices its own
    file zero-copy and skips batches outside the window."""
    if offset < 0:
        raise ValueError(f"offset must be >= 0, got {offset}")
    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        target = pa.schema(
            [pa.field("id", pa.int64()), pa.field("vector", pa.list_(pa.float32()))]
        )
        end_limit = offset + length if length > 0 else None
        for rb in batches:
            col = rb.column(rb.schema.get_field_index("content"))
            for row in range(rb.num_rows):
                reader = _open_ipc(pa.py_buffer(col[row].as_py()))
                pos = 0  # running row cursor within THIS file
                for b in _batches_from_reader(reader):
                    b_start, b_end = pos, pos + b.num_rows
                    pos = b_end
                    if offset > 0 or end_limit is not None:
                        lo = max(b_start, offset)
                        hi = b_end if end_limit is None else min(b_end, end_limit)
                        if lo >= hi:
                            if end_limit is not None and b_start >= end_limit:
                                break  # rest of the file is past the window
                            continue
                        b = b.slice(lo - b_start, hi - lo)
                    t = pa.Table.from_batches([b]).select(["id", "vector"])
                    yield from t.cast(target).to_batches()

    return files.mapInArrow(parse, schema=VECTOR_SCHEMA)


def write_vectors(
    df: DataFrame,
    out_dir: str,
    id_col: str = "id",
    vec_col: str = "vector",
    stream_format: bool = False,
) -> int:
    """Write ``{id, vector}`` to ``out_dir`` as one Arrow IPC file per
    partition (reference schema: uint64 id + list<float32>,
    format/storage.cpp:287-292). Returns the number of rows written.

    The write happens executor-side inside a ``mapInArrow`` pass whose tiny
    {part, rows} result is the action that drives it — same shape as a
    parquet job commit."""
    from pyspark import TaskContext

    os.makedirs(out_dir, exist_ok=True)
    src = df.select(
        df[id_col].cast("long").alias("id"),
        df[vec_col].cast("array<float>").alias("vector"),
    )
    out_schema = pa.schema(
        [pa.field("id", pa.uint64()), pa.field("vector", pa.list_(pa.float32()))]
    )

    def write_part(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        ctx = TaskContext.get()
        pid = ctx.partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.arrow")
        # task-attempt-unique temp + atomic rename: a retried/speculative
        # attempt can never interleave writes into the final part file —
        # whichever attempt finishes last wins wholesale via os.replace
        tmp = os.path.join(
            out_dir, f".part-{pid:05d}.attempt-{ctx.taskAttemptId()}.tmp"
        )
        writer = None
        n = 0
        try:
            for rb in batches:
                t = pa.Table.from_batches([rb]).cast(out_schema)
                if writer is None:
                    sink = pa.OSFile(tmp, "wb")
                    writer = (
                        pa.ipc.new_stream(sink, out_schema)
                        if stream_format
                        else pa.ipc.new_file(sink, out_schema)
                    )
                for b in t.to_batches():
                    writer.write_batch(b)
                    n += b.num_rows
            if writer is not None:
                writer.close()
                os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
        yield pa.RecordBatch.from_arrays(
            [pa.array([pid], pa.int32()), pa.array([n], pa.int64())],
            names=["part", "rows"],
        )

    stats = src.mapInArrow(write_part, schema="part int, rows long")
    return sum(r["rows"] for r in stats.collect())
