"""BYTE_STREAM_SPLIT for the vector column at the 768-d shape — the
r10 verdict's storage-side lever (#2). VERDICT: closed, structurally
unavailable in this stack; numbers below record what it would buy.

Three findings, each independently verifiable:

1. **Spark cannot WRITE it.** parquet-java 1.16 (bundled with Spark
   4.1.2) exposes byte-stream-split only through
   ``ParquetProperties.Builder#withByteStreamSplitEncoding`` — there is
   no hadoop config key (verified by disassembling
   ``ParquetOutputFormat``: the constant list ends at
   SIZE_STATISTICS_ENABLED; no *split* key exists), and Spark builds its
   writer properties exclusively from hadoop conf. Every
   ``.option("parquet.enable.bytestreamsplit", ...)`` spelling is
   silently ignored (measured: encodings stay PLAIN).

2. **Spark cannot READ it on the hot path.** The vectorized parquet
   reader throws ``SparkUnsupportedOperationException: Unsupported
   encoding: BYTE_STREAM_SPLIT`` (VectorizedColumnReader's page-encoding
   visitor). Only the row-based parquet-mr fallback
   (``enableVectorizedReader=false``) can read BSS files — this probe
   measures that fallback at ~an order of magnitude slower than the
   vectorized PLAIN scan, i.e. shipping BSS epoch files would REGRESS
   the scan floor, not cut it. A pinned canary test
   (tests/test_parquet_encodings.py::test_parquet_bss_is_unsupported_by_the_scan)
   fails the day a Spark upgrade adds vectorized BSS support, which is
   the signal to re-open this lever.

3. **What it would buy if the scan could consume it** — measured at the
   pyarrow layer (same files, same row groups, only the float-leaf
   encoding differs): decode wall and on-disk bytes for PLAIN vs BSS,
   interleaved min-of-reps per the box-drift protocol. On hash-derived
   768-d float vectors (full-entropy mantissas, the worst case for BSS)
   expect a small size win from the exponent/sign byte streams
   compressing and a decode delta that the packed_f32 result (r10:
   e2e-neutral at every dimension despite a 12x kernel-side decode cut)
   already bounds: even a free decode win does not move e2e on this
   box, because the floor is shared with Arrow transfer and scan
   scheduling.

Run: python scripts/probe_bss_768d.py [n_rows]  (default 1M)
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from synth768 import DIM, splitmix_vectors  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
BASE = os.environ.get("SPARK_GRAFT_TMP", "/tmp") + "/cavde_bss_probe"
CHUNK = 100_000
REPS = 3


def write_variant(name: str, encoding: "dict | None") -> str:
    path = f"{BASE}/{name}"
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    writer = None
    for lo in range(0, N, CHUNK):
        ids = np.arange(lo, min(lo + CHUNK, N), dtype=np.uint64)
        vecs = splitmix_vectors(ids)
        tbl = pa.table(
            {
                "id": pa.array(ids.astype(np.int64), type=pa.int64()),
                "vector": pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs.ravel(), type=pa.float32()), DIM
                ).cast(pa.list_(pa.float32())),
            }
        )
        if writer is None:
            kw = dict(
                use_dictionary=False,
                compression="snappy",
                data_page_version="1.0",
            )
            if encoding:
                kw["column_encoding"] = encoding
            writer = pq.ParquetWriter(f"{path}/part-0.parquet", tbl.schema, **kw)
        writer.write_table(tbl)
    writer.close()
    return path


def du(path: str) -> int:
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(path)
        for f in fs
    )


def pyarrow_decode_wall(path: str) -> float:
    t0 = time.perf_counter()
    f = pq.ParquetFile(f"{path}/part-0.parquet")
    total = 0.0
    for batch in f.iter_batches(batch_size=65536, columns=["vector"]):
        arr = batch.column(0)
        flat = arr.combine_chunks().flatten() if isinstance(
            arr, pa.ChunkedArray
        ) else arr.flatten()
        X = flat.to_numpy(zero_copy_only=False).reshape(-1, DIM)
        total += float(X[:, 0].sum())  # consume, defeat laziness
    return time.perf_counter() - t0


def main() -> None:
    print(f"writing {N} x {DIM}-d, PLAIN and BYTE_STREAM_SPLIT ...",
          file=sys.stderr)
    t0 = time.perf_counter()
    p_plain = write_variant("plain", None)
    t_wp = time.perf_counter() - t0
    t0 = time.perf_counter()
    p_bss = write_variant(
        "bss", {"vector.list.element": "BYTE_STREAM_SPLIT", "id": "PLAIN"}
    )
    t_wb = time.perf_counter() - t0

    md = pq.ParquetFile(f"{p_bss}/part-0.parquet").metadata
    encs = [str(md.row_group(0).column(i).encodings) for i in range(md.num_columns)]

    # interleaved pyarrow decode A/B (box-drift protocol: min of reps)
    walls = {"plain": [], "bss": []}
    pyarrow_decode_wall(p_plain), pyarrow_decode_wall(p_bss)  # warm cache
    for _ in range(REPS):
        walls["plain"].append(pyarrow_decode_wall(p_plain))
        walls["bss"].append(pyarrow_decode_wall(p_bss))

    # Spark context: vectorized PLAIN scan (the hot path today), the BSS
    # rejection, and the row-based fallback wall on the SAME bytes
    from pyspark.sql import SparkSession
    import pyspark.sql.functions as F

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )

    def spark_scan(path: str) -> float:
        t0 = time.perf_counter()
        (
            spark.read.parquet(path)
            .agg(F.sum(F.element_at("vector", 1)))
            .collect()
        )
        return time.perf_counter() - t0

    spark_scan(p_plain)  # warm
    sp_plain = min(spark_scan(p_plain) for _ in range(REPS))

    bss_vectorized_error = None
    try:
        spark_scan(p_bss)
    except Exception as e:
        msg = str(e)
        key = "Unsupported encoding"
        i = msg.find(key)
        bss_vectorized_error = msg[i : i + 40] if i >= 0 else msg[:80]

    spark.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
    spark.conf.set("spark.sql.parquet.enableNestedColumnVectorizedReader", "false")
    spark_scan(p_bss)  # warm
    sp_bss_rowbased = min(spark_scan(p_bss) for _ in range(REPS))
    sp_plain_rowbased = min(spark_scan(p_plain) for _ in range(REPS))
    spark.stop()

    out = {
        "n": N,
        "dim": DIM,
        "bss_file_encodings": encs,
        "bytes_plain": du(p_plain),
        "bytes_bss": du(p_bss),
        "bytes_ratio_bss_over_plain": round(du(p_bss) / du(p_plain), 4),
        "write_sec_plain": round(t_wp, 2),
        "write_sec_bss": round(t_wb, 2),
        "pyarrow_decode_sec_plain": round(min(walls["plain"]), 3),
        "pyarrow_decode_sec_bss": round(min(walls["bss"]), 3),
        "pyarrow_decode_reps": {k: [round(v, 3) for v in vs] for k, vs in walls.items()},
        "spark_vectorized_scan_sec_plain": round(sp_plain, 3),
        "spark_vectorized_bss_error": bss_vectorized_error,
        "spark_rowbased_scan_sec_bss": round(sp_bss_rowbased, 3),
        "spark_rowbased_scan_sec_plain": round(sp_plain_rowbased, 3),
    }
    print(json.dumps(out))
    shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
