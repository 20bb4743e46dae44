"""Canary for the BYTE_STREAM_SPLIT storage lever (r10 verdict #2).

The lever is CLOSED in this stack, with three measured findings
(scripts/probe_bss_768d.py, PERF.md r11):

1. Spark's JVM writer cannot emit BSS — parquet-java 1.16 has no hadoop
   config key for it (builder-only API), so every writer .option
   spelling is silently ignored.
2. Spark's VECTORIZED reader rejects BSS pages outright ("Unsupported
   encoding: BYTE_STREAM_SPLIT"); only the row-based fallback reads
   them, measured ~3.4x slower than the vectorized PLAIN scan —
   shipping BSS epoch files would regress the scan floor.
3. Even at the pyarrow layer, BSS decode is ~1.4x SLOWER than PLAIN on
   hash-derived float vectors (full-entropy mantissas defeat the
   byte-stream transpose), for a ~7.5% size win.

These tests PIN findings 1 and 2. The day a Spark upgrade makes either
assert fail, the lever re-opens: re-run scripts/probe_bss_768d.py and
revisit PERF.md's r11 entry.
"""

import glob
import os

import numpy as np
import pytest


def _write_bss(tmpdir: str) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = 8
    vecs = np.arange(100 * d, dtype=np.float32).reshape(100, d)
    tbl = pa.table(
        {
            "id": pa.array(np.arange(100), type=pa.int64()),
            "vector": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.ravel(), type=pa.float32()), d
            ).cast(pa.list_(pa.float32())),
        }
    )
    path = os.path.join(tmpdir, "bss")
    os.makedirs(path, exist_ok=True)
    pq.write_table(
        tbl,
        os.path.join(path, "part-0.parquet"),
        use_dictionary=False,
        column_encoding={"vector.list.element": "BYTE_STREAM_SPLIT", "id": "PLAIN"},
    )
    return path


def test_spark_writer_has_no_bss_knob(spark, tmp_path):
    """Finding 1: the writer option is silently ignored — float leaves
    stay PLAIN. If this starts producing BYTE_STREAM_SPLIT, Spark gained
    the knob: re-open the lever."""
    import pyarrow.parquet as pq

    out = str(tmp_path / "spark_bss_attempt")
    (
        spark.range(1000)
        .selectExpr("id", "array(cast(id as float)) as vector")
        .write.mode("overwrite")
        .option("parquet.enable.dictionary", "false")
        .option("parquet.enable.bytestreamsplit", "true")
        .option("parquet.enable.byte-stream-split", "true")
        .parquet(out)
    )
    encodings = set()
    for f in glob.glob(out + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for i in range(md.num_columns):
            encodings.update(md.row_group(0).column(i).encodings)
    assert "BYTE_STREAM_SPLIT" not in encodings, (
        "Spark gained a writer knob for BYTE_STREAM_SPLIT — re-open the "
        "r11 storage lever (scripts/probe_bss_768d.py)"
    )


def test_parquet_bss_is_unsupported_by_the_scan(spark, tmp_path):
    """Finding 2: the vectorized reader raises on BSS pages. If this
    scan ever SUCCEEDS, Spark gained vectorized BSS read support —
    re-open the lever."""
    from pyspark.sql import functions as F

    path = _write_bss(str(tmp_path))
    df = spark.read.parquet(path)
    with pytest.raises(Exception, match="Unsupported encoding|FAILED_READ_FILE"):
        df.agg(F.sum(F.element_at("vector", 1))).collect()
    # the row-based fallback CAN read the same bytes (correctness of the
    # fallback pinned so the canary distinguishes "unsupported encoding"
    # from "corrupt file")
    prior = spark.conf.get("spark.sql.parquet.enableVectorizedReader", None)
    spark.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
    try:
        got = df.agg(F.sum(F.element_at("vector", 1)).alias("s")).collect()[0]["s"]
        assert got == pytest.approx(float(np.arange(0, 800, 8, dtype=np.float32).sum()))
    finally:
        # restore whatever the shared session had, not a hardcoded value
        if prior is None:
            spark.conf.unset("spark.sql.parquet.enableVectorizedReader")
        else:
            spark.conf.set("spark.sql.parquet.enableVectorizedReader", prior)
