"""Structured Streaming surface tests.

Strategy (SURVEY.md §5): streaming correctness is oracled by batch
equivalence — on a finite input, a watermarked windowed aggregation must
produce exactly the rows the identical batch plan produces; a query stream
served through foreachBatch must produce exactly the batch search results.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cuda_acceleratedvectordatabaseengine_spark.operators.ivf import IVFIndex
from cuda_acceleratedvectordatabaseengine_spark.sources import tables
from cuda_acceleratedvectordatabaseengine_spark.streaming.events import (
    session_counts,
    sliding_counts,
    tumbling_counts,
)
from cuda_acceleratedvectordatabaseengine_spark.streaming.search_stream import (
    serve_query_stream,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return tables.load(spark, sf_dir, "events")


def _rows(df, *order_cols):
    return [tuple(r) for r in df.orderBy(*order_cols).collect()]


def _stream_vs_batch(spark, events, transform, order_cols):
    """Run `transform` on the events table both as a batch DF and as a file
    stream (complete-mode memory sink); results must match exactly."""
    tmp = tempfile.mkdtemp(prefix="cavde-stream-")
    try:
        events.write.mode("overwrite").parquet(f"{tmp}/in")
        batch_out = _rows(transform(spark.read.parquet(f"{tmp}/in")), *order_cols)

        stream_in = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "4")  # several micro-batches
            .parquet(f"{tmp}/in")
        )
        q = (
            transform(stream_in)
            .writeStream.format("memory")
            .queryName("cavde_stream_test")
            .outputMode("complete")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .start()
        )
        try:
            q.processAllAvailable()
            stream_out = _rows(spark.table("cavde_stream_test"), *order_cols)
        finally:
            q.stop()
        return batch_out, stream_out
    finally:
        spark.catalog.dropTempView("cavde_stream_test")
        shutil.rmtree(tmp, ignore_errors=True)


def test_tumbling_stream_equals_batch(spark, events):
    batch, stream = _stream_vs_batch(
        spark,
        events,
        lambda df: tumbling_counts(df, window="1 hour", watermark="1 hour"),
        ("window_start", "event_type"),
    )
    assert len(batch) > 0
    assert stream == batch


def test_sliding_stream_equals_batch(spark, events):
    batch, stream = _stream_vs_batch(
        spark,
        events,
        lambda df: sliding_counts(df, window="1 hour", slide="30 minutes"),
        ("window_start", "event_type"),
    )
    assert len(batch) > len(set(r[1] for r in batch))  # overlapping windows
    assert stream == batch


def test_session_stream_equals_batch(spark, events):
    # keep state bounded: sessions for a small slice of users
    few = events.filter(F.col("user_id") < 50)
    batch, stream = _stream_vs_batch(
        spark,
        few,
        lambda df: session_counts(df, gap="30 minutes"),
        ("user_id", "session_start"),
    )
    assert len(batch) > 0
    assert stream == batch


def test_tumbling_matches_q12_buckets(spark, events):
    """The window-struct output must agree with the epoch-arithmetic batch
    query q12 (same buckets, same counts)."""
    win = tumbling_counts(events).withColumn(
        "hour_bucket", F.floor(F.unix_timestamp("window_start") / 3600).cast("long")
    )
    got = _rows(
        win.select("hour_bucket", "event_type", "cnt", "sum_value"),
        "hour_bucket",
        "event_type",
    )
    exp = _rows(
        events.withColumn(
            "hour_bucket", F.floor(F.unix_timestamp("ts") / 3600).cast("long")
        )
        .groupBy("hour_bucket", "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        ),
        "hour_bucket",
        "event_type",
    )
    assert got == exp


def test_serve_query_stream_matches_batch(spark, sf_dir):
    """V2 request-coalescing analog: queries arriving as a file stream,
    searched per micro-batch, must produce the batch search results."""
    emb = tables.load(spark, sf_dir, "embeddings")
    corpus = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )

    tmp = tempfile.mkdtemp(prefix="cavde-qstream-")
    try:
        index = IVFIndex.build(
            corpus, f"{tmp}/index", "emb", nlist=8, metric="l2", seed=42
        )
        expected = _rows(
            index.search(queries, k=5, nprobe=8), "query_id", "rank"
        )

        queries.write.mode("overwrite").parquet(f"{tmp}/qs")
        collected: list = []
        stream = (
            spark.readStream.schema(queries.schema)
            .option("maxFilesPerTrigger", "2")
            .parquet(f"{tmp}/qs")
        )
        q = serve_query_stream(
            index,
            stream,
            k=5,
            nprobe=8,
            output_sink=lambda df, bid: collected.extend(
                tuple(r) for r in df.collect()
            ),
            checkpoint_dir=f"{tmp}/ckpt",
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        assert sorted(collected) == sorted(expected)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
