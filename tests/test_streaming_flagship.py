"""Certified streaming flagship (r7 verdict item 5): the arrival-time
composition WARC files -> manifest -> gates -> chunk -> cross-batch
chunk dedup (stateful) -> hashed embeddings -> delta-epoch ingest ->
searchable index, driven across deterministic micro-batches (one WARC
file per trigger) including a cross-batch duplicate document and a
compaction trigger, then certified by stream-vs-batch parity against
the SAME stage chain run as one batch job (pipeline_docs_to_ann's
discipline: chunk -> min-id exact dedup -> dense_hashed_vectors ->
full-probe search == brute-force kNN by completeness)."""
from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from cuda_acceleratedvectordatabaseengine_spark.functions import distance as D
from cuda_acceleratedvectordatabaseengine_spark.functions import text as TXT
from cuda_acceleratedvectordatabaseengine_spark.operators import ivf, knn, textops
from cuda_acceleratedvectordatabaseengine_spark.operators.web import (
    filter_domain_blocklist,
)
from cuda_acceleratedvectordatabaseengine_spark.sources import warc as W
from cuda_acceleratedvectordatabaseengine_spark.streaming.dedup_stream import (
    dedup_stream,
)
from cuda_acceleratedvectordatabaseengine_spark.streaming.ingest_stream import (
    ingest_vector_stream,
)

BLOCKED = ("spam.example",)


def _doc(i, site, words):
    # distinct multi-chunk text per doc (~48 tokens -> 2-3 chunks at 32/8)
    body = " ".join(f"{w}{i}tok{j}" for j, w in enumerate(words * 24))
    return (
        i,
        f"http://{site}/p/{i}",
        f"<html><body><p>{body}</p></body></html>",
    )


def _batches():
    """4 WARC files: b0 bootstraps the index (batch job); b1-b3 stream.
    b2 carries a blocklisted doc; b3 carries a cross-batch duplicate of
    STREAMED doc 10's text under a new (higher) doc_id — the stateful
    dedup must drop it batches later."""
    b0 = [_doc(0, "a.example", ["alpha", "beta"]),
          _doc(1, "a.example", ["gamma", "delta"]),
          _doc(2, "b.example", ["epsilon", "zeta"])]
    b1 = [_doc(10, "b.example", ["eta", "theta"]),
          _doc(11, "c.example", ["iota", "kappa"])]
    b2 = [_doc(20, "c.example", ["lambda", "muon", "quark"]),
          _doc(21, "spam.example", ["nu", "xi"])]  # gated out
    dup_html = _doc(10, "b.example", ["eta", "theta"])[2]  # doc 10's body
    b3 = [_doc(30, "d.example", ["omicron", "sigma", "tau"]),
          (31, "http://d.example/p/31", dup_html)]  # duplicate body
    return [b0, b1, b2, b3]


def _gate_and_chunk(manifest):
    """The shared STATELESS stage chain — applied identically to the
    streaming manifest and the batch manifest: blocklist -> html text ->
    chunk 32/8 -> flagship chunk key."""
    gated = filter_domain_blocklist(manifest, BLOCKED)
    docs = gated.select(
        "doc_id", TXT.html_to_lines_expr("html").alias("text")
    )
    ch = textops.chunk_documents(docs, max_tokens=32, overlap=8)
    return ch.select(
        (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("id"),
        F.col("chunk_text").alias("text"),
    )


def _batch_winner_vectors(spark, path_glob):
    """The batch twin of the streamed chain: min-id exact chunk dedup
    (the flagship's discipline), then hashed embeddings."""
    man = W.warc_manifest(spark, path_glob)
    uniq = (
        _gate_and_chunk(man)
        .groupBy(F.lower(F.trim(F.col("text"))).alias("text"))
        .agg(F.min("id").alias("id"))
    )
    return textops.dense_hashed_vectors(
        uniq, dim=64, text_col="text", id_col="id"
    )


def test_streaming_flagship_end_to_end(spark, tmp_path):
    batches = _batches()
    warc_dir = str(tmp_path / "warc")
    stream_dir = str(tmp_path / "warc_stream")
    os.makedirs(warc_dir)
    os.makedirs(stream_dir)
    paths = []
    for i, rows in enumerate(batches):
        p = os.path.join(warc_dir, f"batch{i}.warc.gz")
        W.write_warc_file(rows, p)
        paths.append(p)

    # ---- bootstrap: batch-0 epoch (centroids are train-time artifacts;
    # ingest only assigns — the ingest_vector_stream contract)
    base_dir = str(tmp_path / "idx")
    v0 = _batch_winner_vectors(spark, paths[0])
    ivf.IVFIndex.build(v0, base_dir, "flagship", nlist=2, metric=D.L2, seed=7)

    # ---- the arrival-time composition
    man = W.warc_manifest_stream(spark, stream_dir + "/*.warc.gz")
    chunks = _gate_and_chunk(man)
    winners = dedup_stream(
        chunks, id_col="id", key_expr=F.lower(F.trim(F.col("text")))
    )  # {doc_id=min chunk key of first batch, fingerprint=normalized text}

    def embed_batch(static_df):
        # vectorization runs INSIDE the trigger (the batch_transform
        # seam): a streaming plan can't chain an aggregation after the
        # stateful dedup, and a real encoder is a per-batch job anyway
        return textops.dense_hashed_vectors(
            static_df.select(F.col("doc_id").alias("id"),
                             F.col("fingerprint").alias("text")),
            dim=64, text_col="text", id_col="id",
        )

    kinds = []
    q = ingest_vector_stream(
        winners, base_dir, "flagship",
        compact_every=3, keep_epochs=3,
        checkpoint_dir=str(tmp_path / "ckpt"),
        on_epoch=lambda e, kind: kinds.append(kind),
        batch_transform=embed_batch,
    )
    try:
        counts = []
        for i in (1, 2, 3):
            shutil.copy(paths[i], stream_dir)
            q.processAllAvailable()
            idx = ivf.IVFIndex.load(spark, base_dir, "flagship")
            counts.append(idx.vectors.count())  # LIVE chain view
            # searchable after every trigger
            probe = idx.search(
                v0.limit(1).select(F.col("id").alias("query_id"),
                                   F.col("vector").alias("qvec")),
                k=3, nprobe=idx.manifest.nlist,
            )
            assert probe.count() == 3
        assert counts == sorted(counts) and counts[-1] > counts[0]
        # one activation per batch; the b2 delta tripped compact_every=3
        # (chain base+d1+d2), so kinds = delta, compacted, delta
        assert kinds == ["delta", "compacted", "delta"]
    finally:
        q.stop()

    # ---- stream-vs-batch parity: the SAME chain as ONE batch job
    idx = ivf.IVFIndex.load(spark, base_dir, "flagship")
    all_vecs = _batch_winner_vectors(spark, warc_dir + "/*.warc.gz")
    assert idx.vectors.count() == all_vecs.count()  # dup + blocked absorbed

    queries = v0.select(
        F.col("id").alias("query_id"), F.col("vector").alias("qvec")
    )
    got = idx.search(queries, k=5, nprobe=idx.manifest.nlist)
    exact = knn.exact_knn(all_vecs, queries, k=5, metric=D.L2)
    g = sorted(
        (r["query_id"], r["rank"], r["id"], round(r["distance"], 6))
        for r in got.collect()
    )
    e = sorted(
        (r["query_id"], r["rank"], r["id"], round(r["distance"], 6))
        for r in exact.collect()
    )
    assert g == e  # full probe == brute force; streamed corpus == batch

    ids = {r["id"] for r in idx.vectors.select("id").collect()}
    # the cross-batch duplicate (doc 31) and the blocklisted doc (21)
    # must be absent; their first-seen/clean counterparts present
    assert not any(31000 <= i < 32000 for i in ids)
    assert not any(21000 <= i < 22000 for i in ids)
    assert any(10000 <= i < 11000 for i in ids)
    assert any(30000 <= i < 31000 for i in ids)
