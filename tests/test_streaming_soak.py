"""Bounded streaming soak (r13 verdict #5): the stream tests elsewhere
are short differentials — this drives >= 20 micro-batches through
``ingest_vector_stream`` (compaction + SQ-sidecar maintenance firing
repeatedly under a small GC grace) and >= 20 through
``serve_query_stream``, asserting the properties that only show up
under sustained load:

- **state plateaus**: on-disk epoch count and index-dir file count are
  BOUNDED over the whole run (keep_epochs + chain-in-progress + the
  grace window), never linear in batches; the active chain re-collapses
  to < compact_every after every compaction;
- **sidecar invariant under churn**: every activated epoch — delta or
  compacted — carries SQ codes (the serving path may cascade at any
  trigger, so a single uncoded activation is a correctness hole);
- **latency stability**: per-batch ingest wall (delta batches) and
  per-batch serving latency do not trend up — medians of the last
  batches stay within a generous drift band of the first (this box
  drifts 2-4x between runs, so the bound is deliberately loose; the
  assertion targets monotone growth, i.e. a leak, not noise);
- **correctness at the end of the soak**: every vector ever streamed is
  searchable, and the final epoch serves an exact self-hit.
"""
from __future__ import annotations

import os
import shutil
import statistics
import tempfile
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuda_acceleratedvectordatabaseengine_spark.metrics import LatencyRecorder
from cuda_acceleratedvectordatabaseengine_spark.operators import ivf
from cuda_acceleratedvectordatabaseengine_spark.operators.sq import IVFSQIndex
from cuda_acceleratedvectordatabaseengine_spark.sources import tables
from cuda_acceleratedvectordatabaseengine_spark.streaming.ingest_stream import (
    ingest_vector_stream,
)
from cuda_acceleratedvectordatabaseengine_spark.streaming.search_stream import (
    serve_query_stream,
)

N_INGEST_BATCHES = 20
N_SERVE_BATCHES = 20
COMPACT_EVERY = 4
KEEP_EPOCHS = 2


def _file_count(root: str) -> int:
    return sum(len(fns) for _r, _d, fns in os.walk(root))


@pytest.mark.slow
def test_streaming_soak_bounded_state_and_stable_latency(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    )
    mod = N_INGEST_BATCHES + 1  # slot 0 seeds the base build
    base_rows = emb.filter(F.col("id") % mod == 0)
    tmp = tempfile.mkdtemp(prefix="cavde-soak-")
    try:
        init = np.asarray(
            [r["vector"] for r in emb.orderBy("id").limit(8).collect()],
            dtype=np.float64,
        )
        base = ivf.IVFIndex.build(
            base_rows, f"{tmp}/idx", "soak", nlist=8, init=init, train=False
        )
        IVFSQIndex.build_from_ivf(base)  # sidecar maintained per batch
        for part in range(1, mod):
            emb.filter(F.col("id") % mod == part).write.parquet(
                f"{tmp}/in/shard{part:02d}"
            )
        stream = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{tmp}/in/shard*")
        )
        mgr = base.manager
        track: list[dict] = []
        last = [time.perf_counter()]

        def on_epoch(epoch, kind):
            now = time.perf_counter()
            man = mgr.read_manifest(epoch)
            track.append(
                {
                    "kind": kind,
                    "wall": now - last[0],
                    "epochs_on_disk": len(mgr.list_epochs()),
                    "files_on_disk": _file_count(mgr.index_dir),
                    "chain_len": len(mgr.epoch_chain(epoch)),
                    "has_sq": bool(man.sq),
                }
            )
            last[0] = now

        q = ingest_vector_stream(
            stream, f"{tmp}/idx", "soak",
            compact_every=COMPACT_EVERY, keep_epochs=KEEP_EPOCHS,
            gc_min_age_s=5.0,  # small grace => the plateau is real GC
            checkpoint_dir=f"{tmp}/ckpt",
            on_epoch=on_epoch,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        # ---- the soak actually soaked -----------------------------------
        assert len(track) == N_INGEST_BATCHES
        n_compacted = sum(1 for r in track if r["kind"] == "compacted")
        assert n_compacted >= 4  # compaction fired repeatedly, not once

        # ---- state plateaus, not linear growth --------------------------
        # bound: keep_epochs + a full in-progress chain + epochs younger
        # than the grace window (one epoch per batch, batches take ~1s,
        # grace 5s => ~6) — generous, but LINEAR growth (~N_INGEST
        # epochs) blows through it
        epoch_bound = KEEP_EPOCHS + COMPACT_EVERY + 8
        assert max(r["epochs_on_disk"] for r in track) <= epoch_bound, track
        assert all(r["chain_len"] <= COMPACT_EVERY for r in track)
        # after every compaction the active chain collapsed to length 1
        assert all(
            r["chain_len"] == 1 for r in track if r["kind"] == "compacted"
        )
        # file count: the second half of the soak must not keep growing —
        # compare its max against the max of the first half plus slack for
        # one extra in-flight chain (each shard adds ~O(nlist) files until
        # GC'd; linear growth would roughly double the count instead)
        half = len(track) // 2
        first_max = max(r["files_on_disk"] for r in track[:half])
        second_max = max(r["files_on_disk"] for r in track[half:])
        assert second_max <= first_max * 1.5 + 100, (first_max, second_max)

        # ---- sidecar invariant under churn ------------------------------
        assert all(r["has_sq"] for r in track), [
            (r["kind"], r["has_sq"]) for r in track
        ]

        # ---- ingest latency does not trend up ---------------------------
        deltas = [r["wall"] for r in track if r["kind"] == "delta"]
        assert len(deltas) >= 10
        early = statistics.median(deltas[:5])
        late = statistics.median(deltas[-5:])
        assert late <= early * 4 + 0.5, (early, late, deltas)

        # ---- end-of-soak correctness ------------------------------------
        final = ivf.IVFIndex.load(spark, f"{tmp}/idx", "soak")
        n_total = emb.count()
        assert final.manifest.num_vectors == n_total
        assert final.vectors.count() == n_total

        # ---- serving soak over the final index --------------------------
        queries = emb.select(
            F.col("id").alias("query_id"), F.col("vector").alias("qvec")
        ).orderBy("query_id").limit(N_SERVE_BATCHES * 5)
        rows = queries.collect()
        os.makedirs(f"{tmp}/qin")
        for b in range(N_SERVE_BATCHES):
            spark.createDataFrame(
                rows[b * 5:(b + 1) * 5], queries.schema
            ).coalesce(1).write.parquet(f"{tmp}/qin/qb{b:02d}")
        qstream = (
            spark.readStream.schema(queries.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{tmp}/qin/qb*")
        )
        rec = LatencyRecorder()
        hits: list[tuple[int, int]] = []
        sq = serve_query_stream(
            final, qstream, k=1, nprobe=8,
            output_sink=lambda df, bid: hits.extend(
                (r["query_id"], r["id"]) for r in df.collect()
            ),
            checkpoint_dir=f"{tmp}/qckpt",
            recorder=rec,
        )
        try:
            sq.processAllAvailable()
        finally:
            sq.stop()
        lat = [r[3] for r in rec.rows]
        assert len(lat) == N_SERVE_BATCHES
        # exact self-hit for every query in every micro-batch
        assert len(hits) == N_SERVE_BATCHES * 5
        assert all(qid == hit for qid, hit in hits)
        early_ms = statistics.median(lat[:5])
        late_ms = statistics.median(lat[-5:])
        assert late_ms <= early_ms * 4 + 200, (early_ms, late_ms, lat)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
