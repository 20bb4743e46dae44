"""Task-retry / kill-mid-write chaos battery (r7 verdict item 7) for
the write protocols that claim crash/retry safety: warc_sink, snapshot
export/import, and epoch-dir partial-state tolerance. (ingest_batch
redelivery/resume and the neardup band-store crashed-compact paths are
exercised in tests/test_streaming.py.) The invariant under test
everywhere: NO partial state is ever readable — crashes leave only
dot-tmp files that every reader's glob ignores, duplicate attempts
atomically replace rather than append/interleave, and whole-job re-runs
are idempotent."""
from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from cuda_acceleratedvectordatabaseengine_spark.functions import distance as D
from cuda_acceleratedvectordatabaseengine_spark.operators import ivf
from cuda_acceleratedvectordatabaseengine_spark.sources import warc as W
from cuda_acceleratedvectordatabaseengine_spark.sources import tables
from cuda_acceleratedvectordatabaseengine_spark.sources.epochs import EpochManager
from cuda_acceleratedvectordatabaseengine_spark.sources.snapshot import (
    export_epoch,
    import_snapshot,
    read_snapshot_vectors,
)


@pytest.fixture(scope="module")
def manifest(spark):
    rows = [
        (i, f"http://site{i % 3}.example/p/{i}",
         f"<html><body><p>doc {i} body text here.</p></body></html>")
        for i in range(24)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, url string, html string"
    ).repartition(4)


def test_warc_sink_duplicate_execution_idempotent(spark, manifest, tmp_path):
    out = str(tmp_path / "dump")
    acct1 = W.warc_sink(manifest, out).collect()
    files1 = sorted(glob.glob(out + "/*.warc.gz"))
    # whole-job re-execution (driver retry): same filenames, same rows
    acct2 = W.warc_sink(manifest, out).collect()
    files2 = sorted(glob.glob(out + "/*.warc.gz"))
    assert files1 == files2
    assert sum(r["n_records"] for r in acct1) == 24
    assert sum(r["n_records"] for r in acct2) == 24
    back = W.read_warc(spark, out + "/*.warc.gz").collect()
    assert len(back) == 24  # no duplicated or interleaved records
    # no attempt-tmp droppings survive a completed run
    assert glob.glob(out + "/.*.tmp") == []


def test_warc_sink_killed_attempt_leaves_nothing_readable(spark, manifest, tmp_path):
    out = str(tmp_path / "dump")
    os.makedirs(out)
    # simulate a task killed mid-write: a half-written attempt tmp
    with open(os.path.join(out, ".part-00000.attempt-3.tmp"), "wb") as f:
        f.write(b"WARC/1.0\r\nWARC-Type: resp")  # truncated garbage
    # readers see NOTHING (tmp matches no .warc.gz glob)
    assert glob.glob(out + "/*.warc.gz") == []
    # the retry then publishes complete files alongside; reads are clean
    W.warc_sink(manifest, out).collect()
    back = W.read_warc(spark, out + "/*.warc.gz").collect()
    assert len(back) == 24


@pytest.fixture(scope="module")
def built_index(spark, sf_dir, tmp_path_factory):
    emb = tables.load(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    )
    base = str(tmp_path_factory.mktemp("chaos_idx"))
    return ivf.IVFIndex.build(
        corpus, base, "chaos", nlist=4, metric=D.L2, seed=3
    )


def test_snapshot_duplicate_export_idempotent(spark, built_index, tmp_path):
    out = str(tmp_path / "snap")
    s1 = export_epoch(built_index, out)
    s2 = export_epoch(built_index, out)  # driver/job retry into same dir
    assert s1["num_vectors"] == s2["num_vectors"]
    got = read_snapshot_vectors(spark, out).count()
    assert got == s1["num_vectors"]  # atomic per-partition replace: no x2
    handle = import_snapshot(
        spark, out, str(tmp_path / "imp"), "chaos_imp", activate=True
    )
    assert handle.manifest.num_vectors == s1["num_vectors"]


def test_snapshot_stale_attempt_tmp_invisible(spark, built_index, tmp_path):
    out = str(tmp_path / "snap")
    s = export_epoch(built_index, out)
    # plant a killed attempt's tmp inside a list dir
    lists = glob.glob(out + "/vectors/list_id=*")
    assert lists
    with open(os.path.join(lists[0], ".part-00009.attempt-7.tmp"), "wb") as f:
        f.write(b"ARROW1garbage")
    assert read_snapshot_vectors(spark, out).count() == s["num_vectors"]
    handle = import_snapshot(
        spark, out, str(tmp_path / "imp"), "chaos_imp2", activate=True
    )
    assert handle.manifest.num_vectors == s["num_vectors"]


def test_snapshot_truncated_final_file_fails_loud(spark, built_index, tmp_path):
    """A corrupt FINAL file (bitrot, not a protocol crash) must fail the
    import loudly — never a silent row loss."""
    out = str(tmp_path / "snap")
    export_epoch(built_index, out)
    victim = sorted(glob.glob(out + "/vectors/*/part-*.arrow"))[0]
    data = open(victim, "rb").read()
    with open(victim, "wb") as f:
        f.write(data[: len(data) // 2])
    with pytest.raises(Exception):
        import_snapshot(
            spark, out, str(tmp_path / "imp"), "chaos_imp3", activate=True
        )


def test_partial_epoch_dir_is_invisible(spark, built_index):
    """A crash between the vectors write and the manifest write leaves a
    manifest-less epoch dir: readers and the epoch manager must treat it
    as nonexistent, and the active chain stays servable."""
    mgr: EpochManager = built_index.manager
    active_before = mgr.active_epoch()
    n_before = built_index.vectors.count()
    # fabricate the partial epoch: dir + vectors subdir, NO manifest
    ghost = (max(mgr.list_epochs()) if mgr.list_epochs() else 0) + 7
    ghost_dir = mgr.epoch_dir(ghost)
    os.makedirs(os.path.join(ghost_dir, "vectors"), exist_ok=True)
    with open(os.path.join(ghost_dir, "vectors", "junk.parquet"), "wb") as f:
        f.write(b"PAR1 not really parquet")
    try:
        assert mgr.active_epoch() == active_before  # pointer untouched
        reloaded = ivf.IVFIndex.load(
            spark, mgr.base_dir, mgr.index_name
        )
        assert reloaded.epoch == active_before
        assert reloaded.vectors.count() == n_before
        # GC sweep over a store containing the partial dir must not crash
        mgr.cleanup(keep=3, min_age_s=0.0)
        assert mgr.active_epoch() == active_before
    finally:
        import shutil

        shutil.rmtree(ghost_dir, ignore_errors=True)


def test_duplicate_activation_idempotent(built_index):
    mgr = built_index.manager
    e = mgr.active_epoch()
    mgr.activate(e)
    mgr.activate(e)  # replayed activation: no error, pointer stable
    assert mgr.active_epoch() == e


# -- concurrent-writer epoch safety (r13 verdict #1) ----------------------
# Two spark-submit jobs against one index root (the usage
# deploy/spark-submit.md documents) must never interleave writes into one
# epoch dir: reserve_epoch claims the id with mkdir-as-CAS.


def test_reserve_epoch_two_writers_disjoint(tmp_path):
    import threading
    from concurrent.futures import ThreadPoolExecutor

    base = str(tmp_path / "race")
    writers = [EpochManager(base, "idx") for _ in range(2)]
    per_writer = 6
    barrier = threading.Barrier(2)

    def claim(mgr):
        barrier.wait()  # maximize overlap: both scan the same tip
        return [mgr.reserve_epoch() for _ in range(per_writer)]

    with ThreadPoolExecutor(2) as pool:
        got = [f.result() for f in [pool.submit(claim, m) for m in writers]]
    all_ids = sorted(got[0] + got[1])
    # disjoint AND gapless: every contended id went to exactly one writer
    assert len(set(all_ids)) == 2 * per_writer
    assert all_ids == list(range(all_ids[0], all_ids[0] + 2 * per_writer))
    # each claimed id owns a reserved directory
    for e in all_ids:
        assert os.path.isdir(writers[0].epoch_dir(e))


def test_two_writer_epoch_interleaving_consistent_chains(spark, built_index):
    """Two threaded writers build DELTA epochs on the same parent of the
    same index root concurrently: epochs must come out disjoint, both
    manifests complete, and both chains consistent (parent-first)."""
    import threading
    from concurrent.futures import ThreadPoolExecutor

    mgr: EpochManager = built_index.manager
    parent = mgr.active_epoch()
    parent_n = mgr.read_manifest(parent).num_vectors
    delta = built_index.vectors.select("id", "vector", "list_id").limit(8)
    delta = delta.cache()
    delta.count()
    barrier = threading.Barrier(2)

    def build_delta(_i):
        own = EpochManager(mgr.base_dir, mgr.index_name)  # separate job
        barrier.wait()
        return own.write_epoch(
            delta,
            built_index.centroids,
            built_index.manifest.metric,
            activate=False,
            parent_epoch=parent,
            extra=ivf.inherited_manifest_extra(
                mgr.read_manifest(parent).extra, parent
            ),
        )
    try:
        with ThreadPoolExecutor(2) as pool:
            out = [f.result() for f in [pool.submit(build_delta, i) for i in range(2)]]
    finally:
        delta.unpersist()
    (e1, m1), (e2, m2) = out
    assert e1 != e2  # the CAS held under contention
    for e, m in out:
        assert mgr.read_manifest(e).num_vectors == m.num_vectors
        assert m.num_vectors == parent_n + 8  # no interleaved rows
        assert mgr.epoch_chain(e)[0] == mgr.epoch_chain(parent)[0]
        assert mgr.epoch_chain(e)[-1] == e
    # both deltas individually servable; parent untouched
    for e in (e1, e2):
        h = ivf.IVFIndex.load(spark, mgr.base_dir, mgr.index_name, epoch=e)
        assert h.vectors.count() == parent_n + 8
    assert mgr.active_epoch() == parent


def test_pointer_discipline_is_pluggable(tmp_path):
    """EpochManager delegates every _ACTIVE touch to the injected pointer
    object — the seam for object-store conditional-put disciplines where
    rename is not atomic (deploy/spark-submit.md §2)."""

    class RecordingPointer:
        def __init__(self):
            self.state = None
            self.calls = []

        def read(self, index_dir):
            self.calls.append("read")
            return self.state

        def write(self, index_dir, epoch):
            self.calls.append(("write", epoch))
            self.state = epoch

        def clear(self, index_dir):
            self.calls.append("clear")
            self.state = None

    ptr = RecordingPointer()
    mgr = EpochManager(str(tmp_path / "p"), "idx", pointer=ptr)
    e = mgr.reserve_epoch()
    with open(mgr.manifest_path(e), "w") as f:
        f.write("{}")  # activate() only checks dir membership
    assert mgr.active_epoch() is None
    mgr.activate(e)
    assert mgr.active_epoch() == e
    mgr.deactivate()
    assert mgr.active_epoch() is None
    assert ("write", e) in ptr.calls and "clear" in ptr.calls
    # and no _ACTIVE file ever touched disk: the pointer owns the medium
    assert not os.path.exists(os.path.join(mgr.index_dir, "_ACTIVE"))


def test_abandoned_reservation_skipped_not_reused(tmp_path):
    """A writer that dies right after reserving leaves an empty epoch dir:
    later writers must claim PAST it (never write into a dir another
    process may still hold), and readers must not resolve it."""
    mgr = EpochManager(str(tmp_path / "a"), "idx")
    dead = mgr.reserve_epoch()  # the crashed writer's claim
    nxt = mgr.reserve_epoch()
    assert nxt == dead + 1
    assert mgr.active_epoch() is None  # pointer never moved
