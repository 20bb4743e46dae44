"""Streaming NEAR-duplicate suppression — MinHash-LSH at arrival.

``dedup_stream`` (exact) drops byte-identical content as it arrives; this
module drops NEAR-duplicates (edited copies, boilerplate variants) the
same way, without ever re-scanning the accumulated corpus. It is the
streaming form of ``operators/dedup.py``'s MinHash-LSH family, built the
way ``ingest_stream`` builds index maintenance: ``foreachBatch`` over a
persistent BAND-BUCKET STORE instead of an in-memory service.

Per micro-batch (the testable core is ``neardup_batch``):

1. MinHash signatures for the batch (the batch operator's vectorized
   kernel, ``minhash_signatures``), sliced into ``bands`` band rows
   ``{doc_id, band, bh}`` (``dedup.band_rows`` — same coordinates as the
   batch candidate join).
2. WITHIN-batch resolution: docs sharing any band bucket form a pair
   graph; connected components (the batch operator — driver union-find at
   delta scale) elect the min-id doc per component.
3. CROSS-batch check: an equi-join of the batch's band rows against the
   accumulated store; any component touching an occupied bucket is a
   near-duplicate of already-accepted content and is dropped whole.
4. Survivors' band rows are APPENDED to the store under
   ``batch_id=<n>/`` — replay of a crashed micro-batch overwrites its own
   subdirectory, so the store never double-counts (at-least-once safe).
5. Every ``compact_every`` delta dirs the store folds into one
   ``compact_id=<n>/`` dir (write-commit-then-delete, crash-safe via
   Spark's _SUCCESS marker) — at 100K micro-batches the read path stays
   a handful of files instead of a small-file storm.

Semantics: first-seen-wins at BAND granularity. A pair that shares >= 1
of the 32 bands (4-row bands: P(collision) = j^4 per band) is treated as
near-duplicate without an exact verify — the aggressive-dedup setting; a
j=0.9 pair is caught with p ~ 1-(1-0.9^4)^32 ~ 1-1e-15, while an
unrelated j=0.1 pair false-drops with p ~ 32e-4. Tune ``bands``/
``num_perm`` for the precision/recall trade, exactly as in the batch
operator.

Scale shape: the per-trigger work is delta-sized signatures + ONE
equi-join against the store on (band, bh) — shuffle-on-bucket, the only
join shape that scales; the store grows by O(accepted docs x bands) rows
of three 8-byte columns and is a plain parquet table (bucket it on
``bh`` for a shuffle-free join at 100 TB). The reference engine has no
streaming surface at all; this is LLM-pipeline extension surface.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators import dedup

# Fold the per-batch delta dirs into one compacted dir once this many
# deltas accumulate — without it, 100K micro-batches = a 100K-small-file
# storm on every store read (the same amortized discipline as
# ingest_batch's compact_every).
DEFAULT_STORE_COMPACT_EVERY = 16


def _store_batch_dir(store_dir: str, batch_id: int) -> str:
    return os.path.join(store_dir, f"batch_id={batch_id}")


def _is_committed(path: str) -> bool:
    return os.path.isfile(os.path.join(path, "_SUCCESS"))


def _store_parts(store_dir: str) -> tuple[str | None, list[str]]:
    """(newest COMMITTED compact dir or None, delta dirs oldest-first).

    A compact dir without Spark's _SUCCESS marker is a crashed partial
    write and is invisible — its input dirs are still present (inputs are
    deleted only AFTER a committed compact), so no rows are ever lost.
    """
    if not os.path.isdir(store_dir):
        return None, []
    compacts, deltas = [], []
    for name in os.listdir(store_dir):
        full = os.path.join(store_dir, name)
        if name.startswith("compact_id=") and _is_committed(full):
            compacts.append(name)
        elif name.startswith("batch_id="):
            deltas.append(name)
    key = lambda n: int(n.split("=", 1)[1])  # noqa: E731
    compacts.sort(key=key)
    deltas.sort(key=key)
    newest = os.path.join(store_dir, compacts[-1]) if compacts else None
    return newest, [os.path.join(store_dir, d) for d in deltas]


def read_store(spark, store_dir: str) -> DataFrame | None:
    """The accumulated band-bucket store, or None before the first commit.

    Reads the newest committed compact dir plus every delta dir. During
    the delete window after a compaction commit the same row can appear
    in both — harmless, because the store is only ever consumed with set
    semantics (left_semi bucket joins / DISTINCT doc listings).
    """
    compact, deltas = _store_parts(store_dir)
    paths = ([compact] if compact else []) + deltas
    if not paths:
        return None
    return spark.read.parquet(*paths)


def compact_store(
    spark, store_dir: str, compact_id: int, exclude_delta: str | None = None
) -> bool:
    """Fold the store into one ``compact_id=<n>`` dir, then delete the
    input dirs. Crash-safe by ordering: the compact write commits (Spark
    _SUCCESS marker) BEFORE any input is removed, and an uncommitted
    compact is ignored by readers; a crash mid-delete only leaves benign
    duplicate rows until the next compaction sweeps them. Returns False
    when there is nothing to fold or a committed ``compact_id=<n>``
    already exists (replay of a finished compaction).

    ``exclude_delta``: a delta dir to leave OUT of this fold — the
    streaming caller passes the triggering batch's own delta so a batch
    never compacts itself before its checkpoint commits (a crash in that
    window would make the replay self-collide against the compact dir and
    report [] survivors, silently dropping the batch from the survivor
    callback). The excluded delta is folded by a later compaction, after
    its batch has committed.

    Housekeeping: any OTHER uncommitted ``compact_id=`` dir found here is
    a crashed partial write whose inputs are guaranteed still present
    (inputs are deleted only after commit), so it is deleted — without
    this, orphaned partial compacts accumulate forever."""
    target = os.path.join(store_dir, f"compact_id={compact_id}")
    if os.path.isdir(store_dir):
        for name in os.listdir(store_dir):
            full = os.path.join(store_dir, name)
            if (
                name.startswith("compact_id=")
                and full != target
                and not _is_committed(full)
            ):
                shutil.rmtree(full, ignore_errors=True)
    compact, deltas = _store_parts(store_dir)
    if compact == target:  # replayed batch: this compaction already ran
        return False
    inputs = ([compact] if compact else []) + [
        d for d in deltas if d != exclude_delta
    ]
    if not inputs:
        return False
    (
        spark.read.parquet(*inputs)
        .select("doc_id", "band", "bh")
        .distinct()
        .write.mode("overwrite")
        .parquet(target)
    )
    for path in inputs:
        shutil.rmtree(path, ignore_errors=True)
    return True


def neardup_batch(
    batch_df: DataFrame,
    store_dir: str,
    batch_id: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = dedup.DEFAULT_NUM_PERM,
    bands: int = dedup.DEFAULT_BANDS,
    n: int = 3,
    max_shingle_doc_freq: int | None = None,
    compact_every: int | None = DEFAULT_STORE_COMPACT_EVERY,
) -> "list[int]":
    """One near-dup step: returns the batch's surviving doc ids (sorted)
    and appends their band rows to the store. Replay-idempotent: the
    batch's store subdirectory is overwritten, never appended twice, and
    the cross-batch check excludes the batch's OWN prior partial write.
    Once ``compact_every`` delta dirs accumulate they are folded into one
    ``compact_id=<n>`` dir (``compact_store``) so the store read path
    stays O(1) files per trigger instead of O(batches)."""
    spark = batch_df.sparkSession
    sigs = dedup.minhash_signatures(
        batch_df, num_perm, n, text_col, id_col, max_shingle_doc_freq
    )
    rows = dedup.band_rows(sigs, bands, num_perm).cache()
    try:
        batch_ids = {r["doc_id"] for r in rows.select("doc_id").distinct().collect()}
        if not batch_ids:
            return []
        # within-batch: min-id per band-collision component survives
        a, b = rows.alias("a"), rows.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bh") == F.col("b.bh"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_id_a"),
                F.col("b.doc_id").alias("doc_id_b"),
            )
            .distinct()
        )
        comp = {
            r["doc_id"]: r["component"]
            for r in dedup.connected_components(pairs).collect()
        }
        # cross-batch: any component touching an occupied store bucket is
        # a near-dup of already-accepted content — dropped whole. The
        # batch's OWN delta dir (a crashed previous attempt of this very
        # batch) is excluded so a replay reaches the same decision instead
        # of colliding with itself. Compaction below likewise excludes the
        # own delta, so a replayed batch can never find itself pre-folded
        # into a compact dir — replay always reproduces the original
        # survivor decision.
        own_dir = _store_batch_dir(store_dir, batch_id)
        compact, deltas = _store_parts(store_dir)
        store_paths = ([compact] if compact else []) + [
            d for d in deltas if d != own_dir
        ]
        collided: set[int] = set()
        if store_paths:
            store = spark.read.parquet(*store_paths)
            hit = (
                rows.join(store.select("band", "bh"), ["band", "bh"], "left_semi")
                .select("doc_id")
                .distinct()
                .collect()
            )
            collided = {comp.get(r["doc_id"], r["doc_id"]) for r in hit}
        survivors = sorted(
            d
            for d in batch_ids
            if comp.get(d, d) == d and comp.get(d, d) not in collided
        )
        if survivors:
            rows.filter(F.col("doc_id").isin(survivors)).write.mode(
                "overwrite"
            ).parquet(own_dir)
        if compact_every:
            _, deltas_now = _store_parts(store_dir)
            # exclude_delta=own_dir: never fold this batch's own rows
            # before its checkpoint commits (see compact_store docstring)
            if len([d for d in deltas_now if d != own_dir]) >= compact_every:
                compact_store(spark, store_dir, batch_id, exclude_delta=own_dir)
        return survivors
    finally:
        rows.unpersist()


def neardup_dedup_stream(
    docs: DataFrame,
    store_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = dedup.DEFAULT_NUM_PERM,
    bands: int = dedup.DEFAULT_BANDS,
    n: int = 3,
    max_shingle_doc_freq: int | None = None,
    compact_every: int | None = DEFAULT_STORE_COMPACT_EVERY,
    trigger: dict | None = None,
    checkpoint_dir: str | None = None,
    query_name: str = "neardup-dedup-stream",
    on_survivors=None,
) -> StreamingQuery:
    """Suppress near-duplicates on a streaming document source.

    ``on_survivors(batch_id, [doc_id, ...])`` fires once per micro-batch
    with the ids accepted from it (empty list for all-duplicate batches).
    The surviving corpus is recoverable at any time from the store:
    ``read_store(spark, store_dir).select("doc_id").distinct()``."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        survivors = neardup_batch(
            batch_df, store_dir, batch_id,
            text_col=text_col, id_col=id_col,
            num_perm=num_perm, bands=bands, n=n,
            max_shingle_doc_freq=max_shingle_doc_freq,
            compact_every=compact_every,
        )
        if on_survivors is not None:
            on_survivors(batch_id, survivors)

    writer = docs.writeStream.foreachBatch(process_batch).queryName(query_name)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
