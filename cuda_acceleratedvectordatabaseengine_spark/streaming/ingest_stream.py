"""Streaming index maintenance: a vector stream feeds DELTA EPOCHS.

The reference ingests with blocking ``add()`` calls against a mutable
in-memory index (engine/ivf_flat_index.cpp:148-202); its storage layer
then snapshots immutable epochs. Spark's native form composes the two:
each micro-batch of arriving vectors becomes one O(delta) delta epoch
(``IVFIndex.add``), activated atomically, so searches always see a
consistent snapshot and never block on ingest.

Unbounded chains would accumulate per-batch file fragments, so the loop
self-maintains, mirroring the compaction the reference declares (B7,
format/storage.h:160):

- when the active chain reaches ``compact_every`` epochs, the micro-batch
  handler rewrites it into ONE full epoch (``compact``) and activates
  that instead;
- epoch GC (keep-newest + ancestor-closure) runs after every batch, so
  storage is bounded by ``keep_epochs`` chains regardless of stream
  lifetime.

Scale shape: per trigger the work is one assignment pass + one
partitioned write of THE BATCH ONLY (plus an occasional corpus-sized
compaction, amortized 1/compact_every). At 100 TB with a Kafka source
this is the standard ingest loop — `maxOffsetsPerTrigger` sizes the
delta, compaction cost amortizes across triggers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.ivf import IVFIndex


def ingest_vector_stream(
    vector_stream: DataFrame,
    base_dir: str,
    index_name: str,
    id_col: str = "id",
    vec_col: str = "vector",
    compact_every: int = 4,
    keep_epochs: int = 3,
    trigger: dict | None = None,
    checkpoint_dir: str | None = None,
    query_name: str = "ivf-ingest-stream",
    on_epoch=None,
) -> StreamingQuery:
    """Maintain ``index_name`` from a streaming ``{id, vector}`` source.

    The index must already exist with an ACTIVE epoch (built once via
    ``IVFIndex.build`` — centroids are train-time artifacts; ingest only
    assigns). ``on_epoch(epoch, kind)`` is called after each activation
    with kind ``"delta"`` or ``"compacted"`` — the hook for cache warms or
    serving-side reloads."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        idx = IVFIndex.load(spark, base_dir, index_name)
        new = idx.add(batch_df, id_col=id_col, vec_col=vec_col, activate=True)
        kind = "delta"
        if len(new.manager.epoch_chain(new.epoch)) >= compact_every:
            new = new.compact(activate=True)
            kind = "compacted"
        new.manager.cleanup(keep=keep_epochs)
        if on_epoch is not None:
            on_epoch(new.epoch, kind)

    writer = (
        vector_stream.writeStream.foreachBatch(process_batch).queryName(query_name)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
