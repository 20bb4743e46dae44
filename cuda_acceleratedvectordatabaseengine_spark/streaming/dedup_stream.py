"""Streaming exact deduplication — first-seen-wins across micro-batches.

The batch engine dedups a corpus with a hash-groupBy over content
fingerprints (operators/dedup.py, exact family). An LLM ingest pipeline at
100 TB cannot afford to re-scan the accumulated corpus every time a new
shard arrives; the streaming form drops duplicates AT ARRIVAL instead:

- each document's content fingerprint (the same ``doc_fingerprint_expr``
  the batch path uses — md5 over normalized text) keys a
  ``applyInPandasWithState`` group;
- state per distinct fingerprint is a single long (the first-seen doc id),
  so the state store carries exactly the cardinality the batch
  hash-groupBy would shuffle — one row per DISTINCT document, not per
  document. With the RocksDB state store provider this scales to corpus-
  sized state off-heap;
- the first batch that sees a fingerprint emits ONE winner (smallest doc
  id within that batch, deterministic) and pins the state; every later
  arrival of the same content, in the same batch or any future one, is
  dropped.

The reference engine has no streaming surface (its ingest is the batch
``add()`` path, engine/ivf_flat_index.cpp:148-202); this operator is part
of the LLM-pipeline extension surface, expressed on Spark's own stateful
streaming runtime rather than a hand-rolled dedup service.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from ..functions import text as TXT

OUTPUT_SCHEMA = "doc_id long, fingerprint string"
STATE_SCHEMA = "first_doc_id long"


def _first_seen(key, pdfs, state):
    """Emit the smallest doc_id of this fingerprint's first batch; drop
    everything once state exists. Generator yields nothing for dropped
    groups — an empty micro-batch contribution, not an empty frame."""
    best = None
    for pdf in pdfs:
        if len(pdf):
            m = int(pdf["doc_id"].min())
            best = m if best is None else min(best, m)
    if best is not None and not state.exists:
        state.update((best,))
        yield pd.DataFrame({"doc_id": [best], "fingerprint": [str(key[0])]})


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    key_expr=None,
) -> DataFrame:
    """Streaming exact dedup: ``{doc_id: long, fingerprint: string}`` of each content
    fingerprint's first-seen document; all later duplicates are dropped.

    Input is a STREAMING DataFrame with a text column and a long id
    column. The result streams in append mode (each winner is emitted
    exactly once, in the micro-batch that first saw its content). Join the
    output back to the payload stream/table to materialize surviving
    documents — the state output stays two narrow columns on purpose.

    ``key_expr`` swaps the dedup key for any string Column — e.g.
    ``functions.urls.canonical_url_expr("url")`` turns this into
    arrival-time URL-level dedup over a crawl manifest (the streaming
    twin of ``dedup.dedup_by_url``); default is the content fingerprint
    the batch path uses.
    """
    keyed = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        (
            key_expr
            if key_expr is not None
            else TXT.doc_fingerprint_expr(text_col)
        ).alias("fingerprint"),
    )
    return keyed.groupBy("fingerprint").applyInPandasWithState(
        _first_seen,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
