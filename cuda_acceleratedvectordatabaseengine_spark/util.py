"""Small plan-shaping helpers shared across operators."""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame


class SharedCache:
    """Bounded, semantically-keyed registry of persisted DataFrames.

    Expensive derived relations (shingle tables, minhash/simhash signature
    sets, LSH bucket keys) are consumed by several plan branches within one
    operator AND recomputed verbatim by sibling operators in the same
    pipeline (pair finding -> cluster resolution reruns the identical
    shingle+signature pass). A plain ``.cache()`` leaks storage blocks
    forever; unpersist-before-return forces every sibling call to pay the
    full pass again. This registry is the middle path the reference's cache
    objects take (a capacity-bounded cache with explicit eviction,
    engine/ivf_flat_index.h:191-222):

    - ``persist(df)`` keys the frame by its ANALYZED-PLAN semantic hash, so
      a sibling operator that rebuilds the same logical relation gets the
      already-persisted one back (hit = zero recompute);
    - entries are LRU-bounded (``max_entries``) — inserting past the cap
      unpersists the coldest entry, so long-lived applications cannot
      accumulate storage;
    - ``release()`` is the explicit eviction hook for callers
      (bench harnesses, services) that want a cold start.

    An entry whose blocks were dropped externally (``spark.catalog.
    clearCache()``) is re-persisted on hit rather than silently degrading to
    recompute-per-consumer.
    """

    def __init__(self, max_entries: int = 8) -> None:
        self.max_entries = max_entries
        self._entries: OrderedDict[tuple, DataFrame] = OrderedDict()

    @staticmethod
    def _key(df: DataFrame) -> tuple:
        try:
            return (id(df.sparkSession), df._jdf.semanticHash())
        except Exception:  # Connect or API drift: no sharing, still bounded
            return (id(df.sparkSession), id(df))

    def persist(self, df: DataFrame) -> DataFrame:
        key = self._key(df)
        hit = self._entries.get(key)
        if hit is not None:
            self._entries.move_to_end(key)
            lvl = hit.storageLevel
            if not (lvl.useMemory or lvl.useDisk):  # externally cleared
                hit.persist()
            return hit
        df = df.persist()
        self._entries[key] = df
        while len(self._entries) > self.max_entries:
            _, cold = self._entries.popitem(last=False)
            cold.unpersist()
        return df

    def release(self) -> int:
        """Unpersist every entry; returns how many were released."""
        n = len(self._entries)
        while self._entries:
            self._entries.popitem()[1].unpersist()
        return n

    def __len__(self) -> int:
        return len(self._entries)


def respread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Widen a narrow scan before CPU-heavy per-row work.

    A small parquet input (one file under ``maxPartitionBytes``) arrives as a
    single partition, serializing everything downstream — hashing, shingling,
    decode — onto one core.  Round-robin repartition up to the session's
    default parallelism when the input has fewer partitions than that.  At
    100 TB the scan already has thousands of splits and this is a no-op (the
    partition-count probe is metadata-only, no job runs).
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
