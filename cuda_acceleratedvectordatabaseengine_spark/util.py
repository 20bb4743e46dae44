"""Small plan-shaping helpers shared across operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
