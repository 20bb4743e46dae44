"""Bucketed (pre-shuffled) tables for co-located joins.

The 100 TB join discipline: when two big tables are repeatedly joined
on the same key (embeddings x chunk metadata on doc_id, band rows x
band rows on (band, bh), search results x corpus on id), pay the
shuffle ONCE at write time — `bucketBy(n, key)` hash-partitions rows
into a fixed bucket layout — and every subsequent equi-join on that key
runs as a SortMergeJoin with NO Exchange on either side (plan-guarded
in tests/test_bucketed.py). `sortBy` additionally pre-sorts within
buckets so the join skips its Sort too.

Spark only honors bucket layouts through the catalog (`saveAsTable`),
so these are EXTERNAL tables: data lives at the caller's path, the
catalog entry is just metadata (DROP TABLE never deletes data). Both
sides must agree on (num_buckets, bucket_col) for the exchange-free
plan — expose one constant per pipeline and reuse it.

The reference engine has no table layer; this is the Spark-native
answer to its "partition into lists once, scan pruned forever" layout
discipline (SURVEY §2 B4), applied to relational joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_col: str,
    num_buckets: int,
    sort_cols: "tuple[str, ...]" = (),
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as an EXTERNAL bucketed parquet table: data at
    ``path``, catalog entry ``name``, hash-bucketed ``num_buckets`` ways
    on ``bucket_col`` (+ optional within-bucket sort). Joins between
    tables written with the same (num_buckets, bucket_col) are
    exchange-free."""
    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be positive, got {num_buckets}")
    w = (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(num_buckets, bucket_col)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """The catalog read — REQUIRED for the bucket layout to reach the
    planner (a raw ``spark.read.parquet(path)`` of the same files loses
    the bucket metadata and shuffles like any other scan)."""
    return spark.table(name)


def colocated_join(
    spark: SparkSession,
    left_name: str,
    right_name: str,
    on: "str | list[str]",
    how: str = "inner",
) -> DataFrame:
    """Equi-join two bucketed catalog tables. With matching bucket specs
    the physical plan has no Exchange on either side; this helper exists
    so call sites read as intent ("this join is co-located by layout")
    and tests can pin the plan shape in one place."""
    return read_bucketed(spark, left_name).join(
        read_bucketed(spark, right_name), on, how
    )


def drop_table(spark: SparkSession, name: str) -> None:
    """Drop the catalog entry (external: the files at ``path`` stay)."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
