"""Loaders for the driver-generated parquet testdata (TESTDATA.md).

One parquet file per table under ``{sf_dir}/{name}.parquet``. Reads go
through ``spark.read.parquet`` so Catalyst gets vectorized scans, predicate
pushdown, and column pruning for free — at 100 TB these tables would be
partitioned directories and everything here still applies unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS), which the Spark parquet
        # reader rejects unless nanos are read back as long. Set at call time
        # so the engine works on ANY caller-provided session (the driver
        # builds its own), not just ones from session.get_spark().
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # a micros ts WITHOUT isAdjustedToUTC would infer as TIMESTAMP_NTZ,
        # which unix_micros/unix_timestamp reject and whose LTZ cast depends
        # on the caller session's timezone; reading it as plain TIMESTAMP
        # takes the raw micros as epoch-UTC — the same naive reading a SQL
        # oracle (DuckDB) uses, independent of session timezone
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long via nanosAsLong; truncate to micros
        # with integer division (nanos ~1.7e18 exceed double's 2^53 mantissa,
        # so float division would corrupt timestamps)
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` mirrors the
    DuckDB oracle environment (same view names)."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
