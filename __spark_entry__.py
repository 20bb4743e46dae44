"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``cuda_acceleratedvectordatabaseengine_spark``;
this module only adapts the query catalog to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cuda_acceleratedvectordatabaseengine_spark.plans import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the end-to-end composition the engine exists for —
    raw documents -> token-window chunking -> in-engine hashed
    embeddings -> IVF epoch build -> top-k search, on sf0.001
    (the r7 ``pipeline_docs_to_ann`` catalog row)."""
    return Q.get("pipeline_docs_to_ann").spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in Q.all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in Q.all_specs().items()
        if spec.oracle is not None
    }
