"""Bucketed co-located joins (sources/bucketed.py): exchange-free plan
shape, result parity with the shuffled join, bucket-metadata loss when
bypassing the catalog."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cuda_acceleratedvectordatabaseengine_spark.sources import bucketed, tables


@pytest.fixture(scope="module")
def bucket_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    docs = tables.load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    emb = tables.load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "label"
    )
    names = ("cavde_t_docs_bkt", "cavde_t_emb_bkt")
    bucketed.write_bucketed(
        docs, names[0], str(base / "docs"), "doc_id", 8,
        sort_cols=("doc_id",),
    )
    bucketed.write_bucketed(
        emb, names[1], str(base / "emb"), "doc_id", 8,
        sort_cols=("doc_id",),
    )
    yield names
    for n in names:
        bucketed.drop_table(spark, n)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class _no_broadcast:
    """At test scale every join is under the autoBroadcast threshold,
    which sidesteps bucketing entirely ('Bucketed: false (disabled by
    query planner)') — disable broadcast to expose the shape that
    matters at 100 TB, where neither side fits in an executor."""

    KEY = "spark.sql.autoBroadcastJoinThreshold"

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get(self.KEY)
        self.spark.conf.set(self.KEY, "-1")

    def __exit__(self, *exc):
        self.spark.conf.set(self.KEY, self.prev)


def test_colocated_join_has_no_exchange(spark, bucket_tables):
    left, right = bucket_tables
    with _no_broadcast(spark):
        j = bucketed.colocated_join(spark, left, right, "doc_id")
        plan = _plan(j)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan


def test_colocated_join_matches_shuffled_join(spark, sf_dir, bucket_tables):
    left, right = bucket_tables
    got = {
        (r["doc_id"], r["lang"], r["label"])
        for r in bucketed.colocated_join(spark, left, right, "doc_id")
        .select("doc_id", "lang", "label")
        .collect()
    }
    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "lang")
    emb = tables.load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "label"
    )
    want = {
        (r["doc_id"], r["lang"], r["label"])
        for r in docs.join(emb, "doc_id").collect()
    }
    assert got == want and got


def test_groupby_on_bucket_col_skips_exchange(spark, bucket_tables):
    left, _ = bucket_tables
    agg = bucketed.read_bucketed(spark, left).groupBy("doc_id").agg(
        F.count("*").alias("n")
    )
    assert "Exchange" not in _plan(agg)


def test_raw_path_read_loses_bucket_layout(spark, bucket_tables, tmp_path):
    """Documented footgun: reading the same parquet files by PATH (not
    through the catalog) loses bucket metadata and the join shuffles."""
    left, right = bucket_tables
    lpath = (
        spark.sql(f"DESCRIBE FORMATTED {left}")
        .filter(F.col("col_name") == "Location")
        .first()["data_type"]
    )
    raw = spark.read.parquet(lpath.replace("file:", ""))
    with _no_broadcast(spark):
        j = raw.join(bucketed.read_bucketed(spark, right), "doc_id")
        plan = _plan(j)
    assert "Exchange" in plan


def test_validation(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="num_buckets"):
        bucketed.write_bucketed(docs, "x", "/tmp/x", "doc_id", 0)
