"""Interval join: boundary semantics + differential vs a DuckDB
inequality join, + plan-shape guard (equi-join, never nested-loop)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cuda_acceleratedvectordatabaseengine_spark.operators.rangejoin import interval_join


def test_interval_join_boundaries(spark):
    l = spark.createDataFrame([(1, "u", 100)], "lid long, k string, t long")
    r = spark.createDataFrame(
        [(10, "u", 95), (11, "u", 100), (12, "u", 105), (13, "u", 94),
         (14, "u", 106), (15, "v", 100)],
        "rid long, k string, t long",
    )
    got = sorted(
        row["rid_right"]
        for row in interval_join(l, r, by="k", left_ts="t", right_ts="t", lower=-5, upper=5).collect()
    )
    assert got == [10, 11, 12]  # inclusive bounds, key match required


def test_interval_join_exact_and_validation(spark):
    l = spark.createDataFrame([(1, "u", 100)], "lid long, k string, t long")
    r = spark.createDataFrame([(10, "u", 100), (11, "u", 101)],
                              "rid long, k string, t long")
    got = [row["rid_right"] for row in
           interval_join(l, r, by="k", left_ts="t", right_ts="t", lower=0, upper=0).collect()]
    assert got == [10]
    with pytest.raises(ValueError):
        interval_join(l, r, by="k", left_ts="t", right_ts="t", lower=5, upper=-5)


def test_interval_join_matches_duckdb(spark, sf_dir):
    from cuda_acceleratedvectordatabaseengine_spark.sources import tables

    ev = tables.load(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("eid"), "user_id", F.unix_micros("ts").alias("t")
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), "user_id", F.unix_micros("ts").alias("t")
    )
    j = interval_join(
        err, clk, by="user_id", left_ts="t", right_ts="t", lower=-300_000_000, upper=0
    )
    got = {(r["eid"], r["cid_right"]) for r in j.collect()}
    con = duckdb.connect()
    want = set(
        con.execute(f"""
            WITH e AS (SELECT event_id AS eid, user_id, epoch_us(ts) AS t
                       FROM '{sf_dir}/events.parquet' WHERE event_type='error'),
                 c AS (SELECT event_id AS cid, user_id, epoch_us(ts) AS t
                       FROM '{sf_dir}/events.parquet' WHERE event_type='click')
            SELECT e.eid, c.cid FROM e JOIN c
            ON e.user_id = c.user_id
            AND c.t - e.t BETWEEN -300000000 AND 0
        """).fetchall()
    )
    assert got == want and len(got) > 0


def test_interval_join_plan_is_equi_join(spark):
    l = spark.createDataFrame([(1, "u", 100)], "lid long, k string, t long")
    r = spark.createDataFrame([(10, "u", 95)], "rid long, k string, t long")
    plan = interval_join(l, r, by="k", left_ts="t", right_ts="t", lower=-5, upper=5)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
