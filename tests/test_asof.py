"""As-of join: synthetic-semantics tests plus a differential test against
DuckDB's native ASOF JOIN on the events table."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cuda_acceleratedvectordatabaseengine_spark.operators.asof import asof_join

TRADES = [
    (1, "A", 100, 10.0),
    (2, "A", 250, 11.0),
    (3, "A", 50, 9.0),    # before any quote
    (4, "B", 300, 20.0),
    (5, "B", 100, 21.0),  # exactly simultaneous with a quote
]
QUOTES = [
    (10, "A", 100, 1.5),
    (11, "A", 200, 1.6),
    (12, "A", 200, 1.7),  # tied timestamp with quote 11
    (13, "B", 100, 2.5),
    (14, "B", 250, 2.6),
]


def _expected(direction: str) -> dict[int, int | None]:
    """Reference semantics in plain Python: nearest at-or-before (backward)
    / at-or-after (forward) quote time; greatest quote_id among ties."""
    out: dict[int, int | None] = {}
    for tid, sym, t, _ in TRADES:
        if direction == "backward":
            cand = [q for q in QUOTES if q[1] == sym and q[2] <= t]
            best_t = max((q[2] for q in cand), default=None)
        else:
            cand = [q for q in QUOTES if q[1] == sym and q[2] >= t]
            best_t = min((q[2] for q in cand), default=None)
        out[tid] = (
            max(q[0] for q in cand if q[2] == best_t) if best_t is not None else None
        )
    return out


@pytest.fixture(scope="module")
def quotes_trades(spark):
    tdf = spark.createDataFrame(TRADES, "trade_id long, sym string, t long, price double")
    qdf = spark.createDataFrame(QUOTES, "quote_id long, sym string, t long, quote double")
    return tdf, qdf


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_semantics(quotes_trades, direction):
    tdf, qdf = quotes_trades
    got = {
        r["trade_id"]: r["quote_id_right"]
        for r in asof_join(
            tdf, qdf, by="sym", left_ts="t", right_ts="t",
            direction=direction, right_cols=["quote_id", "quote"],
            right_tiebreak="quote_id",
        ).collect()
    }
    assert got == _expected(direction)


def test_asof_preserves_left_columns(quotes_trades):
    tdf, qdf = quotes_trades
    out = asof_join(tdf, qdf, by="sym", left_ts="t", right_ts="t",
                    right_cols=["quote"], right_tiebreak="quote_id")
    assert set(out.columns) == {"trade_id", "sym", "t", "price", "quote_right"}
    assert out.count() == len(TRADES)  # left join: every left row survives


def test_asof_events_attribution(spark, sf_dir):
    """Purchases attributed to the user's most recent prior click, checked
    against DuckDB ASOF JOIN on the same data (tie-invariant gap output)."""
    from cuda_acceleratedvectordatabaseengine_spark.sources import tables

    ev = tables.load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_micros("ts").alias("t")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.unix_micros("ts").alias("t")
    )
    j = asof_join(p, c, by="user_id", left_ts="t", right_ts="t", right_cols=["t"])
    got = {
        r["event_id"]: r["t"] - r["t_right"] if r["t_right"] is not None else None
        for r in j.collect()
    }
    con = duckdb.connect()
    want = {
        r[0]: r[1]
        for r in con.execute(f"""
            WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS t
                       FROM '{sf_dir}/events.parquet' WHERE event_type='purchase'),
                 c AS (SELECT user_id, epoch_us(ts) AS t
                       FROM '{sf_dir}/events.parquet' WHERE event_type='click')
            SELECT p.event_id, p.t - c.t
            FROM p ASOF LEFT JOIN c
            ON p.user_id = c.user_id AND p.t >= c.t
        """).fetchall()
    }
    assert got == want
