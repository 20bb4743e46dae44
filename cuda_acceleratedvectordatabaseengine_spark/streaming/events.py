"""Watermarked window aggregations over the events stream.

The reference has no streaming semantics of its own (SURVEY.md §2.6); this
is the extension surface: tumbling/sliding/session windows with late-data
handling via watermarks. The batch-equivalent of the tumbling hourly
aggregation is catalog query q12_events_hourly — which is how correctness
is oracled (stream output on a finite input must equal the batch result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Per (tumbling window, event_type): count + value sum. Works on both
    batch and streaming DataFrames (same plan, same results on finite
    input)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window, slide).alias("win"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "cnt",
        )
    )


def sessionize_batch(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Deterministic batch sessionization: assign every event a
    ``session_id`` (0-based per user) — a new session starts when the gap
    to the previous event is >= ``gap_seconds`` (the same strictness as
    ``F.session_window``: events exactly ``gap`` apart do NOT merge).

    Built from lag + a RANGE-framed cumulative sum over microsecond epochs,
    so tied timestamps land in the same session regardless of their
    arbitrary intra-tie order — the result is fully deterministic and has
    an exact SQL spelling in any window-function dialect (the DuckDB
    oracle). Shuffles once on ``user_col``; both window passes reuse that
    partitioning.
    """
    gap_us = int(gap_seconds) * 1_000_000
    w = Window.partitionBy(user_col).orderBy("t_us")
    # default frame with orderBy is RANGE UNBOUNDED PRECEDING..CURRENT ROW:
    # tied rows see the same cumulative value (tie-order independence)
    marked = (
        events.withColumn("t_us", F.unix_micros(F.col(ts_col)))
        .withColumn(
            "new_sess",
            F.when(
                F.lag("t_us").over(w).isNull()
                | (F.col("t_us") - F.lag("t_us").over(w) >= gap_us),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
    )
    return marked.withColumn(
        "session_id", (F.sum("new_sess").over(w) - F.lit(1)).cast("long")
    ).drop("new_sess")


def session_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Per-user session summary {user_id, n_sessions, n_events,
    avg_session_secs} from ``sessionize_batch``."""
    sess = sessionize_batch(events, gap_seconds, ts_col, user_col)
    per_sess = sess.groupBy(user_col, "session_id").agg(
        F.count("*").alias("n_ev"),
        ((F.max("t_us") - F.min("t_us")) / F.lit(1_000_000.0)).alias("dur_s"),
    )
    return (
        per_sess.groupBy(user_col)
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_ev").alias("n_events"),
            F.round(F.avg("dur_s"), 6).alias("avg_session_secs"),
        )
        .orderBy(user_col)
    )


def session_counts(
    events: DataFrame,
    gap: str = "10 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity (stateful streaming; fine in batch too)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("win"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )
