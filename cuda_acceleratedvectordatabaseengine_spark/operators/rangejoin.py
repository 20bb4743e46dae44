"""Interval (range) join — pairs within a bounded time window, the second
temporal operator Spark lacks natively (with ``operators/asof.py``; the
brief names range joins alongside as-of joins as canonical custom ops).

``interval_join(left, right, by, ...)`` returns every (left, right) pair
sharing the ``by`` keys with ``lower <= right_ts - left_ts <= upper``.

Scale shape: a naive spelling is a theta-join — Spark plans it as
BroadcastNestedLoopJoin and it dies at scale. Here both sides are bucketed
by ``width = upper - lower``: a left row's admissible window spans at most
two consecutive buckets, so the left side explodes into <= 2 (key, bucket)
rows, the right side maps to exactly one, and the candidate set comes from
a plain shuffled EQUI-join on (by, bucket) — O(matches + small constant),
1000-executor-safe — followed by the exact window filter. Each true pair
is emitted exactly once (the right row lives in one bucket; the left row
lists each candidate bucket once)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: int = 0,
    upper: int = 0,
    suffix: str = "_right",
) -> DataFrame:
    """Inner interval join on integer timestamps (same unit both sides).
    Right columns (except ``by``) are renamed with ``suffix``."""
    if upper < lower:
        raise ValueError(f"upper ({upper}) < lower ({lower})")
    by = [by] if isinstance(by, str) else list(by)
    width = max(upper - lower, 1)

    lo_b = F.floor((F.col(left_ts) + F.lit(lower)) / F.lit(width))
    hi_b = F.floor((F.col(left_ts) + F.lit(upper)) / F.lit(width))
    l = left.withColumn(
        "__bucket", F.explode(F.array_distinct(F.array(lo_b, hi_b)))
    )
    r = right.select(
        *[F.col(c) for c in by],
        *[
            F.col(c).alias(c + suffix)
            for c in right.columns
            if c not in by
        ],
        F.floor(F.col(right_ts) / F.lit(width)).alias("__bucket"),
    )
    dt = F.col(right_ts + suffix) - F.col(left_ts)
    return (
        l.join(r, by + ["__bucket"])
        .filter((dt >= lower) & (dt <= upper))
        .drop("__bucket")
    )
