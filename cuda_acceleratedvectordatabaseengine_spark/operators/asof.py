"""As-of (nearest-prior) join — a time-series operator Spark's join zoo
lacks (the brief's canonical example of a custom operator; the reference
engine has no temporal joins at all, SURVEY.md §2.6).

Semantics (``direction='backward'``): each left row matches the right row
with the greatest ``right_ts <= left_ts`` within the same ``by`` keys, or
null if none. ``'forward'`` mirrors it (smallest ``right_ts >= left_ts``).
DuckDB's native ``ASOF JOIN`` is the oracle.

Implementation is the scalable single-shuffle form, NOT a range/theta
join: both sides are unioned into one stream, shuffled once on the ``by``
keys, sorted by (ts, side), and each left row picks up the running
``last(right_payload, ignorenulls)`` via a window — O(n log n) per key
group, no BroadcastNestedLoopJoin, no per-row probing. The same plan shape
handles 1000 executors: the only shuffle is the window's
``partitionBy(by)``; skewed keys skew exactly like any groupBy and respond
to the same AQE handling.

Ties: right rows sharing the maximal eligible timestamp are ordered by
``right_tiebreak`` (if given) and the last one wins — pass an id column to
make the match fully deterministic; without it, tie selection is
arbitrary (gap-style outputs are tie-invariant either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"
_TS = "__asof_ts"
_TB = "__asof_tb"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the matched right row's
    columns (``right_cols``, renamed with ``suffix``) or nulls."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by]
    payload = F.struct(*[F.col(c) for c in right_cols])
    payload_type = right.select(payload.alias("p")).schema["p"].dataType
    tb_type = right.select(right_tiebreak).schema[0].dataType if right_tiebreak else None

    left_types = dict(left.dtypes)
    non_by_left = [c for c in left.columns if c not in by]

    l_stream = left.select(
        *left.columns,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(payload_type).alias(_PAYLOAD),
        *([F.lit(None).cast(tb_type).alias(_TB)] if right_tiebreak else []),
    )
    r_stream = right.select(
        *[F.lit(None).cast(left_types[c]).alias(c) for c in non_by_left],
        *[F.col(c) for c in by],
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        payload.alias(_PAYLOAD),
        *([F.col(right_tiebreak).alias(_TB)] if right_tiebreak else []),
    )
    both = l_stream.unionByName(r_stream)

    # right rows must sort BEFORE left rows at equal timestamps so an
    # exactly-simultaneous right row is eligible (ASOF's <= / >=); for
    # 'forward' the stream is walked in descending time, same trick
    if direction == "backward":
        order = [F.col(_TS).asc(), F.col(_SIDE).asc()] + (
            [F.col(_TB).asc()] if right_tiebreak else []
        )
    else:
        # only time reverses; the tiebreak stays ascending so "greatest
        # tiebreak wins" holds in both directions
        order = [F.col(_TS).desc(), F.col(_SIDE).asc()] + (
            [F.col(_TB).asc()] if right_tiebreak else []
        )
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        both.withColumn("__match", F.last(_PAYLOAD, ignorenulls=True).over(w))
        .filter(F.col(_SIDE) == 1)
        .drop(_SIDE, _PAYLOAD, _TS, *([_TB] if right_tiebreak else []))
    )
    for c in right_cols:
        matched = matched.withColumn(c + suffix, F.col(f"__match.{c}"))
    return matched.drop("__match")
