"""Sequence packing for LLM training-data pipelines.

GPT-style packing: concatenate documents in a stable order and cut
fixed token-budget training sequences, letting documents straddle
sequence boundaries (the standard pretraining layout — no padding
waste, boundaries handled by attention masks downstream). The engine's
job is the *placement*: for each document, which byte of the global
token stream it starts at, and therefore which sequences it lands in.

The global token offset is a prefix sum over an ordered corpus — the
classic Spark trap is ``Window.orderBy(id)`` with no partitioning,
which collapses 100 TB onto one task. We do the textbook two-level
scan instead:

1. bucket documents by id range (floor division by a span derived from
   max(id) — one bounded 1-row driver read);
2. per-bucket running sum via a window PARTITIONED by bucket (parallel);
3. bucket totals -> a G-row cumulative offset table, broadcast back.

Every stage is parallel; the only serial structure is the G-row offset
table (G = num_buckets, hundreds at most). Documents then explode to
the sequences they overlap — at most tc/budget + 1 rows each — and a
map-side-combined groupBy produces per-sequence stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TXT


def token_offsets(
    df: DataFrame,
    order_col: str = "doc_id",
    count_col: str = "tc",
    num_buckets: int = 64,
) -> DataFrame:
    """Global exclusive prefix sum of ``count_col`` in ``order_col`` order.

    Two-level distributed scan (see module docstring); requires
    non-negative integer ``order_col``. Returns the input columns plus
    ``start`` (tokens before this doc) and ``end`` (= start + count).
    """
    hi = df.agg(F.max(order_col).alias("m")).first()["m"]  # bounded: 1 row
    if hi is None:
        return df.withColumn("start", F.lit(0).cast("long")).withColumn(
            "end", F.col(count_col).cast("long")
        )
    span = max(1, (int(hi) + num_buckets) // num_buckets)
    b = df.withColumn(
        "_bucket", F.floor(F.col(order_col) / F.lit(span)).cast("long")
    )
    in_bucket = Window.partitionBy("_bucket").orderBy(order_col)
    b = b.withColumn("_local_end", F.sum(count_col).over(in_bucket))
    offsets = b.groupBy("_bucket").agg(F.sum(count_col).alias("_bsum"))
    prior = (
        Window.orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # G rows total — single-task by construction, bounded by num_buckets
    offsets = offsets.withColumn(
        "_off", F.coalesce(F.sum("_bsum").over(prior), F.lit(0)).cast("long")
    )
    return (
        b.join(F.broadcast(offsets.select("_bucket", "_off")), "_bucket")
        .withColumn("end", (F.col("_local_end") + F.col("_off")).cast("long"))
        .withColumn("start", (F.col("end") - F.col(count_col)).cast("long"))
        .drop("_bucket", "_local_end", "_off")
    )


def pack_sequences(
    df: DataFrame,
    budget: int = 256,
    text_col: str = "text",
    order_col: str = "doc_id",
    num_buckets: int = 64,
    token_count_col: "str | None" = None,
) -> DataFrame:
    """Cut the corpus (concatenated in ``order_col`` order) into
    ``budget``-token training sequences; per-sequence stats.

    Returns (seq_id, n_docs, n_tokens, first_doc, last_doc): how many
    documents overlap each sequence, how many of its token slots are
    filled (= budget everywhere but the final partial sequence), and
    the id range it draws from. ``sum(n_tokens)`` equals the corpus
    token count — a packing that loses or double-counts tokens is wrong.

    Documents with zero tokens are excluded (they occupy no slots).

    ``token_count_col``: use a precomputed per-doc token count instead
    of the whitespace proxy — the seam for a REAL tokenizer's counts
    (join ``bpe.apply_bpe_bytes`` output on ``order_col`` and name its
    ``n_tokens`` here) so sequence budgets reflect the tokenizer that
    will actually run.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    tc = (
        F.col(token_count_col)
        if token_count_col is not None
        else TXT.token_count_expr(text_col)
    )
    base = df.select(
        F.col(order_col), tc.cast("long").alias("tc")
    ).filter(F.col("tc") > 0)
    pos = token_offsets(base, order_col, "tc", num_buckets)
    lo = F.floor(F.col("start") / F.lit(budget)).cast("long")
    hi = F.floor((F.col("end") - 1) / F.lit(budget)).cast("long")
    spans = pos.select(
        F.col(order_col),
        "start",
        "end",
        F.explode(F.sequence(lo, hi)).alias("seq_id"),
    )
    seq_lo = F.col("seq_id") * budget
    seq_hi = (F.col("seq_id") + 1) * budget
    return (
        spans.groupBy("seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.least(F.col("end"), seq_hi) - F.greatest(F.col("start"), seq_lo)
            ).alias("n_tokens"),
            F.min(order_col).alias("first_doc"),
            F.max(order_col).alias("last_doc"),
        )
    )
