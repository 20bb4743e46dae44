"""Table profiling — the data-quality pass a pipeline runs before
trusting a new corpus drop: per-column row/null/distinct counts and
value ranges.

One job, one scan: every column's aggregates go into a single wide
``agg`` (null counts, distincts, min/max), and the one-row result is
exploded into the per-column report. No per-column jobs, no driver
loop over the data — profiling 100 TB costs exactly one pass.

``exact=False`` (the scale default) uses HyperLogLog
``approx_count_distinct`` — constant memory per column; ``exact=True``
is the oracle-comparable form (COUNT DISTINCT) for modest tables and
correctness gates. Min/max are cast to strings after aggregation so
heterogeneous columns share one report schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, cols: "list[str] | None" = None, exact: bool = False
) -> DataFrame:
    """Per-column profile: (col_name, n_rows, n_null, n_distinct,
    min_value, max_value), one row per column, ordered by name."""
    cols = list(cols) if cols is not None else list(df.columns)
    distinct = F.countDistinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            distinct(c).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__mn_{c}"),
            F.max(c).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__rows").alias("n_rows"),
                (F.col("__rows") - F.col(f"__nn_{c}")).alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
            )
            for c in sorted(cols)
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")


def corpus_drift(
    df_a: DataFrame, df_b: DataFrame, group_col: str = "lang"
) -> DataFrame:
    """Distribution drift between two corpus snapshots — the check a
    pipeline owner runs when a new crawl drop lands: per-group share
    delta (share_B - share_A) and the total-variation distance
    (SUM |delta| / 2, in [0, 1]) over ``group_col`` (language, domain,
    source...). Output (metric, value DOUBLE) rows:
    ``share_delta:<group>`` per group plus ``tv_distance``.

    Exact arithmetic only (counts, divisions, abs — no logs), so the
    report value-matches a SQL recompute to ROUND(6); groups absent
    from one snapshot count 0 there (no smoothing needed). Scale shape:
    two map-side-combined counts + a full-outer join on the group key;
    totals come from a global window over the JOINED group-count rows
    (group-cardinality data, never corpus rows — each corpus is scanned
    exactly once)."""
    from pyspark.sql import Window

    # NULL group keys never equi-join (SQL null semantics): a NULL
    # group present in both snapshots would split into two full-outer
    # rows, double-counting in tv_distance and NULLing the metric
    # label. Join on a (is_null, value) flag pair so NULL is one
    # ordinary group WITHOUT merging it with a group literally named
    # '<null>' (that string is only the output label; if both exist,
    # two distinct share_delta:<null> rows appear — counts stay
    # separate, only the label is ambiguous).
    gs = F.col(group_col).cast("string")
    gn = gs.isNull()
    gv = F.coalesce(gs, F.lit(""))
    a = df_a.groupBy(gn.alias("gn"), gv.alias("gv")).agg(
        F.count("*").alias("n_a")
    )
    b = df_b.groupBy(gn.alias("gn"), gv.alias("gv")).agg(
        F.count("*").alias("n_b")
    )
    w = Window.partitionBy()
    j = (
        a.join(b, ["gn", "gv"], "full_outer")
        .fillna(0, ["n_a", "n_b"])
        .withColumn("ta", F.sum("n_a").over(w))
        .withColumn("tb", F.sum("n_b").over(w))
    )
    delta = F.col("n_b") / F.col("tb") - F.col("n_a") / F.col("ta")
    label = F.when(F.col("gn"), F.lit("<null>")).otherwise(F.col("gv"))
    per = j.select(
        F.concat(F.lit("share_delta:"), label).alias("metric"),
        (F.round(delta, 6) + F.lit(0.0)).alias("value"),
    )
    tv = j.agg(
        F.lit("tv_distance").alias("metric"),
        (F.round(F.sum(F.abs(delta)) / 2, 6) + F.lit(0.0)).alias("value"),
    )
    return per.unionByName(tv)
