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
