"""Local mirror of the driver's DuckDB-oracle comparison so mismatches are
caught in pytest before a round ends."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, round floats, sort rows — order-insensitive
    canonical form for comparison."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def assert_matches_oracle(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"):
    got_raw = spark_df.toPandas()
    want_raw = con.sql(sql).df()
    got_dt = {c: str(got_raw[c].dtype) for c in got_raw.columns}
    want_dt = {c: str(want_raw[c].dtype) for c in want_raw.columns}
    assert got_dt == want_dt, f"{name}: dtype mismatch {got_dt} vs {want_dt}"
    got = canonicalize(got_raw)
    want = canonicalize(want_raw)
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            bad = [
                (i, a, b)
                for i, (a, b) in enumerate(zip(g, w))
                if not (
                    (isinstance(a, float) and isinstance(b, float) and math.isclose(a, b, rel_tol=0, abs_tol=1e-9))
                    or a == b
                )
            ]
        else:
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b]
        assert not bad, f"{name}: column {c} first diffs {bad[:5]}"
