"""Drive the __spark_entry__ contract exactly like the external driver.

A VANILLA SparkSession (none of session.get_spark's configs), every
queries() entry executed at sf0.01 and compared against its oracle_sql()
in DuckDB (sorted columns + sorted rows + dtypes — the canonical compare
from tests/oracle_utils.py). Run from anywhere:

    python scripts/verify_contract.py

Exit code 0 = every oracle row matches — the same gate the driver's
CORRECTNESS_r{N}.json records. Queries without an oracle run as
rows-only smoke checks.
"""
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))
os.chdir(ROOT)  # Spark python workers must resolve the package by cwd

from pyspark.sql import SparkSession

from oracle_utils import assert_matches_oracle, duck_con

SF_DIR = "/root/testdata/sf0.01"

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E

rows = E.entry(spark).collect()
print(f"entry(): {len(rows)} rows OK", flush=True)

con = duck_con(SF_DIR)
qs, osql = E.queries(), E.oracle_sql()
fails = []
for name, fn in qs.items():
    try:
        sdf = fn(spark, SF_DIR)
        if name in osql:
            assert_matches_oracle(sdf, con, osql[name], name)
            status = "PASS"
        else:
            status = f"rows-only ({sdf.count()})"
        print(f"{name}: {status}", flush=True)
    except Exception as e:
        status = f"FAIL {type(e).__name__}: {e}"
        print(f"{name}: {status}", flush=True)
        fails.append((name, status))

print(f"\n{len(qs) - len(fails)}/{len(qs)} pass")
if fails:
    for n, s in fails:
        print(f"  FAIL {n}: {s[:300]}")
    sys.exit(1)
