"""Targeted driver-contract check: verify only the spec names given on
the command line (same vanilla-session + DuckDB-oracle compare as
verify_contract.py — use that for the full catalog).

    python scripts/verify_subset.py quantized_search_combo text_lm_combo
"""
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))
os.chdir(ROOT)

from pyspark.sql import SparkSession

from oracle_utils import assert_matches_oracle, duck_con

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

names = sys.argv[1:]
if not names:
    print("usage: verify_subset.py <spec> [<spec> ...]")
    sys.exit(2)

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E

con = duck_con(SF_DIR)
qs, osql = E.queries(), E.oracle_sql()
fails = []
for name in names:
    if name not in qs:
        print(f"{name}: NOT REGISTERED", flush=True)
        fails.append(name)
        continue
    try:
        sdf = qs[name](spark, SF_DIR)
        if name in osql:
            assert_matches_oracle(sdf, con, osql[name], name)
            print(f"{name}: PASS", flush=True)
        else:
            print(f"{name}: rows-only ({sdf.count()})", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:400]}", flush=True)
        fails.append(name)

print(f"\n{len(names) - len(fails)}/{len(names)} pass")
sys.exit(1 if fails else 0)
