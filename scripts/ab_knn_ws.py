"""Interleaved A/B: q2_knn_l2's pairwise-ws regression check (r9 verdict).

BENCH_r09 showed q2_knn_l2 0.63 -> 0.98s vs r8 — the one headline query
whose kernel r9 touched (`D.pairwise(..., ws=)` threading through
`knn.partial_topk_scanner`). Cross-round absolute timings on this box
drift 2-4x, so the only load-bearing evidence is an in-process
interleaved A/B: the SAME q2 catalog query end-to-end, alternating
`knn.PAIRWISE_WS` (captured at scanner-factory time) per rep, plus the
bare kernel at the exact (batch_rows, nq=10) shape q2 scans.

    python scripts/ab_knn_ws.py            # sf0.1, 3 reps/arm
    SPARK_GRAFT_AB_REPS=5 python scripts/ab_knn_ws.py
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.chdir(ROOT)

import numpy as np

from cuda_acceleratedvectordatabaseengine_spark.functions import distance as D
from cuda_acceleratedvectordatabaseengine_spark.operators import knn
from cuda_acceleratedvectordatabaseengine_spark.plans import queries as Q
from cuda_acceleratedvectordatabaseengine_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))

spark = get_spark(app_name="cavde-ab-knn-ws")
spark.sparkContext.setLogLevel("ERROR")

spec = Q.get("q2_knn_l2")

# warm: plan compilation + page cache, both arms
for flag in (True, False):
    knn.PAIRWISE_WS = flag
    spec.spark(spark, SF_DIR).collect()

walls: dict = {"ws": [], "nows": []}
results: dict = {}
for rep in range(REPS):
    for flag, arm in ((True, "ws"), (False, "nows")):
        knn.PAIRWISE_WS = flag
        t0 = time.perf_counter()
        rows = spec.spark(spark, SF_DIR).collect()
        walls[arm].append(time.perf_counter() - t0)
        key = sorted(tuple(r) for r in rows)
        results.setdefault(arm, key)
        assert results[arm] == key, f"non-deterministic within arm {arm}"
knn.PAIRWISE_WS = True
assert results["ws"] == results["nows"], "arms disagree on q2 rows!"

# bare kernel at the scan shape: sf0.1 batches are ~10-60K rows, nq=10
rng = np.random.default_rng(7)
Vb = rng.standard_normal((60_000, 64))
Qb = rng.standard_normal((10, 64))
kern: dict = {"ws": [], "nows": []}
ws: dict = {}
for rep in range(max(REPS, 5)):
    t0 = time.perf_counter()
    a = D.pairwise("l2", Vb, Qb, ws=ws).copy()
    kern["ws"].append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    b = D.pairwise("l2", Vb, Qb)
    kern["nows"].append(time.perf_counter() - t0)
    assert np.array_equal(a, b)

out = {
    "query": "q2_knn_l2",
    "sf_dir": SF_DIR,
    "reps": REPS,
    "e2e_ws_sec": [round(t, 3) for t in walls["ws"]],
    "e2e_nows_sec": [round(t, 3) for t in walls["nows"]],
    "e2e_min_ws": round(min(walls["ws"]), 3),
    "e2e_min_nows": round(min(walls["nows"]), 3),
    "kernel_ws_ms": [round(t * 1e3, 2) for t in kern["ws"]],
    "kernel_nows_ms": [round(t * 1e3, 2) for t in kern["nows"]],
    "identical_results": True,
}
print(json.dumps(out))
