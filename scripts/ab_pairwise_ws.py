"""Interleaved A/B of the reuse-workspace pairwise in the IVF pruned
scan (`ivf.PAIRWISE_WS`): fresh (n, nq) score blocks per Arrow batch vs
blocks carved from a per-task workspace reused across batches.

Motivation (PERF.md r9): this box writes fresh pages at ~0.1-1.6 GB/s,
so per-batch score-block allocation — not GEMM FLOPs — was the measured
wall in the assignment kernels (tiled fix: 7-400x). The search scanner
has the same shape of allocation; the ws path is BIT-identical in
values (same ops, same order — tests/test_distance.py pins it), so this
A/B is purely about wall-clock. One index build, arms alternate in one
process so box drift cancels; the flag is captured driver-side at
scanner-factory time, so it flips per search call.

    python scripts/ab_pairwise_ws.py                            # 600K
    SPARK_GRAFT_PROBE_SCALE=8 python scripts/ab_pairwise_ws.py  # 4.8M
"""
import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.chdir(ROOT)

from pyspark.sql import functions as F

from bench import derived_vectors
from cuda_acceleratedvectordatabaseengine_spark.operators import ivf, kmeans
from cuda_acceleratedvectordatabaseengine_spark import util
from cuda_acceleratedvectordatabaseengine_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE = int(os.environ.get("SPARK_GRAFT_PROBE_SCALE", "1"))
REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))
NLIST = int(os.environ.get("SPARK_GRAFT_AB_NLIST", "128"))
NPROBE = int(os.environ.get("SPARK_GRAFT_AB_NPROBE", "8"))

spark = get_spark(app_name="cavde-ab-pairwise-ws")
spark.sparkContext.setLogLevel("ERROR")

base_vecs = derived_vectors(spark, SF_DIR)
n_base = base_vecs.count()
legs = [
    base_vecs.select((F.col("id") + F.lit(i * n_base)).alias("id"), "vector")
    for i in range(SCALE)
]
vecs = legs[0]
for leg in legs[1:]:
    vecs = vecs.unionByName(leg)
vecs = vecs.repartition(64).cache()
n = vecs.count()
print(f"corpus: {n} vectors nlist={NLIST} nprobe={NPROBE}", flush=True)

model = kmeans.train(util.sample_head(vecs, 100_000), NLIST, seed=42)
base = tempfile.mkdtemp(prefix="cavde_ab_ws_")
try:
    idx = ivf.IVFIndex.build(
        vecs, base, "ws_ab", nlist=NLIST, init=model.centroids, train=False
    )
    queries = (
        base_vecs.orderBy("id").limit(1000)
        .select(F.col("id").alias("query_id"), F.col("vector").alias("qvec"))
        .cache()
    )
    queries.count()

    def run(flag: bool) -> tuple[float, int]:
        ivf.PAIRWISE_WS = flag
        t0 = time.perf_counter()
        rows = idx.search(queries, k=10, nprobe=NPROBE).collect()
        return time.perf_counter() - t0, len(rows)

    run(True)  # warm both code paths / page cache once
    times = {"ws": [], "fresh": []}
    for rep in range(REPS):
        for name, flag in (("fresh", False), ("ws", True)):
            sec, nrows = run(flag)
            times[name].append(sec)
            print(f"rep{rep} {name}: {sec:.2f}s rows={nrows}", flush=True)
    # result-identity spot check (values are bit-identical by design)
    ivf.PAIRWISE_WS = False
    a = {
        (r["query_id"], r["rank"]): (r["id"], round(r["distance"], 9))
        for r in idx.search(queries, k=10, nprobe=NPROBE).collect()
    }
    ivf.PAIRWISE_WS = True
    b = {
        (r["query_id"], r["rank"]): (r["id"], round(r["distance"], 9))
        for r in idx.search(queries, k=10, nprobe=NPROBE).collect()
    }
    diffs = sum(1 for k_ in a if a[k_] != b.get(k_))
    out = {
        "n": n,
        "nlist": NLIST,
        "nprobe": NPROBE,
        "fresh_best": min(times["fresh"]),
        "ws_best": min(times["ws"]),
        "ratio_ws_over_fresh": round(min(times["ws"]) / min(times["fresh"]), 3),
        "fresh_all": [round(x, 2) for x in times["fresh"]],
        "ws_all": [round(x, 2) for x in times["ws"]],
        "result_diffs": diffs,
    }
    print("RESULT " + json.dumps(out), flush=True)
finally:
    ivf.PAIRWISE_WS = True
    shutil.rmtree(base, ignore_errors=True)
