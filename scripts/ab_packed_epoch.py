"""Interleaved A/B of the REAL IVF search over the two epoch vector
layouts: array<float> vs packed_f32 binary (same corpus, same centroids,
same probe sets — only the stored layout differs).

scripts/ab_binary_layout.py isolated the layout effect on a synthetic
scan kernel (~1.9x); this drives the production ``IVFIndex.search``
end to end (probe -> pruned partition scan -> merge), alternating arms
in one process so box drift cancels.

    python scripts/ab_packed_epoch.py                       # 600K
    SPARK_GRAFT_PROBE_SCALE=8 python scripts/ab_packed_epoch.py  # 4.8M
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
REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "4"))
NLIST = int(os.environ.get("SPARK_GRAFT_AB_NLIST", "128"))
NPROBE = int(os.environ.get("SPARK_GRAFT_AB_NPROBE", "8"))

spark = get_spark(app_name="cavde-ab-packed-epoch")
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
base = tempfile.mkdtemp(prefix="cavde_ab_pkd_")
result = None
try:
    t0 = time.perf_counter()
    idx_list = ivf.IVFIndex.build(
        vecs, base, "lst", nlist=NLIST, init=model.centroids, train=False
    )
    t_build_list = time.perf_counter() - t0
    t0 = time.perf_counter()
    idx_pkd = ivf.IVFIndex.build(
        vecs, base, "pkd", nlist=NLIST, init=model.centroids, train=False,
        vector_layout="packed_f32",
    )
    t_build_pkd = time.perf_counter() - t0
    vecs.unpersist()

    queries = (
        base_vecs.orderBy("id").limit(1000)
        .select(F.col("id").alias("query_id"), F.col("vector").alias("qvec"))
    )
    arms = {"list": idx_list, "packed": idx_pkd}
    for a in arms.values():  # warm
        a.search(queries, k=10, nprobe=NPROBE).count()
    samples = {k: [] for k in arms}
    for _ in range(REPS):
        for name, a in arms.items():
            t0 = time.perf_counter()
            a.search(queries, k=10, nprobe=NPROBE).count()
            samples[name].append(round(time.perf_counter() - t0, 3))

    # exactness: the two arms must return identical rows
    ra = sorted(
        (r["query_id"], r["rank"], r["id"], round(r["distance"], 9))
        for r in idx_list.search(queries, k=10, nprobe=NPROBE).collect()
    )
    rb = sorted(
        (r["query_id"], r["rank"], r["id"], round(r["distance"], 9))
        for r in idx_pkd.search(queries, k=10, nprobe=NPROBE).collect()
    )
    n_diff = sum(1 for x, y in zip(ra, rb) if x != y)

    result = {
        "metric": "ab_packed_epoch",
        "n_vectors": n,
        "nlist": NLIST,
        "nprobe": NPROBE,
        "reps": REPS,
        "build_sec": {
            "list": round(t_build_list, 3), "packed": round(t_build_pkd, 3)
        },
        "samples": samples,
        "min_sec": {k: min(v) for k, v in samples.items()},
        "ratio_packed_vs_list": round(
            min(samples["list"]) / min(samples["packed"]), 3
        ),
        "n_result_diffs": n_diff,
    }
finally:
    shutil.rmtree(base, ignore_errors=True)
if result is not None:
    print(json.dumps(result, separators=(",", ":")), flush=True)
