"""Interleaved A/B of the REAL IVF search over the two epoch vector
layouts — array<float> vs packed_f32 binary — at the published HIGH-D
workload shape (768-d, nlist=4096, nprobe=32; BASELINE.md README.md:39-45).

The r9 verdict gated packed_f32 OFF by default from a 64-d end-to-end
A/B (0.48-1.22x, kernel-level 1.9x diluted by everything else). The
r10 10M x 768-d probe (scripts/scale_probe_768d.py, PERF.md) attributed
the steady-search floor at high d to parquet list<float> decode + Arrow
transfer — the exact term the packed layout removes, and it grows
linearly in d while the terms that diluted it at 64-d don't. So the
gate decision deserves a re-measure at the d where it should matter
most. Same corpus, same centroids, same queries; arms alternate in one
process so box drift cancels; results must be row-identical (float32
source, layout-polymorphic scanners).

Default 5M x 768-d (epochs 2 x 15.5 GB + build shuffles fit the box's
disk with margin; 10M would peak ~124 GB).

    SPARK_GRAFT_DRIVER_MEM=16g python scripts/ab_packed_768d.py [n] [dim]
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

import numpy as np
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from cuda_acceleratedvectordatabaseengine_spark.operators import ivf, kmeans
from cuda_acceleratedvectordatabaseengine_spark.session import get_spark
from scripts.synth768 import DIM as DEFAULT_DIM, splitmix_vectors, synth_corpus

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else DEFAULT_DIM  # crossover sweeps
NLIST = 4096
NPROBE = 32
TRAIN_SAMPLE = 120_000
REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "4"))

spark = get_spark(app_name="cavde-ab-packed-768d")
spark.sparkContext.setLogLevel("ERROR")

vecs = synth_corpus(spark, N, dim=DIM)
print(f"corpus: {N} x {DIM}-d (virtual), nlist={NLIST} nprobe={NPROBE}", flush=True)

model = kmeans.train(synth_corpus(spark, TRAIN_SAMPLE, dim=DIM, parts=8), NLIST, seed=42)
base = tempfile.mkdtemp(prefix="cavde_ab_pkd768_")
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

    def du(path):
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                total += os.path.getsize(os.path.join(root, f))
        return total

    bytes_on_disk = {"list": du(os.path.join(base, "lst")),
                     "packed": du(os.path.join(base, "pkd"))}

    qvecs = splitmix_vectors(np.arange(1000, dtype=np.uint64), DIM)
    queries = spark.createDataFrame(
        [(int(i), qvecs[i].tolist()) for i in range(1000)],
        schema=StructType(
            [
                StructField("query_id", LongType(), False),
                StructField("qvec", ArrayType(FloatType(), False), False),
            ]
        ),
    ).cache()
    queries.count()

    arms = {"list": idx_list, "packed": idx_pkd}
    for a in arms.values():  # warm both scans + worker daemons
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
        "metric": "ab_packed_768d",
        "n_vectors": N,
        "dim": DIM,
        "nlist": NLIST,
        "nprobe": NPROBE,
        "reps": REPS,
        "build_sec": {
            "list": round(t_build_list, 3), "packed": round(t_build_pkd, 3)
        },
        "bytes_on_disk": bytes_on_disk,
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
