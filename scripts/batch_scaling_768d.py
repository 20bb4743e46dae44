"""Batch-size scaling at the published shape — the coalescing number.

r11's recall probe found the >= 0.9 operating point (nprobe=512, 12.5%
of lists) costs only 1.28x the published nprobe=32 wall AT BATCH SIZE
1000, because the fused batch's probe union covers the epoch either
way. This probe completes that finding: the same index, walls for
query-batch sizes {1, 16, 64, 256, 1000} at BOTH operating points,
interleaved reps. The per-query cost curve is the quantitative case
for V2 request coalescing (streaming/search_stream.py micro-batches):
a single query pays the whole probed-list scan alone; a fused batch
amortizes it across every member whose probes overlap.

Corpus size defaults to 2M (same signal as 10M for the SHAPE of the
curve at ~5x less wall; pass 10000000 to reproduce at the full
published scale).

    SPARK_GRAFT_DRIVER_MEM=48g python scripts/batch_scaling_768d.py [n]
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

TARGET = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
DIM = 768
NLIST = 4096
TRAIN_SAMPLE = 120_000
BATCHES = (1, 16, 64, 256, 1000)
NPROBES = (32, 512)  # published point, r11 tuned >= 0.9 point
REPS = 3

from scripts.synth768 import splitmix_vectors, synth_corpus  # noqa: E402

spark = get_spark(app_name="cavde-batch-scaling-768d")
spark.sparkContext.setLogLevel("ERROR")

Q_SCHEMA = StructType(
    [
        StructField("query_id", LongType(), False),
        StructField("qvec", ArrayType(FloatType(), False), False),
    ]
)


def query_df(nq):
    qvecs = splitmix_vectors(np.arange(nq, dtype=np.uint64), DIM)
    df = spark.createDataFrame(
        [(int(i), qvecs[i].tolist()) for i in range(nq)], schema=Q_SCHEMA
    ).cache()
    df.count()
    return df


work = tempfile.mkdtemp(prefix="cavde_bsc768_")
try:
    vecs = synth_corpus(spark, TARGET)
    n = vecs.count()
    print(f"corpus: {n} x {DIM}-d, nlist={NLIST}", flush=True)
    t0 = time.perf_counter()
    model = kmeans.train(synth_corpus(spark, TRAIN_SAMPLE, parts=8), NLIST, seed=42)
    idx = ivf.IVFIndex.build(
        vecs, work, "bsc768", nlist=NLIST, init=model.centroids, train=False
    )
    print(f"train+build: {time.perf_counter() - t0:.1f}s", flush=True)

    qdfs = {nq: query_df(nq) for nq in BATCHES}
    # warm every (batch, nprobe) cell once, then interleave timed reps
    for nq in BATCHES:
        for nprobe in NPROBES:
            idx.search(qdfs[nq], k=10, nprobe=nprobe).count()
    samples = {(nq, np_): [] for nq in BATCHES for np_ in NPROBES}
    for _ in range(REPS):
        for nq in BATCHES:
            for nprobe in NPROBES:
                t0 = time.perf_counter()
                idx.search(qdfs[nq], k=10, nprobe=nprobe).count()
                samples[(nq, nprobe)].append(time.perf_counter() - t0)
    rows = []
    for nq in BATCHES:
        for nprobe in NPROBES:
            w = min(samples[(nq, nprobe)])
            rows.append(
                {
                    "batch": nq,
                    "nprobe": nprobe,
                    "wall_sec": round(w, 3),
                    "reps": [round(x, 2) for x in samples[(nq, nprobe)]],
                    "sec_per_query": round(w / nq, 4),
                    "qps": round(nq / w, 1),
                }
            )
            print(json.dumps(rows[-1]), flush=True)
    print(
        "RESULT "
        + json.dumps({"n": n, "dim": DIM, "nlist": NLIST, "rows": rows})
    )
finally:
    shutil.rmtree(work, ignore_errors=True)
