"""Train-sample-size arm for the 10M x 768-d published-shape probe.

scale_probe_768d.py trained on 120K rows (~30 points/list at
nlist=4096 — the reference's own <=100K-sample posture,
bench/benchmark.cpp:69, scaled to the list count) and measured
recall@10 of 0.32/0.41/0.51/0.61 at nprobe 8/16/32/64. Hypothesis: at
high d the centroid estimate is the binding constraint, so the same
probe budget buys more recall with a better-trained quantizer. This
arm trains on 4x the sample (480K ~= 117 points/list), builds the same
10M corpus, and reruns the recall sweep (+nprobe=128 for saturation).
Recall is a deterministic function of (corpus, centroids, nprobe) —
box drift cannot touch it — so the two arms compare across runs; only
wall-clock numbers are drift-caveated.

    SPARK_GRAFT_DRIVER_MEM=32g python scripts/probe_768d_trainsize.py [train_n]
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

from cuda_acceleratedvectordatabaseengine_spark.metrics import recall_sweep
from cuda_acceleratedvectordatabaseengine_spark.operators import ivf, kmeans
from cuda_acceleratedvectordatabaseengine_spark.session import get_spark
from scripts.synth768 import DIM, splitmix_vectors, synth_corpus

N = 10_000_000
NLIST = 4096
TRAIN_SAMPLE = int(sys.argv[1]) if len(sys.argv) > 1 else 480_000

spark = get_spark(app_name="cavde-768d-trainsize")
spark.sparkContext.setLogLevel("ERROR")

t = {}


def phase(name):
    class _P:
        def __enter__(self):
            self.t0 = time.perf_counter()
            return self

        def __exit__(self, *a):
            t[name] = round(time.perf_counter() - self.t0, 2)
            print(f"[phase] {name}: {t[name]}s", flush=True)

    return _P()


work = tempfile.mkdtemp(prefix="cavde_768d_ts_")
try:
    vecs = synth_corpus(spark, N)
    sample = synth_corpus(spark, TRAIN_SAMPLE, parts=16)
    train_phases = {}
    with phase(f"train_{TRAIN_SAMPLE // 1000}k_sample"):
        model = kmeans.train(sample, NLIST, seed=42, timings=train_phases)
    t["train_phases"] = {k: round(v, 2) for k, v in train_phases.items()}

    with phase("assign_write_epoch"):
        idx = ivf.IVFIndex.build(
            vecs, work, "ts768", nlist=NLIST,
            init=model.centroids, train=False,
        )

    qvecs = splitmix_vectors(np.arange(100, dtype=np.uint64), DIM)
    queries = spark.createDataFrame(
        [(int(i), qvecs[i].tolist()) for i in range(100)],
        schema=StructType(
            [
                StructField("query_id", LongType(), False),
                StructField("qvec", ArrayType(FloatType(), False), False),
            ]
        ),
    ).cache()
    queries.count()

    with phase("recall_sweep_8_16_32_64_128"):
        rows = recall_sweep(
            idx, vecs, queries, k=10, nprobes=(8, 16, 32, 64, 128)
        ).collect()
    t["recall_curve"] = {
        int(r["nprobe"]): round(r["mean_recall"], 4) for r in rows
    }
    print(f"recall@10 per nprobe: {t['recall_curve']}", flush=True)
    t["n_vectors"] = N
    t["dim"] = DIM
    t["nlist"] = NLIST
    t["train_sample"] = TRAIN_SAMPLE
    t["baseline_120k_recall"] = {8: 0.322, 16: 0.405, 32: 0.514, 64: 0.61}
    print("RESULT " + json.dumps(t), flush=True)
finally:
    shutil.rmtree(work, ignore_errors=True)
