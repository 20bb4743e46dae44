"""Kernel-level A/B: scan scoring in float64 (the oracle-parity default)
vs float32, at the high-d shape where the byte argument is strongest.

r6 named this lever and declined it ("float32 (2x GEMM rate) risks
argmin tie-flips vs the float64 SQL oracle", PERF.md) while assignment
was 2s of an 11.3s bench add. The r10 10M x 768-d probe re-opens it:
the steady-search floor there is decode + transfer, and scoring in f32
removes the list_matrix astype(float64) (a full extra copy of every
scanned byte) and halves GEMM traffic. Protocol per the packed_f32
lesson (PERF.md r10): kernel-level FIRST — if the isolated win is
small, end-to-end dilution kills it and no e2e arm is needed.

Arms (interleaved, one process, REPS each) over a cached 2M x 768-d
list-layout parquet:
- f64_convert / f32_convert: extract the (n, d) matrix only;
- f64_scan / f32_scan: extract + rank-trick L2 vs NQ queries +
  per-batch per-query min.
Agreement: max |dmin_f32 - dmin_f64| / score-scale reported (f32 scan
is NOT bit-parity — that is the point of the check).

    python scripts/ab_f32_score_768d.py [n]
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
from pyspark.sql import functions as F

from cuda_acceleratedvectordatabaseengine_spark.functions import arrowkit as AK
from cuda_acceleratedvectordatabaseengine_spark.session import get_spark
from scripts.synth768 import DIM, splitmix_vectors, synth_corpus

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
NQ = 128
REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))

spark = get_spark(app_name="cavde-ab-f32score")
spark.sparkContext.setLogLevel("ERROR")

base = tempfile.mkdtemp(prefix="cavde_ab_f32_")
path = os.path.join(base, "corpus")
result = None
try:
    synth_corpus(spark, N).write.parquet(path)
    df = spark.read.parquet(path)
    n = df.count()

    Q64 = splitmix_vectors(np.arange(NQ, dtype=np.uint64), DIM).astype(np.float64)
    Q32 = Q64.astype(np.float32)
    qn64 = (Q64 * Q64).sum(axis=1)
    qn32 = qn64.astype(np.float32)

    def kernel(dtype, score):
        Q = Q64 if dtype == np.float64 else Q32
        qn = qn64 if dtype == np.float64 else qn32

        def run(batches):
            mins = []
            rows = 0
            for rb in batches:
                X = AK.list_matrix(rb, "vector", dtype)
                rows += X.shape[0]
                if score:
                    xn = np.einsum("ij,ij->i", X, X)
                    d2 = xn[:, None] - 2.0 * (X @ Q.T) + qn[None, :]
                    mins.append(d2.min(axis=0))
            if score:
                # empty partition contributes NOTHING in score mode — the
                # rows-count sentinel below is reserved for the convert
                # arms; yielding it here would contaminate query 0's
                # groupBy-min (r10 ADVICE)
                if mins:
                    m = np.minimum.reduce(mins).astype(np.float64)
                    yield AK.batch(qid=np.arange(NQ, dtype=np.int64), dmin=m)
            else:
                yield AK.batch(
                    qid=np.array([0], dtype=np.int64),
                    dmin=np.array([float(rows)], dtype=np.float64),
                )

        return run

    ARMS = {
        "f64_convert": (np.float64, False),
        "f32_convert": (np.float32, False),
        "f64_scan": (np.float64, True),
        "f32_scan": (np.float32, True),
    }

    def run_arm(name):
        dtype, score = ARMS[name]
        t0 = time.perf_counter()
        df.mapInArrow(kernel(dtype, score), "qid long, dmin double").count()
        return time.perf_counter() - t0

    for name in ARMS:  # warm scans + worker daemons
        run_arm(name)
    samples = {name: [] for name in ARMS}
    for _ in range(REPS):
        for name in ARMS:
            samples[name].append(round(run_arm(name), 3))

    def mins_of(dtype):
        out = (
            df.mapInArrow(kernel(dtype, True), "qid long, dmin double")
            .groupBy("qid").agg(F.min("dmin").alias("dmin"))
            .orderBy("qid").collect()
        )
        return np.array([r["dmin"] for r in out])

    m64, m32 = mins_of(np.float64), mins_of(np.float32)
    # queries are corpus members, so true min d2 = 0 (self-match): a
    # pure relative diff divides by ~0 and explodes; scale-normalize by
    # the score magnitude (xn+qn ~ O(d/3)) instead
    scale = float(np.median(qn64)) * 2.0
    rel = float(np.max(np.abs(m32 - m64)) / scale)

    result = {
        "metric": "ab_f32_score_768d",
        "n_vectors": n,
        "dim": DIM,
        "nq": NQ,
        "reps": REPS,
        "samples": samples,
        "min_sec": {k: min(v) for k, v in samples.items()},
        "ratio_f32_vs_f64": {
            "convert": round(
                min(samples["f64_convert"]) / min(samples["f32_convert"]), 3
            ),
            "scan": round(min(samples["f64_scan"]) / min(samples["f32_scan"]), 3),
        },
        "max_dmin_diff_over_score_scale": rel,
    }
finally:
    shutil.rmtree(base, ignore_errors=True)
if result is not None:
    print(json.dumps(result, separators=(",", ":")), flush=True)
