"""Mechanism check for the train-sample-size recall paradox
(scripts/probe_768d_trainsize.py): at 10M x 768-d / nlist=4096, training
Lloyd on 480K rows produced LOWER recall@nprobe than 120K at every
nprobe (0.44 vs 0.51 at nprobe=32). Hypothesis: recall at FIXED nprobe
is not a pure quantizer-quality metric — a noisier quantizer yields
more imbalanced lists, so the same 32 probed lists cover a larger
fraction of the corpus (the r9 finding "recall tracks the probed
FRACTION" in disguise).

Measures, per arm (120K / 480K), with no epoch writes:
- list-size distribution of the full 10M assignment (one distributed
  assign + groupBy count per arm);
- the 100 probe sets (top-32 centroids per query — driver-side numpy
  from the same centroids the recall runs used, seed 42);
- mean scanned fraction at nprobe in {8,16,32,64,128}: sum of probed
  list sizes / N.

If fraction(120K) > fraction(480K) at each nprobe, the paradox is
imbalance buying recall with hidden scan cost, and the honest tuning
curve is recall vs FRACTION, not recall vs nprobe.

    SPARK_GRAFT_DRIVER_MEM=32g python scripts/probe_768d_balance.py
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.chdir(ROOT)

import numpy as np
from pyspark.sql import functions as F

from cuda_acceleratedvectordatabaseengine_spark.operators import kmeans
from cuda_acceleratedvectordatabaseengine_spark.session import get_spark
from scripts.synth768 import DIM, splitmix_vectors, synth_corpus

N = 10_000_000
NLIST = 4096
NPROBES = (8, 16, 32, 64, 128)

spark = get_spark(app_name="cavde-768d-balance")
spark.sparkContext.setLogLevel("ERROR")

vecs = synth_corpus(spark, N)
qvecs = splitmix_vectors(np.arange(100, dtype=np.uint64), DIM).astype(np.float64)

out = {"n_vectors": N, "dim": DIM, "nlist": NLIST, "arms": {}}
for train_n in (120_000, 480_000):
    t0 = time.perf_counter()
    model = kmeans.train(
        synth_corpus(spark, train_n, parts=16), NLIST, seed=42
    )
    C = model.centroids
    counts_rows = (
        kmeans.assign(vecs, C)
        .groupBy("list_id").agg(F.count("*").alias("n")).collect()
    )
    sizes = np.zeros(NLIST, dtype=np.int64)
    for r in counts_rows:
        sizes[r["list_id"]] = r["n"]
    # probe sets: top-nprobe nearest centroids per query (L2, same rule
    # the search uses), pure numpy
    d2 = ((qvecs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    order = np.argsort(d2, axis=1)
    arm = {
        "train_n": train_n,
        "wall_sec": round(time.perf_counter() - t0, 1),
        "list_sizes": {
            "mean": float(sizes.mean()),
            "cv": round(float(sizes.std() / sizes.mean()), 4),
            "max": int(sizes.max()),
            "p99": int(np.percentile(sizes, 99)),
            "empty": int((sizes == 0).sum()),
        },
        "scanned_fraction_pct": {},
    }
    for np_ in NPROBES:
        probed = sizes[order[:, :np_]].sum(axis=1)  # rows per query
        arm["scanned_fraction_pct"][np_] = round(
            100.0 * float(probed.mean()) / N, 4
        )
    out["arms"][train_n] = arm
    print(f"arm {train_n}: {json.dumps(arm)}", flush=True)

print("RESULT " + json.dumps(out), flush=True)
