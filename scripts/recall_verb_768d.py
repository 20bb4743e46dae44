"""The recall_target VERB at the published shape (r12; follows up the
r11 measurement in scripts/recall_operating_point_768d.py).

r11 measured the recall/nprobe curve manually at 10M x 768-d and found
the reference's prescribed nprobe=32 buys 0.514 recall@10 with the
tuned >=0.9 point at nprobe=512. r12 made that tuning a first-class
build verb (IVFIndex.build(recall_target=) / tune_recall, manifest
stamp, search(nprobe=None) defaults). This script runs the VERB at the
2M x 768-d / nlist=4096 probe shape and records what it costs and what
it stamps:

- tune wall with the ascending early-stop sweep (the full doubling
  series tops out at nprobe=nlist — a full exact search — which early
  stop avoids whenever a smaller candidate meets the target);
- the stamped operating point, re-read from the manifest;
- a 1000-query batch searched at the stamped default (nprobe=None) vs
  the reference's published nprobe=32, wall + recall for both.

Usage: python scripts/recall_verb_768d.py
Artifact: scripts/artifacts_recall_verb_768d.json
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

from cuda_acceleratedvectordatabaseengine_spark import util
from cuda_acceleratedvectordatabaseengine_spark.functions import distance as D
from cuda_acceleratedvectordatabaseengine_spark.metrics import mean_recall
from cuda_acceleratedvectordatabaseengine_spark.operators import ivf, kmeans, knn
from cuda_acceleratedvectordatabaseengine_spark.session import get_spark
from scripts.synth768 import synth_corpus

N = int(os.environ.get("SPARK_GRAFT_AB_N", "2000000"))
NLIST = int(os.environ.get("SPARK_GRAFT_AB_NLIST", "4096"))
TARGET = float(os.environ.get("SPARK_GRAFT_RECALL_TARGET", "0.9"))

spark = get_spark(app_name="cavde-recall-verb-768d")
spark.sparkContext.setLogLevel("ERROR")

# no corpus-wide cache: synth vectors are cheap generated expressions and
# the cached 2M x 768 corpus + 32 concurrent epoch readers was exactly the
# 8g-heap OOM the cascade sweep hit (PERF.md r12)
vecs = synth_corpus(spark, N, parts=64)
out = {"n": N, "nlist": NLIST, "target": TARGET}

t0 = time.perf_counter()
model = kmeans.train(util.sample_head(vecs, 100_000), NLIST, seed=42)
out["train_sec"] = round(time.perf_counter() - t0, 2)
print(f"train: {out['train_sec']}s", flush=True)

base = tempfile.mkdtemp(prefix="cavde_rt_verb_")
try:
    t0 = time.perf_counter()
    idx = ivf.IVFIndex.build(
        vecs, base, "rt", nlist=NLIST, init=model.centroids, train=False
    )
    out["build_sec"] = round(time.perf_counter() - t0, 2)
    print(f"build: {out['build_sec']}s", flush=True)

    t0 = time.perf_counter()
    stamp = idx.tune_recall(vecs, TARGET)  # default sample + doubling series
    out["tune_sec"] = round(time.perf_counter() - t0, 2)
    out["stamp"] = stamp
    # what early stop skipped: candidates above the chosen point
    full_series = []
    c = 1
    while c < NLIST:
        full_series.append(c)
        c *= 2
    full_series.append(NLIST)
    out["candidates_total"] = len(full_series)
    # r13: the one-pass sweep evaluates every candidate from a single
    # ground-truth pass (no per-candidate searches), so "evaluated"
    # counts candidates whose recall the stamp derivation covered — all
    # of them; tune_sec is the number that shows the collapse
    out["candidates_evaluated"] = len(full_series)
    out["stamped_nprobe"] = stamp["suggested_nprobe_flat"]
    print(f"tune: {out['tune_sec']}s stamp={stamp}", flush=True)

    # serve a 1000-query batch at the stamped default vs the published 32
    queries = (
        util.sample_head(vecs, 1000)
        .select(F.col("id").alias("query_id"), F.col("vector").alias("qvec"))
        .localCheckpoint(eager=True)
    )
    exact = knn.exact_knn(vecs, queries, k=10, metric=D.L2).localCheckpoint(
        eager=False
    )
    for label, np_ in (("stamped_default", None), ("published_32", 32)):
        idx.search(queries, k=10, nprobe=np_).count()  # warm
        t0 = time.perf_counter()
        res = idx.search(queries, k=10, nprobe=np_)
        n = res.count()
        wall = round(time.perf_counter() - t0, 2)
        out[label] = {
            "nprobe": idx.resolved_nprobe(np_),
            "wall_sec_1000q": wall,
            "recall_at_10": round(mean_recall(res, exact), 3),
            "rows": n,
        }
        print(f"{label}: {out[label]}", flush=True)
finally:
    shutil.rmtree(base, ignore_errors=True)

line = json.dumps(out, separators=(",", ":"))
print(line)
with open(os.path.join(ROOT, "scripts", "artifacts_recall_verb_768d.json"), "w") as fh:
    fh.write(line + "\n")
