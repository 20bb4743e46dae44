"""Interleaved A/B: vector column physical layout — ``array<float>`` vs
packed fixed-width ``binary`` (float32 LE) — on the scan path.

The r8 refutations (fused GEMM, SQ8 cascade) both ended at the same
wall: the pruned scan's floor is the JVM->Python Arrow conversion of
the vector column (~99% of bytes). The one untested lever is the
column's physical type. ``array<float>`` goes through Spark's
ArrowWriter ArrayWriter (per-ELEMENT float writes — d JVM calls per
row); ``binary`` is one byte-copy per row. Same float payload, same
parquet partitioning, identical kernel except the matrix extraction
(ListArray flatten-reshape vs frombuffer-view).

Two kernels per layout, interleaved in one process (box drift hits all
arms equally; min of REPS is the estimate):

- convert: extract the (n, d) float64 matrix, emit row-count only —
  the pure transfer+conversion floor;
- scan: extract + rank-trick L2 against NQ broadcast queries + per-batch
  per-query min — the pruned-scan shape with scoring kept subdominant.

    python scripts/ab_binary_layout.py            # 600K (sf0.1 derived)
    SPARK_GRAFT_PROBE_SCALE=8 python scripts/ab_binary_layout.py  # 4.8M
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
import pyarrow as pa
from pyspark.sql import functions as F

from bench import derived_vectors
from cuda_acceleratedvectordatabaseengine_spark.functions import arrowkit as AK
from cuda_acceleratedvectordatabaseengine_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE = int(os.environ.get("SPARK_GRAFT_PROBE_SCALE", "1"))
REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))
NQ = int(os.environ.get("SPARK_GRAFT_AB_NQ", "128"))
DIM = 64

spark = get_spark(app_name="cavde-ab-binlayout")
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
vecs = vecs.repartition(64)

base = tempfile.mkdtemp(prefix="cavde_ab_binlayout_")
list_path = os.path.join(base, "list_layout")
bin_path = os.path.join(base, "bin_layout")


def to_binary(batches):
    """array<float> -> packed float32-LE binary, zero-copy from the
    ListArray values buffer (offsets are synthesized: fixed width)."""
    for rb in batches:
        arr = rb.column(rb.schema.get_field_index("vector"))
        vals = arr.flatten()
        n = len(arr)
        fl = vals.to_numpy(zero_copy_only=False).astype(np.float32, copy=False)
        data = pa.py_buffer(fl.tobytes())
        offsets = pa.py_buffer(
            (np.arange(n + 1, dtype=np.int32) * (DIM * 4)).tobytes()
        )
        binarr = pa.BinaryArray.from_buffers(pa.binary(), n, [None, offsets, data])
        yield pa.RecordBatch.from_arrays(
            [rb.column(rb.schema.get_field_index("id")), binarr],
            names=["id", "vector"],
        )


t0 = time.perf_counter()
vecs.write.mode("overwrite").parquet(list_path)
t_write_list = time.perf_counter() - t0
t0 = time.perf_counter()
vecs.mapInArrow(to_binary, "id long, vector binary").write.mode(
    "overwrite"
).parquet(bin_path)
t_write_bin = time.perf_counter() - t0


def du(path):
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


list_df = spark.read.parquet(list_path)
bin_df = spark.read.parquet(bin_path)
n = list_df.count()
assert bin_df.count() == n

Q = (
    np.stack(
        [
            np.asarray(r["vector"], dtype=np.float64)
            for r in base_vecs.orderBy("id").limit(NQ).collect()
        ]
    )
)
qn = (Q * Q).sum(axis=1)


def _score(X, out_rows):
    # rank-trick L2: ||x||^2 - 2 x.q + ||q||^2, per-batch per-query min
    xn = (X * X).sum(axis=1)
    d2 = xn[:, None] - 2.0 * (X @ Q.T) + qn[None, :]
    out_rows.append(d2.min(axis=0))


def kernel(extract, score):
    def run(batches):
        mins = []
        rows = 0
        for rb in batches:
            X = extract(rb)
            rows += X.shape[0]
            if score:
                _score(X, mins)
        if score and mins:
            m = np.minimum.reduce(mins)
            yield AK.batch(
                qid=np.arange(NQ, dtype=np.int64), dmin=m
            )
        else:
            yield AK.batch(qid=np.array([0], dtype=np.int64),
                           dmin=np.array([float(rows)], dtype=np.float64))
    return run


def extract_list(rb):
    return AK.list_matrix(rb, "vector", np.float64)


def extract_bin(rb):
    B = AK.binary_matrix(rb, "vector", DIM * 4)
    return np.ascontiguousarray(B).view(np.float32).astype(
        np.float64, copy=False
    )


ARMS = {
    "list_convert": (list_df, extract_list, False),
    "bin_convert": (bin_df, extract_bin, False),
    "list_scan": (list_df, extract_list, True),
    "bin_scan": (bin_df, extract_bin, True),
}


def run_arm(name):
    df, extract, score = ARMS[name]
    t0 = time.perf_counter()
    out = df.mapInArrow(kernel(extract, score), "qid long, dmin double")
    k = out.count()
    return time.perf_counter() - t0, k


# warm both scans + worker daemons
for name in ARMS:
    run_arm(name)

samples = {name: [] for name in ARMS}
checks = {}
for _ in range(REPS):
    for name in ARMS:
        dt, k = run_arm(name)
        samples[name].append(round(dt, 3))
        checks[name] = k

# correctness cross-check: the two scan arms must agree on every min
def collect_mins(name):
    df, extract, score = ARMS[name]
    out = (
        df.mapInArrow(kernel(extract, True), "qid long, dmin double")
        .groupBy("qid").agg(F.min("dmin").alias("dmin"))
        .orderBy("qid").collect()
    )
    return np.array([r["dmin"] for r in out])


diff = float(np.abs(collect_mins("list_scan") - collect_mins("bin_scan")).max())

result = {
    "metric": "ab_binary_layout",
    "n_vectors": n,
    "dim": DIM,
    "nq": NQ,
    "reps": REPS,
    "write_sec": {"list": round(t_write_list, 3), "bin": round(t_write_bin, 3)},
    "bytes_on_disk": {"list": du(list_path), "bin": du(bin_path)},
    "samples": samples,
    "min_sec": {k: min(v) for k, v in samples.items()},
    "ratio_bin_vs_list": {
        "convert": round(min(samples["list_convert"]) / min(samples["bin_convert"]), 3),
        "scan": round(min(samples["list_scan"]) / min(samples["bin_scan"]), 3),
    },
    "max_abs_dmin_diff": diff,
}
print(json.dumps(result, separators=(",", ":")), flush=True)
shutil.rmtree(base, ignore_errors=True)
