"""One-off scale-headroom probe (PERF.md): ingest/search shape at 8x the
bench corpus (4.8M x 64-d derived vectors), at nlist=128 (flat layout)
vs nlist=1024 (two-level bucketed layout above epochs.MAX_LIST_DIRS).

    python scripts/scale_probe.py [nlist ...]     # default: 128 1024
"""
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
SCALE = int(os.environ.get("SPARK_GRAFT_PROBE_SCALE", "8"))

spark = get_spark(app_name="cavde-scale-probe")
spark.sparkContext.setLogLevel("ERROR")

base_vecs = derived_vectors(spark, SF_DIR)
n_base = base_vecs.count()
# 8 shifted copies -> 8x corpus with distinct ids (same construction as
# the r5 probe): component values unchanged, ids offset per copy
legs = [
    base_vecs.select(
        (F.col("id") + F.lit(i * n_base)).alias("id"), "vector"
    )
    for i in range(SCALE)
]
vecs = legs[0]
for leg in legs[1:]:
    vecs = vecs.unionByName(leg)
vecs = vecs.repartition(64).cache()
n = vecs.count()
print(f"corpus: {n} vectors x 64-d (sf_dir={SF_DIR})", flush=True)

# Warm the process exactly like bench.py's warm block (same rationale,
# PERF.md r7): driver OpenBLAS pool spawn at the Lloyd GEMM shape, the
# Arrow collect path, and the partitioned-parquet write/committer class
# load all happen ONCE per process — without this the first nlist leg
# reads 2-4x slower than the same leg run second, and cross-leg
# comparisons (the whole point of this probe) are meaningless.
import numpy as _np

rng = _np.random.default_rng(0)
_ = rng.standard_normal((100_000, 64)) @ rng.standard_normal((64, 128))
_warm = vecs.limit(4096).cache()
_warm.count()
_wbase = tempfile.mkdtemp(prefix="cavde_probe_warm_")
try:
    _wi = kmeans.train(_warm, 8, seed=42)
    _widx = ivf.IVFIndex.build(
        _warm, _wbase, "warm", nlist=8, init=_wi.centroids, train=False
    )
    _widx.search(
        _warm.limit(8).select(
            F.col("id").alias("query_id"), F.col("vector").alias("qvec")
        ),
        k=5,
        nprobe=8,
    ).count()
finally:
    shutil.rmtree(_wbase, ignore_errors=True)
_warm.unpersist()

nlists = [int(a) for a in sys.argv[1:]] or [128, 1024]
for nlist in nlists:
    nprobe = 8 if nlist <= 128 else 16
    t0 = time.perf_counter()
    model = kmeans.train(util.sample_head(vecs, 100_000), nlist, seed=42)
    train_s = time.perf_counter() - t0
    base = tempfile.mkdtemp(prefix=f"cavde_probe_{nlist}_")
    try:
        t0 = time.perf_counter()
        idx = ivf.IVFIndex.build(
            vecs, base, "probe", nlist=nlist, init=model.centroids,
            train=False,
        )
        add_s = time.perf_counter() - t0
        vdir = idx.manager.vectors_path(idx.epoch)
        dirs = [d for d in os.listdir(vdir) if "=" in d]
        layout = (
            f"bucketed x{len(dirs)} (lpb={idx.lists_per_bucket})"
            if idx.lists_per_bucket
            else f"flat x{len(dirs)}"
        )
        queries = (
            vecs.orderBy("id").limit(1000)
            .select(F.col("id").alias("query_id"), F.col("vector").alias("qvec"))
        )
        idx.search(queries, k=10, nprobe=nprobe).count()  # cold
        t0 = time.perf_counter()
        idx.search(queries, k=10, nprobe=nprobe).count()
        search_s = time.perf_counter() - t0
        print(
            f"nlist={nlist} nprobe={nprobe} layout={layout}: "
            f"train {train_s:.1f}s, add {add_s:.1f}s "
            f"({add_s / n * 1e6:.1f} us/vec), steady search(1000q) "
            f"{search_s:.2f}s ({1000 / search_s:.0f} QPS)",
            flush=True,
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
