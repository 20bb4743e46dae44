"""Interleaved A/B of the fused list scanner vs the per-list loop.

Builds the 4.8M-vector probe index ONCE per nlist, then alternates
steady 1000-query searches with fusion on/off in one process — box-level
drift hits both arms equally, so the ratio is trustworthy even when
absolute numbers wander (PERF.md r7: probe variance).

    python scripts/ab_fused_scan.py [nlist ...]   # default: 4096
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
REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))

spark = get_spark(app_name="cavde-ab-fused")
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
print(f"corpus: {n} vectors (sf_dir={SF_DIR})", flush=True)

for nlist in [int(a) for a in sys.argv[1:]] or [4096]:
    nprobe = 8 if nlist <= 128 else 16
    model = kmeans.train(util.sample_head(vecs, 100_000), nlist, seed=42)
    base = tempfile.mkdtemp(prefix=f"cavde_ab_{nlist}_")
    try:
        idx = ivf.IVFIndex.build(
            vecs, base, "probe", nlist=nlist, init=model.centroids, train=False
        )
        queries = (
            vecs.orderBy("id").limit(1000)
            .select(F.col("id").alias("query_id"), F.col("vector").alias("qvec"))
        )
        idx.search(queries, k=10, nprobe=nprobe).count()  # cold
        default_cap = ivf.FUSE_INFLATION_CAP
        samples = {"fused": [], "perlist": []}
        for rep in range(REPS):
            for arm, cap in (("fused", default_cap), ("perlist", 0.0)):
                ivf.FUSE_INFLATION_CAP = cap
                t0 = time.perf_counter()
                idx.search(queries, k=10, nprobe=nprobe).count()
                samples[arm].append(time.perf_counter() - t0)
        ivf.FUSE_INFLATION_CAP = default_cap
        f = min(samples["fused"])
        p = min(samples["perlist"])
        print(
            f"nlist={nlist} nprobe={nprobe} 1000q steady: "
            f"fused {f:.2f}s best ({[round(x, 2) for x in samples['fused']]}), "
            f"per-list {p:.2f}s best ({[round(x, 2) for x in samples['perlist']]}), "
            f"speedup {p / f:.2f}x",
            flush=True,
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
