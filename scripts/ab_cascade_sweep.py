"""Cascade-vs-flat crossover sweep: one 4.8M nlist=1024 build, nprobe in
{16, 64, 256, 1024} — interleaved arms, plus a distance-level mismatch
classification (tie-shuffle vs genuine shortlist miss) at each shape.

    python scripts/ab_cascade_sweep.py [nprobe ...]
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
from cuda_acceleratedvectordatabaseengine_spark.operators.sq import IVFSQIndex
from cuda_acceleratedvectordatabaseengine_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE = int(os.environ.get("SPARK_GRAFT_PROBE_SCALE", "8"))
REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))
NLIST = int(os.environ.get("SPARK_GRAFT_AB_NLIST", "1024"))

spark = get_spark(app_name="cavde-ab-cascade-sweep")
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
print(f"corpus: {n} vectors, nlist={NLIST}", flush=True)

model = kmeans.train(vecs.limit(100_000), NLIST, seed=42)
base = tempfile.mkdtemp(prefix=f"cavde_absw_{NLIST}_")
try:
    idx = ivf.IVFIndex.build(
        vecs, base, "probe", nlist=NLIST, init=model.centroids, train=False
    )
    IVFSQIndex.build_from_ivf(idx)
    idx = ivf.IVFIndex.load(spark, base, "probe")
    assert idx._cascade_handle() is not None
    queries = (
        vecs.orderBy("id").limit(1000)
        .select(F.col("id").alias("query_id"), F.col("vector").alias("qvec"))
    )
    for nprobe in [int(a) for a in sys.argv[1:]] or [16, 64, 256, NLIST]:
        # mismatch classification (also warms both arms at this shape)
        a = {
            (r["query_id"], r["rank"]): (r["id"], round(r["distance"], 6))
            for r in idx.search(queries, k=10, nprobe=nprobe, cascade="sq").collect()
        }
        b = {
            (r["query_id"], r["rank"]): (r["id"], round(r["distance"], 6))
            for r in idx.search(
                queries, k=10, nprobe=nprobe, cascade="off"
            ).collect()
        }
        id_diff = sum(1 for k in b if a[k][0] != b[k][0])
        dist_diff = sum(1 for k in b if abs(a[k][1] - b[k][1]) > 1e-9)
        samples = {"cascade": [], "flat": []}
        for rep in range(REPS):
            for arm, casc in (("cascade", "sq"), ("flat", "off")):
                t0 = time.perf_counter()
                idx.search(queries, k=10, nprobe=nprobe, cascade=casc).count()
                samples[arm].append(time.perf_counter() - t0)
        c = min(samples["cascade"])
        f = min(samples["flat"])
        print(
            f"nprobe={nprobe:5d} ({nprobe / NLIST:5.1%} of corpus): "
            f"cascade {c:.2f}s {[round(x, 2) for x in samples['cascade']]}, "
            f"flat {f:.2f}s {[round(x, 2) for x in samples['flat']]}, "
            f"speedup {f / c:.2f}x | rows with id diff {id_diff}, "
            f"with DISTANCE diff {dist_diff} (of 10000)",
            flush=True,
        )
finally:
    shutil.rmtree(base, ignore_errors=True)
