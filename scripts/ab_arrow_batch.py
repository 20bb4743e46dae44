"""Interleaved A/B of spark.sql.execution.arrow.maxRecordsPerBatch on
the 4.8M-vector probe search: the decomposition probe showed the pruned
scan is Arrow-conversion-bound (~3.5s floor), so batch size is the
direct lever — bigger batches amortize IPC flushes per 10K rows.

    python scripts/ab_arrow_batch.py [nlist]   # default 4096
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
CONF = "spark.sql.execution.arrow.maxRecordsPerBatch"

spark = get_spark(app_name="cavde-ab-arrow")
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
print(f"corpus: {vecs.count()} vectors", flush=True)

nlist = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
nprobe = 8 if nlist <= 128 else 16
model = kmeans.train(util.sample_head(vecs, 100_000), nlist, seed=42)
base = tempfile.mkdtemp(prefix=f"cavde_abarrow_{nlist}_")
try:
    idx = ivf.IVFIndex.build(
        vecs, base, "probe", nlist=nlist, init=model.centroids, train=False
    )
    queries = (
        vecs.orderBy("id").limit(1000)
        .select(F.col("id").alias("query_id"), F.col("vector").alias("qvec"))
    )
    idx.search(queries, k=10, nprobe=nprobe).count()  # cold
    default = spark.conf.get(CONF, "10000")
    arms = {"10000": [], "65536": [], "262144": []}
    for rep in range(3):
        for val in arms:
            spark.conf.set(CONF, val)
            t0 = time.perf_counter()
            idx.search(queries, k=10, nprobe=nprobe).count()
            arms[val].append(time.perf_counter() - t0)
    spark.conf.set(CONF, default)
    for val, ts in arms.items():
        print(
            f"nlist={nlist} {CONF}={val}: best {min(ts):.2f}s "
            f"({[round(t, 2) for t in ts]})",
            flush=True,
        )
finally:
    shutil.rmtree(base, ignore_errors=True)
