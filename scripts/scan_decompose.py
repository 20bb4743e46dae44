"""Decompose the high-nlist batch-search gap: at each nlist, time the
pruned scan alone, scan+Arrow conversion, and the full search, in one
process — names which layer the nlist=4096 overhead lives in (parquet
read / Python-worker conversion / scoring+merge), instead of guessing.

    python scripts/scan_decompose.py [nlist ...]   # default: 1024 4096
"""
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

from bench import derived_vectors
from cuda_acceleratedvectordatabaseengine_spark.operators import ivf, kmeans, knn
from cuda_acceleratedvectordatabaseengine_spark import util
from cuda_acceleratedvectordatabaseengine_spark.session import get_spark
from cuda_acceleratedvectordatabaseengine_spark.sources.epochs import prune_lists

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE = int(os.environ.get("SPARK_GRAFT_PROBE_SCALE", "8"))

spark = get_spark(app_name="cavde-scan-decompose")
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


def timed(f, reps=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return best


for nlist in [int(a) for a in sys.argv[1:]] or [1024, 4096]:
    nprobe = 8 if nlist <= 128 else 16
    model = kmeans.train(util.sample_head(vecs, 100_000), nlist, seed=42)
    base = tempfile.mkdtemp(prefix=f"cavde_dec_{nlist}_")
    try:
        idx = ivf.IVFIndex.build(
            vecs, base, "probe", nlist=nlist, init=model.centroids, train=False
        )
        queries = (
            vecs.orderBy("id").limit(1000)
            .select(F.col("id").alias("query_id"), F.col("vector").alias("qvec"))
        )
        qids, Q = knn.collect_query_matrix(queries)
        probe = ivf.select_nprobe_lists(idx.centroids, Q, nprobe, "l2")
        needed = sorted({int(x) for x in probe.ravel()})
        pruned = prune_lists(idx.vectors, needed, idx.lists_per_bucket)
        cols = pruned.select("id", "vector", "list_id")
        cols.count()  # cold scan once

        t_scan = timed(lambda: cols.count())

        def convert(batches):
            import pyarrow as pa

            from cuda_acceleratedvectordatabaseengine_spark.functions import (
                arrowkit as AK,
            )

            for rb in batches:
                if rb.num_rows == 0:
                    continue
                ids = AK.column(rb, "id", np.int64)
                V = AK.list_matrix(rb, "vector")
                lids = AK.column(rb, "list_id", np.int64)
                yield AK.batch(
                    n=np.asarray([len(ids)], dtype=np.int64),
                    s=np.asarray([float(V[0, 0]) + lids[0]], dtype=np.float64),
                )

        t_conv = timed(
            lambda: cols.mapInArrow(convert, schema="n long, s double").count()
        )
        t_search = timed(
            lambda: idx.search(queries, k=10, nprobe=nprobe).count()
        )
        print(
            f"nlist={nlist} nprobe={nprobe} lists={len(needed)}: "
            f"scan-count {t_scan:.2f}s, scan+arrow-convert {t_conv:.2f}s, "
            f"full search {t_search:.2f}s "
            f"(convert-overhead {t_conv - t_scan:.2f}s, "
            f"score+merge {t_search - t_conv:.2f}s)",
            flush=True,
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
