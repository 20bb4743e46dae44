"""Interleaved A/B of the default SQ8 cascade vs the flat float scan.

Builds the 4.8M-vector probe index ONCE per nlist, encodes the SQ8
sidecar, then alternates steady 1000-query searches with cascade on/off
in one process — box-level drift hits both arms equally, so the ratio is
trustworthy even when absolute numbers wander (PERF.md r7: probe
variance). Also asserts value-identity of the two arms once per nlist
(the cascade is exact-reranked — ids AND rank order must match).

    python scripts/ab_cascade.py [nlist ...]   # default: 1024 4096
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
from cuda_acceleratedvectordatabaseengine_spark import util
from cuda_acceleratedvectordatabaseengine_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE = int(os.environ.get("SPARK_GRAFT_PROBE_SCALE", "8"))
REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))

spark = get_spark(app_name="cavde-ab-cascade")
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

for nlist in [int(a) for a in sys.argv[1:]] or [1024, 4096]:
    nprobe = 8 if nlist <= 128 else 16
    model = kmeans.train(util.sample_head(vecs, 100_000), nlist, seed=42)
    base = tempfile.mkdtemp(prefix=f"cavde_abc_{nlist}_")
    try:
        idx = ivf.IVFIndex.build(
            vecs, base, "probe", nlist=nlist, init=model.centroids, train=False
        )
        t0 = time.perf_counter()
        IVFSQIndex.build_from_ivf(idx)
        enc = time.perf_counter() - t0
        idx = ivf.IVFIndex.load(spark, base, "probe")  # manifest sees sq
        assert idx._cascade_handle() is not None
        queries = (
            vecs.orderBy("id").limit(1000)
            .select(F.col("id").alias("query_id"), F.col("vector").alias("qvec"))
        )
        # value-identity check (once, also warms both arms)
        a = sorted(
            (r["query_id"], r["rank"], r["id"])
            for r in idx.search(queries, k=10, nprobe=nprobe, cascade="sq").collect()
        )
        b = sorted(
            (r["query_id"], r["rank"], r["id"])
            for r in idx.search(
                queries, k=10, nprobe=nprobe, cascade="off"
            ).collect()
        )
        ident = "identical" if a == b else f"MISMATCH ({sum(x != y for x, y in zip(a, b))} rows)"
        samples = {"cascade": [], "flat": []}
        for rep in range(REPS):
            for arm, casc in (("cascade", "sq"), ("flat", "off")):
                t0 = time.perf_counter()
                idx.search(queries, k=10, nprobe=nprobe, cascade=casc).count()
                samples[arm].append(time.perf_counter() - t0)
        c = min(samples["cascade"])
        f = min(samples["flat"])
        print(
            f"nlist={nlist} nprobe={nprobe} 1000q steady: "
            f"cascade {c:.2f}s best ({[round(x, 2) for x in samples['cascade']]}), "
            f"flat {f:.2f}s best ({[round(x, 2) for x in samples['flat']]}), "
            f"speedup {f / c:.2f}x, encode_sq {enc:.1f}s, results {ident}",
            flush=True,
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
