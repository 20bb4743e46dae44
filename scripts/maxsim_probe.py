"""One-off MaxSim scale probe (PERF.md): exact vs cluster-blocked
late-interaction retrieval over the bench-scale corpus treated as
multi-vector items (4 chunks per item).

    python scripts/maxsim_probe.py [nlist ...]     # default: 64 256

Reports wall-clock and recall@10 of the blocked path against the exact
operator at nprobe 1/4/8 — the blocked path's surfaced scores are exact
by construction (tests/test_hybrid.py), so recall is the ONLY quality
axis.
"""
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.chdir(ROOT)

from pyspark.sql import functions as F

from bench import derived_vectors
from cuda_acceleratedvectordatabaseengine_spark.operators import hybrid, kmeans
from cuda_acceleratedvectordatabaseengine_spark import util
from cuda_acceleratedvectordatabaseengine_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_QUERY_ITEMS = 8
K = 10

spark = get_spark(app_name="cavde-maxsim-probe")
spark.sparkContext.setLogLevel("ERROR")

vecs = derived_vectors(spark, SF_DIR).repartition(32).cache()
n = vecs.count()
grp = F.expr("CAST(id DIV 4 AS BIGINT)")
qcut = N_QUERY_ITEMS * 4
qv = vecs.filter(F.col("id") < qcut).select(
    grp.alias("query_id"), F.col("id").alias("qvec_id"),
    F.col("vector").alias("vec"),
)
dv = vecs.filter(F.col("id") >= qcut).select(
    grp.alias("id"), F.col("vector").alias("vec")
).cache()
n_items = dv.select("id").distinct().count()
print(f"corpus: {n} chunks -> {n_items} items x ~4 chunks, "
      f"{N_QUERY_ITEMS} queries x 4 vectors (sf_dir={SF_DIR})", flush=True)

t0 = time.perf_counter()
exact = hybrid.maxsim_topk(dv, qv, k=K).collect()
exact_s = time.perf_counter() - t0
exact_set = {(r["query_id"], r["id"]) for r in exact}
print(f"exact    : {exact_s:7.2f}s   ({len(exact_set)} result pairs)",
      flush=True)

nlists = [int(a) for a in sys.argv[1:]] or [64, 256]
for nlist in nlists:
    t0 = time.perf_counter()
    model = kmeans.train(util.sample_head(vecs, 100_000).select("id", "vector"), nlist, seed=42
    )
    train_s = time.perf_counter() - t0
    for nprobe in (1, 4, 8):
        t0 = time.perf_counter()
        got = hybrid.maxsim_blocked_topk(
            dv, qv, model.centroids, k=K, nprobe=nprobe
        ).collect()
        blocked_s = time.perf_counter() - t0
        got_set = {(r["query_id"], r["id"]) for r in got}
        recall = len(got_set & exact_set) / max(1, len(exact_set))
        print(
            f"nlist={nlist:4d} nprobe={nprobe}: {blocked_s:7.2f}s "
            f"(train {train_s:.2f}s)  recall@{K}={recall:.3f}  "
            f"speedup x{exact_s / blocked_s:.2f}",
            flush=True,
        )
