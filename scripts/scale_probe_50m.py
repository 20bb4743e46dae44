"""The 1M-100M tuning-tier probe (r7 verdict item 2): build and search
a >=50M x 64-d index at the reference's prescribed nlist=4096
(README.md:154-167 tuning table), with per-phase attribution.

Phases: corpus synth -> parquet (stable input, no cache pressure);
sample train (200k, the production discipline); assign+write epoch;
cold + steady batch search at nprobe=32; recall sweep vs an exact
ground truth on a bounded query sample; SQ8 sidecar encode + the
cascade-vs-flat interleaved A/B at this scale.

    python scripts/scale_probe_50m.py [target_n]   # default 50.4M
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

from bench import derived_vectors
from cuda_acceleratedvectordatabaseengine_spark.metrics import recall_sweep
from cuda_acceleratedvectordatabaseengine_spark.operators import ivf, kmeans
from cuda_acceleratedvectordatabaseengine_spark.operators.sq import IVFSQIndex
from cuda_acceleratedvectordatabaseengine_spark import util
from cuda_acceleratedvectordatabaseengine_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TARGET = int(sys.argv[1]) if len(sys.argv) > 1 else 50_400_000
NLIST = 4096
NPROBE = 32  # the tuning table's 1M-100M prescription
REPS = 3

spark = get_spark(app_name="cavde-scale-50m")
spark.sparkContext.setLogLevel("ERROR")

t = {}


def phase(name):
    class _P:
        def __enter__(self):
            self.t0 = time.perf_counter()
            return self

        def __exit__(self, *a):
            t[name] = round(time.perf_counter() - self.t0, 2)
            print(f"[phase] {name}: {t[name]}s", flush=True)

    return _P()


work = tempfile.mkdtemp(prefix="cavde_50m_")
try:
    base_vecs = derived_vectors(spark, SF_DIR)
    n_base = base_vecs.count()
    scale = max(1, (TARGET + n_base - 1) // n_base)
    corpus_path = os.path.join(work, "corpus")
    with phase("synth_write_corpus"):
        (
            base_vecs.select(
                F.explode(
                    F.sequence(F.lit(0), F.lit(scale - 1))
                ).alias("leg"),
                "id",
                "vector",
            )
            .select(
                (F.col("id") + F.col("leg") * n_base).alias("id"), "vector"
            )
            .repartition(256)
            .write.parquet(corpus_path)
        )
    vecs = spark.read.parquet(corpus_path)
    n = vecs.count()
    print(f"corpus: {n} vectors x 64-d, nlist={NLIST}", flush=True)

    with phase("train_200k_sample"):
        model = kmeans.train(util.sample_head(vecs, 200_000), NLIST, seed=42)

    with phase("assign_write_epoch"):
        idx = ivf.IVFIndex.build(
            vecs, work, "probe50m", nlist=NLIST,
            init=model.centroids, train=False,
        )
    man = idx.manifest
    print(
        f"epoch built: {man.num_vectors} vectors, "
        f"lists_per_bucket={idx.lists_per_bucket}",
        flush=True,
    )

    queries = (
        vecs.filter(F.col("id") < n_base).orderBy("id").limit(1000)
        .select(F.col("id").alias("query_id"), F.col("vector").alias("qvec"))
        .cache()
    )
    queries.count()

    with phase("search_cold"):
        idx.search(queries, k=10, nprobe=NPROBE).count()
    steady = []
    for rep in range(REPS):
        with phase(f"search_steady_{rep}"):
            idx.search(queries, k=10, nprobe=NPROBE).count()
        steady.append(t[f"search_steady_{rep}"])
    t["search_steady_best"] = min(steady)
    t["qps_best"] = round(1000 / min(steady), 1)

    qs_small = queries.limit(100).cache()
    qs_small.count()
    with phase("recall_sweep_8_16_32_64"):
        rows = recall_sweep(
            idx, vecs, qs_small, k=10, nprobes=(8, 16, 32, 64)
        ).collect()
    t["recall_curve"] = {int(r["nprobe"]): round(r["mean_recall"], 4) for r in rows}
    print(f"recall@10 per nprobe: {t['recall_curve']}", flush=True)

    with phase("encode_sq_sidecar"):
        IVFSQIndex.build_from_ivf(idx)
    idx = ivf.IVFIndex.load(spark, work, "probe50m")
    assert idx._cascade_handle() is not None
    idx.search(queries, k=10, nprobe=NPROBE, cascade="sq").count()  # warm
    samples = {"cascade": [], "flat": []}
    for rep in range(REPS):
        for arm, casc in (("cascade", "sq"), ("flat", "off")):
            t0 = time.perf_counter()
            idx.search(queries, k=10, nprobe=NPROBE, cascade=casc).count()
            samples[arm].append(round(time.perf_counter() - t0, 2))
    t["cascade_samples"] = samples["cascade"]
    t["flat_samples"] = samples["flat"]
    t["cascade_vs_flat"] = round(
        min(samples["flat"]) / min(samples["cascade"]), 2
    )
    print(
        f"cascade {samples['cascade']} vs flat {samples['flat']} -> "
        f"{t['cascade_vs_flat']}x",
        flush=True,
    )

    t["n_vectors"] = n
    t["nlist"] = NLIST
    t["nprobe"] = NPROBE
    print("RESULT " + json.dumps(t), flush=True)
finally:
    shutil.rmtree(work, ignore_errors=True)
