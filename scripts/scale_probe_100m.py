"""The 100M+ tuning-tier probe (r8 verdict item 1): build and search a
>=100M x 64-d index at the reference's prescribed nlist=16384
(README.md:154-167 tuning table, the last untested row), stressing the
two-level bucketed layout (64 buckets x 256 lists) and distributed
Lloyd at 4x the r8-fixed list count (where the old O(nlist) Python
terms would have cost ~400s/iteration).

Phases: corpus synth -> parquet; sample train (500k ~= 30 pts/list);
assign+write epoch; cold + steady batch search at nprobe=64 (the
tuning table's 100M+ prescription); recall sweep vs exact ground truth
on a bounded query sample.  The SQ cascade A/B is NOT repeated here —
refuted at 50M (0.65x, PERF.md r8) and the sidecar would double disk.

    python scripts/scale_probe_100m.py [target_n]   # default 100.8M

Set SPARK_GRAFT_100M_WORK=<dir> to reuse a work dir across runs: an
existing <dir>/corpus is reused instead of re-synthesized (the corpus
is ~25 GB / ~10 min to write), and the dir is kept on exit (only the
built index is removed). Disk note: peak usage during the epoch write
is corpus + shuffle + epoch ~= 3x corpus size.
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
from cuda_acceleratedvectordatabaseengine_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TARGET = int(sys.argv[1]) if len(sys.argv) > 1 else 100_800_000
NLIST = 16384
NPROBE = 64  # the tuning table's 100M+ prescription
TRAIN_SAMPLE = 500_000  # ~30 points per list
REPS = 3

spark = get_spark(app_name="cavde-scale-100m")
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


work_env = os.environ.get("SPARK_GRAFT_100M_WORK")
work = work_env or tempfile.mkdtemp(prefix="cavde_100m_")
index_dir = os.path.join(work, "probe100m")
shutil.rmtree(index_dir, ignore_errors=True)  # stale partial index
try:
    base_vecs = derived_vectors(spark, SF_DIR)
    n_base = base_vecs.count()
    scale = max(1, (TARGET + n_base - 1) // n_base)
    corpus_path = os.path.join(work, "corpus")
    if os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        print(f"reusing corpus at {corpus_path}", flush=True)
        t["synth_write_corpus"] = 0.0
    else:
        shutil.rmtree(corpus_path, ignore_errors=True)
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
                    (F.col("id") + F.col("leg") * n_base).alias("id"),
                    "vector",
                )
                .repartition(512)
                .write.parquet(corpus_path)
            )
    vecs = spark.read.parquet(corpus_path)
    n = vecs.count()
    print(f"corpus: {n} vectors x 64-d, nlist={NLIST}", flush=True)

    train_phases = {}
    with phase(f"train_{TRAIN_SAMPLE // 1000}k_sample"):
        model = kmeans.train(
            vecs.limit(TRAIN_SAMPLE), NLIST, seed=42, timings=train_phases
        )
    t["train_phases"] = {
        k: round(v, 2) for k, v in train_phases.items()
    }

    with phase("assign_write_epoch"):
        idx = ivf.IVFIndex.build(
            vecs, work, "probe100m", nlist=NLIST,
            init=model.centroids, train=False,
        )
    man = idx.manifest
    print(
        f"epoch built: {man.num_vectors} vectors, "
        f"lists_per_bucket={idx.lists_per_bucket}",
        flush=True,
    )
    t["vec_per_sec_build"] = round(n / t["assign_write_epoch"], 0)

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

    # the quality-matched probe depth: recall tracks the probed FRACTION
    # (PERF.md r9), so nprobe=128 here matches the 50M tier's 0.78%
    with phase("search_steady_nprobe128"):
        idx.search(queries, k=10, nprobe=128).count()

    qs_small = queries.limit(100).cache()
    qs_small.count()
    with phase("recall_sweep_16_32_64_128"):
        rows = recall_sweep(
            idx, vecs, qs_small, k=10, nprobes=(16, 32, 64, 128)
        ).collect()
    t["recall_curve"] = {
        int(r["nprobe"]): round(r["mean_recall"], 4) for r in rows
    }
    print(f"recall@10 per nprobe: {t['recall_curve']}", flush=True)

    t["n_vectors"] = n
    t["nlist"] = NLIST
    t["nprobe"] = NPROBE
    print("RESULT " + json.dumps(t), flush=True)
finally:
    if work_env:
        shutil.rmtree(index_dir, ignore_errors=True)  # keep the corpus
    else:
        shutil.rmtree(work, ignore_errors=True)
