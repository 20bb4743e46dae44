"""Cascade-vs-flat crossover sweep — interleaved arms, distance-level
mismatch classification (tie-shuffle vs genuine shortlist miss) at each
probe shape.

Two corpus shapes:

* default — the r8 shape: sf0.1-derived 64-d vectors tiled x SCALE
  (4.8M rows), nlist=1024. This is the sweep that REFUTED the SQ8
  cascade at 64-d (0.55-0.95x at every nprobe; PERF.md r8).
* ``SPARK_GRAFT_AB_SHAPE=768d`` — the reference's PUBLISHED shape
  (r10 verdict #1): the 768-d virtual corpus (scripts/synth768.py,
  default 2M rows via SPARK_GRAFT_AB_N), nlist=4096, nprobe sweep
  {32, 128, 512}. r10 attributed the 768-d steady-search floor to
  scanned BYTES (parquet list<float> decode + Arrow transfer, 31 GB at
  1.15 GB/s, FLOPs ~5%) — the int8 sidecar cuts exactly those terms
  4x, PQ codes ~32x, so the r8 64-d refutation does not transfer and
  must be re-measured here. This mode adds a third arm: PQ-ADC first
  pass (m=dim/8, residual off, exact rerank at 4k) through
  IVFPQIndex.search.

    python scripts/ab_cascade_sweep.py [nprobe ...]
    SPARK_GRAFT_AB_SHAPE=768d python scripts/ab_cascade_sweep.py [nprobe ...]
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
from cuda_acceleratedvectordatabaseengine_spark.operators import ivf, kmeans
from cuda_acceleratedvectordatabaseengine_spark.operators.pq import IVFPQIndex
from cuda_acceleratedvectordatabaseengine_spark.operators.sq import IVFSQIndex
from cuda_acceleratedvectordatabaseengine_spark import util
from cuda_acceleratedvectordatabaseengine_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE = int(os.environ.get("SPARK_GRAFT_PROBE_SCALE", "8"))
REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))
SHAPE = os.environ.get("SPARK_GRAFT_AB_SHAPE", "64d")
# SPARK_GRAFT_AB_COLD=1 (r11 verdict #3): drop the epoch files from the
# page cache before EVERY timed run, so each rep measures the IO-BOUND
# regime — the cold-NVMe/S3 deployment case the README's surviving
# cascade claim is about, which all prior (page-cached, CPU-decode-bound)
# refutations never touched. posix_fadvise(DONTNEED) is unprivileged;
# os.sync() first so dirty pages are clean and actually evict (verified
# via /proc/meminfo Cached deltas, printed per drop).
COLD = os.environ.get("SPARK_GRAFT_AB_COLD", "0") == "1"
OUT = os.environ.get("SPARK_GRAFT_AB_OUT")


def _cached_kb() -> int:
    with open("/proc/meminfo") as f:
        for line in f:
            if line.startswith("Cached:"):
                return int(line.split()[1])
    return -1


def drop_page_cache(path: str) -> "tuple[int, int]":
    """Advise every file under ``path`` out of the page cache. Returns
    (bytes advised, page-cache shrink in KB per /proc/meminfo)."""
    os.sync()
    before = _cached_kb()
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            p = os.path.join(root, fn)
            try:
                fd = os.open(p, os.O_RDONLY)
            except OSError:
                continue
            try:
                total += os.fstat(fd).st_size
                os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
            finally:
                os.close(fd)
    return total, before - _cached_kb()

spark = get_spark(app_name="cavde-ab-cascade-sweep")
spark.sparkContext.setLogLevel("ERROR")

if SHAPE == "768d":
    from scripts.synth768 import synth_corpus

    N = int(os.environ.get("SPARK_GRAFT_AB_N", "2000000"))
    NLIST = int(os.environ.get("SPARK_GRAFT_AB_NLIST", "4096"))
    NQ = int(os.environ.get("SPARK_GRAFT_AB_NQ", "1000"))
    vecs = synth_corpus(spark, N, parts=64).cache()
    default_sweep = [32, 128, 512]
    with_pq = True
else:
    base_vecs = derived_vectors(spark, SF_DIR)
    n_base = base_vecs.count()
    NLIST = int(os.environ.get("SPARK_GRAFT_AB_NLIST", "1024"))
    NQ = 1000
    legs = [
        base_vecs.select((F.col("id") + F.lit(i * n_base)).alias("id"), "vector")
        for i in range(SCALE)
    ]
    vecs = legs[0]
    for leg in legs[1:]:
        vecs = vecs.unionByName(leg)
    vecs = vecs.repartition(64).cache()
    default_sweep = [16, 64, 256, NLIST]
    with_pq = os.environ.get("SPARK_GRAFT_AB_PQ", "0") == "1"

n = vecs.count()
print(f"corpus: {n} vectors, shape={SHAPE}, nlist={NLIST}", flush=True)

t0 = time.perf_counter()
model = kmeans.train(util.sample_head(vecs, 100_000), NLIST, seed=42)
print(f"train: {time.perf_counter() - t0:.1f}s", flush=True)
base = tempfile.mkdtemp(prefix=f"cavde_absw_{SHAPE}_{NLIST}_")
results = []
try:
    t0 = time.perf_counter()
    idx = ivf.IVFIndex.build(
        vecs, base, "probe", nlist=NLIST, init=model.centroids, train=False
    )
    print(f"build: {time.perf_counter() - t0:.1f}s", flush=True)
    # everything from here on scans the EPOCH, not `vecs` — pin the query
    # sample, then release the corpus cache BEFORE the sidecar builds: at
    # the 768-d shape the cached 2M x 768 corpus (~6-8 GB of block-manager
    # heap) plus 32 concurrent vectorized epoch readers overflows the 8g
    # driver-JVM heap (java.lang.OutOfMemoryError observed twice in r12;
    # r11's identical run passed — borderline, now deterministic headroom)
    queries = (
        util.sample_head(vecs, NQ)
        .select(F.col("id").alias("query_id"), F.col("vector").alias("qvec"))
        .cache()
    )
    queries.count()
    vecs.unpersist()
    t0 = time.perf_counter()
    IVFSQIndex.build_from_ivf(idx)
    print(f"sq sidecar: {time.perf_counter() - t0:.1f}s", flush=True)
    pq_idx = None
    if with_pq:
        dim = len(queries.select("qvec").first()["qvec"])
        t0 = time.perf_counter()
        pq_idx = IVFPQIndex.build_from_ivf(idx, m=dim // 8, nbits=8, seed=42)
        print(f"pq build (m={dim // 8}): {time.perf_counter() - t0:.1f}s", flush=True)
    idx = ivf.IVFIndex.load(spark, base, "probe")
    assert idx._cascade_handle() is not None

    def run_arm(arm: str, nprobe: int, k: int = 10):
        if arm == "pq":
            return pq_idx.search(
                queries, k=k, nprobe=nprobe, rerank_exact=True, rerank_k=4 * k
            )
        return idx.search(
            queries, k=k, nprobe=nprobe, cascade="sq" if arm == "cascade" else "off"
        )

    arms = ["cascade", "flat"] + (["pq"] if pq_idx is not None else [])
    for nprobe in [int(a) for a in sys.argv[1:]] or default_sweep:
        # mismatch classification vs the exact-flat arm (also warms all
        # arms at this shape before timing)
        collected = {
            arm: {
                (r["query_id"], r["rank"]): (r["id"], round(r["distance"], 6))
                for r in run_arm(arm, nprobe).collect()
            }
            for arm in arms
        }
        b = collected["flat"]
        diffs = {}
        for arm in arms:
            if arm == "flat":
                continue
            a = collected[arm]
            diffs[arm] = {
                "id_diff": sum(1 for kk in b if kk in a and a[kk][0] != b[kk][0]),
                "dist_diff": sum(
                    1 for kk in b if kk in a and abs(a[kk][1] - b[kk][1]) > 1e-9
                ),
                # rows flat returned that this arm did NOT (a dropped
                # (query, rank) is disagreement too — counting it
                # separately keeps id_diff honest instead of silently
                # skipping short results)
                "missing": sum(1 for kk in b if kk not in a),
            }
        samples = {arm: [] for arm in arms}
        for rep in range(REPS):
            for arm in arms:  # interleaved: every arm once per rep
                if COLD:
                    nbytes, shrunk = drop_page_cache(base)
                    print(
                        f"# cold: advised {nbytes / 1e9:.1f} GB out, "
                        f"Cached shrank {shrunk / 1024:.0f} MB",
                        file=sys.stderr, flush=True,
                    )
                t0 = time.perf_counter()
                run_arm(arm, nprobe).count()
                samples[arm].append(time.perf_counter() - t0)
        mins = {arm: min(samples[arm]) for arm in arms}
        row = {
            "nprobe": nprobe,
            "cold": COLD,
            "fraction": round(nprobe / NLIST, 4),
            "sec": {arm: round(mins[arm], 3) for arm in arms},
            "reps": {arm: [round(x, 2) for x in samples[arm]] for arm in arms},
            "speedup_vs_flat": {
                arm: round(mins["flat"] / mins[arm], 2)
                for arm in arms
                if arm != "flat"
            },
            "mismatch_of_10k": diffs,
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    final = {"shape": SHAPE, "n": n, "nlist": NLIST, "cold": COLD,
             "reps": REPS, "rows": results}
    print(json.dumps(final))
    if OUT:
        with open(OUT, "w") as fh:
            json.dump(final, fh, indent=1)
            fh.write("\n")
finally:
    shutil.rmtree(base, ignore_errors=True)
