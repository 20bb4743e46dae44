"""A/B: spark.io.compression.codec=zstd vs lz4 (the default) at a scale
where shuffle bytes are real (guide §2.3: "no universal answer — measure").

The engine's dominant shuffle is the epoch-build routing exchange (every
vector moves once to its list) plus the per-search candidate merges; the
payload is float32 arrays (high-entropy mantissas), the case where zstd's
better ratio may not pay for its CPU. One arm per process (the shuffle
codec is cluster conf, not SQLConf), alternated by the caller:

    python scripts/ab_shuffle_codec.py synth [target_n]   # once, shared
    for i in 1 2; do
        python scripts/ab_shuffle_codec.py lz4
        python scripts/ab_shuffle_codec.py zstd
    done

Both arms read the SAME synthesized parquet corpus ($CAVDE_AB_CODEC_DIR,
default /tmp/cavde_ab_codec). Measures: a pure key-shuffle noop pass, the
epoch build (routing exchange + parquet write), and 3 steady searches at
nprobe=32. Result identity: compression changes bytes on the wire, not
values (Spark's shuffle is codec-transparent); search results are
additionally count-checked against the arm-independent expected row count.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cuda_acceleratedvectordatabaseengine_spark.session import get_spark

WORK = os.environ.get("CAVDE_AB_CODEC_DIR", "/tmp/cavde_ab_codec")
TARGET = 12_600_000
NLIST = 1024
NPROBE = 32


def synth(target_n: int) -> None:
    from pyspark.sql import functions as F

    from bench import derived_vectors

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-codec-synth")
    base = derived_vectors(spark, sf_dir)
    n_base = base.count()
    scale = max(1, (target_n + n_base - 1) // n_base)
    os.makedirs(WORK, exist_ok=True)
    path = os.path.join(WORK, "corpus")
    if os.path.exists(path):
        shutil.rmtree(path)
    (
        base.select(
            F.explode(F.sequence(F.lit(0), F.lit(scale - 1))).alias("leg"),
            "id", "vector",
        )
        .select((F.col("id") + F.col("leg") * n_base).alias("id"), "vector")
        .repartition(128)
        .write.parquet(path)
    )
    print(f"# synthesized {spark.read.parquet(path).count()} vectors -> {path}",
          file=sys.stderr)


def main() -> None:
    arm = sys.argv[1] if len(sys.argv) > 1 else "lz4"
    if arm == "synth":
        synth(int(sys.argv[2]) if len(sys.argv) > 2 else TARGET)
        return
    from pyspark.sql import functions as F

    from cuda_acceleratedvectordatabaseengine_spark import util
    from cuda_acceleratedvectordatabaseengine_spark.operators import ivf, kmeans

    spark = get_spark(
        app_name=f"ab-codec-{arm}",
        extra_conf={"spark.io.compression.codec": arm},
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    vecs = spark.read.parquet(os.path.join(WORK, "corpus"))
    n = vecs.count()

    out: dict = {"arm": arm, "n": n}
    # 1. pure key-shuffle pass (the isolation control): every byte through
    # one exchange, discarded by the noop sink (guide §1.4)
    t0 = time.perf_counter()
    (
        vecs.repartition(64, F.pmod(F.xxhash64("id"), F.lit(6400)))
        .write.format("noop").mode("overwrite").save()
    )
    out["pure_shuffle_sec"] = round(time.perf_counter() - t0, 2)

    # 2. the real workload: train once (driver-side, codec-independent,
    # not timed), then the epoch build's routing exchange + parquet write
    model = kmeans.train(util.sample_head(vecs, 200_000), NLIST, seed=42)
    work = tempfile.mkdtemp(prefix=f"cavde_ab_codec_{arm}_")
    try:
        t0 = time.perf_counter()
        idx = ivf.IVFIndex.build(
            vecs, work, "abcodec", nlist=NLIST, init=model.centroids,
            train=False,
        )
        out["epoch_build_sec"] = round(time.perf_counter() - t0, 2)
        queries = (
            vecs.filter(F.col("id") < 1000).orderBy("id").limit(1000)
            .select(F.col("id").alias("query_id"),
                    F.col("vector").alias("qvec"))
            .cache()
        )
        queries.count()
        t0 = time.perf_counter()
        n_res = idx.search(queries, k=10, nprobe=NPROBE).count()
        out["search_cold_sec"] = round(time.perf_counter() - t0, 2)
        steady = []
        for _ in range(3):
            t0 = time.perf_counter()
            assert idx.search(queries, k=10, nprobe=NPROBE).count() == n_res
            steady.append(round(time.perf_counter() - t0, 2))
        out["search_steady_sec"] = steady
        out["n_results"] = n_res
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
