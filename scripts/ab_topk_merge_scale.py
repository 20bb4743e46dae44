"""Scale arm of the one-exchange T4 merge A/B: 4.8M x 64-d synthetic
vectors (the r5 scale-probe shape), nlist=1024, 1000 queries, nprobe 16
and full-probe — does removing the second merge exchange still win when
the candidate relation is real (1000 queries x 1024 lists)?

Same protocol as scripts/ab_topk_merge.py: arms alternate in one process,
result identity asserted first.

    python scripts/ab_topk_merge_scale.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cuda_acceleratedvectordatabaseengine_spark import util
from cuda_acceleratedvectordatabaseengine_spark.session import get_spark


def main() -> None:
    n = int(os.environ.get("SPARK_GRAFT_SCALE_N", 4_800_000))
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))
    spark = get_spark(app_name="ab-topk-merge-scale")
    spark.range(1000).selectExpr("sum(id)").collect()

    from pyspark.sql import functions as F

    from cuda_acceleratedvectordatabaseengine_spark.operators import (
        ivf,
        kmeans,
        knn,
    )

    dim, nlist, k = 64, 1024, 10
    comps = [
        (
            F.pmod(F.xxhash64("id", F.lit(i)), F.lit(1_000_000))
            / F.lit(500_000.0)
            - F.lit(1.0)
        ).cast("float")
        for i in range(dim)
    ]
    vecs = (
        spark.range(n, numPartitions=64)
        .select(F.col("id"), F.array(*comps).alias("vector"))
        .cache()
    )
    vecs.count()
    model = kmeans.train(util.sample_head(vecs, 100_000), nlist, seed=42)
    base = tempfile.mkdtemp(prefix="cavde_ab_tkscale_")
    out = {"metric": "ab_topk_merge_scale", "n_vectors": n, "nlist": nlist}
    try:
        idx = ivf.IVFIndex.build(
            vecs, base, "abtks", nlist=nlist, init=model.centroids,
            train=False,
        )
        queries = (
            vecs.filter(F.col("id") < 1000)
            .select(F.col("id").alias("query_id"), F.col("vector").alias("qvec"))
        )
        for label, nprobe in (("nprobe16", 16), ("fullprobe", nlist)):
            knn.TOPK_SINGLE_EXCHANGE = True
            a = {tuple(r) for r in idx.search(queries, k=k, nprobe=nprobe).collect()}
            knn.TOPK_SINGLE_EXCHANGE = False
            b = {tuple(r) for r in idx.search(queries, k=k, nprobe=nprobe).collect()}
            assert a == b, f"{label}: arms differ by {len(a ^ b)} rows"
            arms: dict[str, list[float]] = {"two_window": [], "one_exchange": []}
            for _ in range(reps):
                for name, flag in (("two_window", False), ("one_exchange", True)):
                    knn.TOPK_SINGLE_EXCHANGE = flag
                    t0 = time.perf_counter()
                    idx.search(queries, k=k, nprobe=nprobe).count()
                    arms[name].append(round(time.perf_counter() - t0, 3))
            out[label] = {
                "samples": arms,
                "ratio_two_window_over_one_exchange": round(
                    min(arms["two_window"]) / min(arms["one_exchange"]), 3
                ),
            }
    finally:
        knn.TOPK_SINGLE_EXCHANGE = True
        shutil.rmtree(base, ignore_errors=True)
        vecs.unpersist()
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
