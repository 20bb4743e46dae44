"""A/B: process-pooled pairwise workspace (distance.task_workspace) vs the
r13 per-task workspace, on the bench's steady 1000-query nprobe=8 search.

Arm is the SPARK_GRAFT_WS_PERSIST env var (read at import time on driver
AND workers), so each arm is its own process; the caller alternates:

    for i in 1 2; do
        SPARK_GRAFT_WS_PERSIST=0 python scripts/ab_ws_persist.py
        SPARK_GRAFT_WS_PERSIST=1 python scripts/ab_ws_persist.py
    done

Prints one JSON line: per-rep steady-search walls (first rep after an
untimed warm) — the pool's claim is that reps stop re-faulting their
score blocks, so later reps should flatten.
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
    arm = os.environ.get("SPARK_GRAFT_WS_PERSIST", "1")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "6"))
    spark = get_spark(app_name=f"ab-ws-{arm}")
    spark.range(1000).selectExpr("sum(id)").collect()

    from pyspark.sql import functions as F

    import bench
    from cuda_acceleratedvectordatabaseengine_spark.operators import ivf, kmeans

    vecs = bench.derived_vectors(spark, sf_dir).cache()
    vecs.count()
    model = kmeans.train(util.sample_head(vecs, 100_000), 128, seed=42)
    base = tempfile.mkdtemp(prefix="cavde_ab_ws_")
    try:
        idx = ivf.IVFIndex.build(
            vecs, base, "abws", nlist=128, init=model.centroids, train=False
        )
        queries = (
            vecs.orderBy("id").limit(1000)
            .select(F.col("id").alias("query_id"), F.col("vector").alias("qvec"))
        )
        idx.search(queries, k=10, nprobe=8).count()  # warm (plan + workers)
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            idx.search(queries, k=10, nprobe=8).count()
            walls.append(round(time.perf_counter() - t0, 3))
    finally:
        shutil.rmtree(base, ignore_errors=True)
        vecs.unpersist()
    print(json.dumps(
        {"arm_ws_persist": arm, "steady_search_reps": walls,
         "min": min(walls)},
        separators=(",", ":"),
    ))


if __name__ == "__main__":
    main()
