"""Interleaved A/B: one-exchange T4 merge (repartition(query_id) +
min-aggregate dedup) vs the r13 two-window merge (Exchange(query_id,id)
row_number dedup + Exchange(query_id) rank window), on the bench's steady
1000-query nprobe=8 search. Also asserts both arms return IDENTICAL rows.

    python scripts/ab_topk_merge.py            # 3 alternating reps per arm
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))
    spark = get_spark(app_name="ab-topk-merge")
    spark.range(1000).selectExpr("sum(id)").collect()

    from pyspark.sql import functions as F

    import bench
    from cuda_acceleratedvectordatabaseengine_spark.operators import (
        ivf,
        kmeans,
        knn,
    )

    vecs = bench.derived_vectors(spark, sf_dir).cache()
    vecs.count()
    model = kmeans.train(util.sample_head(vecs, 100_000), 128, seed=42)
    base = tempfile.mkdtemp(prefix="cavde_ab_topk_")
    try:
        idx = ivf.IVFIndex.build(
            vecs, base, "abtk", nlist=128, init=model.centroids, train=False
        )
        queries = (
            vecs.orderBy("id").limit(1000)
            .select(F.col("id").alias("query_id"), F.col("vector").alias("qvec"))
        )
        # result-identity check first (also warms both plans)
        knn.TOPK_SINGLE_EXCHANGE = True
        a = {tuple(r) for r in idx.search(queries, k=10, nprobe=8).collect()}
        knn.TOPK_SINGLE_EXCHANGE = False
        b = {tuple(r) for r in idx.search(queries, k=10, nprobe=8).collect()}
        assert a == b, f"arms differ: {len(a ^ b)} rows"
        arms: dict[str, list[float]] = {"two_window": [], "one_exchange": []}
        for _ in range(reps):
            for name, flag in (("two_window", False), ("one_exchange", True)):
                knn.TOPK_SINGLE_EXCHANGE = flag
                t0 = time.perf_counter()
                idx.search(queries, k=10, nprobe=8).count()
                arms[name].append(round(time.perf_counter() - t0, 3))
    finally:
        knn.TOPK_SINGLE_EXCHANGE = True
        shutil.rmtree(base, ignore_errors=True)
        vecs.unpersist()
    print(json.dumps(
        {
            "metric": "ab_topk_merge",
            "identical_results": True,
            "samples": arms,
            "ratio_two_window_over_one_exchange": round(
                min(arms["two_window"]) / min(arms["one_exchange"]), 3
            ),
        },
        separators=(",", ":"),
    ))


if __name__ == "__main__":
    main()
