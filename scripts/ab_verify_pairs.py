"""Interleaved A/B: mapInArrow + flat-buffer reshape (r15 default) vs the
r14 mapInPandas per-row materialization in exact_verify_pairs — the shared
verification tail of the bucketed near-dup family (LSH tables, cluster
buckets, semantic dedup).

The candidate volume is B^2/2 per bucket (the bench's weak-similarity LSH
shape emits 1.28M candidate pairs for 141 survivors), so how the (va, vb)
batches become matrices dominates the row-wise distance math. Same
D.rowwise float64 kernel on the same values — asserts bit-identical rows
(ids AND distances) before timing.

    python scripts/ab_verify_pairs.py          # 2 counterbalanced reps/arm
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cuda_acceleratedvectordatabaseengine_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "2"))
    spark = get_spark(app_name="ab-verify-pairs")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(128, numPartitions=32).mapInArrow(lambda it: it, "id long").count()

    from cuda_acceleratedvectordatabaseengine_spark.functions import distance as D
    from cuda_acceleratedvectordatabaseengine_spark.operators import ann
    from cuda_acceleratedvectordatabaseengine_spark.plans import queries as Q
    from cuda_acceleratedvectordatabaseengine_spark.sources import tables

    emb = tables.load(spark, sf_dir, "embeddings")

    def run():
        return ann.lsh_near_dup_pairs(
            emb, tau=Q.COSINE_DUP_TAU, metric=D.COSINE,
            n_planes=4, n_tables=16,
        )

    # bit-identity: ids AND float distances
    rows_by_arm = {}
    for arm in ("arrow", "pandas"):
        ann.VERIFY_PAIRS_IMPL = arm
        ann.shared_cache.release()
        rows_by_arm[arm] = sorted(tuple(r) for r in run().collect())
    assert rows_by_arm["arrow"] == rows_by_arm["pandas"], "arms differ"
    print(f"# identity OK ({len(rows_by_arm['arrow'])} verified pairs)",
          file=sys.stderr)

    samples = {"pandas": [], "arrow": []}
    for rep in range(reps):
        arms = ("pandas", "arrow") if rep % 2 == 0 else ("arrow", "pandas")
        for arm in arms:
            ann.VERIFY_PAIRS_IMPL = arm
            ann.shared_cache.release()
            t0 = time.perf_counter()
            run().count()
            samples[arm].append(round(time.perf_counter() - t0, 3))
    ann.VERIFY_PAIRS_IMPL = "arrow"
    print(json.dumps(
        {
            "metric": "ab_verify_pairs",
            "identical_results": True,
            "samples": samples,
            "ratio_pandas_over_arrow": round(
                min(samples["pandas"]) / min(samples["arrow"]), 3
            ),
        },
        separators=(",", ":"),
    ))


if __name__ == "__main__":
    main()
