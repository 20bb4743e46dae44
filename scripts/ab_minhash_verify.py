"""Interleaved A/B: array_intersect exact-Jaccard verification for
minhash_dedup_pairs (r15 default — persist the per-doc shingle-array
relation the signature kernel consumes anyway; verify candidates with
size(array_intersect)) vs the r14 flat shingle-table shape (persist the
flat table, two joins back to it + per-pair groupBy + two size joins).

Asserts the FULL RESULT ROWS of the exercising catalog specs are
identical between arms, then times them interleaved in one process.

    python scripts/ab_minhash_verify.py       # 2 alternating reps per arm
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cuda_acceleratedvectordatabaseengine_spark.session import get_spark

ROWS = ["dedup_minhash_lsh", "dedup_clusters", "pipeline_curation_funnel"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "2"))
    spark = get_spark(app_name="ab-minhash-verify")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(128, numPartitions=32).mapInArrow(lambda it: it, "id long").count()

    from cuda_acceleratedvectordatabaseengine_spark.operators import ann, dedup
    from cuda_acceleratedvectordatabaseengine_spark.plans import queries as Q

    specs = Q.all_specs()

    def reset() -> None:
        dedup.shared_cache.release()
        ann.shared_cache.release()
        Q._INDEX_CACHE.clear()
        spark.catalog.clearCache()

    for name in ROWS:
        rows_by_arm = {}
        for arm in ("array_intersect", "shingle_join"):
            dedup.MINHASH_VERIFY_IMPL = arm
            reset()
            rows_by_arm[arm] = sorted(
                tuple(r) for r in specs[name].spark(spark, sf_dir).collect()
            )
        assert rows_by_arm["array_intersect"] == rows_by_arm["shingle_join"], (
            f"{name}: arms differ"
        )
        print(f"# identity OK: {name} ({len(rows_by_arm['shingle_join'])} rows)",
              file=sys.stderr)

    samples: dict[str, dict[str, list[float]]] = {
        n: {"shingle_join": [], "array_intersect": []} for n in ROWS
    }
    # counterbalanced arm order per rep to cancel monotonic drift
    for rep in range(reps):
        arms = ("shingle_join", "array_intersect")
        if rep % 2:
            arms = tuple(reversed(arms))
        for arm in arms:
            dedup.MINHASH_VERIFY_IMPL = arm
            for name in ROWS:
                reset()
                t0 = time.perf_counter()
                specs[name].spark(spark, sf_dir).count()
                samples[name][arm].append(round(time.perf_counter() - t0, 3))
    dedup.MINHASH_VERIFY_IMPL = "array_intersect"

    out = {"metric": "ab_minhash_verify", "identical_results": True,
           "samples": samples, "ratio_shingle_join_over_array_intersect": {}}
    for name in ROWS:
        out["ratio_shingle_join_over_array_intersect"][name] = round(
            min(samples[name]["shingle_join"])
            / min(samples[name]["array_intersect"]), 3)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
