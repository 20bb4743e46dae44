"""Interleaved A/B: one-exchange group-explode candidate-pair generation
(util.bucket_candidate_pairs, r15 default) vs the r14 self-join shape
(hot-bucket count pass + broadcast anti-join + equi-self-join + distinct)
for the whole bucket-LSH family: minhash bands (dedup.lsh_candidate_pairs),
simhash blocks (dedup.simhash_near_pairs), hyperplane LSH tables
(ann.lsh_near_dup_pairs) and cluster buckets (ann.cluster_near_dup_pairs).

Asserts the FULL RESULT ROWS of the four catalog specs that exercise those
callers are identical between arms, then times them interleaved in one
process (house drift protocol) with every operator cache released between
runs.

    python scripts/ab_bucket_pairs.py          # 2 alternating reps per arm
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cuda_acceleratedvectordatabaseengine_spark import util
from cuda_acceleratedvectordatabaseengine_spark.session import get_spark

ROWS = [
    "dedup_minhash_lsh",   # dedup.lsh_candidate_pairs (minhash bands)
    "dedup_simhash",       # dedup.simhash_near_pairs (payload variant)
    "dedup_lsh_recall",    # ann.lsh_near_dup_pairs (hyperplane tables)
    "dedup_cluster_blocked",  # ann.cluster_near_dup_pairs (cluster buckets)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "2"))
    spark = get_spark(app_name="ab-bucket-pairs")
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

    # --- result identity: full output rows of each spec, both arms ---
    for name in ROWS:
        rows_by_arm = {}
        for arm in ("group_explode", "self_join"):
            util.BUCKET_PAIRS_IMPL = arm
            reset()
            df = specs[name].spark(spark, sf_dir)
            rows_by_arm[arm] = sorted(
                tuple(r) for r in df.collect()
            )
        assert rows_by_arm["group_explode"] == rows_by_arm["self_join"], (
            f"{name}: arms differ "
            f"({len(rows_by_arm['group_explode'])} vs "
            f"{len(rows_by_arm['self_join'])} rows)"
        )
        print(f"# identity OK: {name} ({len(rows_by_arm['self_join'])} rows)",
              file=sys.stderr)

    # --- interleaved timing ---
    samples: dict[str, dict[str, list[float]]] = {
        n: {"self_join": [], "group_explode": []} for n in ROWS
    }
    for _ in range(reps):
        for arm in ("self_join", "group_explode"):
            util.BUCKET_PAIRS_IMPL = arm
            for name in ROWS:
                reset()
                t0 = time.perf_counter()
                specs[name].spark(spark, sf_dir).count()
                samples[name][arm].append(round(time.perf_counter() - t0, 3))
    util.BUCKET_PAIRS_IMPL = "group_explode"

    out = {"metric": "ab_bucket_pairs", "identical_results": True,
           "samples": samples, "ratio_self_join_over_group_explode": {}}
    for name in ROWS:
        out["ratio_self_join_over_group_explode"][name] = round(
            min(samples[name]["self_join"])
            / min(samples[name]["group_explode"]), 3)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
