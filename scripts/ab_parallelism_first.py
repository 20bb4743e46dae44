"""Interleaved A/B: spark.sql.adaptive.coalescePartitions.parallelismFirst
false (r15 default — AQE respects advisoryPartitionSizeInBytes, the Spark
docs' own recommendation) vs true (the pre-r15 inherited default, which
coalesces every small shuffle to ~defaultParallelism near-empty partitions).

Motivation (OPTIMIZATION_r15.md): with parallelismFirst=true a TINY cached
relation built through a shuffle keeps 32 partitions, so every downstream
stage schedules 32 near-empty tasks — one cold LSH candidate count over 914
signatures ran 8 AQE jobs x ~3 stages x 32 tasks for 18 result rows.

The flag is runtime-settable (SQLConf), so both arms run interleaved in one
process over a representative catalog slice with all operator caches
released between runs. Result identity per row is guaranteed by the AQE
contract (coalescing changes partitioning, not values) and re-checked by
the full oracle drive (scripts/verify_contract.py) after the flip.

    python scripts/ab_parallelism_first.py     # 2 alternating reps per arm
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cuda_acceleratedvectordatabaseengine_spark.session import get_spark

ROWS = [
    "pipeline_curation_funnel",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "ivf_search_fullprobe",
    "q2_knn_l2",
    "events_sessionization",
    "pipeline_pack_sequences",
    "text_bpe_pair_counts",
    "retrieval_quality_metrics",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "2"))
    spark = get_spark(app_name="ab-parallelism-first")
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

    def run_slice() -> dict:
        per = {}
        for name in ROWS:
            t0 = time.perf_counter()
            specs[name].spark(spark, sf_dir).count()
            per[name] = round(time.perf_counter() - t0, 2)
        return per

    # one untimed warm pass so neither arm pays first-touch/codegen alone
    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst", "true"
    )
    reset()
    run_slice()

    arms: dict[str, list[dict]] = {"true": [], "false": []}
    for _ in range(reps):
        for arm in ("true", "false"):
            spark.conf.set(
                "spark.sql.adaptive.coalescePartitions.parallelismFirst", arm
            )
            reset()
            arms[arm].append(run_slice())
    totals = {a: [round(sum(p.values()), 2) for p in runs] for a, runs in arms.items()}
    print(json.dumps({
        "metric": "ab_parallelism_first",
        "rows": ROWS,
        "totals_sec": totals,
        "per_run": arms,
        "ratio_true_over_false": round(
            min(totals["true"]) / min(totals["false"]), 3
        ),
    }, separators=(",", ":")))


if __name__ == "__main__":
    main()
