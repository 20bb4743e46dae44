"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {"q1_scan_filter": sec, ...}, "sf": 0.1}

Mirrors the reference's bench surface (bench/benchmark.cpp:170-197 reports
train/add/search seconds + QPS); here each catalog query is timed to first
full materialization (count of a fused plan — no driver-side collect of
payload rows, so timing measures cluster work, not result transfer).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cuda_acceleratedvectordatabaseengine_spark.plans import queries as Q
from cuda_acceleratedvectordatabaseengine_spark.session import get_spark

# Every oracle-checked catalog query runs; the heavy approximate ones
# (pq_recall_rerank builds a PQ codebook per call) are in too — they are the
# engine's reason to exist. Order: cheap relational first, vector ops after,
# so a crash still reports the basics.
HEADLINE = [
    "q1_scan_filter",
    "q6_topk_per_group",
    "q7_distinct_count",
    "q9_agg_pricing",
    "q10_join_metadata",
    "q12_events_hourly",
    "q2_knn_l2",
    "q3_knn_ip",
    "q4_knn_cosine",
    "ann_cosine_topk",
    "q5_assign_counts",
    "q8_lloyd_update",
    "ivf_search_fullprobe",
    "ivf_recall_nprobe2",
    "pq_recall_rerank",
    "q11_embedding_near_dup",
    "dedup_exact_stats",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_token_stats",
    "text_quality_scores",
    "text_lang_id",
]


def sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="cavde-bench")
    # Warm the JVM + parquet footer caches outside the timed region.
    spark.range(1000).selectExpr("sum(id)").collect()

    specs = Q.all_specs()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = specs.get(name)
        if spec is None:
            continue
        t0 = time.perf_counter()
        try:
            n = spec.spark(spark, sf_dir).count()
            timings[name] = round(time.perf_counter() - t0, 3)
            print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)
        except Exception as e:  # keep benching; a failed query reports -1
            timings[name] = -1.0
            print(f"# {name}: FAILED {e}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_of(sf_dir),
            }
        )
    )


if __name__ == "__main__":
    main()
