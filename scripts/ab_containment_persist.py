"""Interleaved A/B: containment_pairs with the shingle table persisted
through the shared registry (r14) vs the r13 unpersisted form whose three
plan branches (both self-join sides + sizes) each re-run the
tokenize/shingle/hash pass. Asserts identical pairs first; shared_cache is
released before every rep so each sample measures a COLD first call.

    python scripts/ab_containment_persist.py
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
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))
    spark = get_spark(app_name="ab-containment")
    spark.range(1000).selectExpr("sum(id)").collect()

    from pyspark.sql import functions as F

    from cuda_acceleratedvectordatabaseengine_spark.operators import dedup
    from cuda_acceleratedvectordatabaseengine_spark.sources import tables

    docs = tables.load(spark, sf_dir, "documents")

    def pairs_r13():
        # the r13 shape: same logic, shingle table NOT persisted
        sh = dedup._shingle_table(docs, "text", "doc_id", 3, None)
        sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
        a = sh.select(F.col("doc_id").alias("ia"), "shingle")
        b = sh.select(F.col("doc_id").alias("ib"), "shingle")
        sized = (
            a.join(b, "shingle")
            .filter(F.col("ia") < F.col("ib"))
            .groupBy("ia", "ib")
            .agg(F.count("*").alias("c"))
            .join(sizes.select(F.col("doc_id").alias("ia"),
                               F.col("n_sh").alias("na")), "ia")
            .join(sizes.select(F.col("doc_id").alias("ib"),
                               F.col("n_sh").alias("nb")), "ib")
        )
        dir_a = sized.select(
            F.col("ia").alias("inner_id"), F.col("ib").alias("outer_id"),
            (F.col("c") / F.col("na")).alias("containment"),
        )
        dir_b = sized.select(
            F.col("ib").alias("inner_id"), F.col("ia").alias("outer_id"),
            (F.col("c") / F.col("nb")).alias("containment"),
        )
        return dir_a.unionByName(dir_b).filter(F.col("containment") >= 0.5)

    def pairs_r14():
        return dedup.containment_pairs(docs, tau=0.5, n=3)

    a = {tuple(r) for r in pairs_r14().collect()}
    dedup.shared_cache.release()
    b = {tuple(r) for r in pairs_r13().collect()}
    assert a == b, f"arms differ: {len(a ^ b)} rows"
    arms: dict[str, list[float]] = {"r13_unpersisted": [], "r14_persisted": []}
    for _ in range(reps):
        for name, fn in (("r13_unpersisted", pairs_r13),
                         ("r14_persisted", pairs_r14)):
            dedup.shared_cache.release()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            arms[name].append(round(time.perf_counter() - t0, 3))
    dedup.shared_cache.release()
    print(json.dumps(
        {
            "metric": "ab_containment_persist",
            "identical_results": True,
            "n_pairs": len(a),
            "samples": arms,
            "ratio_unpersisted_over_persisted": round(
                min(arms["r13_unpersisted"]) / min(arms["r14_persisted"]), 3
            ),
        },
        separators=(",", ":"),
    ))


if __name__ == "__main__":
    main()
