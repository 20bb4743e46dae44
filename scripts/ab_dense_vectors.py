"""Interleaved A/B: dense_hashed_vectors "fused" (one exchange, higher-
order densify) vs the r13 "case" pivot (COO + SUM(CASE dim=i) per
dimension), on the flagship pipeline's embed stage shape (sf0.1 document
chunks, dim=64). Asserts both arms produce IDENTICAL vectors first.

    python scripts/ab_dense_vectors.py
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
    spark = get_spark(app_name="ab-dense-vectors")
    spark.range(1000).selectExpr("sum(id)").collect()

    from pyspark.sql import functions as F

    from cuda_acceleratedvectordatabaseengine_spark.operators import (
        textops as TO,
    )
    from cuda_acceleratedvectordatabaseengine_spark.sources import tables

    docs = tables.load(spark, sf_dir, "documents")
    ch = TO.chunk_documents(docs, max_tokens=32, overlap=8).select(
        (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("id"),
        F.col("chunk_text").alias("text"),
    )
    uniq = ch.groupBy(F.lower(F.trim(F.col("text"))).alias("text")).agg(
        F.min("id").alias("id")
    ).cache()
    uniq.count()

    def vecs():
        return TO.dense_hashed_vectors(uniq, dim=64, text_col="text", id_col="id")

    # identity check (exact float equality, both physical forms)
    TO.DENSE_VECTOR_IMPL = "fused"
    a = {r["id"]: tuple(r["vector"]) for r in vecs().collect()}
    TO.DENSE_VECTOR_IMPL = "case"
    b = {r["id"]: tuple(r["vector"]) for r in vecs().collect()}
    assert a == b, (
        f"arms differ: {sum(1 for k in a if a[k] != b.get(k))} ids of {len(a)}"
    )
    arms: dict[str, list[float]] = {"case": [], "fused": []}
    for _ in range(reps):
        for name in ("case", "fused"):
            TO.DENSE_VECTOR_IMPL = name
            t0 = time.perf_counter()
            vecs().write.format("noop").mode("overwrite").save()
            arms[name].append(round(time.perf_counter() - t0, 3))
    TO.DENSE_VECTOR_IMPL = "fused"
    uniq.unpersist()
    print(json.dumps(
        {
            "metric": "ab_dense_vectors",
            "identical_results": True,
            "n_vectors": len(a),
            "samples": arms,
            "ratio_case_over_fused": round(
                min(arms["case"]) / min(arms["fused"]), 3
            ),
        },
        separators=(",", ":"),
    ))


if __name__ == "__main__":
    main()
