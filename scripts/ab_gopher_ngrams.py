"""Interleaved A/B: gopher_ngram_rules single-scan tagged-explode (r14) vs
the r13 nine-branch union (inlined replica below), on the
text_ngram_repetition fixture at the bench scale factor. Asserts the rule
booleans are identical first.

    python scripts/ab_gopher_ngrams.py
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
    spark = get_spark(app_name="ab-gopher-ngrams")
    spark.range(1000).selectExpr("sum(id)").collect()

    from pyspark.sql import functions as F

    from cuda_acceleratedvectordatabaseengine_spark.functions import text as TXT
    from cuda_acceleratedvectordatabaseengine_spark.operators import textops
    from cuda_acceleratedvectordatabaseengine_spark.plans import queries as Q
    from cuda_acceleratedvectordatabaseengine_spark.sources import tables

    pages = tables.load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(Q._NGRAM_FIXTURE).alias("page")
    )

    def long_r13():
        # the r13 shape: one scan branch per shingle length, unioned
        long = None
        for _name, (n, _t, _k) in textops.GOPHER_NGRAM_RULES.items():
            part = pages.select(
                F.col("doc_id").alias("__id"),
                F.lit(n).alias("__n"),
                F.explode(
                    TXT.word_shingles_expr(
                        F.lower(F.col("page")), n, distinct=False
                    )
                ).alias("__s"),
            )
            long = part if long is None else long.unionByName(part)
        return long

    def rules_r13():
        per = (
            long_r13()
            .groupBy("__id", "__n", "__s")
            .agg(F.count("*").alias("__c"))
            .groupBy("__id", "__n")
            .agg(
                F.sum("__c").alias("__total"),
                F.count("*").alias("__dist"),
                F.max("__c").alias("__top"),
            )
        )
        aggs = []
        for name, (n, t, kind) in textops.GOPHER_NGRAM_RULES.items():
            mass = (
                F.col("__top")
                if kind == "top"
                else F.col("__total") - F.col("__dist")
            )
            ok = 100 * mass <= t * F.col("__total")
            aggs.append(
                F.coalesce(
                    F.min(F.when(F.col("__n") == n, ok)), F.lit(True)
                ).alias(name)
            )
        rules = per.groupBy("__id").agg(*aggs)
        out = pages.join(
            rules.withColumnRenamed("__id", "doc_id"), "doc_id", "left"
        )
        keep = F.lit(True)
        for name in textops.GOPHER_NGRAM_RULES:
            out = out.withColumn(name, F.coalesce(F.col(name), F.lit(True)))
            keep = keep & F.col(name)
        return out.withColumn("ngram_keep", keep)

    cols = ["doc_id", *textops.GOPHER_NGRAM_RULES, "ngram_keep"]
    new = textops.gopher_ngram_rules(pages, text_col="page").select(*cols)
    old = rules_r13().select(*cols)
    a = {tuple(r) for r in new.collect()}
    b = {tuple(r) for r in old.collect()}
    assert a == b, f"arms differ: {len(a ^ b)} rows"
    arms: dict[str, list[float]] = {"r13_union": [], "r14_single_scan": []}
    for _ in range(reps):
        for name, df in (("r13_union", old), ("r14_single_scan", new)):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            arms[name].append(round(time.perf_counter() - t0, 3))
    print(json.dumps(
        {
            "metric": "ab_gopher_ngrams",
            "identical_results": True,
            "n_docs": len(a),
            "samples": arms,
            "ratio_union_over_single_scan": round(
                min(arms["r13_union"]) / min(arms["r14_single_scan"]), 3
            ),
        },
        separators=(",", ":"),
    ))


if __name__ == "__main__":
    main()
