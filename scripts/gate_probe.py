"""Scan-speed probe for the corpus gates: how fast do the pure-Catalyst
gate expressions run over real documents on local[32]?

Measures wall-clock for one full pass of each gate over the sf dir's
documents table (doc count scaled up by UNION ALL self-replication to
get multi-second timings), reporting docs/sec. The point being probed:
these gates are scalar expressions inside whole-stage codegen, so their
cost should be a small multiple of the bare scan — the number that
matters when the same expression runs over 100 TB.

Usage: python scripts/gate_probe.py [replicas]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from cuda_acceleratedvectordatabaseengine_spark.functions import text as TXT
    from cuda_acceleratedvectordatabaseengine_spark.functions import urls as U
    from cuda_acceleratedvectordatabaseengine_spark.sources import tables

    base = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    docs = base
    for _ in range(replicas - 1):
        docs = docs.unionByName(base)
    docs = docs.repartition(64).persist()
    n = docs.count()  # materialize once so every gate reads cached rows

    url = (
        "'http://Site' || CAST(doc_id % 50 AS STRING) || '.Com:80/p/' ||"
        " CAST(doc_id % 97 AS STRING) || '?utm_source=x&b=2&a=1#f'"
    )

    gates = {
        "bare_scan": lambda d: d.select(F.length("text").alias("x")),
        "c4_clean": lambda d: d.select(
            F.length(TXT.c4_clean_text_expr("text")).alias("x")
        ),
        "gopher_keep": lambda d: d.select(
            TXT.gopher_keep_expr("text").cast("int").alias("x")
        ),
        "quality_score": lambda d: d.select(
            TXT.quality_score_expr("text").alias("x")
        ),
        "pii_redact": lambda d: d.select(
            F.length(TXT.pii_redact_expr("text")).alias("x")
        ),
        "html_to_lines": lambda d: d.select(
            F.length(TXT.html_to_lines_expr("text")).alias("x")
        ),
        "canonical_url": lambda d: d.select(
            F.length(U.canonical_url_expr(url)).alias("x")
        ),
        "registrable_domain": lambda d: d.select(
            F.length(U.url_domain_expr(url)).alias("x")
        ),
    }
    out = {}
    for name, fn in gates.items():
        t0 = time.perf_counter()
        fn(docs).agg(F.sum("x")).collect()
        dt = time.perf_counter() - t0
        out[name] = {"sec": round(dt, 3), "docs_per_sec": int(n / dt)}
        print(f"{name}: {dt:.3f}s  ({n / dt / 1e6:.2f}M docs/s)", flush=True)
    import json

    print(json.dumps({"n_docs": n, "sf_dir": sf_dir, "gates": out}))


if __name__ == "__main__":
    main()
