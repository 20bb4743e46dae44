"""Interleaved before/after for the r10 ExactSubstr scale-hardening.

OLD (r9): occurrence count = `count(*) over (partition by span)` on the
RAW ~min_len-token span STRING — ~50x the shuffle bytes of an 8-byte key
and an un-splittable single-reducer bound for hot boilerplate spans.
NEW (r10, operators/dedup.py): xxhash64(span) at birth + map-side-
combined groupBy count + LeftSemi join-back (AQE-skew-splittable).

Both forms run in ONE process, arms alternating (this box drifts 2-4x
across runs — PERF.md), on sf0.1 documents at L=8, and must agree on
the per-document coverage aggregate exactly (hash collisions would
surface here as a diff).

    python scripts/ab_span_count.py
    SPARK_GRAFT_AB_REPS=5 python scripts/ab_span_count.py
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.chdir(ROOT)

from pyspark.sql import Window
from pyspark.sql import functions as F

from cuda_acceleratedvectordatabaseengine_spark.functions import text as TXT
from cuda_acceleratedvectordatabaseengine_spark.operators import dedup
from cuda_acceleratedvectordatabaseengine_spark.session import get_spark
from cuda_acceleratedvectordatabaseengine_spark.sources import tables

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))
MIN_LEN = 8


def spans_old(df):
    """The r9 shape, verbatim: raw-string window count."""
    spans = df.select(
        F.col("doc_id"),
        F.posexplode(
            TXT.word_shingles_expr(F.lower(F.col("text")), MIN_LEN, distinct=False)
        ).alias("pos", "span"),
    )
    occ = F.count("*").over(Window.partitionBy("span"))
    dup = (
        spans.withColumn("occ", occ)
        .filter(F.col("occ") >= 2)
        .select(
            "doc_id",
            F.col("pos").alias("start"),
            (F.col("pos") + MIN_LEN).alias("end"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("start")
    prev_end = F.max("end").over(w.rowsBetween(Window.unboundedPreceding, -1))
    brk = F.when(
        prev_end.isNull() | (F.col("start") > prev_end), F.lit(1)
    ).otherwise(F.lit(0))
    island = F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        dup.withColumn("island", island)
        .groupBy("doc_id", "island")
        .agg(
            F.min("start").alias("span_start"),
            F.max("end").alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .drop("island")
    )


def digest(df):
    """Order-free fingerprint of the span relation."""
    return df.agg(
        F.count("*").alias("rows"),
        F.sum("span_start").alias("s0"),
        F.sum("span_end").alias("s1"),
        F.sum("n_windows").alias("nw"),
        F.countDistinct("doc_id").alias("docs"),
    ).collect()[0].asDict()


spark = get_spark(app_name="cavde-ab-span-count")
spark.sparkContext.setLogLevel("ERROR")
docs = tables.load(spark, SF_DIR, "documents").select("doc_id", "text")
docs.cache().count()

arms = {
    "old_string_window": lambda: spans_old(docs),
    "new_hashed_groupby": lambda: dedup.exact_duplicated_spans(docs, min_len=MIN_LEN),
}
# warm both plans once
sig = {name: digest(make()) for name, make in arms.items()}
assert sig["old_string_window"] == sig["new_hashed_groupby"], sig

walls = {name: [] for name in arms}
for rep in range(REPS):
    for name, make in arms.items():
        t0 = time.perf_counter()
        d = digest(make())
        walls[name].append(time.perf_counter() - t0)
        assert d == sig[name], (name, d)

out = {
    "op": "exact_duplicated_spans",
    "sf_dir": SF_DIR,
    "min_len": MIN_LEN,
    "digest": sig["new_hashed_groupby"],
    **{
        f"{name}_sec": [round(t, 3) for t in ts]
        for name, ts in walls.items()
    },
    "min_old": round(min(walls["old_string_window"]), 3),
    "min_new": round(min(walls["new_hashed_groupby"]), 3),
    "identical_results": True,
}
docs.unpersist()
print(json.dumps(out))
