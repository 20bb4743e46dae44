"""Benchmark decontamination: n-gram overlap between a training corpus and
an evaluation/benchmark set.

Standard LLM training-data hygiene (no reference analog — this is
north-star pipeline surface): an eval item is "contaminated" into the
corpus when a training document contains a large fraction of the item's
word n-grams. The canonical procedure (GPT-3 appendix-style 8-gram
collision, loosened here to a containment fraction) is a pure relational
plan:

- distinct word n-gram shingles per side (the same shingling the dedup
  family uses, ``functions/text.word_shingles_expr``);
- an equi-join on the shingle — the benchmark side is tiny by nature and
  broadcasts, so the corpus-side scan is shuffle-free;
- per (doc, bench item) overlap counts and containment =
  overlap / |bench item's shingles|.

At 100 TB the corpus side streams through the broadcast join at scan
speed; nothing here is quadratic. ``decontaminate`` drops the flagged
documents with an anti-join — the filter stage of the pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TXT


def _shingle_sets(
    df: DataFrame, id_col: str, out_id: str, text_col: str, n: int
) -> DataFrame:
    """{out_id, shingle}, distinct per document (word_shingles_expr already
    emits distinct shingles per row)."""
    return df.select(
        F.col(id_col).alias(out_id),
        F.explode(
            TXT.word_shingles_expr(F.lower(F.col(text_col)), n)
        ).alias("shingle"),
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_containment: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """-> {doc_id, bench_id, overlap, containment}: corpus documents that
    contain >= ``min_containment`` of a benchmark item's distinct
    ``n``-gram shingles. ``overlap`` is the shared-shingle count."""
    if not 0.0 <= min_containment <= 1.0:
        raise ValueError(
            f"min_containment must be in [0, 1], got {min_containment}"
        )
    corp = _shingle_sets(corpus, id_col, "doc_id", text_col, n)
    bench = _shingle_sets(benchmark, bench_id_col, "bench_id", bench_text_col, n)
    bsizes = bench.groupBy("bench_id").agg(F.count("*").alias("bn"))
    inter = (
        corp.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("overlap"))
    )
    out = inter.join(F.broadcast(bsizes), "bench_id").select(
        "doc_id",
        "bench_id",
        "overlap",
        (F.col("overlap") / F.col("bn")).alias("containment"),
    )
    return out.filter(F.col("containment") >= min_containment)


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_containment: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """The corpus with contaminated documents removed (anti-join against
    the flagged doc ids)."""
    flagged = contamination_report(
        corpus,
        benchmark,
        n=n,
        min_containment=min_containment,
        text_col=text_col,
        id_col=id_col,
        bench_text_col=bench_text_col,
        bench_id_col=bench_id_col,
    ).select(F.col("doc_id").alias(id_col)).distinct()
    return corpus.join(flagged, id_col, "left_anti")
