"""Raw-document ingestion sources and the curated-corpus sink.

A training pipeline's inputs rarely start as tidy parquet: they arrive
as JSONL dumps, CSV exports, and bare text files. These readers give
every format the same landing shape — the `documents` schema the whole
operator surface consumes (doc_id, text, lang, source, n_chars) — with
the ingestion discipline that matters at 100 TB:

- **explicit schemas, never inference.** Schema inference reads the data
  twice and silently drifts when a shard's first file is unrepresentative;
  every reader here passes a fixed StructType.
- **corrupt records are data, not exceptions.** JSONL/CSV read in
  PERMISSIVE mode with a `_corrupt_record` side-channel; `bad_records()`
  filters them for the quarantine sink instead of failing the job.
- **ids are content-free and deterministic.** Files arrive unordered and
  shards re-run; a stable id comes from xxhash64(file, line-offset) —
  reproducible across reruns, no global counter, no zipWithIndex scan.

The sink writes survivors partitioned by (lang, source) — the layout
every downstream mix/sample job prunes on — plus a JSON manifest of
per-partition counts, the artifact handed to the training job.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RAW_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)

RAW_CSV_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def _finalize(df: DataFrame, default_source: str) -> DataFrame:
    """Land any raw reader's output in the documents shape with a
    deterministic content-addressed id (xxhash64 of file + text, masked
    non-negative so ids survive engines that treat ids as unsigned)."""
    did = F.abs(
        F.xxhash64(F.col("_file"), F.coalesce(F.col("text"), F.lit("")))
    )
    return df.select(
        did.alias("doc_id"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        F.coalesce(F.col("lang"), F.lit("und")).alias("lang"),
        F.coalesce(F.col("source"), F.lit(default_source)).alias("source"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("n_chars"),
    )


def read_jsonl(
    spark: SparkSession, path: str, default_source: str = "jsonl"
) -> DataFrame:
    """JSONL documents -> the documents schema. PERMISSIVE: malformed
    lines land with text NULL and `_corrupt_record` set — recover them
    via ``bad_records`` before `_finalize` drops the column."""
    raw = (
        spark.read.schema(RAW_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    ok = raw.filter(F.col("_corrupt_record").isNull())
    return _finalize(ok.withColumn("_file", F.input_file_name()), default_source)


def read_csv(
    spark: SparkSession,
    path: str,
    default_source: str = "csv",
    header: bool = True,
) -> DataFrame:
    """CSV documents -> the documents schema, PERMISSIVE + quarantine
    side-channel, no schema inference (single deterministic pass)."""
    raw = (
        spark.read.schema(RAW_CSV_SCHEMA)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    ok = raw.filter(F.col("_corrupt_record").isNull())
    return _finalize(ok.withColumn("_file", F.input_file_name()), default_source)


def read_text_files(
    spark: SparkSession, path: str, default_source: str = "textfile"
) -> DataFrame:
    """One document per text FILE (wholetext): the layout of book/article
    corpora. lang lands as 'und' — run lang-id downstream."""
    raw = spark.read.text(path, wholetext=True)
    return _finalize(
        raw.select(
            F.col("value").alias("text"),
            F.lit(None).cast("string").alias("lang"),
            F.lit(None).cast("string").alias("source"),
            F.input_file_name().alias("_file"),
        ),
        default_source,
    )


def bad_records(spark: SparkSession, path: str, fmt: str = "json") -> DataFrame:
    """The quarantine side: raw `_corrupt_record` lines from a JSONL/CSV
    landing zone, for audit and re-ingestion after fixes."""
    schema = RAW_JSONL_SCHEMA if fmt == "json" else RAW_CSV_SCHEMA
    reader = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    raw = reader.json(path) if fmt == "json" else reader.csv(path)
    # Spark refuses a query whose only referenced column is the corrupt-
    # record side channel (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — keep a data
    # column in the projection so the scan stays legal
    return raw.filter(F.col("_corrupt_record").isNotNull()).select(
        "_corrupt_record", "text"
    )


def write_corpus(
    df: DataFrame, out_dir: str, partition_cols: "tuple[str, ...]" = ("lang", "source")
) -> dict:
    """Write a curated corpus partitioned by the mix keys and drop a JSON
    manifest of per-partition doc/char counts next to it. Partitioned
    layout means every downstream domain-mix or per-language job prunes
    at the directory level instead of scanning the corpus.

    Returns the manifest dict (also written to ``<out_dir>/_MANIFEST.json``).
    """
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(
        f"{out_dir}/docs"
    )
    stats = (
        df.groupBy(*partition_cols)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .collect()
    )  # bounded: one row per (lang, source) partition
    manifest = {
        "partition_cols": list(partition_cols),
        "partitions": sorted(
            (
                {
                    **{c: r[c] for c in partition_cols},
                    "n_docs": r["n_docs"],
                    "n_chars": int(r["n_chars"] or 0),
                }
                for r in stats
            ),
            key=lambda d: tuple(str(d[c]) for c in partition_cols),
        ),
        "n_docs_total": int(sum(r["n_docs"] for r in stats)),
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(f"{out_dir}/_MANIFEST.json", "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


# ---------------------------------------------------------------------------
# crawled-HTML ingestion (the format real pretraining corpora start from)
# ---------------------------------------------------------------------------
def html_to_text(
    df: DataFrame, html_col: str = "text", out_col: str = "text"
) -> DataFrame:
    """Visible-text extraction over an HTML column: drop script/style/
    comment bodies, strip tags, decode common entities, normalize
    whitespace — the whole chain is Catalyst ``regexp_replace``/
    ``replace`` expressions (functions.text.html_to_text_expr), so
    extraction runs at scan speed inside whole-stage codegen with no
    Python in the path. For full numeric/named entity fidelity compose
    with ``decode_html_entities`` (Arrow-batched ``html.unescape``)."""
    from ..functions import text as TXT

    return df.withColumn(out_col, TXT.html_to_text_expr(html_col))


def decode_html_entities(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Full HTML entity decoding (``html.unescape``: every named entity +
    numeric &#NNN;/&#xHH; forms) as an Arrow-batched mapInPandas pass —
    the slow-path complement to the Catalyst common-entity map. Use it
    AFTER ``html_to_text`` and only when the corpus actually carries
    exotic entities; the batch shape is one string column transform, no
    shuffle."""
    import pandas as pd  # noqa: F401 (mapInPandas contract)

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def unescape(batches):
        import html as _html

        for pdf in batches:
            pdf[text_col] = pdf[text_col].map(
                lambda s: _html.unescape(s) if isinstance(s, str) else s
            )
            yield pdf

    return df.mapInPandas(unescape, schema=fields)


def read_html(
    spark: SparkSession,
    path: str,
    default_source: str = "html",
    lines: bool = False,
) -> DataFrame:
    """One document per HTML FILE -> the documents schema, with ``text``
    the extracted visible text (Catalyst chain) and ``n_chars`` counted
    AFTER extraction. lang lands as 'und' — run lang-id downstream, as
    with read_text_files.

    ``lines=True`` uses the block-aware extraction
    (``html_to_lines_expr``): block-closing tags become newlines so the
    C4 line-level rules (``textops.c4_clean``) have structure to act on;
    the default collapses the page to normalized single-line text."""
    from ..functions import text as TXT

    extract = TXT.html_to_lines_expr if lines else TXT.html_to_text_expr
    raw = spark.read.text(path, wholetext=True)
    return _finalize(
        raw.select(
            extract(F.col("value")).alias("text"),
            F.lit(None).cast("string").alias("lang"),
            F.lit(None).cast("string").alias("source"),
            F.input_file_name().alias("_file"),
        ),
        default_source,
    )
