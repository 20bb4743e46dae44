"""Document-analysis operators over the ``documents`` table: token
counting, quality scoring, language ID, fingerprinting. All pure Catalyst
expressions from functions.text — a single projection, no shuffle, fully
codegen'd; the shape that runs unchanged over 100 TB of text."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TXT


def analyze_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds the standard analysis columns in one projection."""
    return df.select(
        "*",
        TXT.token_count_expr(text_col).alias("token_cnt"),
        F.length(F.col(text_col)).alias("char_cnt"),
        TXT.non_alpha_ratio_expr(text_col).alias("non_alpha_ratio"),
        TXT.stopword_ratio_expr(text_col).alias("stopword_ratio"),
        TXT.quality_score_expr(text_col).alias("quality_score"),
        TXT.lang_id_expr(text_col).alias("lang_pred"),
        TXT.doc_fingerprint_expr(text_col).alias("fingerprint"),
        TXT.content_hash64_expr(text_col).alias("content_hash"),
    )


def language_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    return (
        analyze_documents(df, text_col)
        .groupBy("lang_pred")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.avg("token_cnt"), 6).alias("avg_tokens"),
            F.round(F.avg("quality_score"), 6).alias("avg_quality"),
        )
        .orderBy("lang_pred")
    )


def quality_filter(
    df: DataFrame, min_score: float = 0.1, text_col: str = "text"
) -> DataFrame:
    """Training-data quality gate: drop low-quality documents."""
    return df.filter(TXT.quality_score_expr(text_col) >= min_score)
