"""Streaming curation gate — the batch funnel's front stages applied AT
ARRIVAL, so junk never reaches the accumulated corpus.

The batch `operators/curation.curation_funnel` scans a finished corpus;
an ingest pipeline wants the same gates inline: language filter and
quality gate are stateless projections (they stream as-is), and exact
dedup rides the existing `dedup_stream` state store (one long per
distinct fingerprint — the minimum state that gives first-seen-wins
across micro-batches). Near-dedup and decontamination stay out of the
inline gate on purpose: both need corpus-wide candidate joins and run
as the periodic batch stages (`neardup_dedup_stream` keeps its own
band store for the streaming variant).

`gate_metrics_stream` is the funnel accounting for the same source:
cumulative raw/lang/quality counts in update mode — one state row
total, emitted per micro-batch, the live attrition dashboard feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TXT
from .dedup_stream import dedup_stream


def _gate(
    docs: DataFrame, lang: str, min_quality: float, text_col: str,
    quality_expr=None,
) -> DataFrame:
    q = (
        quality_expr
        if quality_expr is not None
        else TXT.quality_score_expr(text_col) >= min_quality
    )
    return docs.filter((F.col("lang") == lang) & q)


def curate_stream(
    docs: DataFrame,
    lang: str = "en",
    min_quality: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality_expr=None,
    pii_classes: "tuple[str, ...] | None" = None,
) -> DataFrame:
    """Survivor stream of the inline curation gate: language + quality
    filters, optional PII redaction, then stateful exact dedup (first
    seen wins across all micro-batches). Emits ``{doc_id, fingerprint}``
    winners in append mode; join back to the payload stream to
    materialize documents.

    ``quality_expr`` swaps the heuristic gate for any boolean Column —
    e.g. the TRAINED model's
    ``classifier.quality_prob_expr(weights) >= tau``: because the learned
    gate is a pure Catalyst expression, it streams exactly like the
    heuristic (stateless projection, no UDF, no extra state).

    ``pii_classes`` (e.g. ``functions.text.PII_CLASSES``) scrubs PII
    BEFORE the dedup fingerprint — same ordering as the batch funnel's
    pii_redact stage, so two documents differing only in their PII spans
    collapse to one winner. A stateless regexp projection: streams with
    zero extra state.
    """
    gated = _gate(docs, lang, min_quality, text_col, quality_expr)
    if pii_classes is not None:
        from ..operators import textops

        gated = textops.pii_redact(
            gated, text_col, classes=tuple(pii_classes)
        ).drop("n_pii")
    return dedup_stream(gated, text_col, id_col)


def gate_metrics_stream(
    docs: DataFrame,
    lang: str = "en",
    min_quality: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Cumulative funnel counters for the gate, as a streaming update-mode
    aggregate: (n_raw, n_lang, n_quality) counting every document ever
    seen, those passing the language filter, and those passing language +
    quality. One global state row — emit per micro-batch, feed the
    dashboard. (Unique-content counts come from the survivor stream's
    row count; state already pays for them there.)"""
    lang_ok = (F.col("lang") == lang).cast("long")
    qual_ok = (
        (F.col("lang") == lang)
        & (TXT.quality_score_expr(text_col) >= min_quality)
    ).cast("long")
    return docs.select(
        F.lit(1).cast("long").alias("raw"),
        lang_ok.alias("lang_ok"),
        qual_ok.alias("qual_ok"),
    ).agg(
        F.sum("raw").alias("n_raw"),
        F.sum("lang_ok").alias("n_lang"),
        F.sum("qual_ok").alias("n_quality"),
    )
