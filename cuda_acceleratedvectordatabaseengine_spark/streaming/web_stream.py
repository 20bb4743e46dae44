"""Arrival-time crawl ingest — the batch ``web.ingest_stats`` chain as
a streaming gate.

Every stage except URL dedup is a stateless pure-Catalyst projection or
filter (domain blocklist, HTML->lines extraction, C4 line cleaning, PII
redaction, Gopher gate), so they stream exactly as they run in batch;
URL-level dedup is the one stateful stage, keyed on the canonical URL
through ``dedup_stream(key_expr=)`` (applyInPandasWithState, first-seen
wins).

Ordering note: the batch funnel dedups by URL BEFORE extraction (the
crawl-index discipline — dedup needs only the URL column); at arrival
time the stateless gates run FIRST, so a page that fails the content
gates never claims its canonical-URL key and a later, passing fetch of
the same URL can win it. That is the behavior an incremental crawler
wants; the stream-vs-batch test pins the equivalent batch semantics
(gates first, then keep-smallest-id per canonical URL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions import text as TXT
from ..functions import urls as U
from ..operators import textops
from ..operators.web import filter_domain_blocklist
from .dedup_stream import dedup_stream


def web_ingest_stream(
    manifest: DataFrame,
    blocked=(),
    url_col: str = "url",
    html_col: str = "html",
    id_col: str = "doc_id",
    pii_classes: "tuple[str, ...] | None" = None,
) -> DataFrame:
    """Survivor stream of the crawl ingest gate: one
    ``{doc_id, fingerprint}`` row per first-seen canonical URL among
    documents that passed blocklist + C4 + PII + Gopher. ``fingerprint``
    IS the canonical URL — join back to the payload stream to
    materialize surviving documents (the state output stays narrow on
    purpose, mirroring ``dedup_stream``)."""
    gated = filter_domain_blocklist(manifest, blocked, url_col=url_col)
    gated = textops.c4_clean(
        gated.withColumn("text", TXT.html_to_lines_expr(html_col)),
        text_col="text",
        keep_only=True,
    ).drop("n_lines_kept")
    gated = textops.pii_redact(
        gated, classes=tuple(pii_classes) if pii_classes else None
    ).drop("n_pii")
    gated = textops.gopher_filter(gated)
    return dedup_stream(
        gated, id_col=id_col, key_expr=U.canonical_url_expr(url_col)
    )
