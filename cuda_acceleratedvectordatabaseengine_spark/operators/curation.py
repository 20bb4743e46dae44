"""End-to-end corpus curation funnel — the engine's verbs composed into
the pipeline a training-data team actually runs, with per-stage attrition
accounting.

Stage order follows the published pipelines (C4, The Pile, RefinedWeb):
language filter -> quality gate -> exact dedup -> near dedup ->
benchmark decontamination -> domain mixing. Each stage consumes the
previous stage's survivors; the output is the funnel table
(stage, name, n_docs, n_tokens) that tells you where your tokens went —
the first artifact anyone asks for when a mix looks wrong.

Composition notes:
- every stage is one of this package's already-oracled operators
  (``dedup.dedup_exact``, ``dedup.minhash_dedup_pairs``,
  ``decontam.decontaminate``, ``sampling.domain_mix_sample``) — the
  funnel adds accounting, not new semantics;
- near-dup survivors use the greedy keep-smallest-id rule (drop the
  larger id of every verified pair). Unlike full connected-component
  resolution (``dedup.resolve_duplicates``) this is a single anti-join
  and deterministic in any engine; for transitive cluster semantics run
  the CC path instead;
- the three expensive intermediates (exact-dedup survivors, near-dedup
  survivors, decontaminated survivors) go through the bounded
  ``dedup.shared_cache`` so the seven per-stage aggregates do not
  re-evaluate the minhash/shingle lineage once per stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TXT


STAGES = (
    "raw",
    "lang",
    "quality",
    "exact_dedup",
    "near_dedup",
    "decontam",
    "domain_mix",
)


def curation_funnel(
    docs: DataFrame,
    benchmark: DataFrame,
    lang: str = "en",
    min_quality: float = 0.5,
    near_threshold: float = 0.7,
    target_weights: "dict | None" = None,
    salt: str = "funnel",
    shingle_n: int = 3,
    pii_classes: "tuple[str, ...] | None" = None,
    c4_rules: bool = False,
    gopher: bool = False,
    near_max_bucket_size: "int | None" = 10_000,
    near_max_shingle_doc_freq: "int | None" = None,
) -> DataFrame:
    """Run the full curation pipeline over ``docs`` EAGERLY — every stage
    executes at call time (minutes at corpus scale) — and return the
    driver-materialized funnel table (stage int, name, n_docs, n_tokens,
    stage_sec). This is an EXECUTION verb, not a plan builder: the result
    does not re-derive from later changes to ``docs``; call again for a
    fresh funnel. Use the individual stage operators directly to compose
    a lazy pipeline without funnel accounting.

    ``benchmark`` is the held-out eval set for decontamination
    (columns: bench_id, text). ``target_weights=None`` mixes sources
    uniformly (largest exact-proportion subset).

    ``pii_classes`` (e.g. ``functions.text.PII_CLASSES``) inserts a
    ``pii_redact`` stage after the quality gate: documents are
    TRANSFORMED (PII spans replaced by class tokens), never dropped, so
    n_docs is flat across the stage while n_tokens may move; every later
    stage (dedup hashes, shingles, decontamination) operates on the
    redacted text — the order published scrub pipelines use, so a doc
    differing only in its PII spans dedups as the duplicate it is.
    None (default) keeps the classic stage list unchanged.

    ``near_max_bucket_size`` / ``near_max_shingle_doc_freq`` pass
    through to ``dedup.minhash_dedup_pairs`` — the two knobs the r14
    scale probe (scripts/scale_probe_text.py) showed matter on
    template-heavy corpora: a family of B near-identical pages that
    exact dedup cannot collapse (chrome differs) shares every LSH band
    bucket and pays O(B^2) verify below the bucket cap; lowering the
    cap (or capping shingle doc-frequency) bounds that term at the cost
    of missing some pairs INSIDE the dropped mega-buckets (members
    still pair through their other bands, and such families are
    near-total duplicates anyway).

    ``c4_rules=True`` inserts a ``c4_clean`` stage BEFORE the language
    filter (where the published C4 pipeline runs it, at ingestion):
    line-level cleaning transforms the text in place and pages failing
    the page rules drop, so both n_docs and n_tokens fall. Only
    meaningful for multi-line page text. ``gopher=True`` inserts a
    ``gopher`` stage right after the heuristic quality gate applying
    all seven Gopher document rules. Both stages are the same
    exact-oracled operators the corpus_filter_combo row certifies
    per-document (operators/textops.py c4_clean / gopher_filter).

    Each stage's aggregate row is materialized EAGERLY and timed, and the
    funnel emits ``stage_sec`` — the incremental wall-clock each stage
    added (cached intermediates attribute their build cost to the first
    stage that materializes them), so a regression in one stage is
    visible from the funnel itself without standalone re-runs. Consumers
    that value-compare across engines should drop the time column (the
    catalog query does; the SQL oracle has no wall-clock analog).
    """
    import time

    from . import decontam, dedup, sampling

    def near_dedup(prev: DataFrame) -> DataFrame:
        pairs = dedup.minhash_dedup_pairs(
            prev, near_threshold, n=shingle_n,
            max_bucket_size=near_max_bucket_size,
            max_shingle_doc_freq=near_max_shingle_doc_freq,
        )
        drop = pairs.select(F.col("doc_id_b").alias("doc_id")).distinct()
        return dedup.shared_cache.persist(prev.join(drop, "doc_id", "left_anti"))

    # each stage is a THUNK over the previous stage's survivors, built
    # inside its own timed region — several operators do eager work at
    # construction (shingle-frequency probes, benchmark-shingle broadcast
    # collects, mix-plan group counts), and lazy construction would let
    # that cost escape stage_sec attribution
    builders = [
        lambda prev: docs,
        lambda prev: prev.filter(F.col("lang") == lang),
        lambda prev: prev.filter(TXT.quality_score_expr("text") >= min_quality),
        lambda prev: dedup.shared_cache.persist(dedup.dedup_exact(prev)),
        near_dedup,
        lambda prev: dedup.shared_cache.persist(
            decontam.decontaminate(
                prev, benchmark, n=shingle_n, min_containment=0.5
            )
        ),
        lambda prev: sampling.domain_mix_sample(
            prev, target_weights, group_col="source", salt=salt
        ),
    ]
    names = list(STAGES)
    if c4_rules or gopher or pii_classes is not None:
        from . import textops
    if c4_rules:
        at = names.index("lang")
        names.insert(at, "c4_clean")
        builders.insert(
            at,
            lambda prev: textops.c4_clean(prev, keep_only=True).drop(
                "n_lines_kept"
            ),
        )
    if gopher:
        at = names.index("quality") + 1
        names.insert(at, "gopher")
        builders.insert(at, lambda prev: textops.gopher_filter(prev))
    if pii_classes is not None:
        at = names.index("exact_dedup")
        names.insert(at, "pii_redact")
        builders.insert(
            at,
            lambda prev: textops.pii_redact(
                prev, classes=tuple(pii_classes)
            ).drop("n_pii"),
        )
    tok = TXT.token_count_expr("text").cast("long")
    rows = []
    frame = None
    for i, (name, build) in enumerate(zip(names, builders)):
        t0 = time.perf_counter()
        frame = build(frame)
        agg = frame.agg(
            F.count("*").alias("n_docs"),
            F.coalesce(F.sum(tok), F.lit(0)).cast("long").alias("n_tokens"),
        ).collect()[0]
        rows.append(
            (
                i,
                name,
                agg["n_docs"],
                agg["n_tokens"],
                round(time.perf_counter() - t0, 3),
            )
        )
    return docs.sparkSession.createDataFrame(
        rows,
        "stage int, name string, n_docs long, n_tokens long, stage_sec double",
    )
