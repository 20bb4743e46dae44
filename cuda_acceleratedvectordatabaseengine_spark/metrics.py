"""Recall evaluation (T8) and V7-style serving metrics aggregations.

The reference declares recall@k evaluation but the file is absent
(bench/CMakeLists.txt:29-44, recall plumbing server/query_service.h:201-202);
we implement it properly: recall@k = |approx ∩ exact| / |exact| per query,
computed as a join + aggregation — fully distributed, no collect.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class LatencyRecorder:
    """V7 metrics producer (server/query_service.cpp:679-798 analog): one
    row per served batch {index_name, batch_id, n_queries, latency_ms}.
    Driver-sized by construction — one row per trigger/param-group, not per
    query. ``requests_df`` expands to per-request rows (every request
    coalesced into a batch experiences that batch's wall latency, which is
    exactly the reference's submit-to-complete measurement for fused
    batches) — the input ``latency_summary`` aggregates."""

    def __init__(self) -> None:
        self.rows: list[tuple[str, int, int, float]] = []

    def record(
        self, index_name: str, batch_id: int, n_queries: int, latency_ms: float
    ) -> None:
        self.rows.append((index_name, int(batch_id), int(n_queries), float(latency_ms)))

    def batches_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(
            self.rows,
            "index_name string, batch_id long, n_queries long, latency_ms double",
        )

    def requests_df(self, spark: SparkSession) -> DataFrame:
        """{index_name, latency_ms} with one row per request."""
        return (
            self.batches_df(spark)
            .select(
                "index_name",
                "latency_ms",
                F.explode(F.sequence(F.lit(1), F.col("n_queries"))).alias("_i"),
            )
            .drop("_i")
        )


def recall_at_k(approx: DataFrame, exact: DataFrame) -> DataFrame:
    """Per-query recall of ``approx`` against the ``exact`` ground truth.

    Both inputs are RESULTS-shaped {query_id, rank, id, distance}. Exact
    drives the denominator (handles corpora smaller than k)."""
    e = exact.select("query_id", "id")
    a = approx.select("query_id", "id")
    hits = e.join(a, ["query_id", "id"], "left_semi").groupBy("query_id").agg(
        F.count("*").alias("hits")
    )
    totals = e.groupBy("query_id").agg(F.count("*").alias("total"))
    return (
        totals.join(hits, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce(F.col("hits"), F.lit(0)) / F.col("total")).alias("recall"),
        )
    )


def mean_recall(approx: DataFrame, exact: DataFrame) -> float:
    row = recall_at_k(approx, exact).agg(F.avg("recall").alias("r")).collect()[0]
    return float(row["r"])


def ranking_metrics(
    results: DataFrame,
    relevance: DataFrame,
    k: int,
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query ranked-retrieval quality over RESULTS-shaped rows
    {query_id, rank, id} against graded ``relevance`` {query_id, id,
    rel} -> {query_id, ndcg, mrr, hit_rate}.

    - nDCG@k: DCG with exponential gain (2^rel - 1) / log2(rank + 1)
      (Burges et al. 2005 — the LTR-standard form; binary rel degrades
      to the classic 1/log2 discount), normalized by the ideal DCG over
      the query's OWN relevance list truncated at k. Queries with no
      positive relevance score 0 (not NULL, not dropped) — retrieval
      over a query with nothing relevant earns nothing.
    - MRR@k: 1 / rank of the first result with rel > 0 inside the
      top-k; 0 when none.
    - hit_rate@k: 1.0 if any top-k result has rel > 0 else 0.0.

    Everything is joins + window arithmetic — fully distributed, no
    collect, and exactly re-computable in ANSI SQL (the driver-oracle
    twin). ``results`` drives the query set: a query present in
    ``relevance`` but absent from ``results`` is NOT scored (no result
    list to grade); a query whose result rows all sit past rank k
    scores 0 on every metric (not dropped); pairs absent from
    ``relevance`` count rel = 0."""
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    rel = relevance.select(
        "query_id", "id", F.col(rel_col).cast("double").alias("_rel")
    )
    res_all = results.select("query_id", "rank", "id")
    # the query set comes from results BEFORE the rank<=k filter: a
    # query whose rows all sit past k scores 0 across the board rather
    # than silently vanishing from the macro average
    qset = res_all.select("query_id").distinct()
    res = res_all.filter(F.col("rank") <= k)
    scored = res.join(rel, ["query_id", "id"], "left").withColumn(
        "_rel", F.coalesce(F.col("_rel"), F.lit(0.0))
    )
    gain = (F.pow(F.lit(2.0), F.col("_rel")) - 1.0) / F.log2(
        F.col("rank") + 1.0
    )
    per_q = scored.groupBy("query_id").agg(
        F.sum(gain).alias("dcg"),
        F.min(F.when(F.col("_rel") > 0, F.col("rank"))).alias("first_rel"),
    )
    # ideal DCG: the query's own relevance list, best-first, truncated
    # at k. Ties in rel are value-neutral for DCG; id breaks them so the
    # ranking (and any hash of intermediate rows) is deterministic.
    w = Window.partitionBy("query_id").orderBy(
        F.col("_rel").desc(), F.col("id").asc()
    )
    ideal = (
        rel.filter(F.col("_rel") > 0)
        .withColumn("_irank", F.row_number().over(w))
        .filter(F.col("_irank") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("_rel")) - 1.0)
                / F.log2(F.col("_irank") + 1.0)
            ).alias("idcg")
        )
    )
    return (
        qset.join(per_q, "query_id", "left")
        .join(ideal, "query_id", "left")
        .select(
            "query_id",
            F.when(
                F.coalesce(F.col("idcg"), F.lit(0.0)) > 0,
                F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg"),
            )
            .otherwise(0.0)
            .alias("ndcg"),
            F.coalesce(1.0 / F.col("first_rel"), F.lit(0.0)).alias("mrr"),
            F.when(F.col("first_rel").isNotNull(), 1.0)
            .otherwise(0.0)
            .alias("hit_rate"),
        )
    )


def ranking_quality_report(
    results: DataFrame,
    relevance: DataFrame,
    k: int,
    rel_col: str = "rel",
) -> DataFrame:
    """Macro-averaged ranking quality as (metric, value) rows —
    ``ndcg@k`` / ``mrr@k`` / ``hit_rate@k`` means over the queries in
    ``results`` — the shape ``metrics_report_combo`` folds. Macro =
    every query weighs equally regardless of result-list length (the
    IR-eval convention)."""
    per_q = ranking_metrics(results, relevance, k, rel_col=rel_col)
    agg = per_q.agg(
        F.avg("ndcg").alias("ndcg"),
        F.avg("mrr").alias("mrr"),
        F.avg("hit_rate").alias("hit_rate"),
    )
    return agg.selectExpr(
        f"stack(3, 'ndcg@{k}', ndcg, 'mrr@{k}', mrr, "
        f"'hit_rate@{k}', hit_rate) as (metric, value)"
    )


def binary_relevance_from_exact(exact: DataFrame) -> DataFrame:
    """Derive binary relevance from an exact-kNN ground truth (RESULTS
    shape): every (query_id, id) the exact search surfaced is rel = 1.
    The zero-label-cost grading for ANN/hybrid surfaces — nDCG then
    reduces to rank-discounted recall against the exact list."""
    return exact.select(
        "query_id", "id", F.lit(1.0).alias("rel")
    ).distinct()


def latency_summary(latencies: DataFrame, group_col: str = "index_name") -> DataFrame:
    """V7 metrics shape: per-index count, p50/p95/p99 latency, avg
    (server/query_service.cpp:679-798) — a one-line Spark agg over a
    {index_name, latency_ms} log."""
    return latencies.groupBy(group_col).agg(
        F.count("*").alias("cnt"),
        F.percentile_approx("latency_ms", [0.5, 0.95, 0.99]).alias("p50_p95_p99"),
        F.round(F.avg("latency_ms"), 3).alias("avg_ms"),
    )


def recall_sweep(
    idx,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobes: "tuple[int, ...]" = (1, 2, 4, 8),
    metric: str | None = None,
) -> DataFrame:
    """Mean recall@k per nprobe — the recall/latency trade-off curve the
    reference DECLARED as its recall evaluation (bench/CMakeLists.txt
    names recall_test.cpp; the file is absent) and operators size nprobe
    with.

    One exact ground-truth pass (checkpointed so the per-nprobe union
    does not recompute it), then one pruned search per requested nprobe.
    Returns (nprobe, mean_recall) ordered by nprobe.
    """
    from .functions import distance as D
    from .operators import knn

    metric = metric or getattr(idx, "metric", None) or idx.manifest.metric
    metric = D.parse_metric(metric)
    exact = knn.exact_knn(corpus, queries, k=k, metric=metric).localCheckpoint(
        eager=False
    )
    out = None
    for np_ in nprobes:
        approx = idx.search(queries, k=k, nprobe=int(np_))
        row = (
            recall_at_k(approx, exact)
            .agg(F.avg("recall").alias("mean_recall"))
            .select(
                F.lit(int(np_)).cast("int").alias("nprobe"), "mean_recall"
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("nprobe")


def quality_sweep(
    idx,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobes: "tuple[int, ...]" = (1, 2, 4, 8),
    metric: str | None = None,
) -> DataFrame:
    """``recall_sweep`` widened with ranking quality: per nprobe, mean
    recall@k AND mean nDCG@k / MRR@k / hit_rate@k against binary
    relevance derived from the exact ground truth — the curve that says
    not just how many true neighbors survive pruning but how well the
    pruned ranking ORDERS them (nDCG under binary relevance is
    rank-discounted recall). Returns (nprobe, mean_recall, ndcg, mrr,
    hit_rate) ordered by nprobe; one exact pass, one search per nprobe,
    fully distributed.

    The sweep unions one search plan per nprobe and evaluation triggers
    one Spark job per member — intended for the 4-8 point tuning sweeps
    it exists for, not as a per-query serving path."""
    from .functions import distance as D
    from .operators import knn

    metric = metric or getattr(idx, "metric", None) or idx.manifest.metric
    metric = D.parse_metric(metric)
    exact = knn.exact_knn(corpus, queries, k=k, metric=metric).localCheckpoint(
        eager=False
    )
    rel = binary_relevance_from_exact(exact)
    out = None
    for np_ in nprobes:
        approx = idx.search(queries, k=k, nprobe=int(np_))
        rec = recall_at_k(approx, exact).agg(
            F.avg("recall").alias("mean_recall")
        )
        rank = ranking_metrics(
            approx.select("query_id", "rank", "id"), rel, k
        ).agg(
            F.avg("ndcg").alias("ndcg"),
            F.avg("mrr").alias("mrr"),
            F.avg("hit_rate").alias("hit_rate"),
        )
        row = rec.crossJoin(rank).select(
            F.lit(int(np_)).cast("int").alias("nprobe"),
            "mean_recall", "ndcg", "mrr", "hit_rate",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("nprobe")


def recall_sweep_onepass(
    idx,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobes: "tuple[int, ...]" = (1, 2, 4, 8),
    metric: str | None = None,
) -> "list":
    """Recall@k for EVERY nprobe candidate from ONE exact ground-truth
    pass — no per-candidate searches (r12 verdict #1; collapses
    ``tune_recall``'s cost from O(candidates) distributed searches to
    ~the ground-truth pass alone: 213s -> ~0 beyond GT at 2M x 768-d).

    Valid only for surfaces whose scan ordering is exact (the flat IVF
    scan — ``idx.scan_is_exact``). The argument: the nprobe candidates
    are nested prefixes of one probe ranking, and a true neighbor g (in
    the exact top-k by (distance, id)) has fewer than k rows preceding
    it in the WHOLE corpus, hence fewer than k in any probed subset
    containing it — so g is retrieved at nprobe=n iff the probe rank of
    g's list for that query is < n. Therefore

        recall@k(n) = mean_q |{g in GT_q : probe_rank_q(list(g)) < n}|
                      / |GT_q|

    which needs only (a) the exact ground truth, (b) each GT member's
    list_id, (c) the full probe ranking — already driver-side numpy.
    For quantized surfaces (ADC/SQ/Hamming) the ordering premise fails
    (a row outside the surface's top-k at deep probe can enter it at
    shallow probe — 2-D dominance, not prefix counting); callers keep
    the per-candidate sweep there. Differential twin:
    tests/test_metrics.py asserts value-equality against ``recall_sweep``.

    Cost: one exact k-NN pass + one column-pruned (id, list_id) scan
    joined against the broadcast GT ids + an O(nq*k) driver fold (same
    bounded-collect discipline as the tune sample itself). Returns
    rows (nprobe, mean_recall, std_recall, n_queries) for ALL
    candidates, clipped/deduped to nlist like ``suggest_nprobe``."""
    from pyspark.sql import Row

    from .functions import distance as D
    from .operators import knn
    from .operators.ivf import select_nprobe_lists

    metric = metric or getattr(idx, "metric", None) or idx.manifest.metric
    metric = D.parse_metric(metric)
    C = np.asarray(idx.centroids, dtype=np.float64)
    nlist = C.shape[0]
    cands = sorted({min(int(n), nlist) for n in nprobes})
    qids, Q = knn.collect_query_matrix(queries, "query_id", "qvec")
    if len(qids) == 0:
        raise ValueError("recall_sweep_onepass: query sample is empty")
    # full probe ranking, identical tie-breaking to every search's T2
    # probe (stable argsort, ties to smaller list_id)
    order = select_nprobe_lists(C, Q, nlist, metric)  # (nq, nlist)
    rank_of = np.empty_like(order)
    nq = order.shape[0]
    rank_of[np.arange(nq)[:, None], order] = np.arange(nlist)[None, :]
    qcol = {int(q): i for i, q in enumerate(qids)}
    exact = knn.exact_knn(corpus, queries, k=k, metric=metric)
    # materialize the ground truth to the driver FIRST (bounded: <= nq*k
    # rows) and broadcast a LITERAL frame — wrapping the heavy exact-kNN
    # plan in broadcast() would execute the full corpus pass inside the
    # broadcast-exchange thread, whose spark.sql.broadcastTimeout
    # (default 300s) the pass can exceed at scale (hit at 2M x 768-d)
    gt_rows = [
        (int(r["query_id"]), int(r["id"]))
        for r in exact.select("query_id", "id").collect()
    ]
    if not gt_rows:
        # the empty-QUERIES case was already rejected above, so an empty
        # ground truth here means the corpus itself yielded no rows
        raise ValueError(
            "recall_sweep_onepass: exact ground truth is empty — the "
            "corpus DataFrame produced no rows"
        )
    # denominator = |GT_q| exactly as recall_at_k defines it (handles
    # corpora smaller than k, and GT ids absent from the index — e.g. a
    # corpus superset — count as misses, never shrink the denominator)
    totals: dict[int, int] = {}
    for q, _i in gt_rows:
        totals[q] = totals.get(q, 0) + 1
    gt = queries.sparkSession.createDataFrame(
        gt_rows, "query_id long, id long"
    )
    # column-pruned corpus scan: only (id, list_id) are read, the GT id
    # set (nq*k rows) broadcasts
    got = (
        idx.vectors.select("id", "list_id")
        .join(F.broadcast(gt), "id")
        .select("query_id", "list_id")
        .collect()
    )  # bounded: <= nq*k rows by construction
    ranks: dict[int, list[int]] = {q: [] for q in totals}
    for r in got:
        q = int(r["query_id"])
        ranks[q].append(int(rank_of[qcol[q], int(r["list_id"])]))
    per_q = np.zeros((len(totals), len(cands)), dtype=np.float64)
    for row_i, (q, total) in enumerate(sorted(totals.items())):
        arr = np.asarray(ranks[q], dtype=np.int64)
        for ci, n in enumerate(cands):
            per_q[row_i, ci] = float(np.count_nonzero(arr < n)) / total
    n_queries = per_q.shape[0]
    rows = []
    for ci, n in enumerate(cands):
        col = per_q[:, ci]
        rows.append(
            Row(
                nprobe=int(n),
                mean_recall=float(col.mean()),
                std_recall=(
                    float(col.std(ddof=1)) if n_queries > 1 else None
                ),
                n_queries=int(n_queries),
            )
        )
    return rows


def suggest_nprobe(
    idx,
    corpus: DataFrame,
    queries: DataFrame,
    target_recall: float = 0.95,
    k: int = 10,
    nprobes: "tuple[int, ...]" = (1, 2, 4, 8, 16),
    early_stop: bool = False,
    onepass: bool = False,
) -> "tuple[int, list]":
    """Smallest nprobe whose mean recall@k meets ``target_recall`` on the
    given query sample (falls back to the largest candidate when none
    does — the caller learns the target is unreachable at this nlist).
    Returns (nprobe, sweep_rows); the sweep collect is bounded by
    len(nprobes).

    ``early_stop=True`` evaluates candidates ASCENDING, one pruned
    search at a time against a once-computed exact ground truth, and
    stops at the first candidate meeting the target — the choice is
    identical (smallest meeting candidate either way) but the expensive
    high-nprobe searches are skipped whenever a smaller one wins, which
    matters when the candidate series tops out at nprobe=nlist (a full
    exact search) as ``IVFIndex.tune_recall``'s default does. The
    returned sweep rows then cover only the evaluated candidates.

    ``onepass=True`` (exact-ordering surfaces only — the caller gates on
    ``idx.scan_is_exact``) derives the whole curve from ONE ground-truth
    pass via ``recall_sweep_onepass``: identical choice (the rule is the
    same smallest-meeting scan over the same per-candidate recalls, now
    all available), no per-candidate searches. Rows cover ALL candidates
    and carry (std_recall, n_queries) for the stamp's confidence
    interval; the early-stop rows carry the same fields."""
    if not 0.0 < target_recall <= 1.0:
        raise ValueError(f"target_recall must be in (0, 1], got {target_recall}")
    nlist = getattr(idx, "centroids").shape[0]
    cands = sorted({min(int(n), nlist) for n in nprobes})
    if onepass:
        rows = recall_sweep_onepass(
            idx, corpus, queries, k=k, nprobes=tuple(cands)
        )
        for r in rows:
            if r["mean_recall"] >= target_recall:
                return int(r["nprobe"]), rows
        return int(rows[-1]["nprobe"]), rows
    if not early_stop:
        rows = recall_sweep(
            idx, corpus, queries, k=k, nprobes=tuple(cands)
        ).collect()
        if any(r["mean_recall"] is None for r in rows):
            # avg over zero per-query rows is NULL — surface the real
            # problem instead of a TypeError deep inside the sweep
            raise ValueError("suggest_nprobe: query sample is empty")
        for r in rows:
            if r["mean_recall"] >= target_recall:
                return int(r["nprobe"]), rows
        return int(rows[-1]["nprobe"]), rows

    from pyspark.sql import Row

    from .functions import distance as D
    from .operators import knn

    metric = D.parse_metric(
        getattr(idx, "metric", None) or idx.manifest.metric
    )
    exact = knn.exact_knn(corpus, queries, k=k, metric=metric).localCheckpoint(
        eager=False
    )
    rows = []
    for np_ in cands:
        approx = idx.search(queries, k=k, nprobe=int(np_))
        got = (
            recall_at_k(approx, exact)
            .agg(
                F.avg("recall").alias("mean_recall"),
                F.stddev_samp("recall").alias("std_recall"),
                F.count("*").alias("n_queries"),
            )
            .collect()[0]
        )
        if got["mean_recall"] is None:
            raise ValueError("suggest_nprobe: query sample is empty")
        rows.append(
            Row(
                nprobe=int(np_),
                mean_recall=float(got["mean_recall"]),
                std_recall=(
                    float(got["std_recall"])
                    if got["std_recall"] is not None
                    else None
                ),
                n_queries=int(got["n_queries"]),
            )
        )
        if rows[-1]["mean_recall"] >= target_recall:
            return int(np_), rows
    return int(rows[-1]["nprobe"]), rows


# The probed-fraction floor the default suggestion enforces: the table's
# own 1M-100M band probes 32/4096 = 0.78125% of lists, and the r9 100.8M
# probe measured that recall@10 tracks THIS fraction, not absolute nprobe
# (0.39% -> 0.866, 0.78% -> 0.973 at nlist=16384; PERF.md r9).
REFERENCE_TABLE_FRACTION = 32 / 4096


def suggest_index_params(
    num_vectors: int, target_fraction: "float | None" = REFERENCE_TABLE_FRACTION
) -> dict:
    """The reference's published tuning table (README.md:154-167) as a
    function: scale-banded (nlist, nprobe) starting points —
    <1M: (128, 16); 1M-100M: (4096, 32); 100M+: (16384, 64). Tiny
    corpora additionally clamp nlist to sqrt(N) (k-means wants >= ~N/nlist
    points per list to train) — the table's own bands are authoritative
    above 1M.

    ``target_fraction`` (default: the table's own 1M-100M probed
    fraction, 0.78125%) floors nprobe at ``ceil(target_fraction *
    nlist)``: the r9 100.8M x 64-d probe MEASURED that recall tracks the
    probed FRACTION nprobe/nlist, so the table's flat nprobe=64 at
    nlist=16384 (0.39%) under-probes its own 1M-100M tier — recall@10
    0.866 vs 0.973 at the fraction-matched nprobe=128, for ~5% extra
    batch wall-clock (batch search is fixed-cost dominated). The default
    therefore returns nprobe=128 in the 100M+ band; pass
    ``target_fraction=None`` for the reference table verbatim. Starting
    points either way: confirm with ``suggest_nprobe`` on a real query
    sample.

    Fraction, not nprobe, is also the only fair axis ACROSS quantizers:
    the r10 10M x 768-d train-size probe measured that an undertrained
    (imbalanced, list-size CV 0.41) quantizer scans 17% more corpus at
    the same nprobe=32 than a converged one (CV 0.09) — recall-at-nprobe
    comparisons silently reward imbalance. Train-sample size buys list
    BALANCE (bounded worst-list scan), not recall
    (scripts/probe_768d_{trainsize,balance}.py, PERF.md r10)."""
    if num_vectors <= 0:
        raise ValueError(f"num_vectors must be positive, got {num_vectors}")
    if num_vectors < 1_000_000:
        nlist, nprobe = 128, 16
        cap = max(1, int(num_vectors ** 0.5))
        if nlist > cap:
            nlist = cap
            nprobe = min(nprobe, nlist)
    elif num_vectors < 100_000_000:
        nlist, nprobe = 4096, 32
    else:
        nlist, nprobe = 16384, 64
    if target_fraction:
        if not 0.0 < target_fraction <= 1.0:
            raise ValueError(
                f"target_fraction must be in (0, 1], got {target_fraction}"
            )
        floor = -(-target_fraction * nlist // 1)  # ceil, no math import
        nprobe = min(nlist, max(nprobe, int(floor)))
    return {"nlist": int(nlist), "nprobe": int(nprobe)}
