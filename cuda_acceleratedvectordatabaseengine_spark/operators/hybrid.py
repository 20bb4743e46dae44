"""Hybrid retrieval: keyword search fused with vector search by
reciprocal-rank fusion (RRF).

The reference serves pure vector top-k (proto/vdb.proto:16-23); production
retrieval over LLM corpora almost always pairs that with a lexical branch
and fuses the rankings. Both branches and the fusion are plain relational
plans:

- **Keyword branch** (``keyword_topk``): an inverted-index probe expressed
  as a token equi-join — distinct lowercase whitespace tokens per document
  joined to the query's token set, scored by summed smoothed IDF
  (ln((N+1)/(df+1))), ranked per query. The doc-side explode is the
  inverted index; Catalyst's shuffle on ``token`` is the postings lookup.
  At 100 TB the token join is the standard scale shape (and the place to
  add a stopword/max-df cap, mirroring dedup's ``max_shingle_doc_freq``).
- **Fusion** (``rrf_fuse``): RRF score(d) = sum over rankings r of
  w_r / (rrf_k + rank_r(d)), the standard rank-based fusion (rrf_k=60) —
  one union + groupBy + per-query window, no per-row Python.

Vector branch: any RESULTS-shaped output (exact_knn / IVF / PQ / SQ8
search) plugs in unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TXT

DEFAULT_RRF_K = 60


def keyword_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    qtext_col: str = "qtext",
) -> DataFrame:
    """Per-query keyword top-k -> {query_id, rank, id, score}.

    Score = sum of smoothed IDF over the DISTINCT tokens shared between the
    query text and the document (binary term match, IDF-weighted). The query
    side is a bounded search batch and broadcasts; the document token table
    shuffles once on ``token``.

    Ranking is on the score ROUNDED to 6 decimals (then id) — a deliberate
    exception to the usual rank-on-raw discipline: keyword scores are sums
    of shared IDF terms, where EXACT mathematical ties are common (any two
    documents with the same token overlap), so float summation order would
    otherwise decide ranks engine-dependently. Rounding collapses those
    ties onto the deterministic id tiebreak."""
    dt = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(TXT.tokens_expr(F.lower(F.col(text_col))))
        ).alias("token"),
    )
    n_docs = docs.count()
    # dt is distinct per (id, token) by construction -> df is a plain count
    idf = dt.groupBy("token").agg(
        F.log((F.lit(n_docs) + 1.0) / (F.count("*") + 1.0)).alias("idf")
    )
    qt = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(
            F.array_distinct(TXT.tokens_expr(F.lower(F.col(qtext_col))))
        ).alias("token"),
    )
    scores = (
        dt.join(F.broadcast(qt), "token")
        .join(idf, "token")
        .groupBy("query_id", "id")
        .agg(F.sum("idf").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round("score", 6).desc(), F.col("id").asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "id", "score")
    )


def rrf_fuse(
    rankings: "list[DataFrame]",
    k: int = 10,
    rrf_k: int = DEFAULT_RRF_K,
    weights: "list[float] | None" = None,
) -> DataFrame:
    """Reciprocal-rank fusion of RESULTS-shaped rankings
    ({query_id, rank, id}) -> {query_id, rank, id, score}.

    A document absent from a branch's list simply contributes nothing from
    that branch (the standard RRF convention). Ties in the fused score
    (e.g. symmetric rank pairs) break by id, deterministically."""
    if not rankings:
        raise ValueError("rrf_fuse requires at least one ranking")
    if weights is not None and len(weights) != len(rankings):
        raise ValueError("weights length must match rankings")
    tagged = None
    for i, r in enumerate(rankings):
        wgt = 1.0 if weights is None else float(weights[i])
        part = r.select(
            "query_id",
            "id",
            (F.lit(wgt) / (F.lit(rrf_k) + F.col("rank"))).alias("contrib"),
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    scores = tagged.groupBy("query_id", "id").agg(F.sum("contrib").alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("id").asc())
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "id", "score")
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    qtext_col: str = "qtext",
) -> DataFrame:
    """Per-query BM25 top-k -> {query_id, rank, id, score} (Robertson/
    Sparck Jones; the Lucene practical form).

        score(q, d) = sum_{t in q} idf(t) * tf * (k1+1)
                      / (tf + k1 * (1 - b + b * |d| / avgdl))
        idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)      (always > 0)

    vs ``keyword_topk``'s binary-IDF: term-frequency saturation (k1) and
    document-length normalization (b) — the standard first-stage ranker
    a hybrid pipeline fuses with the vector branch.

    Plan shape: one tf table (explode + map-side-combined count), doc
    lengths and avgdl derived from it (empty documents have no tokens and
    are never scored; avgdl averages over scoreable docs — pinned
    convention mirrored by the SQL oracle), df from the tf table, the
    bounded query side broadcast; ONE shuffle on token then one on
    (query_id, id). Ranking on the score ROUNDED to 6 decimals (then id):
    same deliberate tie discipline as keyword_topk."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(TXT.tokens_expr(F.lower(F.col(text_col)))).alias("token"),
    )
    tf = toks.groupBy("id", "token").agg(F.count("*").alias("tf"))
    dlen = toks.groupBy("id").agg(F.count("*").alias("dl"))
    avgdl = dlen.agg(F.avg("dl").alias("avgdl"))
    n_docs = docs.count()
    idf = tf.groupBy("token").agg(
        F.log(
            (F.lit(float(n_docs)) - F.count("*") + 0.5)
            / (F.count("*") + 0.5)
            + 1.0
        ).alias("idf")
    )
    qt = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(
            F.array_distinct(TXT.tokens_expr(F.lower(F.col(qtext_col))))
        ).alias("token"),
    )
    contrib = (
        tf.join(F.broadcast(qt), "token")
        .join(idf, "token")
        .join(dlen, "id")
        .crossJoin(F.broadcast(avgdl))
        .select(
            "query_id",
            "id",
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        1.0
                        - F.lit(b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("contrib"),
        )
    )
    scores = contrib.groupBy("query_id", "id").agg(
        F.sum("contrib").alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round("score", 6).desc(), F.col("id").asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col("rank").cast("int").alias("rank"), "id", "score"
        )
    )


def maxsim_topk(
    doc_vecs: DataFrame,
    query_vecs: DataFrame,
    k: int,
    metric: str = "cosine",
    max_query_vectors: int | None = 65536,
) -> DataFrame:
    """Late-interaction (ColBERT-style MaxSim) multi-vector top-k ->
    {query_id, rank, id, score}.

    Items are bags of chunk/token vectors (``doc_vecs``: {id, vec}, many
    rows per id); queries likewise ({query_id, qvec_id, vec}). The score
    generalizes single-vector retrieval:

        score(q, d) = sum over query vectors qv of
                      max over d's vectors dv of sim(qv, dv)

    with sim = cosine similarity (``metric="cosine"``) or raw inner
    product (``metric="ip"``). The reference serves single-vector top-k
    only (proto/vdb.proto:16-23); this is the standard multi-vector
    extension of the same scan.

    Plan shape (the 100 TB posture): the query side is a bounded search
    batch and BROADCASTS; similarities are computed JVM-side per
    (doc-chunk row x query vector) with no shuffle, then two hash
    aggregations — max over an item's chunks per query vector (partial
    map-side max first), sum over the query's vectors — and a per-query
    window on the bounded candidate set. The corpus is never shuffled on
    a wide key; nothing leaves the JVM.

    Ranking rounds the fused score to 6 decimals before ordering (same
    deliberate tie discipline as ``keyword_topk``: per-chunk maxes make
    exact ties common), breaking ties on id.

    ``max_query_vectors`` guards the broadcast: the crossJoin is
    corpus x query-batch BY DESIGN (a bounded rerank pool) and must
    never see an unbounded query set — past the cap the call fails fast
    with a pointer to ``maxsim_blocked_topk``, the scale path. The
    guard counts a column-pruned ``query_id``-only, ``limit``-capped
    projection (Catalyst prunes the scan; an expensive chunk+embed
    lineage still re-runs once, so callers who already know their
    query batch is bounded pass ``max_query_vectors=None`` to skip the
    guard job entirely).
    """
    q = query_vecs.select(
        "query_id", "qvec_id", F.col("vec").alias("qv")
    )
    if max_query_vectors is not None:
        nq = (
            query_vecs.select("query_id")
            .limit(max_query_vectors + 1)
            .count()
        )
        if nq > max_query_vectors:
            raise ValueError(
                f"maxsim_topk query side exceeds max_query_vectors="
                f"{max_query_vectors}: this exact path crossJoins the "
                "corpus with a BROADCAST query batch and is for bounded "
                "rerank pools; use maxsim_blocked_topk for large query "
                "sets, raise max_query_vectors deliberately, or pass "
                "max_query_vectors=None when the bound is known"
            )
    d = doc_vecs.select("id", F.col("vec").alias("dv"))
    pairs = d.crossJoin(F.broadcast(q))
    return _maxsim_rank(pairs, k, metric)


def _maxsim_sim_expr(metric: str):
    from ..functions import distance as D

    if metric == "cosine":
        return F.lit(1.0) - D.cosine_expr("qv", "dv")
    if metric == "ip":
        return D.dot_expr("qv", "dv")
    raise ValueError(f"maxsim metric must be 'cosine' or 'ip', got {metric!r}")


def _maxsim_rank(pairs: DataFrame, k: int, metric: str) -> DataFrame:
    """Shared MaxSim tail over (query_id, qvec_id, id, qv, dv) pair rows:
    max over an item's chunks per query vector (map-side combined), sum
    over the query's vectors, per-query window on the bounded candidate
    set, score rounded to 6 before ordering (tie discipline as
    ``keyword_topk``), ties by id."""
    sim = _maxsim_sim_expr(metric)
    best = pairs.groupBy("query_id", "qvec_id", "id").agg(
        F.max(sim).alias("best")
    )
    scores = best.groupBy("query_id", "id").agg(F.sum("best").alias("score"))
    w = Window.partitionBy("query_id").orderBy(
        F.round("score", 6).desc(), F.col("id").asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col("rank").cast("int").alias("rank"), "id", "score"
        )
    )


def maxsim_blocked_topk(
    doc_vecs: DataFrame,
    query_vecs: DataFrame,
    centroids,
    k: int,
    metric: str = "cosine",
    nprobe: int = 1,
) -> DataFrame:
    """Cluster-blocked MaxSim (the PLAID-style scale path) ->
    {query_id, rank, id, score}.

    The exact ``maxsim_topk`` scores every (query, item) pair — fine for
    a bounded rerank pool, quadratic at corpus scale. Here every chunk
    vector (both sides) is first assigned to its nearest centroid (L2,
    same coarse quantizer discipline as IVF routing); candidate items
    are those sharing at least one centroid with the query's vectors,
    and the exact MaxSim formula then runs ONLY over candidates using
    ALL of the candidate's chunks — so a surfaced item's score equals
    the exact operator's score; the only approximation is candidates
    missed entirely (recall, tunable like IVF: via nlist AND via
    ``nprobe`` — each QUERY vector routes to its nprobe nearest
    centroids (``kmeans.assign_topp``), widening the candidate block at
    O(nprobe) extra candidate cost while the doc side stays top-1. On
    weakly-clustered corpora nprobe is the recall lever (PERF.md r6
    MaxSim probe); nprobe=1 is the pure PLAID blocking.

    Plan shape: two bulk assigns (mapInArrow, zero-copy; the query side
    explodes its nprobe list ids), a distinct (list_id) equi-join to
    form candidates — the corpus shuffles on list_id and id, never
    cross-joins — then the shared scoring tail with the bounded query
    side broadcast.
    """
    _maxsim_sim_expr(metric)  # validate before any work
    from . import kmeans as KM

    qa = KM.assign_topp(
        query_vecs.select("query_id", "qvec_id", "vec"),
        centroids,
        nprobe,
        vec_col="vec",
        out_col="list_ids",
    ).select("query_id", F.explode("list_ids").alias("list_id"))
    da = KM.assign(
        doc_vecs.select("id", "vec"), centroids, vec_col="vec", out_col="list_id"
    )
    cand = (
        qa.select("query_id", "list_id")
        .distinct()
        .join(da.select("id", "list_id").distinct(), "list_id")
        .select("query_id", "id")
        .distinct()
    )
    d = doc_vecs.select("id", F.col("vec").alias("dv"))
    q = query_vecs.select("query_id", "qvec_id", F.col("vec").alias("qv"))
    pairs = cand.join(d, "id").join(F.broadcast(q), "query_id")
    return _maxsim_rank(pairs, k, metric)
