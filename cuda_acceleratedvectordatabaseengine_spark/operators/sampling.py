"""Deterministic sampling for training-data mixes.

Sampling a 100 TB corpus with RNG state is unreproducible and
partition-dependent; content-addressed sampling (the same md5-bucket trick
as ``textops.split_column``) makes every row's fate a pure function of its
id — reruns, repartitions, and different engines agree row-for-row, and a
sample can be audited after the fact from ids alone.

The uniform variate is the first 8 md5 hex digits of ``"<id>[:<salt>]"``
compared against a hex threshold — string comparison on lowercase hex, no
numeric hash conversions, so the predicate is identical in Spark and any
SQL dialect with md5/substr. ``salt`` decorrelates independent sampling
decisions over the same ids.

- ``sample_predicate``: keep a row with probability ``fraction`` (a float
  or a per-row Column — the weighted/importance case).
- ``stratified_sample``: per-group rates (domain mixing: "20% web, 100%
  books, 5% logs").
- ``weighted_sample``: per-row acceptance probability from a column
  (quality-weighted mixes).

All are pure projections + filters: no shuffle, no RNG state, no driver
participation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_SPACE = 1 << 32  # 8 hex digits


def uniform_hash_hex_expr(id_col: str = "doc_id", salt: str = "") -> Column:
    """First 8 lowercase md5 hex digits of '<id>[:<salt>]' — a uniform
    draw over [0, 2^32) encoded as hex text."""
    key = F.col(id_col).cast("string")
    if salt:
        key = F.concat(key, F.lit(":" + salt))
    return F.substring(F.md5(key.cast("binary")), 1, 8)


def _threshold_hex(fraction: Column) -> Column:
    """fraction in [0, 1) -> 8-digit lowercase hex threshold."""
    n = F.floor(fraction * F.lit(float(_HASH_SPACE))).cast("long")
    return F.lower(F.lpad(F.hex(n), 8, "0"))


def sample_predicate(
    id_col: str = "doc_id", fraction: "Column | float" = 0.1, salt: str = ""
) -> Column:
    """Boolean keep-predicate: true with probability ``fraction`` (float or
    per-row Column), deterministically per id."""
    frac = F.lit(float(fraction)) if not isinstance(fraction, Column) else fraction
    hx = uniform_hash_hex_expr(id_col, salt)
    return (
        F.when(frac >= 1.0, F.lit(True))
        .when(frac <= 0.0, F.lit(False))
        .otherwise(hx < _threshold_hex(frac))
    )


def stratified_sample(
    df: DataFrame,
    rates: dict,
    default_rate: float = 0.0,
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep each row with its group's rate (domain-mixing sampler)."""
    for v in list(rates.values()) + [default_rate]:
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"rates must be in [0, 1], got {v}")
    frac = None
    for value, rate in sorted(rates.items()):
        cond = F.col(group_col) == F.lit(value)
        frac = (
            F.when(cond, F.lit(float(rate)))
            if frac is None
            else frac.when(cond, F.lit(float(rate)))
        )
    frac = (
        frac.otherwise(F.lit(float(default_rate)))
        if frac is not None
        else F.lit(float(default_rate))
    )
    return df.filter(sample_predicate(id_col, frac, salt))


def weighted_sample(
    df: DataFrame,
    weight_col: "str | Column",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep each row with probability = its weight column clamped to
    [0, 1] (importance/quality-weighted sampling)."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    return df.filter(sample_predicate(id_col, w, salt))


def domain_mix_plan(
    df: DataFrame,
    target_weights: "dict | None" = None,
    group_col: str = "source",
) -> DataFrame:
    """Per-group sampling fractions that reshape the corpus to a target
    mixture, keeping the largest achievable subset.

    Pile/DoReMi-style domain reweighting by downsampling: with group
    counts n_g and target weights w_g, the largest total K docs whose
    mix is exactly proportional to w is K = min_g(n_g / w_g) * sum(w);
    each group keeps frac_g = min(1, K_g) where K_g scales w_g / n_g.
    The binding group (smallest n_g / w_g) keeps everything; every other
    group downsamples to match.

    One aggregation to G rows, then a G-row window for the min — no
    driver collect. Unspecified groups under a partial ``target_weights``
    get weight 0 (dropped); ``None`` means uniform across observed groups.

    Returns (group_col, n_docs, frac) — feed to ``domain_mix_sample``.
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("n_docs"))
    if target_weights:
        for v in target_weights.values():
            if v < 0:
                raise ValueError(f"weights must be >= 0, got {v}")
        w = None
        for value, weight in sorted(target_weights.items()):
            cond = F.col(group_col) == F.lit(value)
            w = (
                F.when(cond, F.lit(float(weight)))
                if w is None
                else w.when(cond, F.lit(float(weight)))
            )
        counts = counts.withColumn("w", w.otherwise(F.lit(0.0)))
    else:
        counts = counts.withColumn("w", F.lit(1.0))
    return _plan_from_weighted_counts(counts, group_col)


def _plan_from_weighted_counts(counts: DataFrame, group_col: str) -> DataFrame:
    """Shared mix-plan tail: (group, n_docs, w) -> (group, n_docs, frac)
    via K = min_g(n_g / w_g); frac_g = min(1, K * w_g / n_g). A G-row
    global window — group-cardinality data only."""
    from pyspark.sql import Window

    everything = Window.partitionBy()
    return (
        counts.withColumn(
            "scale_k",
            F.min(
                F.when(F.col("w") > 0, F.col("n_docs") / F.col("w"))
            ).over(everything),
        )
        .withColumn(
            "frac",
            F.when(F.col("w") <= 0, F.lit(0.0)).otherwise(
                F.least(
                    F.lit(1.0),
                    F.col("scale_k") * F.col("w") / F.col("n_docs"),
                )
            ),
        )
        .select(group_col, "n_docs", "frac")
    )


def temperature_mix_plan(
    df: DataFrame, alpha: float = 0.5, group_col: str = "source"
) -> DataFrame:
    """Temperature-scaled mixing (the multilingual-LM convention,
    alpha in [0, 1]: 1 = natural proportions, 0 = uniform): target share
    proportional to n_g^alpha — flattens dominant domains, boosts the
    tail — realized as the largest achievable downsampled subset (same
    K = min(n/w) arithmetic as ``domain_mix_plan``). The weights derive
    IN-PLAN from the group counts (w = pow(n, alpha)): zero driver
    collect, group-cardinality rows only.

    Returns (group_col, n_docs, frac) — feed to ``domain_mix_sample``'s
    predicate or ``temperature_mix_sample``."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    # alpha=0.5 routes through sqrt, which IEEE 754 requires to be
    # correctly rounded (bit-identical across engines) — general pow is
    # only ~1ulp-accurate and engine-dependent, so the oracled catalog
    # row pins alpha=0.5; other alphas work but carry last-ulp dialect
    # drift in the fractions.
    w = (
        F.sqrt(F.col("n_docs"))
        if alpha == 0.5
        else F.pow(F.col("n_docs"), F.lit(float(alpha)))
    )
    counts = (
        df.groupBy(group_col)
        .agg(F.count("*").alias("n_docs"))
        .withColumn("w", w)
    )
    return _plan_from_weighted_counts(counts, group_col)


def temperature_mix_sample(
    df: DataFrame,
    alpha: float = 0.5,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "temp",
) -> DataFrame:
    """Deterministically resample to the temperature-scaled mixture:
    the G-row plan broadcast back + the content-addressed md5
    keep-predicate (reproducible row-for-row, like every sampler here).
    """
    plan = temperature_mix_plan(df, alpha, group_col)
    return df.join(
        F.broadcast(plan.select(group_col, "frac")), group_col
    ).filter(sample_predicate(id_col, F.col("frac"), salt))


def domain_mix_sample(
    df: DataFrame,
    target_weights: "dict | None" = None,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Deterministically resample the corpus to a target domain mixture
    (largest exact-proportion subset; see ``domain_mix_plan``).

    The plan is G rows — broadcast-joined back, then the same
    content-addressed md5 keep-predicate as every other sampler here:
    reproducible row-for-row across engines, reruns, and repartitions.
    """
    plan = domain_mix_plan(df, target_weights, group_col)
    return df.join(
        F.broadcast(plan.select(group_col, "frac")), group_col
    ).filter(sample_predicate(id_col, F.col("frac"), salt))


def token_budget_mix_plan(
    df: DataFrame,
    total_tokens: int,
    target_weights: "dict | None" = None,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group sampling fractions that hit a TOKEN budget at a target
    mixture — training mixes are specified in tokens, not documents.

    Group g with target weight w_g gets a token budget of
    ``total_tokens * w_g / sum(w)``; its keep-fraction is that budget
    over its available tokens, capped at 1 (a starved group contributes
    everything it has — the mix is then budget-limited, not
    availability-limited, and the report shows it). Document-level
    hash sampling hits the token target in expectation; the variance is
    O(1/sqrt(docs per group)), negligible at corpus scale.

    Returns (group_col, n_docs, n_tokens, token_budget, frac).
    """
    from ..functions import text as TXT

    if total_tokens <= 0:
        raise ValueError(f"total_tokens must be positive, got {total_tokens}")
    tok = TXT.token_count_expr(text_col).cast("long")
    counts = df.groupBy(group_col).agg(
        F.count("*").alias("n_docs"), F.sum(tok).alias("n_tokens")
    )
    if target_weights:
        for v in target_weights.values():
            if v < 0:
                raise ValueError(f"weights must be >= 0, got {v}")
        sum_w = float(sum(target_weights.values()))
        if sum_w <= 0:
            raise ValueError("at least one weight must be positive")
        w = None
        for value, weight in sorted(target_weights.items()):
            cond = F.col(group_col) == F.lit(value)
            w = (
                F.when(cond, F.lit(float(weight)))
                if w is None
                else w.when(cond, F.lit(float(weight)))
            )
        counts = counts.withColumn("w", w.otherwise(F.lit(0.0)))
        counts = counts.withColumn(
            "token_budget", F.lit(float(total_tokens)) * F.col("w") / F.lit(sum_w)
        )
    else:
        from pyspark.sql import Window

        ngroups = F.count(F.lit(1)).over(Window.partitionBy())
        counts = counts.withColumn(
            "token_budget", F.lit(float(total_tokens)) / ngroups
        )
    return counts.withColumn(
        "frac",
        F.when(F.col("n_tokens") <= 0, F.lit(0.0)).otherwise(
            F.least(
                F.lit(1.0), F.col("token_budget") / F.col("n_tokens")
            )
        ),
    ).select(group_col, "n_docs", "n_tokens", "token_budget", "frac")


def token_budget_mix(
    df: DataFrame,
    total_tokens: int,
    target_weights: "dict | None" = None,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "tokmix",
) -> DataFrame:
    """Deterministically sample the corpus toward a token-budget mixture
    (see ``token_budget_mix_plan``): broadcast the G-row plan back and
    keep each row by the content-addressed md5 draw."""
    plan = token_budget_mix_plan(
        df, total_tokens, target_weights, group_col, text_col
    )
    return df.join(
        F.broadcast(plan.select(group_col, "frac")), group_col
    ).filter(sample_predicate(id_col, F.col("frac"), salt))
