"""Training-shard export: deterministic global shuffle + size-accounted
shard writing — the last mile of a pretraining data pipeline.

After curation/dedup/mixing (operators/curation.py, sampling.py), a
training run consumes the corpus as N fixed shards in a reproducible
pseudo-random order. This module provides that terminal stage with the
engine's content-addressed discipline (sampling.uniform_hash_hex_expr):

- shard membership = md5(id:salt) mod n_shards — no global sort, no
  window, embarrassingly parallel at any corpus size;
- within-shard order = ascending md5 hex (a deterministic shuffle), or
  any caller-supplied ordering (e.g. token length for packing
  efficiency, operators/packing.py);
- reruns with the same salt are bit-identical; changing the salt is a
  fresh epoch-level permutation.

Scale shape (the 100 TB posture): ONE hash-partition shuffle keyed on
shard_id + a within-partition sort — the same plan Spark uses for any
bucketed write. No collect, no skew (md5 is uniform), and the
partitioned layout means a training loader reads shard K by path
without touching the rest. The reference engine has no corpus-export
surface (north-star §2.6b scope); the design follows the standard
web-corpus shard conventions (fixed shard count, hash-assigned,
deterministic order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TXT
from . import sampling

SHARD_COL = "shard_id"


def shuffle_key_expr(id_col: str = "doc_id", salt: str = "") -> Column:
    """The deterministic shuffle key: 8 md5 hex digits of '<id>[:salt]'
    (lowercase, fixed width — lexicographic order == numeric order)."""
    return sampling.uniform_hash_hex_expr(id_col, salt)


def shard_id_expr(
    n_shards: int, id_col: str = "doc_id", salt: str = ""
) -> Column:
    """Shard membership: md5-draw mod ``n_shards`` as INT."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    h = F.conv(shuffle_key_expr(id_col, salt), 16, 10).cast("long")
    return F.pmod(h, F.lit(n_shards)).cast("int")


def assign_shards(
    df: DataFrame, n_shards: int, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Append ``shard_id`` (int) — pure Catalyst, no shuffle."""
    return df.withColumn(SHARD_COL, shard_id_expr(n_shards, id_col, salt))


def shard_manifest(
    df: DataFrame, text_col: str = "text", shard_col: str = SHARD_COL
) -> DataFrame:
    """Per-shard accounting over an assigned (or read-back) frame:
    {shard_id, n_docs, n_tokens} — the row a training job validates
    against before consuming a shard. One map-side-combined aggregate."""
    return (
        df.groupBy(F.col(shard_col).cast("int").alias(SHARD_COL))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(TXT.token_count_expr(text_col)).cast("long").alias(
                "n_tokens"
            ),
        )
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "",
    order_by: "list[Column] | None" = None,
    mode: str = "error",
) -> None:
    """Write ``df`` as ``path/shard_id=K/`` parquet dirs: hash-assigned
    membership, deterministic within-shard row order (ascending shuffle
    key then id unless ``order_by`` overrides — e.g. descending token
    length for sequence-packing locality).

    Plan shape: one repartition on shard_id (each shard lands whole in
    one task → one file per shard dir) + sortWithinPartitions. Rerunning
    with identical inputs/salt reproduces the bytes; a training loader
    that reads shard dirs in path order and rows in file order sees the
    same sample sequence every epoch.
    """
    assigned = assign_shards(df, n_shards, id_col=id_col, salt=salt)
    key = shuffle_key_expr(id_col, salt)
    order = list(order_by) if order_by is not None else [key]
    (
        # the partition column LEADS the sort: Spark's partitioned write
        # otherwise inserts its own (unstable) sort on the partition key
        # and destroys the within-shard order
        assigned.repartition(n_shards, F.col(SHARD_COL))
        .sortWithinPartitions(F.col(SHARD_COL), *order, F.col(id_col))
        .write.mode(mode)
        .partitionBy(SHARD_COL)
        .parquet(path)
    )


def read_training_shards(spark: SparkSession, path: str) -> DataFrame:
    """Read a shard export back; ``shard_id`` returns as the partition
    column. Within a shard, parquet row order is the written order."""
    return spark.read.parquet(path)


MANIFEST_NAME = "_shards_manifest.json"


def write_export_manifest(
    spark: SparkSession,
    path: str,
    n_shards: int,
    salt: str = "",
    text_col: str = "text",
) -> dict:
    """Write the loader-facing sidecar ``_shards_manifest.json`` next to
    a shard export: export params (n_shards, salt) + per-shard
    {n_docs, n_tokens} recomputed FROM THE WRITTEN FILES (so the
    manifest certifies what's on disk, not what the writer intended).
    O(n_shards) driver rows; returns the manifest dict."""
    import json
    import os

    man = {
        int(r[SHARD_COL]): {
            "n_docs": int(r["n_docs"]),
            "n_tokens": int(r["n_tokens"]),
        }
        for r in shard_manifest(
            read_training_shards(spark, path), text_col=text_col
        ).collect()
    }
    out = {
        "n_shards": int(n_shards),
        "salt": salt,
        "total_docs": sum(v["n_docs"] for v in man.values()),
        "total_tokens": sum(v["n_tokens"] for v in man.values()),
        "shards": {str(k): man[k] for k in sorted(man)},
    }
    tmp = os.path.join(path, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(path, MANIFEST_NAME))
    return out


def read_export_manifest(path: str) -> dict:
    """Load the sidecar manifest of a shard export."""
    import json
    import os

    with open(os.path.join(path, MANIFEST_NAME)) as f:
        return json.load(f)


def verify_export(
    spark: SparkSession, path: str, text_col: str = "text"
) -> "tuple[bool, dict]":
    """Re-derive the per-shard accounting from the files and compare to
    the sidecar manifest — the check a training job runs before
    consuming an export (bitrot, partial copies, a foreign file dropped
    into a shard dir all surface as count/token drift). Returns
    (ok, {shard_id: {"expected": ..., "actual": ...}} for mismatches)."""
    want = read_export_manifest(path)
    got = {
        str(int(r[SHARD_COL])): {
            "n_docs": int(r["n_docs"]),
            "n_tokens": int(r["n_tokens"]),
        }
        for r in shard_manifest(
            read_training_shards(spark, path), text_col=text_col
        ).collect()
    }
    bad = {}
    for k in set(want["shards"]) | set(got):
        w, g = want["shards"].get(k), got.get(k)
        if w != g:
            bad[k] = {"expected": w, "actual": g}
    return (not bad, bad)
