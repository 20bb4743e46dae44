"""Training-shard export (operators/shards.py): deterministic membership,
reproducible within-shard order, manifest accounting, writer round-trip."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from cuda_acceleratedvectordatabaseengine_spark.operators import shards
from cuda_acceleratedvectordatabaseengine_spark.sources import tables


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return tables.load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )


def _py_shard(doc_id: int, n: int, salt: str = "") -> int:
    key = str(doc_id) + (f":{salt}" if salt else "")
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % n


def _py_key(doc_id: int, salt: str = "") -> str:
    key = str(doc_id) + (f":{salt}" if salt else "")
    return hashlib.md5(key.encode()).hexdigest()[:8]


def test_assignment_matches_reference_md5(spark, docs):
    got = shards.assign_shards(docs, 8, salt="s1").select(
        "doc_id", "shard_id"
    ).collect()
    assert got
    for r in got:
        assert r["shard_id"] == _py_shard(r["doc_id"], 8, "s1")


def test_assignment_covers_and_balances(spark, docs):
    n = docs.count()
    counts = {
        r["shard_id"]: r["n"]
        for r in shards.assign_shards(docs, 8)
        .groupBy("shard_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert sum(counts.values()) == n
    assert set(counts) == set(range(8))  # md5 uniformity: none empty
    mean = n / 8
    assert all(0.5 * mean < c < 1.5 * mean for c in counts.values()), counts


def test_salt_permutes_assignment(spark, docs):
    a = {r["doc_id"]: r["shard_id"]
         for r in shards.assign_shards(docs, 8, salt="a").collect()}
    b = {r["doc_id"]: r["shard_id"]
         for r in shards.assign_shards(docs, 8, salt="b").collect()}
    moved = sum(1 for d in a if a[d] != b[d])
    assert moved > len(a) / 2  # ~7/8 expected


def test_writer_roundtrip_membership_and_order(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    shards.write_training_shards(docs, out, n_shards=4, salt="e0")
    back = shards.read_training_shards(spark, out)
    assert back.count() == docs.count()
    rows = back.select("shard_id", "doc_id").collect()
    # membership: every row in its md5 shard, every doc exactly once
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    for r in rows:
        assert r["shard_id"] == _py_shard(r["doc_id"], 4, "e0")
    # within-shard order: ascending shuffle key then id, per shard file
    for k in range(4):
        part = [r["doc_id"] for r in rows if r["shard_id"] == k]
        # spark.read preserves file row order only per file+partition;
        # re-read the single shard dir directly for the order check
        seq = [
            r["doc_id"]
            for r in spark.read.parquet(f"{out}/shard_id={k}").select(
                "doc_id"
            ).collect()
        ]
        assert sorted(seq) == sorted(part)
        want = sorted(seq, key=lambda d: (_py_key(d, "e0"), d))
        assert seq == want


def test_writer_is_reproducible(spark, docs, tmp_path):
    out1, out2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    for out in (out1, out2):
        shards.write_training_shards(docs, out, n_shards=4, salt="e1")
    for k in range(4):
        a = [r["doc_id"] for r in
             spark.read.parquet(f"{out1}/shard_id={k}").collect()]
        b = [r["doc_id"] for r in
             spark.read.parquet(f"{out2}/shard_id={k}").collect()]
        assert a == b


def test_writer_length_order(spark, docs, tmp_path):
    from cuda_acceleratedvectordatabaseengine_spark.functions import text as TXT

    out = str(tmp_path / "bylen")
    shards.write_training_shards(
        docs, out, n_shards=4, salt="e2",
        order_by=[TXT.token_count_expr("text").desc()],
    )
    for k in range(4):
        toks = [
            r["t"]
            for r in spark.read.parquet(f"{out}/shard_id={k}")
            .select(TXT.token_count_expr("text").alias("t"))
            .collect()
        ]
        assert toks == sorted(toks, reverse=True)


def test_manifest_accounting(spark, docs):
    from cuda_acceleratedvectordatabaseengine_spark.functions import text as TXT

    assigned = shards.assign_shards(docs, 8, salt="m0")
    man = {r["shard_id"]: (r["n_docs"], r["n_tokens"])
           for r in shards.shard_manifest(assigned).collect()}
    want = {
        r["shard_id"]: (r["n"], r["t"])
        for r in assigned.groupBy("shard_id")
        .agg(F.count("*").alias("n"),
             F.sum(TXT.token_count_expr("text")).alias("t"))
        .collect()
    }
    assert man == want
    assert sum(n for n, _ in man.values()) == docs.count()


def test_validation(spark, docs):
    with pytest.raises(ValueError, match="n_shards"):
        shards.shard_id_expr(0)


def test_export_manifest_and_verify(spark, docs, tmp_path):
    out = str(tmp_path / "mexp")
    shards.write_training_shards(docs, out, n_shards=4, salt="m1")
    man = shards.write_export_manifest(spark, out, 4, salt="m1")
    assert man == shards.read_export_manifest(out)
    assert man["n_shards"] == 4 and man["salt"] == "m1"
    assert man["total_docs"] == docs.count()
    assert set(man["shards"]) == {"0", "1", "2", "3"}
    ok, bad = shards.verify_export(spark, out)
    assert ok and bad == {}
    # corrupt one shard: drop a parquet file -> verify catches the drift
    import glob
    import os

    victim = glob.glob(f"{out}/shard_id=2/*.parquet")[0]
    os.remove(victim)
    ok2, bad2 = shards.verify_export(spark, out)
    assert not ok2 and "2" in bad2
    assert bad2["2"]["actual"] != bad2["2"]["expected"]


def test_tokenized_shard_export_roundtrip(spark, tmp_path):
    """The r8 composition a training run actually consumes: byte-BPE
    token_ids payload -> hash-assigned shards -> read back in written
    order -> decode reproduces the exact source text (lossless end to
    end through parquet's array<int> column)."""
    from cuda_acceleratedvectordatabaseengine_spark.operators import bpe

    texts = [
        f"document {i} with words enough to merge pairs {i % 3} over."
        for i in range(24)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe.train_bpe_bytes(df, num_merges=12)
    toks = bpe.encode_documents_bpe(df, merges)
    out = str(tmp_path / "tokshards")
    shards.write_training_shards(toks, out, n_shards=4)
    back = shards.read_training_shards(spark, out)
    assert back.count() == 24
    assert back.select("shard_id").distinct().count() == 4
    for r in back.collect():
        assert bpe.decode_bpe_ids(list(r["token_ids"]), merges) == texts[r["doc_id"]]
        assert r["n_tokens"] == len(r["token_ids"])
