"""BPE merge-list persistence (operators/bpe.py save_merges/load_merges)."""

from __future__ import annotations

from cuda_acceleratedvectordatabaseengine_spark.operators import bpe




def test_merge_save_load_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, "low lower lowest newer newest wide wider widest") for i in range(4)],
        "doc_id long, text string",
    )
    merges = bpe.train_bpe(docs, num_merges=12)
    p = str(tmp_path / "merges.json")
    bpe.save_merges(merges, p)
    back = bpe.load_merges(p)
    assert back == merges  # order AND counts survive exactly
    # tokenization with the reloaded list is identical
    a = {r["doc_id"]: r["bpe_tokens"] for r in bpe.apply_bpe(docs, merges).collect()}
    b = {r["doc_id"]: r["bpe_tokens"] for r in bpe.apply_bpe(docs, back).collect()}
    assert a == b
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bpe_merges_v1"):
        import json

        open(str(tmp_path / "bad.json"), "w").write(json.dumps({"x": 1}))
        bpe.load_merges(str(tmp_path / "bad.json"))
