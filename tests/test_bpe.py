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


# ---------------------------------------------------------------------------
# Byte-level BPE (GPT-2 convention) — differential vs an independent
# pure-Python reference, pretokenizer/byte-map pins, packing seam.
# ---------------------------------------------------------------------------
def _ref_byte_bpe(texts, num_merges):
    """Independent reference: GPT-2 byte-level BPE trained rank-priority
    over pretoken frequencies (Sennrich counting, GPT-2 byte mapping).
    Deliberately re-derives everything from bpe's public primitives only
    (pretokenizer + byte map), with its own merge loop."""
    freq: dict = {}
    for t in texts:
        for unit in bpe.pretoken_units(t):
            freq[unit] = freq.get(unit, 0) + 1
    table = {w: [*w] for w in freq}
    merges = []
    for _ in range(num_merges):
        counts: dict = {}
        for w, syms in table.items():
            f = freq[w]
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                counts[k] = counts.get(k, 0) + f
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a + b, int(c)))
        for w, syms in table.items():
            out, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            table[w] = out
    return merges, table, freq


_CORPUS = [
    "low lower lowest, the lower the better!",
    "New year, newer cars; the newest ideas win.",
    "don't stop won't stop - it's the 2nd of 2026",
    "  spaced   out\ttabs\nand newlines  ",
    "naive cafe",
]


def test_gpt2_pretokenizer_pins():
    # published-convention pins: contractions split, leading space
    # attaches, digits separate from letters, unicode bytes expand
    assert bpe.pretoken_units("isn't it?") == ["isn", "'t", "Ġit", "?"]
    assert bpe.pretoken_units("a2b") == ["a", "2", "b"]
    # multi-byte UTF-8 char -> one unit PER BYTE
    assert len(bpe.pretoken_units("é")[0]) == 2
    # byte map is a 256-bijection and round-trips
    b2u = bpe.bytes_to_unicode()
    assert len(b2u) == 256 and len(set(b2u.values())) == 256
    assert all(" " not in u for u in b2u.values())


def test_train_bpe_bytes_matches_reference_and_paths_agree(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CORPUS)], "doc_id long, text string"
    )
    ref_merges, _, _ = _ref_byte_bpe(_CORPUS, 20)
    driver = bpe.train_bpe_bytes(df, num_merges=20)
    dist = bpe.train_bpe_bytes(df, num_merges=20, driver_threshold=0)
    assert driver == ref_merges
    assert dist == ref_merges


def test_apply_bpe_bytes_counts_match_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CORPUS)], "doc_id long, text string"
    )
    merges = bpe.train_bpe_bytes(df, num_merges=15)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_bytes"])
        for r in bpe.apply_bpe_bytes(df, merges).collect()
    }
    _, table, _ = _ref_byte_bpe(_CORPUS, 15)
    for i, t in enumerate(_CORPUS):
        units = bpe.pretoken_units(t)
        want_tokens = sum(len(table[u]) for u in units)
        want_bytes = sum(len(u) for u in units)
        assert got[i] == (want_tokens, want_bytes), f"doc {i}"
    # merges compress at the corpus level (a short doc whose pretokens
    # hit no learned merge legitimately stays at tokens == bytes)
    assert sum(g[0] for g in got.values()) < sum(g[1] for g in got.values())
    assert all(got[i][0] <= got[i][1] for i in range(len(_CORPUS)))


def test_byte_bpe_token_counts_drive_packing(spark):
    """The packing seam: pack_sequences budgets on the REAL tokenizer
    counts via token_count_col, and sum(n_tokens) == corpus BPE tokens
    (the packing conservation law under the production tokenizer)."""
    from pyspark.sql import functions as F

    from cuda_acceleratedvectordatabaseengine_spark.operators import packing

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CORPUS * 4)], "doc_id long, text string"
    )
    merges = bpe.train_bpe_bytes(df, num_merges=10)
    counts = bpe.apply_bpe_bytes(df, merges).select("doc_id", "n_tokens")
    total = counts.agg(F.sum("n_tokens")).first()[0]
    packed = packing.pack_sequences(
        counts, budget=16, token_count_col="n_tokens"
    )
    rows = packed.collect()
    assert sum(r["n_tokens"] for r in rows) == total
    assert all(r["n_tokens"] <= 16 for r in rows)
    full = [r for r in rows if r["n_tokens"] == 16]
    assert len(full) >= len(rows) - 1  # only the tail may be partial


def test_byte_bpe_ids_lossless_roundtrip(spark):
    """Byte-level BPE's defining property: encode -> decode reproduces
    the EXACT input text (no normalization, unicode included)."""
    texts = _CORPUS + ["café über-naïve — 2026?!", ""]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe.train_bpe_bytes(df, num_merges=12)
    got = {
        r["doc_id"]: (list(r["token_ids"]), r["n_tokens"])
        for r in bpe.encode_documents_bpe(df, merges).collect()
    }
    for i, t in enumerate(texts):
        ids, n = got[i]
        assert n == len(ids)
        assert bpe.decode_bpe_ids(ids, merges) == t, f"doc {i}"
    # id space: bytes 0-255 then merges in order; counts agree with
    # apply_bpe_bytes
    vocab = bpe.bpe_vocab(merges)
    assert len(vocab) == 256 + len({m for m, _ in merges})
    counts = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe.apply_bpe_bytes(df, merges).collect()
    }
    assert all(counts[i] == got[i][1] for i in range(len(texts)))


def test_bpe_packing_shard_chain_end_to_end(spark, tmp_path):
    """Verdict r8 item 7 — the WHOLE token pipeline as one certified
    chain on real corpus text: byte-BPE encode -> token counts ->
    pack_sequences -> shard export -> decode round-trip. The packing is
    checked ROW-FOR-ROW against an independent pure-Python packer fed
    the same counts (not just the conservation law), and every shard
    doc decodes back to its exact text — so the token-budget operators
    are provably consistent with the tokenizer that ships."""
    from pyspark.sql import functions as F

    from cuda_acceleratedvectordatabaseengine_spark.operators import (
        packing,
        shards,
    )
    from cuda_acceleratedvectordatabaseengine_spark.sources import tables

    docs = (
        tables.load(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(60)
    )
    merges = bpe.train_bpe_bytes(docs, num_merges=24)
    enc = bpe.encode_documents_bpe(docs, merges)
    budget = 128

    # --- packing vs an independent reference packer over the same counts
    packed = {
        r["seq_id"]: (r["n_docs"], r["n_tokens"], r["first_doc"], r["last_doc"])
        for r in packing.pack_sequences(
            enc, budget=budget, token_count_col="n_tokens"
        ).collect()
    }
    counts = sorted(
        (r["doc_id"], r["n_tokens"]) for r in enc.collect() if r["n_tokens"] > 0
    )
    expect: dict = {}
    pos = 0
    for doc_id, n in counts:
        start, end = pos, pos + n
        pos = end
        for seq in range(start // budget, (end - 1) // budget + 1):
            lo, hi = seq * budget, (seq + 1) * budget
            nd, nt, fd, ld = expect.get(seq, (0, 0, doc_id, doc_id))
            expect[seq] = (
                nd + 1,
                nt + min(end, hi) - max(start, lo),
                min(fd, doc_id),
                max(ld, doc_id),
            )
    assert packed == expect
    assert sum(v[1] for v in packed.values()) == sum(n for _, n in counts)

    # --- shard export of the encoded payload; decode round-trip
    joined = docs.join(enc, "doc_id")
    out = str(tmp_path / "tok_shards")
    shards.write_training_shards(
        joined.select("doc_id", "text", "token_ids", "n_tokens"),
        out,
        n_shards=4,
    )
    back = shards.read_training_shards(spark, out).collect()
    assert len(back) == docs.count()
    total_back = 0
    for r in back:
        ids = list(r["token_ids"])
        assert r["n_tokens"] == len(ids)
        total_back += len(ids)
        assert bpe.decode_bpe_ids(ids, merges) == r["text"], r["doc_id"]
    # shard accounting equals the packing input total (zero-token docs
    # ship but add nothing): one consistent token currency end to end
    assert total_back == sum(n for _, n in counts)


def test_merges_file_stamps_pretokenizer_variant(tmp_path):
    """The merges artifact records which pretokenizer compiled (regex vs
    re-fallback); loading under the other variant warns, pre-stamp files
    load silently (ADVICE r9: cross-environment portability)."""
    import json
    import warnings

    p = str(tmp_path / "m.json")
    bpe.save_merges([("a b", 3)], p)
    doc = json.load(open(p))
    assert doc["pretokenizer"] == bpe.PRETOKENIZER_VARIANT
    # same-variant load: silent
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert bpe.load_merges(p) == [("a b", 3)]
        assert not any("pretokenizer" in str(x.message) for x in w)
    # cross-variant load: warns, still loads
    other = "re-fallback" if bpe.PRETOKENIZER_VARIANT == "regex" else "regex"
    doc["pretokenizer"] = other
    json.dump(doc, open(p, "w"))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert bpe.load_merges(p) == [("a b", 3)]
        assert any("pretokenizer" in str(x.message) for x in w)
    # legacy file without the stamp: silent
    del doc["pretokenizer"]
    json.dump(doc, open(p, "w"))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert bpe.load_merges(p) == [("a b", 3)]
        assert not any("pretokenizer" in str(x.message) for x in w)
