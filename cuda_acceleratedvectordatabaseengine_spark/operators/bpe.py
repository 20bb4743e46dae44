"""Byte-pair-encoding merge training over a distributed corpus.

Training a BPE vocabulary is the canonical "tokenizer prep" job of an
LLM data pipeline. The algorithm (Sennrich et al. 2016) is inherently
iterative — count adjacent symbol pairs, merge the most frequent,
repeat — but its working set collapses after one corpus pass: all
counting happens on the WORD FREQUENCY table (Heaps'-law sized, not
corpus sized). The Spark shape follows that structure:

1. one distributed pass builds (word, freq) — the only corpus-scale
   shuffle;
2. each merge iteration is one aggregation over the word table
   (adjacent-pair explode weighted by freq), a bounded top-1 driver
   read (orderBy + limit 1), and a vectorized merge rewrite;
3. below ``driver_threshold`` distinct words (the common case — even
   100 TB of web text lands in the tens of millions of words, and the
   sampled training corpora tokenizer teams actually use are far
   smaller), the whole loop runs driver-side on the collected frequency
   table: identical results (differentially tested), none of the
   per-iteration job overhead.

No end-of-word marker (SentencePiece-style interior merges) — the
marker variant is a representation choice, not an algorithmic one, and
omitting it keeps the pair-count core SQL-recomputable for the oracle.

Ties break on (count DESC, pair lexicographic ASC) in both paths, so
training is deterministic everywhere.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TXT


def word_freq(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the lowercased whitespace words — the one
    corpus-scale pass; everything downstream works on this table."""
    return (
        df.select(
            F.explode(TXT.tokens_expr(F.lower(F.col(text_col)))).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def with_symbols(words: DataFrame) -> DataFrame:
    """Append the initial symbol array (one character per symbol)."""
    w = F.col("word")
    syms = F.transform(
        F.sequence(F.lit(1), F.length(w)), lambda i: w.substr(i, F.lit(1))
    )
    return words.withColumn("syms", syms)


def pair_counts(words_with_syms: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent symbol pairs weighted by word frequency —
    one map-side-combined aggregation over the word table."""
    s = F.col("syms")
    n = F.size(s)
    pairs = F.arrays_zip(
        F.slice(s, 1, F.greatest(n - 1, F.lit(0))).alias("a"),
        F.slice(s, 2, F.greatest(n - 1, F.lit(0))).alias("b"),
    )
    return (
        words_with_syms.select(F.col("freq"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def _merge_in_word(syms: "list[str]", a: str, b: str) -> "list[str]":
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _train_driver(rows: "list[tuple[str, int]]", num_merges: int):
    """Reference loop on the collected (word, freq) table."""
    table = {w: ([*w], f) for w, f in rows}
    merges = []
    for _ in range(num_merges):
        counts: dict = {}
        for syms, f in table.values():
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                counts[k] = counts.get(k, 0) + f
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, int(c)))
        table = {
            w: (_merge_in_word(syms, a, b), f)
            for w, (syms, f) in table.items()
        }
    return merges


def train_bpe(
    df: DataFrame,
    num_merges: int = 50,
    text_col: str = "text",
    driver_threshold: int = 200_000,
) -> "list[tuple[str, int]]":
    """Learn ``num_merges`` BPE merges; returns [(merged_symbol, count)]
    in merge order (the vocabulary file a tokenizer ships).

    Hybrid like ``kmeans.train`` / ``dedup.connected_components``: a
    bounded limit-probe decides whether the distinct-word table fits the
    driver (fast path) or the loop runs distributed — one pair-count
    aggregation + one bounded top-1 read + one Arrow-batched merge
    rewrite per iteration. Both paths share the tie rule
    (count DESC, pair ASC) and are differentially tested equal.
    """
    if num_merges <= 0:
        raise ValueError(f"num_merges must be positive, got {num_merges}")
    return _train_from_word_table(
        word_freq(df, text_col), num_merges, driver_threshold
    )


def _train_from_word_table(
    words: DataFrame, num_merges: int, driver_threshold: int
) -> "list[tuple[str, int]]":
    """The shared merge loop over any (word, freq) table — ``train_bpe``
    feeds whitespace words, ``train_bpe_bytes`` feeds byte-unit-mapped
    GPT-2 pretokens; the counting/merge machinery is identical."""
    probe = words.limit(driver_threshold + 1).count()
    if probe <= driver_threshold:
        rows = [(r["word"], r["freq"]) for r in words.collect()]
        return [(a + b, c) for a, b, c in _train_driver(rows, num_merges)]

    cur = with_symbols(words)
    merges: list = []
    for _ in range(num_merges):
        top = (
            pair_counts(cur)
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )  # bounded: exactly one row
        if not top:
            break
        a, b, c = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((a + b, c))

        def rewrite(pdfs, a=a, b=b):
            for pdf in pdfs:
                pdf["syms"] = [
                    _merge_in_word(list(s), a, b) for s in pdf["syms"]
                ]
                yield pdf

        cur = cur.mapInPandas(
            rewrite, schema="word string, freq long, syms array<string>"
        )
        # keep lineage flat across iterations (same discipline as the
        # distributed CC loop): each round folds the previous rewrite
        cur = cur.localCheckpoint(eager=False)
    return merges


def apply_bpe(
    df: DataFrame,
    merges: "list[tuple[str, int]]",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents with a learned merge list: per doc, the BPE
    token count and the chars/token compression ratio — the metric that
    says whether the vocabulary is worth shipping."""
    order = [m for m, _c in merges]

    def run(pdfs):
        for pdf in pdfs:
            toks_out = []
            for text in pdf["text"]:
                words = str(text or "").lower().split()
                total = 0
                for w in words:
                    syms = [*w]
                    for m in order:
                        # merge symbol pairs that concatenate to m
                        out, i, n = [], 0, len(syms)
                        while i < n:
                            if (
                                i + 1 < n
                                and syms[i] + syms[i + 1] == m
                            ):
                                out.append(m)
                                i += 2
                            else:
                                out.append(syms[i])
                                i += 1
                        syms = out
                    total += len(syms)
                toks_out.append(total)
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "bpe_tokens": toks_out,
                    "chars": [
                        len(str(t or "").replace(" ", ""))
                        for t in pdf["text"]
                    ],
                }
            )
            yield out

    res = df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} long, bpe_tokens long, chars long"
    )
    return res.withColumn(
        "chars_per_token",
        F.when(F.col("bpe_tokens") > 0, F.col("chars") / F.col("bpe_tokens")),
    )


def save_merges(merges: "list[tuple[str, int]]", path: str) -> None:
    """Persist a learned merge list as JSON — the vocabulary artifact a
    tokenizer ships. Atomic (write-then-rename), so a crashed save never
    leaves a truncated file behind.

    The file records which pretokenizer variant was in force
    (``regex`` = the verbatim GPT-2 \\p-class pattern, ``re-fallback``
    = the stdlib approximation): merges trained under one variant and
    applied under the other tokenize non-decimal numerals differently,
    so :func:`load_merges` flags the mismatch instead of silently
    drifting across environments."""
    import json
    import os

    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"format": "bpe_merges_v1",
             "pretokenizer": PRETOKENIZER_VARIANT,
             "merges": [[m, int(c)] for m, c in merges]},
            f,
        )
    os.replace(tmp, path)


def load_merges(path: str) -> "list[tuple[str, int]]":
    """Load a merge list saved by :func:`save_merges` (merge ORDER is
    the tokenizer contract — preserved exactly). Warns when the file was
    saved under a different pretokenizer variant than the one compiled
    here (see :func:`save_merges`); files from before the stamp load
    silently."""
    import json
    import warnings

    with open(path) as f:
        doc = json.load(f)
    if doc.get("format") != "bpe_merges_v1":
        raise ValueError(
            f"not a bpe_merges_v1 file: {path} (format={doc.get('format')!r})"
        )
    saved = doc.get("pretokenizer")
    if saved is not None and saved != PRETOKENIZER_VARIANT:
        warnings.warn(
            f"merges file {path} was trained under pretokenizer "
            f"{saved!r} but this environment compiled "
            f"{PRETOKENIZER_VARIANT!r}; byte-BPE tokenization of "
            "non-decimal numerals will differ from training",
            stacklevel=2,
        )
    return [(m, int(c)) for m, c in doc["merges"]]


# ---------------------------------------------------------------------------
# Byte-level BPE (the GPT-2 convention: Radford et al. 2019, public
# encoder.py) — regex pretokenization, a 256-symbol byte alphabet mapped
# to printable unicode units, merges learned over pretoken frequencies.
# Real pipelines tokenize this way; the word-level trainer above remains
# for the SQL-oracle-friendly counting core.
# ---------------------------------------------------------------------------

# GPT-2's pretokenizer. With the `regex` module available we compile
# the published pattern verbatim (true \p{L}/\p{N} classes). The `re`
# fallback approximates: letters \p{L} -> [^\W\d_], numerals \p{N} ->
# \d, "other" -> (?:[^\s\w]|_) — self-consistent, but non-decimal
# numerals (e.g. '²', '½', roman numeral codepoints) are \w-not-\d in
# `re`, so the fallback groups them with letters where real GPT-2
# groups them under \p{N}. Everything downstream (trainer, applier,
# round-trip) is pinned to whichever pattern compiled here, so the
# engine is internally consistent either way.
try:  # pragma: no cover - exercised whenever `regex` is installed
    import regex as _regex

    GPT2_PRETOKEN_RE = _regex.compile(
        r"'s|'t|'re|'ve|'m|'ll|'d"
        r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
        r"|\s+(?!\S)|\s+"
    )
    PRETOKENIZER_VARIANT = "regex"
except ImportError:  # pragma: no cover
    GPT2_PRETOKEN_RE = re.compile(
        r"'s|'t|'re|'ve|'m|'ll|'d"
        r"| ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+"
        r"|\s+(?!\S)|\s+"
    )
    PRETOKENIZER_VARIANT = "re-fallback"


def bytes_to_unicode() -> "dict[int, str]":
    """GPT-2's reversible byte -> printable-unicode-unit table: the 188
    visible latin-1 bytes map to themselves, the 68 others (controls,
    space, DEL...) to 256+i. Merged symbols are then plain strings —
    hashable, SQL-safe, no raw control bytes in the vocabulary file."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAC + 1))
        + list(range(0xAE, 0xFF + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


_B2U = bytes_to_unicode()
_U2B = {u: b for b, u in _B2U.items()}


def pretoken_units(text: str) -> "list[str]":
    """GPT-2 pretokenize + byte->unit map: each pretoken becomes a string
    of unit chars (one per UTF-8 byte) — the symbol sequences the byte
    trainer counts and the applier merges."""
    return [
        "".join(_B2U[b] for b in tok.encode("utf-8"))
        for tok in GPT2_PRETOKEN_RE.findall(text or "")
    ]


def byte_pretoken_freq(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over byte-unit-mapped GPT-2 pretokens — the byte
    trainer's one corpus-scale pass (Heaps'-law sized output, same scale
    posture as ``word_freq``). Python-regex pretokenization runs inside
    mapInPandas with a per-batch local combine, so the shuffle carries
    pretoken partials, not raw text."""

    def count(pdfs):
        for pdf in pdfs:
            local: dict = {}
            for text in pdf[text_col]:
                for unit in pretoken_units(str(text or "")):
                    local[unit] = local.get(unit, 0) + 1
            yield pd.DataFrame(
                {"word": list(local), "freq": list(local.values())}
            )

    partials = df.select(text_col).mapInPandas(
        count, schema="word string, freq long"
    )
    return partials.groupBy("word").agg(F.sum("freq").alias("freq"))


def train_bpe_bytes(
    df: DataFrame,
    num_merges: int = 50,
    text_col: str = "text",
    driver_threshold: int = 200_000,
) -> "list[tuple[str, int]]":
    """Learn ``num_merges`` byte-level merges (GPT-2 convention);
    returns [(merged_unit_string, count)] in merge order. Same hybrid
    driver/distributed loop and (count DESC, pair ASC) tie rule as the
    word trainer — differentially tested against a pure-Python
    reference implementation (tests/test_bpe.py)."""
    if num_merges <= 0:
        raise ValueError(f"num_merges must be positive, got {num_merges}")
    return _train_from_word_table(
        byte_pretoken_freq(df, text_col), num_merges, driver_threshold
    )


def apply_bpe_bytes(
    df: DataFrame,
    merges: "list[tuple[str, int]]",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize with a learned byte-level merge list -> per doc
    {doc_id, n_tokens, n_bytes, bytes_per_token}. ``n_tokens`` is the
    PRODUCTION token count: feed it to the packing/token-budget
    operators via their ``token_count_col`` seam (pack_sequences,
    token_budget_sample) so sequence budgets reflect the tokenizer that
    will actually run, not the whitespace proxy. Merges apply in
    training order per pretoken (equivalent to GPT-2's rank-priority
    loop; differentially tested)."""
    order = [m for m, _c in merges]

    def run(pdfs):
        # per-batch memo: corpora repeat pretokens heavily, so tokenize
        # each distinct pretoken once per batch
        for pdf in pdfs:
            memo: dict = {}
            n_toks, n_bytes = [], []
            for text in pdf[text_col]:
                total = nb = 0
                for unit in pretoken_units(str(text or "")):
                    got = memo.get(unit)
                    if got is None:
                        syms = list(unit)
                        for m in order:
                            out, i, n = [], 0, len(syms)
                            while i < n:
                                if i + 1 < n and syms[i] + syms[i + 1] == m:
                                    out.append(m)
                                    i += 2
                                else:
                                    out.append(syms[i])
                                    i += 1
                            syms = out
                            if len(syms) == 1:
                                break
                        got = len(syms)
                        memo[unit] = got
                    total += got
                    nb += len(unit)
                n_toks.append(total)
                n_bytes.append(nb)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_tokens": n_toks,
                    "n_bytes": n_bytes,
                }
            )

    res = df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} long, n_tokens long, n_bytes long"
    )
    return res.withColumn(
        "bytes_per_token",
        F.when(F.col("n_tokens") > 0, F.col("n_bytes") / F.col("n_tokens")),
    )


def bpe_vocab(merges: "list[tuple[str, int]]") -> "dict[str, int]":
    """token-unit-string -> id over the GPT-2 convention's id space:
    ids 0-255 are the byte alphabet (in byte order, via the
    bytes_to_unicode map), then one id per merge in merge order — the
    vocabulary file a byte-level tokenizer ships alongside merges."""
    vocab = {_B2U[b]: b for b in range(256)}
    nxt = 256
    for m, _c in merges:
        if m not in vocab:
            vocab[m] = nxt
            nxt += 1
    return vocab


def encode_documents_bpe(
    df: DataFrame,
    merges: "list[tuple[str, int]]",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize to TOKEN IDS -> {doc_id, token_ids array<int>, n_tokens}
    — the payload a training-shard export actually ships. Byte-level
    BPE is lossless: decoding ids through the vocab back to bytes
    reproduces the exact input text (round-trip-tested), so shards
    carry no silent normalization."""
    order = [m for m, _c in merges]
    vocab = bpe_vocab(merges)

    def run(pdfs):
        memo: dict = {}

        def toks_of(unit):
            got = memo.get(unit)
            if got is None:
                syms = list(unit)
                for m in order:
                    out, i, n = [], 0, len(syms)
                    while i < n:
                        if i + 1 < n and syms[i] + syms[i + 1] == m:
                            out.append(m)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    syms = out
                    if len(syms) == 1:
                        break
                got = [vocab[s] for s in syms]
                memo[unit] = got
            return got

        for pdf in pdfs:
            ids_out = []
            for text in pdf[text_col]:
                ids: list = []
                for unit in pretoken_units(str(text or "")):
                    ids.extend(toks_of(unit))
                ids_out.append(ids)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "token_ids": ids_out,
                    "n_tokens": [len(x) for x in ids_out],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} long, token_ids array<int>, n_tokens long"
    )


def decode_bpe_ids(ids: "list[int]", merges: "list[tuple[str, int]]") -> str:
    """Driver-side inverse of ``encode_documents_bpe`` (round-trip tests
    and spot checks): ids -> unit strings -> bytes -> UTF-8 text."""
    vocab = bpe_vocab(merges)
    inv = {i: t for t, i in vocab.items()}
    units = "".join(inv[i] for i in ids)
    return bytes(_U2B[u] for u in units).decode("utf-8", errors="strict")
