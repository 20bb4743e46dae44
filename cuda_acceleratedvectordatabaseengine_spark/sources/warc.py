"""WARC (Web ARChive, ISO 28500) source — the on-disk format every
production pretraining ingest starts from (CommonCrawl ships crawl dumps
as gzip-member-per-record WARC files).

The reference engine has no crawl surface (north-star scope, like the
HTML/URL/PII stages); everything here is public-spec behavior:

- **WARC/1.0 and /1.1 framing**: ``WARC/1.x CRLF headers CRLF CRLF``
  then ``Content-Length`` payload bytes then ``CRLF CRLF``.
- **CommonCrawl compression**: each record is its OWN gzip member and
  members are concatenated, so a reader can skip to a member boundary
  without decompressing the whole file. Plain (uncompressed) ``.warc``
  is accepted too.
- **response records**: the payload is a raw HTTP/1.1 response —
  status line + headers, blank line, body. The reader splits it,
  exposing the status code, the body ``Content-Type``, and the body
  bytes (what the HTML pipeline wants).

Scale posture: the distribution unit is the FILE (a crawl dump is tens
of thousands of ~1 GB WARC files; gzip members are not splittable
without an external index, and one-task-per-file is how CommonCrawl is
processed in practice — e.g. the public SparkCC harness). The reader is
``binaryFile`` scan -> Arrow-batched ``mapInPandas`` parse; memory per
task is bounded by one file compressed + one record decompressed (the
member walk never inflates the whole file at once). Malformed records
and trailing garbage are skipped, not raised — corrupt crawl data is
data, the same PERMISSIVE discipline as ``sources/documents.py``.

Writing: real pipelines read WARC, they don't write it, so the writer
here exists for fixtures and round-trip tests: ``warc_record_bytes`` /
``write_warc_file`` (driver-side, bounded) and ``warc_sink`` (the
distributed form — one file per partition via mapInPandas, idempotent
filenames keyed on partitionId so task retries overwrite instead of
duplicating).
"""

from __future__ import annotations

import gzip
import os
import re
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CRLF = b"\r\n"

WARC_RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType(), False),
        T.StructField("record_idx", T.LongType(), False),
        T.StructField("record_id", T.StringType(), True),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("content_length", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)


# ---------------------------------------------------------------------------
# byte-level parsing (pure stdlib, runs inside the mapInPandas batches)
# ---------------------------------------------------------------------------
def _iter_decompressed(buf: bytes):
    """Yield decompressed chunks of ``buf``: one chunk per gzip member
    for member-concatenated files (the CommonCrawl layout), or the whole
    buffer when it isn't gzip. Bounds memory at one member, never the
    whole decompressed file."""
    if len(buf) < 2 or buf[0] != 0x1F or buf[1] != 0x8B:
        yield buf
        return
    pos = 0
    while pos + 2 <= len(buf) and buf[pos] == 0x1F and buf[pos + 1] == 0x8B:
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(buf[pos:])
        except zlib.error:
            return  # truncated/corrupt member: stop, keep what we have
        yield out
        consumed = (len(buf) - pos) - len(d.unused_data)
        if consumed <= 0:
            return
        pos += consumed


def _parse_headers(block: bytes) -> "dict[str, str]":
    """Case-insensitive header dict from a CRLF header block (first line
    excluded by the caller). Folded continuation lines are appended."""
    out: "dict[str, str]" = {}
    last = None
    for line in block.split(CRLF):
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and last is not None:
            out[last] += " " + line.strip().decode("latin-1")
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            continue
        last = name.strip().decode("latin-1").lower()
        out[last] = value.strip().decode("latin-1")
    return out


def _split_http_response(payload: bytes):
    """(status int|None, body_content_type str|None, body bytes) from a
    raw HTTP response payload; returns (None, None, payload) when the
    payload doesn't start with an HTTP status line."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    head_end = payload.find(CRLF + CRLF)
    if head_end < 0:
        return None, None, payload
    head = payload[:head_end]
    body = payload[head_end + 4 :]
    first, _, rest = head.partition(CRLF)
    parts = first.split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        status = None
    ctype = _parse_headers(rest).get("content-type")
    return status, ctype, body


def parse_warc_records(data: bytes):
    """Yield dicts for every well-formed WARC record in ``data`` (one
    decompressed chunk: a gzip member or a whole plain file — either may
    hold one record or many back-to-back). Malformed framing stops the
    walk of this chunk; records already parsed are kept."""
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if not data[pos : pos + 5] == b"WARC/":
            return
        head_end = data.find(CRLF + CRLF, pos)
        if head_end < 0:
            return
        hdr = _parse_headers(data[pos:head_end].partition(CRLF)[2])
        try:
            clen = int(hdr.get("content-length", ""))
        except ValueError:
            return
        payload = data[head_end + 4 : head_end + 4 + clen]
        if len(payload) < clen:
            return  # truncated record
        rec = {
            "record_id": hdr.get("warc-record-id"),
            "warc_type": hdr.get("warc-type"),
            "url": hdr.get("warc-target-uri"),
            "warc_date": hdr.get("warc-date"),
            "record_content_type": hdr.get("content-type"),
            "payload": payload,
        }
        yield rec
        pos = head_end + 4 + clen


def _records_of_file(path: str, content: bytes, record_types, with_text: bool):
    idx = 0
    want = set(record_types) if record_types else None
    for chunk in _iter_decompressed(content):
        for rec in parse_warc_records(chunk):
            wtype = rec["warc_type"]
            if want is not None and wtype not in want:
                continue
            payload = rec["payload"]
            status, body_ctype, body = (None, None, payload)
            if wtype in ("response", "revisit"):
                status, body_ctype, body = _split_http_response(payload)
            yield {
                "warc_file": path,
                "record_idx": idx,
                "record_id": rec["record_id"],
                "warc_type": wtype,
                "url": rec["url"],
                "warc_date": rec["warc_date"],
                "http_status": status,
                "content_type": body_ctype or rec["record_content_type"],
                "content_length": len(body),
                "payload": bytearray(body),
                "text": (
                    body.decode("utf-8", errors="replace")
                    if with_text
                    else None
                ),
            }
            idx += 1


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: "tuple[str, ...] | None" = ("response",),
    with_text: bool = True,
) -> DataFrame:
    """WARC file(s)/glob -> one row per (selected) record, schema
    ``WARC_RECORDS_SCHEMA``. ``record_types=None`` keeps every record
    type (request/metadata/warcinfo included); the default keeps the
    ``response`` records a corpus pipeline wants. ``with_text`` adds a
    UTF-8 (errors=replace) decode of the body — charset sniffing beyond
    UTF-8 is a downstream concern, same as the JSONL readers.

    Plan shape: binaryFile scan (one row per file) -> mapInPandas parse;
    parallelism = number of files, the CommonCrawl processing unit."""
    raw = (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
    )
    return raw.mapInPandas(
        _parse_records(record_types, with_text), schema=WARC_RECORDS_SCHEMA
    )


def _parse_records(record_types, with_text):
    """The shared binaryFile-row -> WARC-record-rows parse (batch and
    streaming sources run the identical function)."""
    import pandas as pd

    def parse(batches):
        for pdf in batches:
            rows = []
            for p, c in zip(pdf["path"], pdf["content"]):
                rows.extend(_records_of_file(p, bytes(c), record_types, with_text))
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_RECORDS_SCHEMA.fields]
            )

    return parse


def read_warc_stream(
    spark: SparkSession,
    path: str,
    record_types: "tuple[str, ...] | None" = ("response",),
    with_text: bool = True,
) -> DataFrame:
    """Streaming twin of ``read_warc``: WARC files appearing under
    ``path`` become micro-batches (binaryFile file-source, one task per
    file — the SparkCC discipline carries over unchanged; the parse
    function is literally the same one). The arrival-time head of the
    streaming flagship (tests/test_streaming_flagship.py)."""
    # file-stream sources demand an explicit schema; binaryFile's is fixed
    binary_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    raw = (
        spark.readStream.format("binaryFile")
        .schema(binary_schema)
        .load(path)
        .select("path", "content")
    )
    return raw.mapInPandas(
        _parse_records(record_types, with_text), schema=WARC_RECORDS_SCHEMA
    )


def warc_manifest(
    spark: SparkSession, path: str, id_from_record_id: bool = True
) -> DataFrame:
    """``read_warc`` landed in the crawl-manifest shape
    ``(doc_id, url, html)`` that ``operators.web.ingest_stats`` and
    ``streaming.web_stream.web_ingest_stream`` consume. ``doc_id`` is
    the WARC-Record-ID's id part only when the WHOLE id is numeric
    (``<urn:scheme:12345>`` — fixture round-trips preserve ids
    exactly); otherwise — including real CommonCrawl ``urn:uuid:``
    ids, whose leading hex-digit run must not be mistaken for an id —
    a content-addressed xxhash64(url, body), deterministic across
    reruns, no counter."""
    recs = read_warc(spark, path, record_types=("response",), with_text=True)
    return _manifest_columns(recs, id_from_record_id)


def _manifest_columns(recs: DataFrame, id_from_record_id: bool = True) -> DataFrame:
    hashed = F.abs(F.xxhash64(F.col("url"), F.col("text")))
    if id_from_record_id:
        digits = F.regexp_extract(
            F.coalesce(F.col("record_id"), F.lit("")),
            "^<urn:[^:>]+:(\\d+)>$",
            1,
        )
        did = F.when(digits != "", digits.cast("long")).otherwise(hashed)
    else:
        did = hashed
    return recs.select(
        did.alias("doc_id"),
        F.col("url"),
        F.col("text").alias("html"),
        F.col("warc_date"),
    )


def warc_manifest_stream(
    spark: SparkSession, path: str, id_from_record_id: bool = True
) -> DataFrame:
    """Streaming twin of ``warc_manifest``: the (doc_id, url, html,
    warc_date) crawl-manifest shape over ``read_warc_stream`` — the
    projection is the shared ``_manifest_columns``, so batch and stream
    land byte-identical rows for identical files."""
    return _manifest_columns(
        read_warc_stream(spark, path, record_types=("response",), with_text=True),
        id_from_record_id,
    )


# ---------------------------------------------------------------------------
# fixture/round-trip writers
# ---------------------------------------------------------------------------
_CTRL = re.compile(r"[\x00-\x1f\x7f]+")


def _header_value(v: str) -> bytes:
    """WARC header values must be a single line: a crawled URL (or a
    hostile record id) containing CR/LF would otherwise terminate the
    header early and smuggle bytes into the record framing, breaking
    the lossless round-trip contract. Strip ALL control characters —
    they are never legal in a header value — so framing is unforgeable
    regardless of input."""
    return _CTRL.sub("", v).encode()


def warc_record_bytes(
    url: str,
    body: bytes,
    record_id: str | None = None,
    date: str = "2026-01-01T00:00:00Z",
    warc_type: str = "response",
    compress: bool = True,
) -> bytes:
    """One WARC/1.0 record (response records wrap the body in a minimal
    HTTP/1.1 200 envelope) — its own gzip member when ``compress``, the
    CommonCrawl layout."""
    if warc_type == "response":
        payload = (
            b"HTTP/1.1 200 OK" + CRLF
            + b"Content-Type: text/html; charset=utf-8" + CRLF
            + b"Content-Length: " + str(len(body)).encode() + CRLF
            + CRLF
            + body
        )
        ctype = "application/http; msgtype=response"
    else:
        payload = body
        ctype = "application/warc-fields"
    headers = [
        ("WARC-Type", warc_type),
        ("WARC-Date", date),
        ("WARC-Record-ID", record_id or "<urn:cavde:0>"),
        ("WARC-Target-URI", url),
        ("Content-Type", ctype),
        ("Content-Length", str(len(payload))),
    ]
    head = b"WARC/1.0" + CRLF + b"".join(
        k.encode() + b": " + _header_value(v) + CRLF for k, v in headers
    )
    rec = head + CRLF + payload + CRLF + CRLF
    return gzip.compress(rec, mtime=0) if compress else rec


def write_warc_file(rows, path: str, compress: bool = True) -> int:
    """Driver-side fixture writer: ``rows`` of (doc_id, url, html) ->
    one WARC file (gzip member per record when ``compress``). Returns
    the record count. Tests and bounded fixtures only — the distributed
    form is ``warc_sink``."""
    n = 0
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        for doc_id, url, html in rows:
            f.write(
                warc_record_bytes(
                    url,
                    html.encode("utf-8"),
                    record_id=f"<urn:cavde:{doc_id}>",
                    compress=compress,
                )
            )
            n += 1
    return n


def warc_sink(
    manifest: DataFrame,
    out_dir: str,
    url_col: str = "url",
    html_col: str = "html",
    id_col: str = "doc_id",
    compress: bool = True,
) -> DataFrame:
    """Distributed WARC writer: one ``part-NNNNN.warc.gz`` per partition
    of ``manifest``, written from inside mapInPandas. The final filename
    keys on ``TaskContext.partitionId()``; each ATTEMPT writes a private
    dot-tmp (``.part-NNNNN.attempt-K.tmp``) and atomically renames on
    completion — a kill mid-write leaves only an unreadable tmp (never a
    truncated ``.warc.gz``), a retried or speculative duplicate attempt
    replaces the same final file instead of interleaving with it, and
    re-executing the whole job is idempotent (chaos battery:
    tests/test_chaos_writes.py). Returns the (warc_file, n_records)
    accounting DataFrame — collecting it (bounded: one row per
    partition) is what materializes the writes. ``out_dir`` must be
    storage every executor can reach (local dir on local[*], shared FS
    on a cluster)."""
    import pandas as pd
    from pyspark import TaskContext

    os.makedirs(out_dir, exist_ok=True)
    cols = manifest.select(id_col, url_col, html_col)

    def write(batches):
        ctx = TaskContext.get()
        pid, attempt = ctx.partitionId(), ctx.taskAttemptId()
        ext = ".warc.gz" if compress else ".warc"
        path = os.path.join(out_dir, f"part-{pid:05d}{ext}")
        tmp = os.path.join(out_dir, f".part-{pid:05d}.attempt-{attempt}.tmp")
        n = 0
        try:
            with open(tmp, "wb") as f:
                for pdf in batches:
                    for did, url, html in zip(
                        pdf[id_col], pdf[url_col], pdf[html_col]
                    ):
                        f.write(
                            warc_record_bytes(
                                str(url),
                                str(html).encode("utf-8"),
                                record_id=f"<urn:cavde:{int(did)}>",
                                compress=compress,
                            )
                        )
                        n += 1
            os.replace(tmp, path)  # atomic publish
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
        yield pd.DataFrame({"warc_file": [path], "n_records": [n]})

    return cols.mapInPandas(write, schema="warc_file string, n_records long")
