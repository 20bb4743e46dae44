"""WARC source (sources/warc.py): framing round-trips, CommonCrawl
gzip-member layout, HTTP response splitting, malformed-record
tolerance, the distributed sink, and the manifest landing that feeds
web.ingest_stats."""
from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from cuda_acceleratedvectordatabaseengine_spark.sources import warc as W


def _fixture_rows(n=6):
    return [
        (
            i,
            f"http://site{i % 3}.com/a/{i}?utm_source=x",
            f"<html><body><p>doc {i} body with several words here.</p></body></html>",
        )
        for i in range(n)
    ]


def test_record_bytes_roundtrip_plain_and_gzip():
    for compress in (False, True):
        blob = W.warc_record_bytes(
            "http://x.com/p", b"<p>hi</p>", record_id="<urn:cavde:7>",
            compress=compress,
        )
        data = gzip.decompress(blob) if compress else blob
        recs = list(W.parse_warc_records(data))
        assert len(recs) == 1
        r = recs[0]
        assert r["warc_type"] == "response"
        assert r["url"] == "http://x.com/p"
        assert r["record_id"] == "<urn:cavde:7>"
        status, ctype, body = W._split_http_response(r["payload"])
        assert status == 200 and ctype.startswith("text/html")
        assert body == b"<p>hi</p>"


def test_multi_member_gzip_and_concatenated_plain(tmp_path, spark):
    rows = _fixture_rows(5)
    # gzip: one member per record (CommonCrawl layout)
    gz = tmp_path / "a.warc.gz"
    W.write_warc_file(rows, str(gz), compress=True)
    # plain: records back-to-back in one stream
    plain = tmp_path / "b.warc"
    W.write_warc_file(rows, str(plain), compress=False)
    for p in (gz, plain):
        got = (
            W.read_warc(spark, str(p))
            .orderBy("record_idx")
            .collect()
        )
        assert [r["url"] for r in got] == [u for _, u, _ in rows]
        assert all(r["http_status"] == 200 for r in got)
        assert all(r["warc_type"] == "response" for r in got)
        # body text survives the HTTP split + utf-8 decode
        assert got[3]["text"] == rows[3][2]
        assert got[0]["content_length"] == len(rows[0][2].encode())


def test_non_response_records_filtered_and_keepable(tmp_path, spark):
    p = tmp_path / "mixed.warc.gz"
    with open(p, "wb") as f:
        f.write(
            W.warc_record_bytes(
                "http://x.com", b"software: test", warc_type="warcinfo"
            )
        )
        f.write(W.warc_record_bytes("http://x.com/1", b"<p>one</p>"))
        f.write(
            W.warc_record_bytes(
                "http://x.com/1", b"GET /1 HTTP/1.1", warc_type="request"
            )
        )
    default = W.read_warc(spark, str(p)).collect()
    assert [r["warc_type"] for r in default] == ["response"]
    everything = W.read_warc(spark, str(p), record_types=None).collect()
    assert sorted(r["warc_type"] for r in everything) == [
        "request", "response", "warcinfo",
    ]
    # non-response payloads pass through unsplit
    info = [r for r in everything if r["warc_type"] == "warcinfo"][0]
    assert bytes(info["payload"]) == b"software: test"
    assert info["http_status"] is None


def test_truncated_and_garbage_tolerance(tmp_path, spark):
    good = W.warc_record_bytes("http://ok.com/1", b"<p>fine</p>", compress=False)
    bad = W.warc_record_bytes("http://bad.com/2", b"<p>gone</p>", compress=False)
    p = tmp_path / "broken.warc"
    with open(p, "wb") as f:
        f.write(good)
        f.write(bad[: len(bad) - 30])  # truncated mid-payload
    got = W.read_warc(spark, str(p)).collect()
    assert [r["url"] for r in got] == ["http://ok.com/1"]
    # a corrupt gzip member after good members keeps the good ones
    p2 = tmp_path / "broken.warc.gz"
    with open(p2, "wb") as f:
        f.write(W.warc_record_bytes("http://ok.com/a", b"<p>a</p>"))
        f.write(b"\x1f\x8b\x08\x00corruptmember")
    got2 = W.read_warc(spark, str(p2)).collect()
    assert [r["url"] for r in got2] == ["http://ok.com/a"]


def test_utf8_replace_decode(tmp_path, spark):
    p = tmp_path / "bin.warc.gz"
    with open(p, "wb") as f:
        f.write(W.warc_record_bytes("http://x.com/b", b"ok \xff\xfe bytes"))
    r = W.read_warc(spark, str(p)).collect()[0]
    assert "ok" in r["text"] and "�" in r["text"]
    assert bytes(r["payload"]) == b"ok \xff\xfe bytes"


def test_warc_sink_distributed_roundtrip(tmp_path, spark):
    rows = _fixture_rows(20)
    manifest = spark.createDataFrame(
        rows, "doc_id long, url string, html string"
    ).repartition(4)
    out = str(tmp_path / "dump")
    acct = W.warc_sink(manifest, out).collect()
    assert sum(r["n_records"] for r in acct) == 20
    assert len(acct) == 4  # one file per partition
    back = W.warc_manifest(spark, out + "/*.warc.gz")
    got = sorted(
        (r["doc_id"], r["url"], r["html"]) for r in back.collect()
    )
    assert got == sorted(rows)  # ids preserved via WARC-Record-ID


def test_warc_manifest_feeds_ingest_stats(tmp_path, spark):
    from cuda_acceleratedvectordatabaseengine_spark.operators import web

    rows = [
        (1, "http://spam.bad.com/x", "<html><body><p>blocked page words here.</p></body></html>"),
        (2, "http://ok.com/a?utm_source=f", "<html><body><p>" + "Good words flow here with many stopwords of the day to be sure. " * 8 + "</p></body></html>"),
        (3, "http://ok.com/a", "<html><body><p>" + "Good words flow here with many stopwords of the day to be sure. " * 8 + "</p></body></html>"),
    ]
    p = str(tmp_path / "c.warc.gz")
    W.write_warc_file(rows, p)
    manifest = W.warc_manifest(spark, p)
    stats = {
        r["name"]: r["n_docs"]
        for r in web.ingest_stats(manifest, blocked=("bad.com",)).collect()
    }
    assert stats["raw"] == 3
    assert stats["blocklist"] == 2  # spam.bad.com dropped
    assert stats["url_dedup"] == 1  # canonical-URL collision folds 2+3


def test_warc_manifest_uuid_record_ids_hash_not_digit_prefix(tmp_path, spark):
    """ADVICE r7: real CommonCrawl WARCs carry urn:uuid record ids; the
    leading hex-digit run must NOT be parsed as a doc_id (e.g.
    <urn:uuid:02a4f3...> -> 2 would collide massively). Only a FULLY
    numeric id is trusted; everything else falls to the content hash."""
    p = str(tmp_path / "uuid.warc.gz")
    with open(p, "wb") as f:
        f.write(
            W.warc_record_bytes(
                "http://a.com/1",
                b"<p>alpha</p>",
                record_id="<urn:uuid:02a4f3aa-1111-4a4a-8a8a-000000000001>",
            )
        )
        f.write(
            W.warc_record_bytes(
                "http://a.com/2",
                b"<p>beta</p>",
                record_id="<urn:uuid:02a4f3aa-1111-4a4a-8a8a-000000000002>",
            )
        )
        # fully numeric id stays trusted (fixture round-trip contract)
        f.write(
            W.warc_record_bytes(
                "http://a.com/3", b"<p>gamma</p>", record_id="<urn:cavde:33>"
            )
        )
    got = {r["url"]: r["doc_id"] for r in W.warc_manifest(spark, p).collect()}
    assert got["http://a.com/3"] == 33
    # uuid ids: distinct content hashes, neither equal to 2
    assert got["http://a.com/1"] != got["http://a.com/2"]
    assert got["http://a.com/1"] != 2 and got["http://a.com/2"] != 2


def test_warc_header_values_crlf_sanitized():
    """ADVICE r7: a crawled URL containing CR/LF must not smuggle bytes
    into the record framing — control chars are stripped from header
    values and the record still round-trips losslessly."""
    evil = "http://x.com/p?a=1\r\nWARC-Type: sneaky\r\n\r\nFAKE"
    blob = W.warc_record_bytes(evil, b"<p>ok</p>", compress=False)
    recs = list(W.parse_warc_records(blob))
    assert len(recs) == 1
    r = recs[0]
    assert r["warc_type"] == "response"
    assert "\r" not in r["url"] and "\n" not in r["url"]
    # the injected pseudo-header stays INSIDE the single-line url value
    # instead of becoming a real record header
    assert r["url"].startswith("http://x.com/p?a=1")
    _, _, body = W._split_http_response(r["payload"])
    assert body == b"<p>ok</p>"


def _fuzz_parse(blob: bytes):
    """Drive the same pure-bytes path _records_of_file uses: decompress
    member-wise, parse records per chunk. Must never raise."""
    out = []
    for chunk in W._iter_decompressed(blob):
        for rec in W.parse_warc_records(chunk):
            out.append(rec)
    return out


def test_warc_fuzz_truncations_and_mutations_never_raise():
    """Fuzz parity with the MP4 walker (r12 verdict #6): random
    truncations and byte mutations of a real multi-member gzip WARC —
    including cuts ON gzip-member boundaries and mutations inside
    record headers — must always parse to a (possibly shorter) record
    list, never raise into the Spark task. Seeded for reproduction."""
    import random

    members = [
        W.warc_record_bytes(
            f"http://fuzz{i}.com/p", f"<p>body {i}</p>".encode(),
            record_id=f"<urn:cavde:{i}>", compress=True,
        )
        for i in range(4)
    ]
    data = b"".join(members)
    assert len(_fuzz_parse(data)) == 4
    # member boundaries: cut exactly at, just before, just after each
    bounds = [0]
    for m in members:
        bounds.append(bounds[-1] + len(m))
    cuts = set(range(0, len(data), 23)) | {
        b + d for b in bounds for d in (-2, -1, 0, 1, 2)
    }
    for cut in sorted(c for c in cuts if 0 <= c <= len(data)):
        got = _fuzz_parse(data[:cut])
        assert isinstance(got, list) and len(got) <= 4
        # prefix property: whole members before the cut still parse
        whole = sum(1 for b in bounds[1:] if b <= cut)
        assert len(got) >= whole - 1  # the member AT the cut may be lost
    rng = random.Random(0xBADC0DE)
    for _ in range(300):
        m = bytearray(data)
        for _ in range(rng.randint(1, 4)):
            m[rng.randrange(len(m))] = rng.randrange(256)
        got = _fuzz_parse(bytes(m))
        assert isinstance(got, list)


def test_warc_fuzz_plain_records_malformed_headers():
    """Plain (uncompressed) framing: mutations that corrupt the WARC/
    magic, the Content-Length header, or the CRLF framing must stop the
    chunk walk cleanly — records before the corruption survive."""
    import random

    recs = [
        W.warc_record_bytes(
            f"http://p{i}.com/x", f"<p>{i}</p>".encode(), compress=False
        )
        for i in range(3)
    ]
    data = b"".join(recs)
    assert len(_fuzz_parse(data)) == 3
    # non-numeric Content-Length in record 2: records 0-1 survive
    broken = data.replace(b"Content-Length:", b"Content-Length: x", 1)
    got = _fuzz_parse(broken)
    assert len(got) <= 3 and isinstance(got, list)
    rng = random.Random(7)
    for cut in range(0, len(data), 11):
        got = _fuzz_parse(data[:cut])
        assert isinstance(got, list)
    for _ in range(200):
        m = bytearray(data)
        for _ in range(rng.randint(1, 3)):
            m[rng.randrange(len(m))] = rng.randrange(256)
        assert isinstance(_fuzz_parse(bytes(m)), list)
