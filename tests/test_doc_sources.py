"""Raw-document ingestion sources (JSONL/CSV/text) and the curated sink."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cuda_acceleratedvectordatabaseengine_spark.sources import documents as DS


@pytest.fixture()
def tmp(request):
    d = tempfile.mkdtemp(prefix="cavde-docsrc-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_read_jsonl_lands_documents_schema(spark, tmp):
    with open(f"{tmp}/a.jsonl", "w") as f:
        f.write('{"text": "hello world", "lang": "en", "source": "web"}\n')
        f.write('{"text": "bonjour le monde", "lang": "fr"}\n')
        f.write("this is not json at all\n")
    df = DS.read_jsonl(spark, f"{tmp}/a.jsonl")
    rows = {r["text"]: r for r in df.collect()}
    assert set(df.columns) == {"doc_id", "text", "lang", "source", "n_chars"}
    assert len(rows) == 2  # the corrupt line is quarantined, not landed
    assert rows["hello world"]["lang"] == "en"
    assert rows["hello world"]["source"] == "web"
    assert rows["bonjour le monde"]["source"] == "jsonl"  # default fill
    assert rows["bonjour le monde"]["n_chars"] == 16
    assert all(r["doc_id"] >= 0 for r in rows.values())

    bad = DS.bad_records(spark, f"{tmp}/a.jsonl", fmt="json").collect()
    assert len(bad) == 1 and "not json" in bad[0]["_corrupt_record"]


def test_read_jsonl_ids_deterministic(spark, tmp):
    with open(f"{tmp}/a.jsonl", "w") as f:
        for i in range(50):
            f.write(json.dumps({"text": f"doc number {i}"}) + "\n")
    a = {r["text"]: r["doc_id"] for r in DS.read_jsonl(spark, f"{tmp}/a.jsonl").collect()}
    b = {r["text"]: r["doc_id"] for r in DS.read_jsonl(spark, f"{tmp}/a.jsonl").collect()}
    assert a == b  # content-addressed: stable across reruns


def test_read_csv_and_quarantine(spark, tmp):
    with open(f"{tmp}/d.csv", "w") as f:
        f.write("text,lang,source\n")
        f.write("good row here,en,crawl\n")
        f.write('"another fine row",de,books\n')
    df = DS.read_csv(spark, f"{tmp}/d.csv")
    rows = {r["text"]: r for r in df.collect()}
    assert set(rows) == {"good row here", "another fine row"}
    assert rows["another fine row"]["lang"] == "de"


def test_read_text_files_one_doc_per_file(spark, tmp):
    os.makedirs(f"{tmp}/books")
    for name, body in [("a.txt", "first book\nwith lines"), ("b.txt", "second")]:
        with open(f"{tmp}/books/{name}", "w") as f:
            f.write(body)
    df = DS.read_text_files(spark, f"{tmp}/books")
    rows = sorted(r["text"] for r in df.collect())
    assert rows == ["first book\nwith lines", "second"]
    assert {r["lang"] for r in df.collect()} == {"und"}


def test_write_corpus_partitions_and_manifest(spark, tmp):
    df = spark.createDataFrame(
        [
            (1, "aa", "en", "web", 2),
            (2, "bbb", "en", "books", 3),
            (3, "cccc", "fr", "web", 4),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    manifest = DS.write_corpus(df, f"{tmp}/out")
    assert manifest["n_docs_total"] == 3
    by_key = {(p["lang"], p["source"]): p for p in manifest["partitions"]}
    assert by_key[("en", "web")]["n_docs"] == 1
    assert by_key[("fr", "web")]["n_chars"] == 4
    # partition directories exist and prune-read works
    back = spark.read.parquet(f"{tmp}/out/docs").filter(
        (F.col("lang") == "en") & (F.col("source") == "books")
    )
    assert [r["doc_id"] for r in back.collect()] == [2]
    with open(f"{tmp}/out/_MANIFEST.json") as f:
        assert json.load(f) == manifest


def test_read_html_extracts_visible_text(spark, tmp):
    html = (
        "<html><head><title>My Page</title>"
        "<style>body { color: red; }</style>"
        "<script>var tracking = 'evil';</script></head>"
        "<body><!-- nav bar -->"
        "<h1>Header</h1>\n<p>First   paragraph &amp; stuff.</p>"
        "<p>Fish &lt;&gt;&lt; swim; it&#39;s&nbsp;fine.</p>"
        "<script type='text/javascript'>alert(1)</script>"
        "</body></html>"
    )
    with open(f"{tmp}/page.html", "w") as f:
        f.write(html)
    df = DS.read_html(spark, f"{tmp}/page.html")
    rows = df.collect()
    assert len(rows) == 1
    text = rows[0]["text"]
    # script/style bodies gone, tags gone, entities decoded, ws normalized
    assert "tracking" not in text and "color" not in text
    assert "alert" not in text and "nav bar" not in text
    assert "<p>" not in text
    assert "My Page" in text and "Header" in text
    assert "First paragraph & stuff." in text
    assert "Fish <>< swim; it's fine." in text
    assert rows[0]["n_chars"] == len(text)  # counted AFTER extraction
    assert rows[0]["source"] == "html" and rows[0]["lang"] == "und"


def test_html_entity_decode_order_and_fallback(spark):
    # '&amp;lt;' must decode to literal '&lt;' (amp decoded LAST), and the
    # mapInPandas fallback handles numeric/named entities the Catalyst
    # map doesn't carry
    df = spark.createDataFrame(
        [(1, "<p>a &amp;lt; b</p>"), (2, "caf&#233; &copy; &#x41;")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["text"] for r in DS.html_to_text(df).collect()}
    assert got[1] == "a &lt; b"
    assert got[2] == "caf&#233; &copy; &#x41;"  # exotic entities untouched
    full = {
        r["doc_id"]: r["text"]
        for r in DS.decode_html_entities(DS.html_to_text(df)).collect()
    }
    assert full[2] == "café © A"


def test_html_decoded_entities_never_become_tags(spark):
    # a decoded '&lt;script&gt;' must surface as literal text, not get
    # stripped as a tag (decode-after-strip ordering)
    df = spark.createDataFrame(
        [(1, "x &lt;script&gt;not code&lt;/script&gt; y")],
        "doc_id long, text string",
    )
    got = DS.html_to_text(df).collect()[0]["text"]
    assert got == "x <script>not code</script> y"


def test_read_html_lines_mode_preserves_structure(spark, tmp):
    html = (
        "<html><body><h1>Header line stays intact here.</h1>"
        "<p>First paragraph with plenty of words to keep.</p>"
        "<p>Second paragraph also has enough words here.</p>"
        "<script>var x=1;</script></body></html>"
    )
    with open(f"{tmp}/lines.html", "w") as f:
        f.write(html)
    flat = DS.read_html(spark, f"{tmp}/lines.html").collect()[0]["text"]
    lined = DS.read_html(spark, f"{tmp}/lines.html", lines=True).collect()[0][
        "text"
    ]
    assert "\n" not in flat
    assert lined.split("\n") == [
        "Header line stays intact here.",
        "First paragraph with plenty of words to keep.",
        "Second paragraph also has enough words here.",
    ]
