"""WARC/WET crawl-archive source tests (sources/warc.py).

Covers the byte-level parser (roundtrip, resync on corrupt gzip members
and malformed records, truncation), the Spark readers/stats, and the
write_wet -> read_wet export roundtrip.
"""

import gzip
import zlib

import pytest
from pyspark.sql import functions as F

from vector_search_databricks_poc_spark.sources.warc import (
    build_warc_file,
    build_warc_record,
    build_wet_record,
    iter_warc_records,
    read_warc,
    read_wet,
    warc_file_stats,
    write_wet,
)


def _sample_records(k=5):
    return [
        build_wet_record(f"http://example.com/{i}", f"doc body {i} é")
        for i in range(k)
    ]


# ---------------------------------------------------------------------------
# pure parser
# ---------------------------------------------------------------------------


def test_roundtrip_gzip_per_record():
    payload = build_warc_file(_sample_records(), gzip_per_record=True)
    c = {}
    recs = list(iter_warc_records(payload, c))
    assert len(recs) == 5
    assert recs[2]["url"] == "http://example.com/2"
    assert recs[2]["content"].decode("utf-8") == "doc body 2 é"
    assert recs[2]["record_type"] == "conversion"
    assert recs[2]["warc_date"] == "2026-01-01T00:00:00Z"
    assert c == {"bad_members": 0, "bad_records": 0}


def test_roundtrip_plain_and_single_member():
    plain = build_warc_file(_sample_records(), gzip_per_record=False)
    assert len(list(iter_warc_records(plain))) == 5
    # one gzip member holding ALL records (non-Common-Crawl but legal)
    single = gzip.compress(plain)
    assert len(list(iter_warc_records(single))) == 5


def test_response_record_with_binary_payload():
    body = bytes(range(256)) * 3
    rec = build_warc_record(
        "response", body, url="http://example.com/bin",
        content_type="application/http",
    )
    got = list(iter_warc_records(build_warc_file([rec])))
    assert len(got) == 1 and got[0]["content"] == body
    assert got[0]["record_type"] == "response"


def test_corrupt_gzip_member_resyncs():
    records = _sample_records(4)
    members = []
    for r in records:
        c = zlib.compressobj(wbits=31)
        members.append(c.compress(r) + c.flush())
    # corrupt the middle of member 1 (keep its gzip magic intact so the
    # resync must find member 2's magic, not member 1's)
    bad = bytearray(members[1])
    for i in range(12, min(30, len(bad))):
        bad[i] ^= 0xFF
    payload = members[0] + bytes(bad) + members[2] + members[3]
    c = {}
    recs = list(iter_warc_records(payload, c))
    assert [r["url"] for r in recs] == [
        "http://example.com/0", "http://example.com/2", "http://example.com/3",
    ]
    assert c["bad_members"] >= 1 and c["bad_records"] == 0


def test_malformed_record_resyncs_in_plain_stream():
    good = _sample_records(3)
    garbage = b"HTTP/1.1 200 OK\r\nnot: warc\r\n\r\nxxxx\r\n\r\n"
    payload = good[0] + garbage + good[1] + good[2]
    c = {}
    recs = list(iter_warc_records(payload, c))
    assert [r["url"] for r in recs] == [
        "http://example.com/0", "http://example.com/1", "http://example.com/2",
    ]
    assert c["bad_records"] == 1


def test_truncated_trailing_record_quarantined():
    full = build_warc_file(_sample_records(2), gzip_per_record=False)
    cut = full[: len(full) - 30]  # truncate inside record 1's payload
    c = {}
    recs = list(iter_warc_records(cut, c))
    assert [r["url"] for r in recs] == ["http://example.com/0"]
    assert c["bad_records"] == 1


def test_missing_content_length_is_bad_record():
    broken = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        b"WARC-Target-URI: http://example.com/x\r\n\r\nbody\r\n\r\n"
    )
    payload = broken + _sample_records(1)[0]
    c = {}
    recs = list(iter_warc_records(payload, c))
    assert [r["url"] for r in recs] == ["http://example.com/0"]
    assert c["bad_records"] == 1


def test_empty_and_garbage_inputs():
    assert list(iter_warc_records(b"")) == []
    c = {}
    assert list(iter_warc_records(b"complete garbage, no markers", c)) == []
    assert c["bad_records"] == 1


def test_payload_containing_record_markers_roundtrips():
    """Content-Length-driven body reads: payloads containing \\r\\n\\r\\n
    runs or literal 'WARC/1.0' lines must NOT be mistaken for record
    boundaries."""
    tricky = "before\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\nafter"
    recs = [
        build_wet_record("http://example.com/t", tricky),
        build_wet_record("http://example.com/u", "plain"),
    ]
    got = list(iter_warc_records(build_warc_file(recs, gzip_per_record=False)))
    assert [r["url"] for r in got] == [
        "http://example.com/t", "http://example.com/u",
    ]
    assert got[0]["content"].decode() == tricky


@pytest.mark.parametrize("gzip_per_record", [True, False])
def test_hypothesis_roundtrip_random_payloads(gzip_per_record):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.text(
                alphabet=st.characters(
                    codec="utf-8", exclude_categories=("Cs",)
                ),
                max_size=300,
            ),
            min_size=1,
            max_size=8,
        )
    )
    def check(texts):
        recs = [
            build_wet_record(f"http://h/{i}", t) for i, t in enumerate(texts)
        ]
        c = {}
        got = list(
            iter_warc_records(build_warc_file(recs, gzip_per_record), c)
        )
        assert [r["content"].decode("utf-8") for r in got] == texts
        assert c == {"bad_members": 0, "bad_records": 0}

    check()


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


@pytest.fixture()
def wet_dir(tmp_path):
    d = tmp_path / "wet"
    d.mkdir()
    (d / "shard-0.warc.wet.gz").write_bytes(build_warc_file(_sample_records(5)))
    extra = [
        build_warc_record(
            "warcinfo", b"software: test", content_type="application/warc-fields"
        ),
        build_wet_record("http://example.com/a", "alpha"),
        build_wet_record("http://example.com/b", "beta"),
    ]
    (d / "shard-1.warc.wet.gz").write_bytes(build_warc_file(extra))
    return str(d)


def test_read_warc_all_records(spark, wet_dir):
    df = read_warc(spark, wet_dir)
    assert df.count() == 8
    assert df.where(F.col("record_type") == "warcinfo").count() == 1
    assert dict(df.dtypes)["content"] == "binary"


def test_read_wet_text_records(spark, wet_dir):
    got = {
        r["url"]: r["text"]
        for r in read_wet(spark, wet_dir).collect()
    }
    assert len(got) == 7  # warcinfo dropped
    assert got["http://example.com/a"] == "alpha"
    assert got["http://example.com/2"] == "doc body 2 é"


def test_warc_file_stats_counts_quarantine(spark, tmp_path):
    d = tmp_path / "mix"
    d.mkdir()
    (d / "good.warc.wet.gz").write_bytes(build_warc_file(_sample_records(3)))
    members = []
    for r in _sample_records(3):
        c = zlib.compressobj(wbits=31)
        members.append(c.compress(r) + c.flush())
    bad = bytearray(members[1])
    for i in range(12, 30):
        bad[i] ^= 0xFF
    (d / "partial.warc.wet.gz").write_bytes(members[0] + bytes(bad) + members[2])
    stats = {r["path"].rsplit("/", 1)[-1]: r for r in warc_file_stats(spark, str(d)).collect()}
    assert stats["good.warc.wet.gz"]["n_records"] == 3
    assert stats["good.warc.wet.gz"]["bad_members"] == 0
    assert stats["partial.warc.wet.gz"]["n_records"] == 2
    assert stats["partial.warc.wet.gz"]["bad_members"] >= 1
    assert stats["good.warc.wet.gz"]["n_conversion"] == 3


def test_write_wet_read_wet_roundtrip(spark, tmp_path):
    src = spark.createDataFrame(
        [(f"http://corpus/{i}", f"text body {i}") for i in range(40)],
        "url string, text string",
    ).repartition(3)
    out = str(tmp_path / "export")
    shards = write_wet(src, out).collect()
    assert sum(r["n_records"] for r in shards) == 40
    assert len(shards) == 3
    back = read_wet(spark, out)
    got = {(r["url"], r["text"]) for r in back.collect()}
    assert got == {(f"http://corpus/{i}", f"text body {i}") for i in range(40)}


def _http_response(
    body: bytes,
    status: int = 200,
    ctype: str = "text/html; charset=utf-8",
    chunked: bool = False,
    gzip_body: bool = False,
) -> bytes:
    headers = [f"HTTP/1.1 {status} X", f"Content-Type: {ctype}"]
    if gzip_body:
        body = gzip.compress(body)
        headers.append("Content-Encoding: gzip")
    if chunked:
        headers.append("Transfer-Encoding: chunked")
        out = bytearray()
        for i in range(0, len(body), 7):  # tiny chunks on purpose
            piece = body[i : i + 7]
            out += f"{len(piece):x}\r\n".encode() + piece + b"\r\n"
        out += b"0\r\n\r\n"
        body = bytes(out)
    else:
        headers.append(f"Content-Length: {len(body)}")
    return "\r\n".join(headers).encode() + b"\r\n\r\n" + body


def test_parse_http_response_plain_chunked_gzip():
    from vector_search_databricks_poc_spark.sources.warc import (
        parse_http_response,
    )

    html = "<html><body>café &amp; tea</body></html>".encode("utf-8")
    for kw in (
        {},
        {"chunked": True},
        {"gzip_body": True},
        {"chunked": True, "gzip_body": True},
    ):
        r = parse_http_response(_http_response(html, **kw))
        assert r["status"] == 200 and r["body"] == html, kw
    # latin-1 charset honored
    r = parse_http_response(
        _http_response("café".encode("latin-1"), ctype="text/html; charset=iso-8859-1")
    )
    assert r["body"].decode(r["charset"]) == "café"
    # deflate, both zlib-wrapped and raw
    raw = zlib.compress(html)
    for enc_body in (raw, raw[2:-4]):
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n" + enc_body
        )
        assert parse_http_response(payload)["body"] == html


def test_parse_http_response_malformed_raises_valueerror():
    from vector_search_databricks_poc_spark.sources.warc import (
        parse_http_response,
    )

    for bad in (
        b"not http at all\r\n\r\nbody",
        b"HTTP/1.1\r\n\r\nbody",  # no status code
        _http_response(b"x" * 50, chunked=True)[:-20],  # truncated chunk
    ):
        with pytest.raises(ValueError):
            parse_http_response(bad)


def test_read_warc_html_extracts_and_filters(spark, tmp_path):
    """response records -> dechunk/gunzip -> charset decode -> strip_html;
    non-200s, non-HTML types, and malformed HTTP all drop out."""
    from vector_search_databricks_poc_spark.sources.warc import read_warc_html

    html = "<html><script>var x=1;</script><p>hello &amp; welcome</p></html>"
    recs = [
        build_warc_record(
            "response", _http_response(html.encode(), chunked=True, gzip_body=True),
            url="http://site/a", content_type="application/http",
        ),
        build_warc_record(
            "response", _http_response(b"<p>gone</p>", status=404),
            url="http://site/missing", content_type="application/http",
        ),
        build_warc_record(
            "response", _http_response(b"\x89PNG...", ctype="image/png"),
            url="http://site/logo.png", content_type="application/http",
        ),
        build_warc_record(
            "response", b"garbage that is not HTTP",
            url="http://site/broken", content_type="application/http",
        ),
        build_wet_record("http://site/wet", "not a response record"),
    ]
    d = tmp_path / "warc"
    d.mkdir()
    (d / "crawl.warc.gz").write_bytes(build_warc_file(recs))
    got = {r["url"]: r for r in read_warc_html(spark, str(d)).collect()}
    assert set(got) == {"http://site/a"}
    assert got["http://site/a"]["text"] == "hello & welcome"
    assert got["http://site/a"]["status"] == 200


def test_stream_read_wet_matches_batch(spark, tmp_path, wet_dir):
    """Streaming decode over a landing dir must produce exactly the
    batch reader's records (same mapInPandas body by construction)."""
    from vector_search_databricks_poc_spark.sources.warc import stream_read_wet

    sink = f"wet_stream_{tmp_path.name}"
    q = (
        stream_read_wet(spark, wet_dir)
        .writeStream.format("memory")
        .queryName(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    streamed = {
        (r["url"], r["text"])
        for r in spark.sql(f"select url, text from {sink}").collect()
    }
    batch = {
        (r["url"], r["text"]) for r in read_wet(spark, wet_dir).collect()
    }
    assert streamed == batch and len(streamed) == 7


def test_stream_read_wet_picks_up_only_new_shards(spark, tmp_path):
    """Landing-directory semantics: a second availableNow run against the
    same checkpoint decodes ONLY shards that arrived since — no rescan of
    history (the exactly-once contract a continuous crawl ingest needs)."""
    import pathlib

    from vector_search_databricks_poc_spark.sources.warc import stream_read_wet

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "s0.warc.wet.gz").write_bytes(
        build_warc_file([build_wet_record("http://h/0", "first")])
    )
    out = str(tmp_path / "corpus_out")
    ckpt = str(tmp_path / "ckpt")

    def run_round():
        q = (
            stream_read_wet(spark, str(landing))
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    run_round()
    assert spark.read.parquet(out).count() == 1
    (landing / "s1.warc.wet.gz").write_bytes(
        build_warc_file([build_wet_record("http://h/1", "second")])
    )
    run_round()
    rows = spark.read.parquet(out).collect()
    # round 2 appended ONLY the new shard: s0 was not reprocessed (no
    # duplicate of http://h/0), s1 arrived exactly once
    assert sorted(r["url"] for r in rows) == ["http://h/0", "http://h/1"]
    assert pathlib.Path(ckpt).exists()


def test_crawl_corpus_pipeline(spark, tmp_path):
    """Crawl shards -> training corpus end-to-end: fixture documents
    exported as WET, re-ingested by crawl_corpus_pipeline; planted junk
    and a cross-url exact duplicate must fall out, clean docs survive
    with stable url-hash ids and extracted domains."""
    from tests.conftest import SF_DIR
    from vector_search_databricks_poc_spark.catalog import load_table
    from vector_search_databricks_poc_spark.pipelines import crawl_corpus_pipeline

    base = (
        load_table(spark, SF_DIR, "documents")
        .where(F.col("lang") == "en")
        .limit(20)
        .select("doc_id", "text")
        .collect()
    )
    rows = [
        (f"http://site{i % 3}.example/doc/{r['doc_id']}", r["text"])
        for i, r in enumerate(base)
    ]
    first_url = rows[0][0]
    dup_url = "http://dup.example/copy"
    rows.append((dup_url, base[0]["text"]))  # same text, different url
    rows.append(("http://junk.example/gib", "zzqx glorp xv " * 40))
    rows.append(("http://junk.example/blank", "   "))
    src = spark.createDataFrame(rows, "url string, text string").repartition(2)
    out = str(tmp_path / "crawl")
    write_wet(src, out).collect()

    train, test = crawl_corpus_pipeline(
        spark, out, langs=("en",), min_quality=0.0,
        near_dup_threshold=0.5, test_fraction=0.2, gopher_gate=False,
    )
    surv = train.unionByName(test).cache()
    urls = {r["url"] for r in surv.select("url").collect()}
    assert "http://junk.example/blank" not in urls  # empty text filtered
    assert "http://junk.example/gib" not in urls  # fails the lang heuristic
    # cross-url exact text duplicate: exactly one representative survives
    assert (dup_url in urls) + (first_url in urls) == 1
    assert len(urls) >= 10  # the clean corpus substantially survives
    doms = {r["domain"] for r in surv.select("domain").distinct().collect()}
    assert doms <= {"site0.example", "site1.example", "site2.example", "dup.example"}
    # url-hash ids: deterministic, unique, split disjointness holds
    assert surv.select("doc_id").distinct().count() == surv.count()
    assert train.join(test, "doc_id", "inner").count() == 0
    surv.unpersist()


def test_write_wet_is_lazy(spark, tmp_path):
    import os
    src = spark.createDataFrame([("u", "t")], "url string, text string")
    out = str(tmp_path / "lazy")
    _ = write_wet(src, out)  # no action -> nothing written
    assert not os.path.exists(out)


def test_write_wet_deterministic_shard_names_and_rerun_overwrites(spark, tmp_path):
    """r6 commit protocol: shard names derive from the partition id, so a
    re-run (the stand-in for a retried/speculative task attempt) rewrites
    the same files byte-identically instead of duplicating records."""
    import os

    src = spark.createDataFrame(
        [(f"http://corpus/{i}", f"text {i}") for i in range(30)],
        "url string, text string",
    ).repartition(4, "url")
    out = str(tmp_path / "det")
    write_wet(src, out).collect()
    first = sorted(os.listdir(out))
    assert all(f.startswith("part-") and f.endswith(".warc.wet.gz") for f in first)
    assert not any(".tmp" in f for f in first)
    bytes_first = {f: (tmp_path / "det" / f).read_bytes() for f in first}
    write_wet(src, out).collect()  # "retry": same partitioning, same input
    second = sorted(os.listdir(out))
    assert second == first  # no duplicate shards
    for f in first:  # identical bytes: gzip members carry no timestamps
        assert (tmp_path / "det" / f).read_bytes() == bytes_first[f]
    # and the corpus read back is still exactly the input (no dup records)
    assert read_wet(spark, out).count() == 30


def test_resync_counts_one_bad_member_per_corrupt_region():
    """r6: embedded \\x1f\\x8b\\x08 sequences inside ONE corrupt member's
    body must not each bump bad_members — the counter is per contiguous
    corrupt region, and parsing still recovers the valid member after."""
    good = _sample_records(2)
    members = [build_warc_file([r]) for r in good]
    # corrupt member whose body embeds several fake gzip magics
    evil = bytearray(build_warc_file([build_wet_record("http://x", "y" * 2000)]))
    evil[40] ^= 0xFF  # corrupt early
    evil += b"\x1f\x8b\x08AAA" * 5  # doomed resync candidates
    payload = members[0] + bytes(evil) + members[1]
    c = {}
    recs = list(iter_warc_records(payload, c))
    assert [r["url"] for r in recs if r["record_type"] == "conversion"] == [
        "http://example.com/0",
        "http://example.com/1",
    ]
    assert c["bad_members"] == 1  # one region, one count


def test_drain_tail_is_bounded_on_markerless_garbage():
    """r6: a malformed region with no \\r\\nWARC/ resync marker must not
    grow the retained tail to the whole decompressed file — it is
    quarantined once it exceeds the slack + declared-length allowance."""
    from vector_search_databricks_poc_spark.sources.warc import (
        _TAIL_SLACK,
        _bounded_tail,
        _drain,
    )

    garbage = b"x" * (_TAIL_SLACK + 4096)  # no WARC/ header, no marker
    c = {"bad_members": 0, "bad_records": 0}
    out = []
    tail = garbage
    g = _drain(tail, c, final=False)
    try:
        while True:
            out.append(next(g))
    except StopIteration as stop:
        tail = stop.value
    assert out == []
    assert len(tail) <= 6  # capped, keeping only a possible marker prefix
    assert c["bad_records"] >= 1
    # a legitimate large record is NOT capped: declared length extends it
    big = build_wet_record("http://big", "z" * (_TAIL_SLACK + 9000))
    partial = big[: len(big) - 100]  # body still arriving
    assert _bounded_tail(partial, dict(c)) == partial


def test_oversize_shard_rejected_loudly(spark, tmp_path):
    """r6 shard-size contract: a shard above the one-file-one-task
    ceiling fails with an actionable error instead of silently
    concentrating executor memory."""
    d = tmp_path / "shards"
    d.mkdir()
    (d / "small.warc.wet.gz").write_bytes(build_warc_file(_sample_records(3)))
    from vector_search_databricks_poc_spark.sources.warc import (
        _wet_decoder,
    )
    import pandas as pd

    dec = _wet_decoder(batch_rows=8, max_shard_bytes=100)
    frame = pd.DataFrame(
        {"path": ["big"], "content": [b"\x00" * 200]}
    )
    with pytest.raises(Exception, match="one-file-one-task ceiling"):
        list(dec(iter([frame])))
    # default ceiling leaves normal shards untouched
    assert read_wet(spark, str(d)).count() == 3
