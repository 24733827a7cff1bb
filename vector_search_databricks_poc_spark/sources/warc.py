"""WARC / WET crawl-archive source (engine source surface).

Common Crawl — the de-facto 100 TB training corpus — ships as WARC
files (raw HTTP capture) and WET files (plain-text ``conversion``
records).  The reference engine has no crawl source at all (its only
sources are literal rows and the arXiv HTTP fetch,
/root/reference/src/databricks/syntetic_data.py:55-65,
syntetic_data_arxiv.py:75-129), but every LLM-data pipeline the mandate
names (dedup, quality gating, mixing, packing) STARTS from crawl
archives, so the ingest edge belongs in the engine.

Format (ISO 28500): a WARC file is a sequence of records, each

    WARC/1.0\r\n
    <name>: <value>\r\n ...          (WARC-Type, WARC-Target-URI,
    \r\n                              WARC-Date, Content-Type,
    <Content-Length payload bytes>    Content-Length, ...)
    \r\n\r\n

optionally with EACH RECORD its own gzip member, members concatenated
(<file>.warc.gz / .warc.wet.gz — the Common Crawl convention, chosen so
a reader can resync mid-file).

Design for scale:

- **One file = one task.**  ``spark.read.format("binaryFile")`` yields
  one row per file; per-record gzip members cannot be split by byte
  range anyway.  Crawl dumps are ~1 GB × tens of thousands of files —
  natural task granularity, no shuffle anywhere on the ingest path.
- **Streaming decode, O(record) memory.**  Gzip members decompress
  incrementally off a memoryview (no whole-file slice copies) and
  complete records are emitted in bounded Arrow batches from
  ``mapInPandas`` — peak memory is one record + one batch, never the
  decompressed file.
- **Malformed input quarantines, never kills.**  A corrupt gzip member
  resyncs at the next gzip magic; a malformed record resyncs at the
  next ``WARC/`` marker; both are COUNTED (``warc_file_stats``) — at
  crawl scale a handful of truncated records per shard is the normal
  case, and the repo's bad-asset contract applies (only
  ValueError/zlib.error are swallowed; anything else is a real bug and
  propagates).
"""

from __future__ import annotations

import zlib
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

_GZ_MAGIC = b"\x1f\x8b\x08"
_CRLF2 = b"\r\n\r\n"

# ---------------------------------------------------------------------------
# pure byte-level builders (test fixtures + the WET export path)
# ---------------------------------------------------------------------------


def build_warc_record(
    record_type: str,
    payload: bytes,
    url: str | None = None,
    date: str = "2026-01-01T00:00:00Z",
    content_type: str = "text/plain",
    extra_headers: dict[str, str] | None = None,
) -> bytes:
    """One serialized WARC record (headers + payload + separator)."""
    headers = [("WARC-Type", record_type), ("WARC-Date", date)]
    if url is not None:
        headers.append(("WARC-Target-URI", url))
    headers.append(("Content-Type", content_type))
    headers.append(("Content-Length", str(len(payload))))
    for k, v in (extra_headers or {}).items():
        headers.append((k, v))
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode() for k, v in headers
    )
    return head + b"\r\n" + payload + _CRLF2


def build_wet_record(url: str, text: str, date: str = "2026-01-01T00:00:00Z") -> bytes:
    """A WET ``conversion`` record: extracted plain text for one page."""
    return build_warc_record(
        "conversion", text.encode("utf-8"), url=url, date=date,
        content_type="text/plain",
    )


def build_warc_file(records: Iterable[bytes], gzip_per_record: bool = True) -> bytes:
    """Concatenate serialized records into WARC file bytes; the default
    wraps each record in its own gzip member (the Common Crawl layout)."""
    if gzip_per_record:
        out = bytearray()
        for r in records:
            c = zlib.compressobj(wbits=31)
            out += c.compress(r) + c.flush()
        return bytes(out)
    return b"".join(records)


# ---------------------------------------------------------------------------
# streaming parser
# ---------------------------------------------------------------------------


# Sentinel yielded by _iter_gzip_members when a member fails AFTER it may
# already have yielded partial output: the consumer must drop any buffered
# record tail, or bytes from the next member would be stitched onto it and
# a contaminated record emitted as good (swallowing the start of a real one).
_MEMBER_FAILED = object()


# First-feed size for resync candidates: an embedded \x1f\x8b\x08 inside a
# corrupt member's compressed body is NOT a real member start and zlib
# rejects it within a few bytes — probing with a small first chunk bounds
# each doomed attempt to O(64 KB) instead of O(1 MB), keeping adversarial
# many-magic shards linear-ish rather than quadratic (r5 ADVICE item).
_RESYNC_PROBE = 1 << 16


def _iter_gzip_members(
    payload: bytes, counters: dict, chunk: int = 1 << 20
) -> Iterator[bytes]:
    """Decompressed chunks across all gzip members, feeding ``chunk``
    bytes at a time off a memoryview (no whole-tail copies).  A corrupt
    member bumps ``counters['bad_members']``, yields ``_MEMBER_FAILED``
    (so the record assembler can discard its partial tail), and resyncs
    at the next gzip magic.

    Resync scans from ``pos + 1`` — from inside the failed member — so a
    real next member is never skipped (the corrupt member's end offset is
    unknowable without decompressing it).  The cost of that choice is
    that embedded magic bytes in the corrupt body are re-attempted;
    ``bad_members`` therefore counts ONE per contiguous corrupt region
    (not one per doomed attempt), and doomed attempts fail on a small
    probe feed rather than a full chunk."""
    mv = memoryview(payload)
    n, pos = len(payload), 0
    in_resync = False
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        fed = pos
        first = True
        try:
            while not d.eof and fed < n:
                step = min(_RESYNC_PROBE if (in_resync and first) else chunk, n - fed)
                out = d.decompress(mv[fed : fed + step])
                fed += step
                first = False
                if out:
                    yield out
            if not d.eof:  # truncated final member
                raise zlib.error("truncated gzip member")
            pos = fed - len(d.unused_data)
            in_resync = False
        except zlib.error:
            if not in_resync:
                counters["bad_members"] += 1
            yield _MEMBER_FAILED
            in_resync = True
            nxt = payload.find(_GZ_MAGIC, pos + 1)
            if nxt == -1:
                return
            pos = nxt


def _parse_record(buf: bytes, pos: int):
    """Try to parse one record at ``pos``.

    Returns ``(record_dict, next_pos)``, ``("need", pos)`` when the
    buffer ends mid-record (caller should append more data), or raises
    ValueError for a malformed record (caller resyncs)."""
    # skip inter-record CRLF runs
    while buf.startswith(b"\r\n", pos):
        pos += 2
    if pos >= len(buf):
        return None, pos
    head_end = buf.find(_CRLF2, pos)
    if head_end == -1:
        # incomplete only if this COULD still be a record prefix
        if len(buf) - pos < 8 or buf.startswith(b"WARC/", pos):
            return "need", pos
        raise ValueError("not a WARC record header")
    if not buf.startswith(b"WARC/", pos):
        raise ValueError("missing WARC/ version line")
    headers: dict[str, str] = {}
    for line in buf[pos:head_end].split(b"\r\n")[1:]:
        k, sep, v = line.partition(b":")
        if not sep:
            raise ValueError("malformed WARC header line")
        headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
            "latin-1"
        )
    try:
        length = int(headers["content-length"])
    except (KeyError, ValueError):
        raise ValueError("missing/invalid Content-Length") from None
    if length < 0:
        raise ValueError("negative Content-Length")
    body_start = head_end + 4
    if body_start + length > len(buf):
        return "need", pos
    rec = {
        "record_type": headers.get("warc-type", ""),
        "url": headers.get("warc-target-uri"),
        "warc_date": headers.get("warc-date"),
        "content_type": headers.get("content-type"),
        "content": buf[body_start : body_start + length],
    }
    return rec, body_start + length


def iter_warc_records(payload: bytes, counters: dict | None = None) -> Iterator[dict]:
    """Stream records from WARC file bytes (gzipped-members or plain).

    ``counters`` (optional dict) accumulates ``bad_members`` /
    ``bad_records`` quarantine counts; parsing always continues at the
    next resync point rather than raising."""
    c = counters if counters is not None else {}
    c.setdefault("bad_members", 0)
    c.setdefault("bad_records", 0)
    if payload.startswith(_GZ_MAGIC[:2]):
        chunks = _iter_gzip_members(payload, c)
    else:
        chunks = iter((payload,))
    buf = b""
    for chunk in chunks:
        if chunk is _MEMBER_FAILED:
            # a partially-decompressed record tail may sit in buf; bytes
            # from the NEXT member must not be stitched onto it
            if buf:
                c["bad_records"] += 1
                buf = b""
            continue
        buf += chunk
        buf = yield from _drain(buf, c, final=False)
    if buf:
        yield from _drain(buf, c, final=True)


# Max bytes of headers/garbage the assembler retains without making
# progress.  A legitimate record may be arbitrarily large — its declared
# Content-Length extends the allowance — but a malformed region with no
# resync marker must not grow the tail to the whole decompressed file
# (r5 ADVICE item: the documented O(record) bound has to hold on
# adversarial input too).
_TAIL_SLACK = 1 << 20


def _declared_body_len(tail: bytes) -> int:
    """Content-Length a plausible in-progress record at the tail's head
    declares, else 0 — the legitimate reason a tail may exceed the slack."""
    if not tail.startswith(b"WARC/"):
        return 0
    head_end = tail.find(_CRLF2)
    if head_end == -1:
        return 0
    for line in tail[:head_end].split(b"\r\n")[1:]:
        k, sep, v = line.partition(b":")
        if sep and k.strip().lower() == b"content-length":
            try:
                return max(0, int(v.strip()))
            except ValueError:
                return 0
    return 0


def _bounded_tail(tail: bytes, c: dict) -> bytes:
    """Cap the retained tail at slack + declared body length; an
    over-limit tail is quarantined, keeping only the last 6 bytes (a
    ``\\r\\nWARC/`` marker straddling the chunk boundary has at most 6
    bytes already buffered)."""
    if len(tail) <= _TAIL_SLACK + _declared_body_len(tail):
        return tail
    c["bad_records"] += 1
    return tail[-6:]


def _drain(buf: bytes, c: dict, final: bool):
    """Emit every complete record in ``buf``; return the unconsumed tail.

    A malformed record is quarantined only once we can resync at the
    next ``\\r\\nWARC/`` marker (or at end of input): mid-stream, the
    marker may simply not have arrived yet, so the tail is kept and
    retried when more decompressed data lands — counting there would
    double-count, and giving up there would drop the rest of the file.
    The kept tail is bounded by ``_bounded_tail``."""
    pos = 0
    while True:
        try:
            rec, nxt = _parse_record(buf, pos)
        except ValueError:
            resync = buf.find(b"\r\nWARC/", pos + 1)
            if resync == -1:
                if final:
                    c["bad_records"] += 1
                    return b""
                return _bounded_tail(buf[pos:], c)
            c["bad_records"] += 1
            pos = resync + 2
            continue
        if rec == "need":
            if final:
                c["bad_records"] += 1  # truncated trailing record
                return b""
            return _bounded_tail(buf[nxt:], c)
        if rec is None:
            return b""
        yield rec
        pos = nxt


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

_RECORD_SCHEMA = (
    "path string, record_type string, url string, warc_date string, "
    "content_type string, content binary"
)
_STATS_SCHEMA = (
    "path string, n_records long, n_conversion long, bad_members long, "
    "bad_records long"
)


_RECORD_COLS = [
    "path", "record_type", "url", "warc_date", "content_type", "content",
]

# binaryFile's fixed schema — needed explicitly for the STREAMING reader
# (file stream sources require a declared schema)
_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


# Shard-size contract: ``binaryFile`` holds each COMPRESSED shard in one
# file row, so one task's input memory is one shard.  Common Crawl shards
# are ~1 GB — the granularity this source is designed for; a multi-GB
# monolith would not fail but would concentrate a whole executor's memory
# into one task, so it is rejected loudly instead of degrading silently.
# Raise the ceiling deliberately (e.g. read_wet(..., max_shard_bytes=...))
# if your shards really are that large; re-shard upstream if you can.
MAX_SHARD_BYTES = 4 << 30


def _check_shard_size(fpath: str, payload, max_shard_bytes: int) -> None:
    if len(payload) > max_shard_bytes:
        raise ValueError(
            f"WARC shard {fpath!r} is {len(payload)} bytes, above the "
            f"{max_shard_bytes}-byte one-file-one-task ceiling; re-shard the "
            f"input (Common Crawl convention is ~1 GB) or raise max_shard_bytes"
        )


def _record_decoder(batch_rows: int, max_shard_bytes: int = MAX_SHARD_BYTES):
    """mapInPandas body shared by the batch and streaming readers:
    (path, content) file rows in, record rows out in bounded batches."""
    import pandas as pd

    def decode(iterator):
        for pdf in iterator:
            for fpath, payload in zip(pdf["path"], pdf["content"]):
                _check_shard_size(fpath, payload, max_shard_bytes)
                rows = []
                for rec in iter_warc_records(bytes(payload)):
                    rows.append(
                        (
                            fpath,
                            rec["record_type"],
                            rec["url"],
                            rec["warc_date"],
                            rec["content_type"],
                            rec["content"],
                        )
                    )
                    if len(rows) >= batch_rows:
                        yield pd.DataFrame(rows, columns=_RECORD_COLS)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=_RECORD_COLS)

    return decode


def read_warc(spark: SparkSession, path: str, batch_rows: int = 1024) -> DataFrame:
    """All WARC records under ``path`` (glob ok) as
    (path, record_type, url, warc_date, content_type, content).

    One input file = one row into the decode stage = one task's work;
    records stream out in ``batch_rows`` Arrow batches so a 1 GB shard
    never materializes decompressed.  Malformed members/records are
    skipped (see ``warc_file_stats`` for the counts — same contract as
    the jsonl quarantine reader, sources/files.py)."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(_record_decoder(batch_rows), schema=_RECORD_SCHEMA)


_WET_SCHEMA = "path string, url string, warc_date string, text string"
_WET_COLS = ["path", "url", "warc_date", "text"]


def _wet_decoder(batch_rows: int, max_shard_bytes: int = MAX_SHARD_BYTES):
    """mapInPandas body shared by the batch and streaming WET readers:
    keeps only ``conversion`` records and decodes UTF-8 with
    ``errors='replace'`` — crawl text routinely carries stray bytes, and
    a lossy char beats a dead task or a dropped page.  (Python-side by
    necessity: Spark 4's ``decode`` expression raises
    MALFORMED_CHARACTER_CODING on invalid bytes, which would kill the
    whole ingest on routine crawl data — and the bytes are already in
    Python here, so this costs nothing extra.)"""
    import pandas as pd

    def decode(iterator):
        for pdf in iterator:
            for fpath, payload in zip(pdf["path"], pdf["content"]):
                _check_shard_size(fpath, payload, max_shard_bytes)
                rows = []
                for rec in iter_warc_records(bytes(payload)):
                    if rec["record_type"] != "conversion":
                        continue
                    rows.append(
                        (
                            fpath,
                            rec["url"],
                            rec["warc_date"],
                            rec["content"].decode("utf-8", errors="replace"),
                        )
                    )
                    if len(rows) >= batch_rows:
                        yield pd.DataFrame(rows, columns=_WET_COLS)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=_WET_COLS)

    return decode


def read_wet(spark: SparkSession, path: str, batch_rows: int = 1024) -> DataFrame:
    """WET text records under ``path``: (path, url, warc_date, text).

    Same one-file-one-task shape as :func:`read_warc`, but the
    conversion-record filter and the lossy UTF-8 decode happen inside
    the single decode stage — non-conversion records never cross the
    Arrow boundary."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(_wet_decoder(batch_rows), schema=_WET_SCHEMA)


def stream_read_warc(
    spark: SparkSession,
    path: str,
    batch_rows: int = 1024,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """STREAMING twin of :func:`read_warc`: watch a landing directory for
    new WARC shards and decode records as files arrive — the production
    crawl shape, where dumps land continuously and ingest must not rescan
    history.

    The file stream source tracks processed files in the checkpoint, so
    each shard is decoded exactly once across restarts;
    ``max_files_per_trigger`` paces a backlogged landing directory (per
    micro-batch, one file still = one task).  The decode stage is the
    SAME mapInPandas body as the batch reader — identical records,
    identical quarantine behavior (asserted batch≡stream in
    tests/test_warc.py)."""
    reader = spark.readStream.format("binaryFile").schema(_BINARYFILE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(path).select("path", "content")
    return files.mapInPandas(_record_decoder(batch_rows), schema=_RECORD_SCHEMA)


def stream_read_wet(
    spark: SparkSession,
    path: str,
    batch_rows: int = 1024,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming WET text: (path, url, warc_date, text) as shards land.
    The SAME ``_wet_decoder`` body as :func:`read_wet` (identical rows,
    identical lossy-UTF-8/quarantine behavior); feed into the streaming
    quality gate / index sync for a continuous crawl-to-corpus
    pipeline."""
    reader = spark.readStream.format("binaryFile").schema(_BINARYFILE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(path).select("path", "content")
    return files.mapInPandas(_wet_decoder(batch_rows), schema=_WET_SCHEMA)


def _dechunk(body: bytes) -> bytes:
    """Decode HTTP/1.1 chunked transfer-encoding.  Raises ValueError on a
    malformed chunk frame (quarantined upstream, per the bad-asset
    contract)."""
    out = bytearray()
    pos = 0
    while True:
        nl = body.find(b"\r\n", pos)
        if nl == -1:
            raise ValueError("chunked body: missing size line")
        size_tok = body[pos:nl].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            raise ValueError("chunked body: bad chunk size") from None
        if size == 0:
            return bytes(out)
        start = nl + 2
        end = start + size
        if end + 2 > len(body):
            raise ValueError("chunked body: truncated chunk")
        out += body[start:end]
        if body[end : end + 2] != b"\r\n":
            raise ValueError("chunked body: missing chunk terminator")
        pos = end + 2


def parse_http_response(payload: bytes) -> dict:
    """(status, headers, body, charset) from a raw HTTP response capture —
    the payload of a WARC ``response`` record.

    Pure stdlib: chunked transfer-encoding is reassembled and
    gzip/deflate content-encoding decompressed (zlib; wbits=47 accepts
    both gzip and zlib wrappers, raw-deflate retried for the IIS-style
    bare variant).  Raises ValueError (or zlib.error) on malformed input
    — exactly the exception set the mapInPandas reader quarantines."""
    sep = payload.find(b"\r\n\r\n")
    if sep == -1 or not payload.startswith(b"HTTP/"):
        raise ValueError("not an HTTP response")
    lines = payload[:sep].split(b"\r\n")
    parts = lines[0].split(None, 2)
    if len(parts) < 2:
        raise ValueError("malformed HTTP status line")
    try:
        status = int(parts[1])
    except ValueError:
        raise ValueError("malformed HTTP status code") from None
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, s, v = line.partition(b":")
        if s:
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1"
            )
    body = payload[sep + 4 :]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    enc = headers.get("content-encoding", "").strip().lower()
    if enc in ("gzip", "x-gzip"):
        body = zlib.decompress(body, 47)
    elif enc == "deflate":
        try:
            body = zlib.decompress(body)
        except zlib.error:
            body = zlib.decompress(body, -15)  # bare-deflate servers
    ctype = headers.get("content-type", "")
    charset = "utf-8"
    if "charset=" in ctype.lower():
        charset = ctype.lower().split("charset=", 1)[1].split(";")[0].strip(
            " \"'"
        ) or "utf-8"
    return {
        "status": status,
        "headers": headers,
        "body": body,
        "charset": charset,
    }


def response_texts(df: DataFrame, batch_rows: int = 1024) -> DataFrame:
    """WARC ``response`` records -> (path, url, warc_date, status,
    content_type, text): HTTP parse + charset decode, executor-side in
    bounded Arrow batches.  Rows whose HTTP payload is malformed are
    dropped (ValueError/zlib.error only — the bad-asset contract); pair
    with ``strip_html`` for markup removal (kept OUT of this stage so tag
    stripping runs as codegen expressions, not Python)."""
    import codecs

    import pandas as pd

    from pyspark.sql import functions as F

    cols = ["path", "url", "warc_date", "status", "content_type", "text"]
    resp = df.where(F.col("record_type") == "response").select(
        "path", "url", "warc_date", "content"
    )

    def decode(iterator):
        for pdf in iterator:
            rows = []
            for path, url, date, payload in zip(
                pdf["path"], pdf["url"], pdf["warc_date"], pdf["content"]
            ):
                try:
                    r = parse_http_response(bytes(payload))
                    try:
                        codecs.lookup(r["charset"])
                        cs = r["charset"]
                    except LookupError:
                        cs = "utf-8"  # unknown label in the wild -> lossy utf-8
                    text = r["body"].decode(cs, errors="replace")
                except (ValueError, zlib.error):
                    continue
                rows.append(
                    (
                        path, url, date, r["status"],
                        r["headers"].get("content-type"), text,
                    )
                )
                if len(rows) >= batch_rows:
                    yield pd.DataFrame(rows, columns=cols)
                    rows = []
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return resp.mapInPandas(
        decode,
        schema=(
            "path string, url string, warc_date string, status int, "
            "content_type string, text string"
        ),
    )


def read_warc_html(spark: SparkSession, path: str) -> DataFrame:
    """Raw-WARC text extraction: response records -> HTTP parse ->
    charset decode -> HTML strip (codegen expressions) -> (path, url,
    warc_date, status, text).  Only 200s with an HTML/plain content type
    survive — the WET-equivalent view of a raw crawl dump."""
    from pyspark.sql import functions as F

    from ..operators.text import strip_html

    recs = read_warc(spark, path)
    bodies = response_texts(recs)
    keep = bodies.where(
        (F.col("status") == 200)
        & (
            F.col("content_type").isNull()
            | F.lower("content_type").rlike("text/html|text/plain|xhtml")
        )
    )
    return keep.select(
        "path", "url", "warc_date", "status",
        strip_html(F.col("text")).alias("text"),
    )


def warc_file_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-file ingest/quarantine summary: (path, n_records,
    n_conversion, bad_members, bad_records).  Separate scan by design —
    run it on the shards the record read flagged, not inline with every
    ingest."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def stats(iterator):
        for pdf in iterator:
            rows = []
            for fpath, payload in zip(pdf["path"], pdf["content"]):
                c: dict = {}
                n = conv = 0
                for rec in iter_warc_records(bytes(payload), c):
                    n += 1
                    conv += rec["record_type"] == "conversion"
                rows.append(
                    (fpath, n, conv, c["bad_members"], c["bad_records"])
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "n_records", "n_conversion", "bad_members",
                    "bad_records",
                ],
            )

    return files.mapInPandas(stats, schema=_STATS_SCHEMA)


def write_wet(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    text_col: str = "text",
    date: str = "2026-01-01T00:00:00Z",
) -> DataFrame:
    """Export (url, text) rows as gzip-per-record WET shards, one file
    per partition — the corpus-interchange sink matching ``read_wet``.

    Returns a LAZY (shard_path, n_records) DataFrame; the write happens
    when it is consumed (the caller controls materialization, same
    contract as every other builder here).  Executor-local writes via
    mapInPandas keep the export shuffle-free; repartition upstream to
    choose the shard count.

    Memory is O(record), matching the reader's bound (see module head):
    each record is serialized and written as its own gzip member as it
    streams through — neither the partition's record list nor the shard
    bytes are ever materialized (pre-r6 this buffered the whole
    partition twice, ~2x shard size of Python heap per task).

    Commit protocol: the shard name derives from the Spark partition id,
    so a retried or speculatively-executed task attempt REWRITES the
    same file instead of silently adding a duplicate shard; each attempt
    writes an attempt-suffixed temp file and commits with one atomic
    rename, so readers never observe partials and concurrent attempts
    cannot interleave (last rename wins, with identical bytes for a
    deterministic upstream plan — the gzip members carry no timestamps).
    POSIX-rename contract: this sink targets local/shared POSIX
    filesystems; object stores lack atomic rename, so export there via a
    committed Spark write (e.g. ``df.write.parquet``) and convert, or
    mount the store behind a rename-capable layer."""
    import os

    import pandas as pd
    from pyspark import TaskContext

    def dump(iterator):
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else os.getpid()
        attempt = tc.taskAttemptId() if tc is not None else 0
        fname = os.path.join(out_dir, f"part-{pid:05d}.warc.wet.gz")
        tmp = f"{fname}.tmp-{attempt}"
        n, f = 0, None
        try:
            for pdf in iterator:
                for url, text in zip(pdf[url_col], pdf[text_col]):
                    if f is None:
                        os.makedirs(out_dir, exist_ok=True)
                        f = open(tmp, "wb")
                    rec = build_wet_record(
                        url, "" if text is None else str(text), date
                    )
                    c = zlib.compressobj(wbits=31)  # one member per record
                    f.write(c.compress(rec) + c.flush())
                    n += 1
        except BaseException:
            if f is not None:
                f.close()
                os.unlink(tmp)  # don't leave .tmp litter for binaryFile scans
            raise
        if f is not None:
            f.close()
            os.rename(tmp, fname)  # atomic: readers never see partials
            yield pd.DataFrame({"shard_path": [fname], "n_records": [n]})

    return df.select(url_col, text_col).mapInPandas(
        dump, schema="shard_path string, n_records long"
    )
