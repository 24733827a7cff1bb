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


def _iter_gzip_members(
    payload: bytes, counters: dict, chunk: int = 1 << 20
) -> Iterator[bytes]:
    """Decompressed chunks across all gzip members, feeding ``chunk``
    bytes at a time off a memoryview (no whole-tail copies).  A corrupt
    member bumps ``counters['bad_members']`` and resyncs at the next gzip
    magic."""
    mv = memoryview(payload)
    n, pos = len(payload), 0
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        fed = pos
        try:
            while not d.eof and fed < n:
                out = d.decompress(mv[fed : fed + chunk])
                fed += min(chunk, n - fed)
                if out:
                    yield out
            if not d.eof:  # truncated final member
                raise zlib.error("truncated gzip member")
            pos = fed - len(d.unused_data)
        except zlib.error:
            counters["bad_members"] += 1
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
        buf += chunk
        buf = yield from _drain(buf, c, final=False)
    if buf:
        yield from _drain(buf, c, final=True)


def _drain(buf: bytes, c: dict, final: bool):
    """Emit every complete record in ``buf``; return the unconsumed tail.

    A malformed record is quarantined only once we can resync at the
    next ``\\r\\nWARC/`` marker (or at end of input): mid-stream, the
    marker may simply not have arrived yet, so the tail is kept and
    retried when more decompressed data lands — counting there would
    double-count, and giving up there would drop the rest of the file."""
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
                return buf[pos:]
            c["bad_records"] += 1
            pos = resync + 2
            continue
        if rec == "need":
            if final:
                c["bad_records"] += 1  # truncated trailing record
                return b""
            return buf[nxt:]
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


def read_warc(spark: SparkSession, path: str, batch_rows: int = 1024) -> DataFrame:
    """All WARC records under ``path`` (glob ok) as
    (path, record_type, url, warc_date, content_type, content).

    One input file = one row into the decode stage = one task's work;
    records stream out in ``batch_rows`` Arrow batches so a 1 GB shard
    never materializes decompressed.  Malformed members/records are
    skipped (see ``warc_file_stats`` for the counts — same contract as
    the jsonl quarantine reader, sources/files.py)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def decode(iterator):
        for pdf in iterator:
            for fpath, payload in zip(pdf["path"], pdf["content"]):
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
                        yield pd.DataFrame(
                            rows,
                            columns=[
                                "path", "record_type", "url", "warc_date",
                                "content_type", "content",
                            ],
                        )
                        rows = []
                if rows:
                    yield pd.DataFrame(
                        rows,
                        columns=[
                            "path", "record_type", "url", "warc_date",
                            "content_type", "content",
                        ],
                    )

    return files.mapInPandas(decode, schema=_RECORD_SCHEMA)


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WET text records under ``path``: (path, url, warc_date, text).

    Keeps only ``conversion`` records and decodes UTF-8 with
    replacement — crawl text routinely carries stray bytes, and a lossy
    char beats a dead task or a dropped page."""
    from pyspark.sql import functions as F

    recs = read_warc(spark, path)
    return recs.where(F.col("record_type") == "conversion").select(
        "path", "url", "warc_date",
        F.decode(F.col("content"), "UTF-8").alias("text"),
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
    choose the shard count."""
    import os
    import uuid

    import pandas as pd

    def dump(iterator):
        records = []
        for pdf in iterator:
            for url, text in zip(pdf[url_col], pdf[text_col]):
                records.append(
                    build_wet_record(url, "" if text is None else str(text), date)
                )
        if records:
            os.makedirs(out_dir, exist_ok=True)
            fname = os.path.join(
                out_dir, f"part-{uuid.uuid4().hex}.warc.wet.gz"
            )
            tmp = fname + ".tmp"
            with open(tmp, "wb") as f:
                f.write(build_warc_file(records, gzip_per_record=True))
            os.rename(tmp, fname)  # atomic: readers never see partials
            yield pd.DataFrame({"shard_path": [fname], "n_records": [len(records)]})

    return df.select(url_col, text_col).mapInPandas(
        dump, schema="shard_path string, n_records long"
    )
