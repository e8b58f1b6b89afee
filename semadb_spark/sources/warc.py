"""WARC / WET web-archive source (ISO 28500) for training-data ingestion.

Common Crawl — the de-facto 100 TB corpus — ships as ``.warc.gz`` /
``.wet.gz`` files: concatenated records, each its own gzip member. This
module parses that format into a typed DataFrame, Spark-first:

- **File-level parallelism is the correct scale shape.** Per-record gzip
  members make the format non-splittable without an external index, and
  the corpus answer (Common Crawl itself) is many ~1 GiB files processed
  one-per-task. ``spark.read.format("binaryFile")`` gives exactly that:
  one task per file, no shuffle, and the parse runs inside
  ``mapInPandas`` so a 100k-file crawl fans out across every executor.
- **Streaming decompression, bounded memory.** Members are inflated one
  at a time with ``zlib.decompressobj(wbits=31)`` chained over
  ``unused_data``, and parsed rows are flushed to Arrow in bounded
  chunks. Peak memory per task is the raw compressed file bytes (which
  ``binaryFile`` materializes whole — unavoidable for a non-splittable
  format) plus one inflated record plus one output chunk, NOT the whole
  inflated file.
- **Never raises on hostile bytes.** Crawl data is adversarial; the
  parser follows the repo's media-decoder contract (garbled records are
  skipped, a truncated trailing gzip member is kept as the partial bytes
  that did inflate — final-record cutoff is routine in crawl data) so
  one bad record cannot kill a 100k-file job.

The reference has no web-archive path at all (its ingest surface is the
HTTP JSON/msgpack API, httpapi/v2/handlers.go) — this is a north-star
extra for the LLM-pipeline story, same tier as the multimodal columns.
"""

from __future__ import annotations

import zlib
from typing import Iterator

GZIP_MAGIC = b"\x1f\x8b"

# Columns surfaced per record. `payload` is the raw block (HTTP body for
# response records), `text` is the UTF-8 decode for textual payloads
# (always set for WET conversion records), NULL otherwise — the same
# typed-metadata-plus-opaque-binary contract as the multimodal columns.
WARC_SCHEMA = (
    "warc_file string, record_id string, warc_type string, "
    "target_uri string, warc_date string, content_type string, "
    "content_length bigint, http_status int, http_content_type string, "
    "payload binary, text string"
)

_TEXTUAL_PREFIXES = ("text/",)
_TEXTUAL_EXACT = ("application/json", "application/xml", "application/xhtml+xml")


# Input chunk fed to the inflater per call. Feeding the WHOLE remaining
# buffer per member is O(file²) in memcpy — `data[pos:]` copies the tail
# for every member and `unused_data` copies it again, which measured
# ~2.5 ms/record on member-per-record crawl files (a 25 MB file with 78k
# members moved ~1 TB of bytes). Chunked feeding bounds per-member copies
# to the inflated output plus one ≤CHUNK tail.
_GZ_CHUNK = 1 << 20


def _iter_gzip_members(data: bytes) -> Iterator[bytes]:
    """Inflate concatenated gzip members one at a time. A corrupt member
    stops the scan; a truncated final member yields whatever bytes did
    inflate (kept partial — crawl files are often cut off mid-record and
    the leading records of the member are still good)."""
    view = memoryview(data)
    pos = 0
    n = len(data)
    while pos < n and data[pos : pos + 2] == GZIP_MAGIC:
        d = zlib.decompressobj(wbits=31)
        out: list[bytes] = []
        try:
            while not d.eof and pos < n:
                fed = view[pos : pos + _GZ_CHUNK]
                out.append(d.decompress(fed))
                pos += len(fed) - len(d.unused_data)
        except zlib.error:
            return
        member = b"".join(out)
        if not d.eof:  # truncated final member
            if member:
                yield member
            return
        yield member


def _split_headers(head: bytes) -> dict[str, str]:
    """Parse `Name: value` header lines with RFC continuation folding.
    Names are case-folded; a repeated name keeps the first value (WARC
    named headers are single-valued per spec)."""
    headers: dict[str, str] = {}
    last: str | None = None
    for raw in head.split(b"\n"):
        line = raw.rstrip(b"\r")
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + line.strip().decode("utf-8", "replace")
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            continue
        key = name.strip().decode("utf-8", "replace").lower()
        if key not in headers:
            headers[key] = value.strip().decode("utf-8", "replace")
        last = key
    return headers


def _dechunk(body: bytes) -> bytes | None:
    """Decode HTTP/1.1 chunked transfer encoding; None if malformed."""
    out = []
    pos = 0
    n = len(body)
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            return None
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return None
        pos = eol + 2
        if size == 0:
            return b"".join(out)
        if pos + size > n:
            return None
        out.append(body[pos : pos + size])
        pos += size + 2  # chunk data + CRLF


def _parse_http_response(block: bytes) -> tuple[int | None, str | None, bytes]:
    """Split an `application/http; msgtype=response` block into
    (status, content-type, body). Tolerates LF-only captures; a block
    that is not an HTTP response comes back (None, None, block)."""
    if not block.startswith(b"HTTP/"):
        return None, None, block
    sep = block.find(b"\r\n\r\n")
    seplen = 4
    if sep < 0:
        sep = block.find(b"\n\n")
        seplen = 2
    if sep < 0:
        sep, seplen = len(block), 0
    head, body = block[:sep], block[sep + seplen :]
    first, _, rest = head.partition(b"\n")
    parts = first.strip().split(None, 2)
    status: int | None = None
    if len(parts) >= 2:
        try:
            status = int(parts[1])
        except ValueError:
            status = None
    headers = _split_headers(rest)
    if "chunked" in headers.get("transfer-encoding", "").lower():
        dechunked = _dechunk(body)
        if dechunked is not None:
            body = dechunked
    ctype = headers.get("content-type")
    return status, ctype, body


def _is_textual(content_type: str | None) -> bool:
    if not content_type:
        return False
    base = content_type.split(";", 1)[0].strip().lower()
    return base.startswith(_TEXTUAL_PREFIXES) or base in _TEXTUAL_EXACT


def iter_warc_records(data: bytes, source: str = "") -> Iterator[dict]:
    """Parse raw WARC bytes (plain or member-gzipped) into record dicts
    matching ``WARC_SCHEMA``. Malformed records are skipped, never raised;
    a record whose declared Content-Length overruns the buffer is
    truncated to what is present (final-record cutoff is routine in
    crawl data)."""
    if data[:2] == GZIP_MAGIC:
        streams: Iterator[bytes] = _iter_gzip_members(data)
    else:
        streams = iter((data,))
    for stream in streams:
        pos = 0
        n = len(stream)
        while pos < n:
            start = stream.find(b"WARC/", pos)
            if start < 0:
                break
            hdr_end = stream.find(b"\r\n\r\n", start)
            seplen = 4
            if hdr_end < 0:
                hdr_end = stream.find(b"\n\n", start)
                seplen = 2
            if hdr_end < 0:
                break
            version_end = stream.find(b"\n", start)
            if version_end < 0 or version_end > hdr_end:
                version_end = hdr_end
            headers = _split_headers(stream[version_end + 1 : hdr_end])
            try:
                declared = int(headers.get("content-length", ""))
            except ValueError:
                declared = -1
            body_start = hdr_end + seplen
            if declared < 0:
                # no usable length: resync on the next record marker
                nxt = stream.find(b"WARC/", body_start)
                pos = nxt if nxt > 0 else n
                continue
            block = stream[body_start : body_start + declared]
            pos = body_start + declared
            warc_type = headers.get("warc-type", "")
            content_type = headers.get("content-type")
            http_status: int | None = None
            http_ctype: str | None = None
            payload = block
            if content_type and "msgtype=response" in content_type.replace(" ", ""):
                http_status, http_ctype, payload = _parse_http_response(block)
            text: str | None = None
            if warc_type == "conversion" or _is_textual(
                http_ctype if http_ctype is not None else content_type
            ):
                text = payload.decode("utf-8", "replace")
            yield {
                "warc_file": source,
                "record_id": headers.get("warc-record-id"),
                "warc_type": warc_type,
                "target_uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "content_type": content_type,
                "content_length": len(block),
                "http_status": http_status,
                "http_content_type": http_ctype,
                "payload": payload,
                "text": text,
            }


# Flush parsed rows to Arrow when either bound trips: records held or
# approximate payload bytes held. Keeps executor memory at "one chunk",
# not "one inflated file" (a ~1 GiB member-gzipped crawl file can inflate
# to several GiB — holding every record of a batch in a Python list
# before the first yield would spike per-task memory by exactly that).
_FLUSH_ROWS = 1024
_FLUSH_BYTES = 64 << 20


def _make_warc_parser(record_types, with_payload: bool):
    """Shared mapInPandas parse fn for read_warc/stream_warc: record-type
    filter and payload drop inside the task, rows yielded in bounded
    chunks (``_FLUSH_ROWS`` / ``_FLUSH_BYTES``) rather than one list per
    binaryFile batch."""
    import pandas as pd  # local import: executors only need it at parse time

    types = tuple(record_types) if record_types else None
    keep_payload = bool(with_payload)
    columns = [c.split()[0] for c in WARC_SCHEMA.split(", ")]

    def parse(batches):
        rows: list = []
        held = 0
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for rec in iter_warc_records(bytes(content), source=str(fpath)):
                    if types is not None and rec["warc_type"] not in types:
                        continue
                    if not keep_payload:
                        rec["payload"] = None
                    rows.append(rec)
                    held += rec["content_length"] or 0
                    if len(rows) >= _FLUSH_ROWS or held >= _FLUSH_BYTES:
                        yield pd.DataFrame(rows, columns=columns)
                        rows, held = [], 0
        yield pd.DataFrame(rows, columns=columns)

    return parse


def read_warc(spark, path: str, *, record_types=None, with_payload: bool = True):
    """Read WARC/WET files (plain or .gz) under ``path`` into a DataFrame
    with ``WARC_SCHEMA``.

    ``record_types`` keeps only the named WARC-Type values (e.g.
    ``("response", "conversion")``) — applied inside the parse task, so
    request/metadata records are dropped before they ever hit a shuffle.
    ``with_payload=False`` nulls the payload column at the source for
    metadata-only scans (column pruning cannot reach inside the parser).

    Scale: one task per file (binaryFile is non-splittable, matching the
    per-record-gzip format); 100k crawl files -> 100k tasks, zero
    shuffles. Memory per task = the compressed file bytes (binaryFile
    materializes them) + one inflated record + one bounded output chunk.
    """
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(
        _make_warc_parser(record_types, with_payload), schema=WARC_SCHEMA
    )


def build_warc_bytes(records, *, gzip_members: bool = False) -> bytes:
    """Serialize record dicts into WARC/1.0 bytes (optionally one gzip
    member per record, the Common Crawl layout). Used by the export sink,
    tests, and the correctness gate; round-trips through
    ``iter_warc_records``.

    Each record dict: ``warc_type`` (required), ``block`` bytes OR
    ``text`` str, plus optional ``target_uri`` / ``record_id`` /
    ``warc_date`` / ``content_type``.
    """
    import io

    out = io.BytesIO()
    for i, rec in enumerate(records):
        out.write(_warc_member_bytes(rec, i, gzip_members=gzip_members))
    return out.getvalue()


def _warc_member_bytes(rec, i: int, *, gzip_members: bool) -> bytes:
    """One record's serialized WARC member (optionally its own gzip
    member) — the streaming unit shared by :func:`build_warc_bytes` and
    the :func:`write_warc` sink's incremental writer."""
    import gzip as _gzip
    import io

    block = rec.get("block")
    if block is None:
        block = (rec.get("text") or "").encode("utf-8")
    headers = [
        ("WARC-Type", rec["warc_type"]),
        ("WARC-Record-ID", rec.get("record_id") or f"<urn:rec:{i}>"),
        ("WARC-Date", rec.get("warc_date") or "2026-01-01T00:00:00Z"),
    ]
    if rec.get("target_uri"):
        headers.append(("WARC-Target-URI", rec["target_uri"]))
    if rec.get("content_type"):
        headers.append(("Content-Type", rec["content_type"]))
    headers.append(("Content-Length", str(len(block))))
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode() for k, v in headers
    )
    member = head + b"\r\n" + block + b"\r\n\r\n"
    if gzip_members:
        # mtime=0 keeps the bytes deterministic for the oracle gate
        buf = io.BytesIO()
        with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(member)
        member = buf.getvalue()
    return member


def write_warc(df, out_dir: str, *, gzip_members: bool = True,
               prefix: str = "part") -> None:
    """Distributed WARC export sink: each partition serializes its rows to
    one ``<prefix>-<partitionId>.warc[.gz]`` file under ``out_dir`` — the
    standard crawl layout (many member-gzipped files), written from the
    executors with no driver collect and no shuffle.

    Input columns (extra columns ignored): ``warc_type`` (required),
    ``target_uri``, ``content_type``, ``record_id``, ``warc_date``, and
    ``block`` (binary) or ``text`` (string) for the record body.

    ``out_dir`` must be executor-visible (shared storage on a cluster;
    any local dir in local mode). Empty partitions write nothing.

    Atomicity: each task writes to ``<name>.inprogress-<taskAttemptId>``
    and ``os.replace``s to the final path only after a clean close, so a
    killed task, a retry, or a speculative duplicate attempt can never
    leave a torn gzip member at the final path — the last finishing
    attempt wins with a complete file (POSIX rename is atomic; the
    reference bar is all-or-nothing pipelines, utils/pipeline.go:1-9).
    Stray ``.inprogress-*`` files from crashed attempts of a previous run
    with the same prefix are removed up front.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    for stray in os.listdir(out_dir):
        if stray.startswith(f"{prefix}-") and ".inprogress-" in stray:
            try:
                os.remove(os.path.join(out_dir, stray))
            except OSError:
                pass
    fields = [c for c in (
        "warc_type", "target_uri", "content_type", "record_id",
        "warc_date", "block", "text",
    ) if c in df.columns]
    ext = ".warc.gz" if gzip_members else ".warc"

    def dump(rows):
        from pyspark import TaskContext

        # streaming writer: one record in memory at a time — a crawl-sized
        # partition never buffers fully (neither as a row list nor as the
        # serialized bytes), matching the parser's bounded-memory contract
        ctx = TaskContext.get()
        pid = ctx.partitionId()
        attempt = ctx.taskAttemptId()
        final = os.path.join(out_dir, f"{prefix}-{pid:05d}{ext}")
        tmp = f"{final}.inprogress-{attempt}"
        wrote = False
        f = None
        try:
            for i, row in enumerate(rows):
                rec = {fld: row[fld] for fld in fields}
                if rec.get("block") is not None:
                    rec["block"] = bytes(rec["block"])
                if f is None:
                    f = open(tmp, "wb")  # lazily: empty partitions write nothing
                f.write(_warc_member_bytes(rec, i, gzip_members=gzip_members))
            if f is not None:
                f.close()
                f = None
                os.replace(tmp, final)
                wrote = True
        finally:
            if f is not None:
                f.close()
            if not wrote and os.path.exists(tmp):
                os.remove(tmp)

    df.foreachPartition(dump)


def read_wet(spark, path: str):
    """WET (extracted-text) convenience reader: conversion records only,
    payload dropped, text guaranteed non-null."""
    from pyspark.sql import functions as F

    df = read_warc(spark, path, record_types=("conversion",), with_payload=False)
    return df.drop("payload").withColumn(
        "text", F.coalesce("text", F.lit(""))
    )


BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def stream_warc(spark, path: str, *, record_types=None,
                with_payload: bool = True, max_files_per_trigger: int | None = None):
    """Structured-Streaming WARC ingestion: watch ``path`` for new crawl
    files and emit parsed records per micro-batch — the
    continuous-ingestion twin of :func:`read_warc` (same parse, same
    ``WARC_SCHEMA``). New segment files are the unit of arrival, exactly
    how crawls are published; ``max_files_per_trigger`` bounds batch size
    so a backlog drains at a controlled rate. Compose with
    ``streaming/ingest.py`` operators (dedup-on-arrival, incremental
    text index) or ``writeStream`` straight to a bronze parquet table.

    binaryFile's streaming source needs the schema pinned up front
    (``BINARYFILE_SCHEMA``); each file is still one task, unsplittable
    by design.
    """
    reader = spark.readStream.format("binaryFile").schema(BINARYFILE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    files = reader.load(path).select("path", "content")
    return files.mapInPandas(
        _make_warc_parser(record_types, with_payload), schema=WARC_SCHEMA
    )
