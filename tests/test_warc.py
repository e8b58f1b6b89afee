"""WARC/WET source tests: pure-parser round-trips, gzip member chaining,
HTTP response splitting, hostile-bytes robustness, and the Spark reader
end-to-end (one task per file, typed schema)."""

import gzip
import io

import pytest

from semadb_spark.sources.warc import (
    WARC_SCHEMA,
    build_warc_bytes,
    iter_warc_records,
    read_warc,
    read_wet,
)


def _http_response_block(body: bytes, ctype: str = "text/html", chunked: bool = False) -> bytes:
    if chunked:
        payload = (
            f"{len(body):x}".encode() + b"\r\n" + body + b"\r\n0\r\n\r\n"
        )
        te = b"Transfer-Encoding: chunked\r\n"
    else:
        payload = body
        te = b""
    return (
        b"HTTP/1.1 200 OK\r\n"
        + f"Content-Type: {ctype}\r\n".encode()
        + te
        + b"Server: test\r\n\r\n"
        + payload
    )


def _sample_records():
    return [
        {"warc_type": "warcinfo", "content_type": "application/warc-fields",
         "block": b"software: test\r\n"},
        {"warc_type": "response", "target_uri": "http://example.com/a",
         "content_type": "application/http; msgtype=response",
         "block": _http_response_block(b"<html>hello</html>")},
        {"warc_type": "conversion", "target_uri": "http://example.com/a",
         "content_type": "text/plain", "text": "hello extracted text"},
        {"warc_type": "request", "target_uri": "http://example.com/a",
         "content_type": "application/http; msgtype=request",
         "block": b"GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n"},
    ]


def test_round_trip_plain():
    recs = list(iter_warc_records(build_warc_bytes(_sample_records())))
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "response", "conversion", "request"]
    resp = recs[1]
    assert resp["http_status"] == 200
    assert resp["http_content_type"] == "text/html"
    assert resp["payload"] == b"<html>hello</html>"
    assert resp["text"] == "<html>hello</html>"  # text/html is textual
    conv = recs[2]
    assert conv["text"] == "hello extracted text"
    assert conv["content_length"] == len(b"hello extracted text")
    assert recs[3]["http_status"] is None  # request: not msgtype=response


def test_round_trip_gzip_members():
    data = build_warc_bytes(_sample_records(), gzip_members=True)
    # genuinely multi-member: a second gzip magic exists past the first
    assert data[:2] == b"\x1f\x8b" and data.find(b"\x1f\x8b", 2) > 0
    recs = list(iter_warc_records(data))
    assert len(recs) == 4
    assert recs[1]["payload"] == b"<html>hello</html>"


def test_chunked_transfer_decoding():
    body = b"chunked payload body"
    raw = build_warc_bytes([
        {"warc_type": "response", "target_uri": "http://e.com/c",
         "content_type": "application/http; msgtype=response",
         "block": _http_response_block(body, chunked=True)},
    ])
    (rec,) = iter_warc_records(raw)
    assert rec["payload"] == body


def test_unicode_and_binary_payloads():
    raw = build_warc_bytes([
        {"warc_type": "conversion", "content_type": "text/plain",
         "text": "naïve café — ünïcode ✓"},
        {"warc_type": "response", "target_uri": "http://e.com/img",
         "content_type": "application/http; msgtype=response",
         "block": _http_response_block(b"\x89PNG\r\n\x1a\n\x00", ctype="image/png")},
    ])
    recs = list(iter_warc_records(raw))
    assert recs[0]["text"] == "naïve café — ünïcode ✓"
    assert recs[1]["text"] is None  # image/png: binary stays binary
    assert recs[1]["payload"].startswith(b"\x89PNG")


def test_truncated_final_record_is_kept_partial():
    raw = build_warc_bytes(_sample_records())
    cut = raw[: len(raw) - 30]  # cut into the final record's block
    recs = list(iter_warc_records(cut))
    assert len(recs) == 4  # all records survive, last one truncated
    assert recs[3]["content_length"] <= len(
        b"GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n")


def test_truncated_gzip_member_never_raises():
    data = build_warc_bytes(_sample_records(), gzip_members=True)
    for cut in (len(data) - 7, len(data) // 2, 10, 3, 1):
        recs = list(iter_warc_records(data[:cut]))  # must not raise
        assert all(r["warc_type"] in
                   {"warcinfo", "response", "conversion", "request"}
                   for r in recs)


def test_garbage_and_missing_length_resync():
    good = build_warc_bytes([_sample_records()[2]])
    bad = b"WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: oops\r\n\r\n" + good
    recs = list(iter_warc_records(bad))
    # bad-length record skipped via resync; good record still parsed
    assert [r["warc_type"] for r in recs] == ["conversion"]
    assert list(iter_warc_records(b"\x00\xffnot a warc")) == []
    assert list(iter_warc_records(b"")) == []


def test_header_continuation_folding():
    block = b"x"
    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: metadata\r\n"
        b"WARC-Target-URI: http://example.com/very\r\n"
        b"\t/long/path\r\n"
        + f"Content-Length: {len(block)}\r\n\r\n".encode()
        + block + b"\r\n\r\n"
    )
    (rec,) = iter_warc_records(raw)
    assert rec["target_uri"] == "http://example.com/very /long/path"


def test_lf_only_capture_tolerated():
    raw = (
        b"WARC/1.0\n"
        b"WARC-Type: conversion\n"
        b"Content-Type: text/plain\n"
        b"Content-Length: 5\n\n"
        b"hello\n\n"
    )
    (rec,) = iter_warc_records(raw)
    assert rec["text"] == "hello"


@pytest.fixture()
def warc_dir(tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "seg-0.warc").write_bytes(build_warc_bytes(_sample_records()))
    (d / "seg-1.warc.gz").write_bytes(
        build_warc_bytes(
            [{"warc_type": "conversion", "target_uri": "http://e.com/b",
              "content_type": "text/plain", "text": "second file text"}],
            gzip_members=True,
        )
    )
    return str(d)


def test_read_warc_spark(spark, warc_dir):
    df = read_warc(spark, warc_dir)
    assert df.schema.simpleString() == (
        "struct<" + WARC_SCHEMA.replace(", ", ",").replace(" ", ":") + ">"
    )
    rows = df.collect()
    assert len(rows) == 5
    by_type = {}
    for r in rows:
        by_type.setdefault(r["warc_type"], []).append(r)
    assert len(by_type["conversion"]) == 2
    assert by_type["response"][0]["http_status"] == 200
    # record_types filter drops inside the task
    only = read_warc(spark, warc_dir, record_types=("conversion",)).collect()
    assert {r["target_uri"] for r in only} == {"http://example.com/a", "http://e.com/b"}
    # with_payload=False nulls payload at the source
    nopay = read_warc(spark, warc_dir, with_payload=False).collect()
    assert all(r["payload"] is None for r in nopay)


def test_read_wet_spark(spark, warc_dir):
    df = read_wet(spark, warc_dir)
    assert "payload" not in df.columns
    rows = df.collect()
    assert sorted(r["text"] for r in rows) == [
        "hello extracted text", "second file text"]


def test_write_warc_distributed_round_trip(spark, tmp_path):
    from pyspark.sql import functions as F

    out = str(tmp_path / "export")
    src = spark.range(0, 50).select(
        F.lit("conversion").alias("warc_type"),
        F.concat(F.lit("http://corpus.invalid/doc/"), F.col("id")).alias("target_uri"),
        F.lit("text/plain").alias("content_type"),
        F.concat(F.lit("body of doc "), F.col("id")).alias("text"),
    ).repartition(4)
    from semadb_spark.sources.warc import write_warc

    write_warc(src, out)
    import os

    files = sorted(os.listdir(out))
    assert 1 <= len(files) <= 4 and all(f.endswith(".warc.gz") for f in files)
    back = read_warc(spark, out).collect()
    assert len(back) == 50
    assert sorted(r["text"] for r in back) == sorted(
        f"body of doc {i}" for i in range(50))
    assert all(r["content_length"] == len(r["text"]) for r in back)


def test_write_warc_rerun_is_atomic(spark, tmp_path):
    """A re-run of the sink over the same partition (the retry /
    speculative-attempt shape) must leave exactly one valid final file per
    partition and zero .inprogress temporaries — never a torn member."""
    import os

    from pyspark.sql import functions as F

    from semadb_spark.sources.warc import write_warc

    out = str(tmp_path / "export")
    src = spark.range(0, 20).select(
        F.lit("conversion").alias("warc_type"),
        F.lit("text/plain").alias("content_type"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
    ).coalesce(1)
    write_warc(src, out)
    # stray from a "crashed attempt" of an earlier run with the same prefix
    stray = os.path.join(out, "part-00000.warc.gz.inprogress-999")
    with open(stray, "wb") as f:
        f.write(b"\x1f\x8b torn partial gzip member")
    write_warc(src, out)  # the re-run
    files = sorted(os.listdir(out))
    assert files == ["part-00000.warc.gz"]  # stray removed, no temporaries
    back = read_warc(spark, out).collect()
    assert sorted(r["text"] for r in back) == sorted(f"doc {i}" for i in range(20))


def test_read_warc_chunked_flush(spark, tmp_path):
    """More records than the per-chunk flush bound in one file — the
    parser must yield multiple bounded chunks that reassemble losslessly."""
    from semadb_spark.sources import warc as warc_mod

    n = warc_mod._FLUSH_ROWS + 476
    d = tmp_path / "big"
    d.mkdir()
    (d / "big.warc").write_bytes(build_warc_bytes(
        [{"warc_type": "conversion", "content_type": "text/plain",
          "text": f"r{i}"} for i in range(n)]))
    got = read_warc(spark, str(d)).collect()
    assert len(got) == n
    assert sorted(r["text"] for r in got) == sorted(f"r{i}" for i in range(n))


def test_stream_warc_micro_batches(spark, tmp_path):
    import time

    d = tmp_path / "incoming"
    d.mkdir()
    (d / "seg-0.warc.gz").write_bytes(build_warc_bytes(
        [{"warc_type": "conversion", "target_uri": "http://e/1",
          "content_type": "text/plain", "text": "first batch doc"}],
        gzip_members=True))
    from semadb_spark.sources.warc import stream_warc

    s = stream_warc(spark, str(d), record_types=("conversion",), with_payload=False)
    assert s.isStreaming
    name = "warc_stream_sink"
    q = (s.writeStream.format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql(f"select target_uri, text from {name}").collect()
    assert [(r["target_uri"], r["text"]) for r in got] == [("http://e/1", "first batch doc")]
    # a NEW file arriving is picked up by the next run from the same source
    (d / "seg-1.warc").write_bytes(build_warc_bytes(
        [{"warc_type": "conversion", "target_uri": "http://e/2",
          "content_type": "text/plain", "text": "second arrival"}]))
    q2 = (stream_warc(spark, str(d), record_types=("conversion",))
          .writeStream.format("memory").queryName(name + "2")
          .trigger(availableNow=True).start())
    q2.awaitTermination(120)
    got2 = {r["target_uri"] for r in spark.sql(f"select target_uri from {name}2").collect()}
    assert got2 == {"http://e/1", "http://e/2"}
