"""WARC codec + source: roundtrip, quarantine, distributed ingest."""

import gzip

import pytest
from pyspark.sql import functions as F

from aquacache_spark.functions.warc import (
    build_warc, encode_warc_record, gzip_member, http_response_block,
    iter_warc_records, parse_http_response)
from aquacache_spark.sources.warc import read_warc, warc_records


def _resp(i: int, payload: bytes = b"<html>x</html>",
          status: int = 200) -> bytes:
    return encode_warc_record(
        {"WARC-Type": "response",
         "WARC-Record-ID": f"urn:example:{i}",
         "WARC-Date": "2024-01-01T00:00:01Z",
         "WARC-Target-URI": f"https://example.org/doc/{i}",
         "Content-Type": "application/http; msgtype=response"},
        http_response_block(status, "OK",
                            {"Content-Type": "text/html"}, payload))


def _req(i: int) -> bytes:
    return encode_warc_record(
        {"WARC-Type": "request",
         "WARC-Record-ID": f"urn:example:req:{i}",
         "WARC-Date": "2024-01-01T00:00:02Z",
         "WARC-Target-URI": f"https://example.org/doc/{i}"},
        b"GET /doc HTTP/1.1\r\nHost: example.org\r\n\r\n")


def test_roundtrip_gz_and_plain():
    recs = [_resp(1), _req(1), _resp(2, b"abc" * 100, 404)]
    for gz in (True, False):
        out = list(iter_warc_records(build_warc(recs, gz=gz)))
        assert [r["ok"] for r in out] == [True] * 3
        assert [r["warc_type"] for r in out] == [
            "response", "request", "response"]
        assert out[0]["http_status"] == 200
        assert out[0]["payload"] == b"<html>x</html>"
        assert out[0]["target_uri"] == "https://example.org/doc/1"
        assert out[0]["record_id"] == "urn:example:1"
        assert out[2]["http_status"] == 404
        assert out[2]["payload"] == b"abc" * 100
        # request records carry their raw block, no HTTP parse
        assert out[1].get("http_status") is None


def test_gz_member_spanning_many_feed_chunks():
    # r12: the member splitter feeds zlib bounded chunks (256 KiB) off
    # a memoryview instead of slicing the whole remainder per member
    # (which copied O(members x size) bytes). Pin the boundary cases:
    # one member whose compressed AND inflated size spans several feed
    # chunks, surrounded by tiny members, parses byte-exactly.
    import os

    big = os.urandom(1 << 20)  # incompressible: compressed > 2 chunks
    recs = [_resp(1), _resp(2, big), _resp(3)]
    out = list(iter_warc_records(build_warc(recs)))
    assert [r["ok"] for r in out] == [True] * 3
    assert out[1]["payload"] == big
    assert out[0]["payload"] == b"<html>x</html>"
    assert out[2]["record_id"] == "urn:example:3"


def test_gz_members_independent_after_corruption():
    # member 1 OK, member 2 corrupt, member 3 unreachable: the OK
    # record survives and exactly one quarantine row is emitted
    m1, m2, m3 = (gzip_member(_resp(i)) for i in (1, 2, 3))
    blob = m1 + m2[:10] + b"\x00\x00\x00\x00" + m2[14:] + m3
    out = list(iter_warc_records(blob))
    assert out[0]["ok"] and out[0]["record_id"] == "urn:example:1"
    assert not out[1]["ok"] and "gzip" in out[1]["error"]
    assert len(out) == 2


def test_truncated_member_quarantines():
    blob = build_warc([_resp(1), _resp(2)], gz=True)
    out = list(iter_warc_records(blob[: len(blob) - 15]))
    assert out[0]["ok"]
    assert not out[-1]["ok"] and "trunc" in out[-1]["error"]


def test_truncated_plain_block_and_header():
    plain = build_warc([_resp(1)], gz=False)
    out = list(iter_warc_records(plain[:30]))
    assert [r["ok"] for r in out] == [False]
    assert "truncated header" in out[0]["error"]
    out = list(iter_warc_records(plain[: len(plain) - 20]))
    assert "truncated block" in out[0]["error"]


def test_bad_magic_and_missing_content_length():
    out = list(iter_warc_records(b"NOTAWARC/1.0\r\nfoo: bar\r\n\r\nxx"))
    assert not out[0]["ok"] and "bad magic" in out[0]["error"]
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n\r\n" + b"x" * 10)
    out = list(iter_warc_records(bad))
    assert not out[0]["ok"] and "Content-Length" in out[0]["error"]


def test_http_block_without_head_is_passthrough():
    r = parse_http_response(b"no http head here")
    assert r["http_status"] is None
    assert r["payload"] == b"no http head here"


def test_distributed_read_warc(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    for f in range(3):
        recs = [_resp(f * 10 + i) for i in range(4)] + [_req(f * 10)]
        (d / f"crawl-{f}.warc.gz").write_bytes(build_warc(recs))
    out = read_warc(spark, str(d))
    rows = out.collect()
    assert len(rows) == 15
    resp = out.where(F.col("warc_type") == "response")
    assert resp.count() == 12
    assert resp.where(~F.col("ok")).count() == 0
    # file identity is stable per path: 3 distinct file_ids, 5 rows each
    per = out.groupBy("file_id").count().collect()
    assert sorted(r["count"] for r in per) == [5, 5, 5]


def test_warc_records_quarantine_distributed(spark):
    good = build_warc([_resp(1), _resp(2)])
    bad = good[:25] + b"\xff\xff\xff\xff" + good[29:]
    df = spark.createDataFrame(
        [(0, bytearray(good)), (1, bytearray(bad))],
        "file_id long, content binary")
    out = warc_records(df)
    ok = out.where(F.col("ok")).count()
    quarantined = out.where(~F.col("ok")).count()
    assert ok >= 2 and quarantined >= 1
    # the good file parses fully even when a sibling file is corrupt
    assert out.where(F.col("ok")
                     & (F.col("file_id") == 0)).count() == 2


def test_write_warc_roundtrip(spark, tmp_path):
    # export -> re-ingest: every record survives with its URL and
    # payload; file assignment is deterministic (id-hash, not
    # partition layout)
    from aquacache_spark.sources.warc import write_warc

    docs = spark.createDataFrame(
        [(i, f"https://example.org/d/{i}", f"body {i} text")
         for i in range(57)],
        "doc_id long, url string, payload string")
    out = str(tmp_path / "export")
    man1 = {r["file_name"]: (r["n_records"], r["n_bytes"])
            for r in write_warc(docs, out,
                                records_per_file=20).collect()}
    assert sum(n for n, _ in man1.values()) == 57
    assert len(man1) == 3  # ceil(57/20) hash buckets
    back = read_warc(spark, out)
    rows = back.collect()
    assert len(rows) == 57
    assert all(r["ok"] and r["warc_type"] == "response" for r in rows)
    got = {int(r["record_id"].split(":")[-1]):
           bytes(r["payload"]).decode() for r in rows}
    assert got == {i: f"body {i} text" for i in range(57)}
    # repartitioned input produces the identical file assignment
    out2 = str(tmp_path / "export2")
    man2 = {r["file_name"]: (r["n_records"], r["n_bytes"])
            for r in write_warc(docs.repartition(7), out2,
                                records_per_file=20).collect()}
    assert man1 == man2


def test_streaming_warc_ingest_composes_with_dedup(spark, tmp_path):
    # the streaming mirror of the web on-ramp: archives dropped into a
    # landing zone stream through the same parse kernel, compose with
    # the exact-dedup stage, and each file is processed exactly once
    from aquacache_spark.sources.warc import read_warc_stream
    from aquacache_spark.streaming.structured import dedup_stream

    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = str(tmp_path / "ckpt")
    seen = []

    def process(df, epoch_id):
        seen.extend(df.collect())

    stream = read_warc_stream(spark, str(landing))
    docs = (stream.where(F.col("ok")
                         & (F.col("warc_type") == "response"))
            .select(F.col("record_id").alias("doc_id"),
                    F.col("payload").cast("string").alias("text"),
                    F.current_timestamp().alias("ingest_time")))
    q = (dedup_stream(docs)
         .writeStream.outputMode("append")
         .option("checkpointLocation", ckpt)
         .foreachBatch(process).start())
    try:
        # drop 1: records 0-3; record 1 and 3 share identical payload
        recs = [_resp(0, b"alpha"), _resp(1, b"dup body"),
                _resp(2, b"beta"), _resp(3, b"dup body")]
        (landing / "a.warc.gz").write_bytes(build_warc(recs))
        q.processAllAvailable()
        # drop 2: a re-crawl of the same payloads + one new page
        recs2 = [_resp(10, b"alpha"), _resp(11, b"gamma")]
        (landing / "b.warc.gz").write_bytes(build_warc(recs2))
        q.processAllAvailable()
    finally:
        q.stop()

    texts = sorted(bytes(r["text"], "utf-8").decode()
                   if isinstance(r["text"], str) else r["text"]
                   for r in seen)
    # first arrival wins: 'dup body' once, re-crawled 'alpha' dropped
    assert texts == ["alpha", "beta", "dup body", "gamma"]
