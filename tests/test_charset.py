# -*- coding: utf-8 -*-
"""Charset sniff/transcode: precedence, fallback, mojibake,
replacement counting, distributed kernel."""

from pyspark.sql import functions as F

from aquacache_spark.functions.charset import (
    sniff_and_decode, synthesize_encoded_docs, transcode_to_utf8)

CAFE = "café"
MOJI = "cafÃ©"  # 'cafÃ©'


def test_bom_beats_everything():
    raw = b"\xef\xbb\xbf" + ('<meta charset="utf-16">' + CAFE) \
        .encode("utf-8")
    r = sniff_and_decode(raw, http_charset="windows-1252")
    assert r["detection_source"] == "bom"
    assert r["detected_encoding"] == "utf-8"
    assert r["text"].endswith(CAFE) and r["had_bom"]


def test_header_beats_meta():
    raw = ('<meta charset="utf-8">' + CAFE).encode("cp1252")
    r = sniff_and_decode(raw, http_charset="ISO-8859-1")
    assert r["detection_source"] == "header"
    assert r["detected_encoding"] == "windows-1252"
    assert r["text"].endswith(CAFE)


def test_meta_prescan_only_first_1024_bytes():
    late = b" " * 1100 + b'<meta charset="windows-1252">' \
        + CAFE.encode("cp1252")
    r = sniff_and_decode(late)
    # declaration is past the prescan window -> UTF-8 validation
    # fails on the 0xE9 byte -> fallback (same decode, other source)
    assert r["detection_source"] == "fallback"


def test_unknown_label_falls_through():
    raw = ('<meta charset="klingon-8">x' + CAFE).encode("utf-8")
    r = sniff_and_decode(raw)
    assert r["detection_source"] == "utf8-valid"


def test_replacement_count_on_mislabeled_payload():
    # declared utf-16le but odd byte count: the final lone byte
    # becomes exactly one U+FFFD
    raw = b"\xff\xfe" + "ab".encode("utf-16-le") + b"\x41"
    r = sniff_and_decode(raw)
    assert r["detected_encoding"] == "utf-16le"
    assert r["replacement_count"] == 1


def test_mojibake_flag_cases():
    assert sniff_and_decode(MOJI.encode("utf-8"))["mojibake"]
    assert not sniff_and_decode(CAFE.encode("utf-8"))["mojibake"]
    # Â + NBSP — the other classic footprint
    assert sniff_and_decode("xÂ y".encode("utf-8"))["mojibake"]


def test_distributed_transcode_with_header_column(spark):
    df = spark.createDataFrame(
        [(1, bytearray(CAFE.encode("cp1252")), "latin-1"),
         (2, bytearray(CAFE.encode("utf-8")), None)],
        "doc_id long, payload binary, charset string")
    out = {r["doc_id"]: r for r in
           transcode_to_utf8(df, charset_col="charset").collect()}
    assert out[1]["detection_source"] == "header"
    assert out[1]["text"] == CAFE
    assert out[2]["detection_source"] == "utf8-valid"


def test_synthesize_classes_roundtrip(spark):
    docs = spark.createDataFrame(
        [(i, f"word{i} text") for i in range(12)],
        "doc_id long, text string")
    out = transcode_to_utf8(synthesize_encoded_docs(docs))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["detection_source"] == "bom"
    assert rows[1]["detected_encoding"] == "utf-16le"
    assert rows[3]["detection_source"] == "fallback"
    assert rows[4]["detection_source"] == "meta"
    assert rows[5]["detection_source"] == "utf8-valid"
    # doc 8 has id%7==1 and class 2: mojibake suffix round-trips
    assert rows[8]["mojibake"] and rows[8]["text"].endswith(MOJI)
    for i in range(12):
        assert rows[i]["replacement_count"] == 0
