"""Charset detection + UTF-8 transcoding — web corpora are not UTF-8.

The reference (YukonWRB/AquaCache) ingests API payloads that are
already UTF-8; a crawl corpus (the WARC on-ramp, sources/warc.py) is
not. This module is the trafilatura/ftfy role rebuilt from the public
algorithms:

- BOM sniff (Unicode standard): EF BB BF -> utf-8, FF FE -> utf-16le,
  FE FF -> utf-16be;
- the WHATWG HTML5 "prescan a byte stream to determine its encoding"
  idea: a ``<meta charset=...>`` / http-equiv Content-Type charset
  declaration within the first 1024 bytes;
- an HTTP header charset, when the fetch layer captured one;
- strict UTF-8 validation;
- windows-1252 fallback (every byte decodes — the requests/WHATWG
  default for unlabeled legacy content);
- a mojibake footprint flag: UTF-8 bytes previously mis-decoded as
  cp1252 leave ``Ã``/``Â`` followed by a Latin-1-range character in
  the text (the classic ``Ã©`` for ``é``) — flagged, not repaired,
  so downstream filters can quarantine or re-decode.

Everything is a map-only Arrow kernel (one pass over the payload
column, no shuffle): at 100 TB the cost is the decode itself and it
scales embarrassingly with executors.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_META_RE = re.compile(
    rb"<meta[^>]+charset\s*=\s*[\"']?([A-Za-z0-9_.:-]+)", re.I)
# Ã (U+00C3) / Â (U+00C2) followed by a Latin-1-range char: the
# footprint of UTF-8 bytes mis-decoded as cp1252 (e.g. é -> Ã©)
_MOJIBAKE_RE = re.compile("[\\u00c3\\u00c2][\\u0080-\\u00ff]")

_ALIASES = {
    "utf8": "utf-8", "utf-8": "utf-8",
    "latin-1": "windows-1252", "latin1": "windows-1252",
    "iso-8859-1": "windows-1252", "windows-1252": "windows-1252",
    "cp1252": "windows-1252",
    "utf-16le": "utf-16le", "utf-16be": "utf-16be",
    "utf-16": "utf-16le",
}


def _normalize_label(label: str) -> str | None:
    return _ALIASES.get(label.strip().lower())


def sniff_and_decode(raw: bytes, http_charset: str | None = None) -> dict:
    """Detect the encoding of ``raw`` and decode to a str.

    Precedence (the WHATWG order): BOM > transport (HTTP header) >
    in-document meta declaration > strict UTF-8 validation >
    windows-1252 fallback. Returns detected_encoding /
    detection_source ('bom'|'header'|'meta'|'utf8-valid'|'fallback'),
    the decoded text, had_bom, replacement_count (U+FFFD substitutions
    on a mislabeled payload), and the mojibake footprint flag."""
    had_bom = False
    enc = None
    source = None
    body = raw
    if raw[:3] == b"\xef\xbb\xbf":
        enc, source, had_bom, body = "utf-8", "bom", True, raw[3:]
    elif raw[:2] == b"\xff\xfe":
        enc, source, had_bom, body = "utf-16le", "bom", True, raw[2:]
    elif raw[:2] == b"\xfe\xff":
        enc, source, had_bom, body = "utf-16be", "bom", True, raw[2:]
    if enc is None and http_charset:
        lab = _normalize_label(http_charset)
        if lab:
            enc, source = lab, "header"
    if enc is None:
        m = _META_RE.search(raw[:1024])
        if m:
            lab = _normalize_label(m.group(1).decode("latin-1"))
            if lab:
                enc, source = lab, "meta"
    if enc is None:
        try:
            text = body.decode("utf-8")
            return {"detected_encoding": "utf-8",
                    "detection_source": "utf8-valid",
                    "text": text, "had_bom": False,
                    "replacement_count": 0,
                    "mojibake": bool(_MOJIBAKE_RE.search(text))}
        except UnicodeDecodeError:
            enc, source = "windows-1252", "fallback"
    codec = {"windows-1252": "cp1252", "utf-8": "utf-8",
             "utf-16le": "utf-16-le", "utf-16be": "utf-16-be"}[enc]
    text = body.decode(codec, errors="replace")
    return {
        "detected_encoding": enc,
        "detection_source": source,
        "text": text,
        "had_bom": had_bom,
        "replacement_count": text.count("�"),
        "mojibake": bool(_MOJIBAKE_RE.search(text)),
    }


TRANSCODE_SCHEMA_FIELDS = [
    T.StructField("detected_encoding", T.StringType()),
    T.StructField("detection_source", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("had_bom", T.BooleanType()),
    T.StructField("replacement_count", T.IntegerType()),
    T.StructField("mojibake", T.BooleanType()),
    T.StructField("n_bytes", T.LongType()),
]


def transcode_to_utf8(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "payload",
    charset_col: str | None = None,
) -> DataFrame:
    """Arrow-batched sniff + decode of a binary payload column:
    (id, payload[, transport charset]) -> detection + UTF-8 text +
    quality flags. Map-only — composes directly after the WARC
    response filter and before HTML extraction."""
    schema = T.StructType(
        [T.StructField(id_col, T.LongType())] + TRANSCODE_SCHEMA_FIELDS)

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            charsets = (pdf[charset_col] if charset_col is not None
                        else [None] * len(pdf))
            for i, blob, cs in zip(pdf[id_col], pdf[blob_col], charsets):
                raw = bytes(blob)
                r = sniff_and_decode(
                    raw, None if cs is None or pd.isna(cs) else str(cs))
                r[id_col] = int(i)
                r["n_bytes"] = len(raw)
                rows.append(r)
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema])

    return df.mapInPandas(kernel, schema=schema)


def synthesize_encoded_docs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic per-encoding payload fixtures (the GIF policy:
    real encoders, closed-form content). Per doc_id % 6:

    0 utf-8 + BOM | 1 utf-16le + BOM | 2 utf-16be + BOM |
    3 windows-1252, no declaration (invalid as UTF-8 -> fallback) |
    4 windows-1252 with a <meta charset> declaration |
    5 plain valid UTF-8 (no BOM, no declaration).

    Text is ``text + ' café'``; docs with id % 7 == 1 (except class
    3, where the corruption would flip UTF-8 validation) instead get
    the pre-mojibaked `` cafÃ©`` suffix the detector must flag."""
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blobs = [], []
            for i, txt in zip(pdf[id_col].astype("int64"),
                              pdf[text_col]):
                i = int(i)
                cls = i % 6
                suffix = (" cafÃ©"
                          if i % 7 == 1 and cls != 3 else " café")
                base = str(txt) + suffix
                if cls == 0:
                    raw = b"\xef\xbb\xbf" + base.encode("utf-8")
                elif cls == 1:
                    raw = b"\xff\xfe" + base.encode("utf-16-le")
                elif cls == 2:
                    raw = b"\xfe\xff" + base.encode("utf-16-be")
                elif cls == 3:
                    raw = base.encode("cp1252")
                elif cls == 4:
                    raw = ('<meta charset="windows-1252">' + base) \
                        .encode("cp1252")
                else:
                    raw = base.encode("utf-8")
                ids.append(i)
                blobs.append(raw)
            yield pd.DataFrame({id_col: ids, "payload": blobs})

    return df.select(id_col, text_col).mapInPandas(
        kernel, schema=out_schema)
