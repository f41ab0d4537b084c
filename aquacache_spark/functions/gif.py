"""GIF89a codec: real LZW compression, pure stdlib.

Completes the image-codec family (BMP raw, PNG/deflate, JPEG/DCT)
with the dictionary-compression family: variable-width LZW codes
(9->12 bits for 256-color images), LSB-first bit packing, CLEAR/EOI
control codes, dictionary reset at 4096, 255-byte data sub-blocks,
global color table. Encoder and decoder are an internally consistent
pair; the decode path is differentially verified by synthesizing
pixels from a closed form, encoding through this writer, decoding,
and hash-matching the palette-mapped channel means against a DuckDB
oracle that never parses a byte (operators/multimodal +
queries.gif_decode_features), plus a hand-packed known-bytes test
pinning the LSB-first bit layout (tests/test_gif.py).

Same per-file policy as the other codecs: one blob is one task unit;
the Arrow kernel fans files out across partitions, the formats
themselves are not splittable.
"""

from __future__ import annotations

import struct

_MAX_CODE_WIDTH = 12
_DICT_LIMIT = 1 << _MAX_CODE_WIDTH  # 4096


class _BitWriter:
    """LSB-first bit packer (the GIF LZW layout)."""

    def __init__(self) -> None:
        self.buf = 0
        self.nbits = 0
        self.out = bytearray()

    def write(self, code: int, width: int) -> None:
        self.buf |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.buf & 0xFF)
            self.buf >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.buf & 0xFF)
            self.buf, self.nbits = 0, 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def read(self, width: int) -> int | None:
        while self.nbits < width:
            if self.pos >= len(self.data):
                return None
            self.buf |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        code = self.buf & ((1 << width) - 1)
        self.buf >>= width
        self.nbits -= width
        return code


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: emit CLEAR first, grow code width when the
    next assignable code would not fit, reset the dictionary at 4096,
    end with EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitWriter()

    def fresh():
        return {bytes([i]): i for i in range(clear)}, eoi + 1, \
            min_code_size + 1

    table, next_code, width = fresh()
    bw.write(clear, width)
    w = b""
    for k in indices:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        bw.write(table[w], width)
        if next_code < _DICT_LIMIT:
            table[wk] = next_code
            next_code += 1
            # the decoder learns this entry one code later, so it
            # bumps width when ITS next_code == 2^width; mirrored
            # here as next_code > 2^width (both fire exactly before
            # the first code that needs the wider field)
            if next_code > (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        else:
            # dictionary full: reset (the decoder stops adding at the
            # same point, so widths stay in lockstep until this CLEAR)
            bw.write(clear, width)
            table, next_code, width = fresh()
        w = bytes([k])
    if w:
        bw.write(table[w], width)
    bw.write(eoi, width)
    return bw.flush()


def lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    br = _BitReader(data)

    def fresh():
        return {i: bytes([i]) for i in range(clear)}, eoi + 1, \
            min_code_size + 1

    table, next_code, width = fresh()
    out = bytearray()
    prev: bytes | None = None
    while True:
        code = br.read(width)
        if code is None or code == eoi:
            return bytes(out)
        if code == clear:
            table, next_code, width = fresh()
            prev = None
            continue
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"bad LZW code {code}")
        out += entry
        if prev is not None and next_code < _DICT_LIMIT:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry


def _palette(n: int = 256) -> bytes:
    """The fixture's deterministic 256-color table: entry i ->
    ((i*3+13)%256, (i*5+29)%256, (i*7+43)%256)."""
    out = bytearray()
    for i in range(n):
        out += bytes(((i * 3 + 13) % 256, (i * 5 + 29) % 256,
                      (i * 7 + 43) % 256))
    return bytes(out)


def encode_gif(indices: bytes, width: int, height: int,
               palette: bytes | None = None) -> bytes:
    """A single-frame 256-color GIF89a from row-major palette
    indices."""
    if len(indices) != width * height:
        raise ValueError("index buffer does not match dimensions")
    pal = palette if palette is not None else _palette()
    if len(pal) != 256 * 3:
        raise ValueError("palette must hold 256 RGB entries")
    out = bytearray(b"GIF89a")
    # logical screen descriptor: GCT present, 8 bits/channel, 256 rows
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    out += pal
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    out.append(8)  # LZW min code size for 8-bit indices
    payload = lzw_encode(indices, 8)
    for off in range(0, len(payload), 255):
        block = payload[off:off + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3B"
    return bytes(out)


def decode_gif(blob: bytes):
    """-> (height x width x 3 uint8 numpy array). Single-frame,
    global-color-table GIFs (the encoder's output class); raises on
    anything else."""
    import numpy as np

    if blob[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF")
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", blob[6:13])
    if not packed & 0x80:
        raise ValueError("no global color table")
    gct_n = 2 << (packed & 0x07)
    pos = 13
    pal = np.frombuffer(blob[pos:pos + gct_n * 3], dtype=np.uint8) \
        .reshape(gct_n, 3)
    pos += gct_n * 3
    while blob[pos] != 0x2C:
        if blob[pos] == 0x21:  # extension: skip sub-blocks
            pos += 2
            while blob[pos] != 0:
                pos += 1 + blob[pos]
            pos += 1
        else:
            raise ValueError(f"unexpected block 0x{blob[pos]:02x}")
    ix, iy, iw, ih, ipacked = struct.unpack("<HHHHB", blob[pos + 1:pos + 10])
    if ipacked & 0xC0:
        raise ValueError("local color tables / interlace unsupported")
    pos += 10
    min_code = blob[pos]
    pos += 1
    payload = bytearray()
    while blob[pos] != 0:
        n = blob[pos]
        payload += blob[pos + 1:pos + 1 + n]
        pos += 1 + n
    idx = np.frombuffer(lzw_decode(bytes(payload), min_code),
                        dtype=np.uint8)
    if idx.size != iw * ih:
        raise ValueError("decoded index count mismatch")
    return pal[idx.reshape(ih, iw)]
