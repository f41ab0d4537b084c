"""GIF/LZW codec: known-bytes bit-layout pin, round-trip torture
(incl. the 4096 dictionary reset and the KwKwK case), and decode
guards."""

import random

import pytest

from aquacache_spark.functions.gif import (
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)


def test_known_bit_packing():
    # min_code_size=2, indices [1,1]: codes CLEAR(4),1,1,EOI(5) at
    # 3 bits, LSB-first: 4 | 1<<3 | 1<<6 | 5<<9 = 0x0A4C
    assert lzw_encode(bytes([1, 1]), 2).hex() == "4c0a"
    assert lzw_decode(bytes.fromhex("4c0a"), 2) == bytes([1, 1])


def test_lzw_round_trips():
    rng = random.Random(11)
    cases = [
        bytes([7] * 10_000),                       # one giant run
        bytes([i % 2 for i in range(5_000)]),      # alternation
        bytes(rng.randrange(256) for _ in range(60_000)),  # 4096 reset
        bytes([(i * i) % 256 for i in range(30_000)]),
        b"", bytes([0]), bytes(range(256)) * 40,
        bytes([3, 3, 3]),                          # KwKwK shape
    ]
    for i, c in enumerate(cases):
        assert lzw_decode(lzw_encode(c, 8), 8) == c, f"case {i}"


def test_gif_round_trip_pixels():
    import numpy as np

    from aquacache_spark.functions.gif import _palette

    idx = bytes((i * 7 + (i // 16) * 16) % 256 for i in range(256))
    px = decode_gif(encode_gif(idx, 16, 16))
    pal = np.frombuffer(_palette(), dtype=np.uint8).reshape(256, 3)
    want = pal[np.frombuffer(idx, dtype=np.uint8).reshape(16, 16)]
    assert (px == want).all()


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + b"\x00" * 40)
    with pytest.raises(Exception):
        decode_gif(encode_gif(bytes(16), 4, 4)[:20])
