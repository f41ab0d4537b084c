"""MJPEG-in-AVI container codec (stdlib struct).

Completes the multimodal triad: with JPEG (functions/jpeg.py) for
stills and WAV for audio, this parses the simplest real VIDEO wrapper
— an AVI (RIFF) file whose video stream is motion-JPEG, each frame an
ordinary baseline JPEG. That is a genuine format (what many older
cameras and scientific instruments emit) and exercises real container
plumbing: RIFF list traversal, avih/strh headers, movi chunk walk.

Scope:
- 'RIFF'/'AVI ' with LIST hdrl (avih + one strl with strh/strf) and
  LIST movi; frames in '00dc'/'00db' chunks (word-aligned);
- ``decode_avi`` returns the header metadata and raw frame payloads
  (decode each with jpeg.decode_jpeg — frame SAMPLING can then skip
  payloads entirely, the cheap path for sampled feature extraction);
- ``encode_avi`` writes the same subset for fixtures/round trips.

Anything else (multiple streams, idx1 required, other codecs) is out
of scope and raises — corrupt inputs quarantine at the feature layer.
"""

from __future__ import annotations

import struct
from typing import List


def encode_avi(frames: List[bytes], width: int, height: int,
               fps: int = 10) -> bytes:
    """JPEG frame payloads -> minimal MJPG AVI bytes."""
    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    usec = 1_000_000 // fps
    avih = struct.pack("<14I", usec, 0, 0, 0x10, len(frames), 0, 1, 0,
                       width, height, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0,
                                            1, fps, 0, len(frames), 0,
                                            0xFFFFFFFF, 0, 0))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24,
                       b"MJPG", width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(blob: bytes) -> dict:
    """Parse the subset above -> {width, height, fps, n_frames,
    frames: [jpeg bytes, ...]}."""
    if blob is None or len(blob) < 12 or blob[:4] != b"RIFF" \
            or blob[8:12] != b"AVI ":
        raise ValueError("not an AVI (bad RIFF/AVI header)")
    meta = {"width": None, "height": None, "fps": None, "codec": None}
    frames: List[bytes] = []

    def walk(data: bytes) -> None:
        pos = 0
        while pos + 8 <= len(data):
            cid = data[pos:pos + 4]
            (clen,) = struct.unpack_from("<I", data, pos + 4)
            body = data[pos + 8:pos + 8 + clen]
            if len(body) != clen:
                raise ValueError("truncated AVI chunk")
            if cid == b"LIST":
                walk(body[4:])
            elif cid == b"avih":
                usec, = struct.unpack_from("<I", body, 0)
                meta["fps"] = round(1_000_000 / usec) if usec else None
                meta["width"], meta["height"] = struct.unpack_from(
                    "<II", body, 32)
            elif cid == b"strh":
                if body[:4] == b"vids":
                    meta["codec"] = body[4:8].decode("latin-1")
            elif cid[2:] in (b"dc", b"db"):
                frames.append(bytes(body))
            pos += 8 + clen + (clen & 1)

    walk(blob[12:])
    if meta["codec"] is None or meta["width"] is None:
        raise ValueError("AVI missing stream/main header")
    if meta["codec"] != "MJPG":
        raise ValueError(f"unsupported AVI codec {meta['codec']!r} "
                         "(MJPG only)")
    return {**meta, "n_frames": len(frames), "frames": frames}
