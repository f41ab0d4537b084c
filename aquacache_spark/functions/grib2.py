"""Minimal pure-stdlib GRIB2 decoder (WMO FM 92 GRIB Edition 2).

The reference's gridded connectors hand GRIB urls to ``terra::rast``
(R/downloadHRDPA.R:155-181); this engine decodes the payload itself —
the raster-ingest sibling of the BMP codec in operators/multimodal.py,
so no GDAL binary is required for the supported product shape:

- Section 3 grid template 3.0 (regular latitude/longitude grid),
- Section 5 data representation template 5.0 (simple packing),
- Section 6 bitmap (indicator 0 = present, 255 = none),
- Section 7 packed data, MSB-first bit stream.

Decoded value = (R + M * 2**E) / 10**D with R the IEEE-754 float32
reference, M the ``nbits``-wide unsigned integer, E/D the binary and
decimal scale factors (GRIB sign-and-magnitude int16). Cells masked
out by the bitmap decode as None (terra's NA).

Scalar codec only — the distributed path batches it through
``mapInPandas`` (sources/gridded.py:grib_cells), one file per task of
a binaryFile scan, which is exactly how a 30-day fleet of HRDPA files
fans out on a cluster.
"""

from __future__ import annotations

import struct
from typing import List, Optional


def _su16(b: bytes, off: int) -> int:
    """GRIB2 signed 16-bit: sign-and-magnitude, NOT two's complement."""
    raw = struct.unpack_from(">H", b, off)[0]
    if raw & 0x8000:
        return -(raw & 0x7FFF)
    return raw


def _si32(b: bytes, off: int) -> int:
    raw = struct.unpack_from(">I", b, off)[0]
    if raw & 0x80000000:
        return -(raw & 0x7FFFFFFF)
    return raw


class Grib2Message:
    __slots__ = ("discipline", "ref_time", "param_category", "param_number",
                 "forecast_hours", "ni", "nj", "lat0", "lon0", "dlat",
                 "dlon", "scan_mode", "values")

    def __init__(self):
        self.values: List[Optional[float]] = []

    def lat(self, j: int) -> float:
        """Latitude of row j under the decoded scanning mode (+j =
        south->north when bit 2 of scan_mode is set, else north->south)."""
        sign = 1.0 if self.scan_mode & 0x40 else -1.0
        return self.lat0 + sign * j * self.dlat

    def lon(self, i: int) -> float:
        return self.lon0 + i * self.dlon


def decode_grib2(data: bytes) -> List[Grib2Message]:
    """Decode every GRIB2 message in ``data``."""
    out: List[Grib2Message] = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos:pos + 4] != b"GRIB":
            raise ValueError(f"bad GRIB indicator at offset {pos}")
        edition = data[pos + 7]
        if edition != 2:
            raise ValueError(f"unsupported GRIB edition {edition}")
        total_len = struct.unpack_from(">Q", data, pos + 8)[0]
        out.append(_decode_message(data[pos:pos + total_len]))
        pos += total_len
    return out


def _decode_message(msg: bytes) -> Grib2Message:
    m = Grib2Message()
    m.discipline = msg[6]
    pos = 16
    bitmap: Optional[bytes] = None
    npoints = 0
    ref = e = d = nbits = None
    while msg[pos:pos + 4] != b"7777":
        sec_len = struct.unpack_from(">I", msg, pos)[0]
        sec_num = msg[pos + 4]
        s = msg[pos:pos + sec_len]
        if sec_num == 1:
            year = struct.unpack_from(">H", s, 12)[0]
            m.ref_time = (year, s[14], s[15], s[16], s[17], s[18])
        elif sec_num == 3:
            template = struct.unpack_from(">H", s, 12)[0]
            if template != 0:
                raise ValueError(
                    f"unsupported grid definition template {template} "
                    "(only 3.0 regular lat/lon)"
                )
            # template 3.0 octet offsets (1-based per spec; -1 here)
            m.ni = struct.unpack_from(">I", s, 30)[0]
            m.nj = struct.unpack_from(">I", s, 34)[0]
            m.lat0 = _si32(s, 46) / 1e6
            m.lon0 = _si32(s, 50) / 1e6
            m.dlon = struct.unpack_from(">I", s, 63)[0] / 1e6
            m.dlat = struct.unpack_from(">I", s, 67)[0] / 1e6
            m.scan_mode = s[71]
        elif sec_num == 4:
            template = struct.unpack_from(">H", s, 7)[0]
            if template not in (0, 8):
                raise ValueError(
                    f"unsupported product definition template {template}"
                )
            m.param_category = s[9]
            m.param_number = s[10]
            m.forecast_hours = struct.unpack_from(">I", s, 18)[0]
        elif sec_num == 5:
            npoints = struct.unpack_from(">I", s, 5)[0]
            template = struct.unpack_from(">H", s, 9)[0]
            if template != 0:
                raise ValueError(
                    f"unsupported data representation template {template} "
                    "(only 5.0 simple packing)"
                )
            ref = struct.unpack_from(">f", s, 11)[0]
            e = _su16(s, 15)
            d = _su16(s, 17)
            nbits = s[19]
        elif sec_num == 6:
            indicator = s[5]
            if indicator == 0:
                bitmap = s[6:]
            elif indicator != 255:
                raise ValueError(
                    f"unsupported bitmap indicator {indicator}"
                )
        elif sec_num == 7:
            if ref is None:
                raise ValueError("data section before representation section")
            m.values = _unpack_simple(
                s[5:], npoints, ref, e, d, nbits, bitmap
            )
        pos += sec_len
    return m


def _unpack_simple(
    packed: bytes,
    npoints: int,
    ref: float,
    e: int,
    d: int,
    nbits: int,
    bitmap: Optional[bytes],
) -> List[Optional[float]]:
    scale_e = 2.0 ** e
    scale_d = 10.0 ** d
    if nbits == 0:
        # constant field: every present point equals R / 10^D
        const = ref / scale_d
        vals_present = None
    else:
        vals_present = []
        acc = 0
        acc_bits = 0
        byte_i = 0
        need = npoints if bitmap is None else None
        total_present = (
            npoints if bitmap is None
            else sum(bin(b).count("1") for b in bitmap[: (npoints + 7) // 8])
        )
        while len(vals_present) < total_present:
            while acc_bits < nbits:
                acc = (acc << 8) | packed[byte_i]
                byte_i += 1
                acc_bits += 8
            acc_bits -= nbits
            mval = (acc >> acc_bits) & ((1 << nbits) - 1)
            vals_present.append((ref + mval * scale_e) / scale_d)
        del need
    if bitmap is None:
        if nbits == 0:
            return [const] * npoints
        return vals_present
    out: List[Optional[float]] = []
    it = iter(vals_present) if vals_present is not None else None
    for idx in range(npoints):
        present = (bitmap[idx // 8] >> (7 - idx % 8)) & 1
        if not present:
            out.append(None)
        elif it is None:
            out.append(const)
        else:
            out.append(next(it))
    return out
