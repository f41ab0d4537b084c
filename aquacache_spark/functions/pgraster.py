"""PostGIS raster WKB codec (the `raster2pgsql` wire format).

The reference's writeRaster ships tiles to PostGIS by shelling out to
``raster2pgsql`` which emits hex-encoded raster WKB INSERTs
(R/writeRaster.R:342-361). This encodes the same serialization —
PostGIS raster RFC2 "Well Known Binary" — directly, so the engine's
tiled ``array<double>`` model exports tiles any PostGIS instance can
ingest with a plain INSERT, no GDAL binary required:

- little-endian, version 0 header: nBands, scaleX/Y, insertion point
  (upper-left), skew, SRID, width, height;
- one band, pixel type 64BF (11), ``hasNodata`` flag set, NULL cells
  written as the nodata value;
- ``isNodataValue`` flag set when every cell is nodata (the PostGIS
  fast-path hint, kept spec-faithful).

``decode_pgraster`` reads the same subset back for round-trip tests
and for re-ingesting previously exported tiles.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

_PT_64BF = 11
_FLAG_HAS_NODATA = 1 << 6
_FLAG_IS_NODATA = 1 << 5


def encode_pgraster(
    values,
    width: int,
    height: int,
    ip_x: float,
    ip_y: float,
    scale_x: float,
    scale_y: float,
    srid: int = 4326,
    nodata: float = -9999.0,
) -> bytes:
    """One 64BF band tile -> PostGIS raster WKB bytes. ``values``:
    row-major (from the upper-left corner) sequence of floats/None of
    length width*height; None becomes ``nodata``."""
    # None and NaN (what Arrow hands a null array element to pandas
    # as) both mean no-data
    arr = np.array([np.nan if v is None else v for v in values],
                   dtype="<f8")
    arr[np.isnan(arr)] = nodata
    if arr.size != width * height:
        raise ValueError(
            f"tile has {arr.size} cells, expected {width}x{height}")
    flags = _PT_64BF | _FLAG_HAS_NODATA
    if bool((arr == nodata).all()):
        flags |= _FLAG_IS_NODATA
    head = struct.pack(
        "<BHHddddddiHH", 1, 0, 1, scale_x, scale_y, ip_x, ip_y,
        0.0, 0.0, srid, width, height,
    )
    return head + struct.pack("<Bd", flags, nodata) + arr.tobytes()


def decode_pgraster(blob: bytes) -> dict:
    """Parse the subset written above (plus big-endian tolerance and
    any single-band float pixel type). Returns a dict with the grid
    metadata and a row-major list with None at nodata cells."""
    if not blob:
        raise ValueError("empty raster WKB")
    endian = "<" if blob[0] == 1 else ">"
    (version, nbands, sx, sy, ipx, ipy, kx, ky, srid, w, h) = \
        struct.unpack_from(f"{endian}HHddddddiHH", blob, 1)
    if version != 0:
        raise ValueError(f"unsupported raster WKB version {version}")
    if nbands != 1:
        raise ValueError(f"only single-band rasters supported ({nbands})")
    off = 1 + struct.calcsize("<HHddddddiHH")
    flags = blob[off]
    pixtype = flags & 0x0F
    if flags & 0x80:
        raise ValueError("out-of-db (offline) bands unsupported")
    dt = {10: "f4", 11: "f8"}.get(pixtype)
    if dt is None:
        raise ValueError(f"unsupported pixel type {pixtype}")
    size = int(dt[1])
    has_nodata = bool(flags & _FLAG_HAS_NODATA)
    (nodata,) = struct.unpack_from(
        f"{endian}{'d' if size == 8 else 'f'}", blob, off + 1)
    data_off = off + 1 + size
    arr = np.frombuffer(blob, dtype=f"{endian}{dt}", count=w * h,
                        offset=data_off)
    vals: list[Optional[float]] = arr.astype(float).tolist()
    if has_nodata:
        vals = [None if v == nodata else v for v in vals]
    return {
        "width": w, "height": h, "scale_x": sx, "scale_y": sy,
        "ip_x": ipx, "ip_y": ipy, "skew_x": kx, "skew_y": ky,
        "srid": srid, "nodata": nodata if has_nodata else None,
        "values": vals,
        "all_nodata": bool(flags & _FLAG_IS_NODATA),
    }
