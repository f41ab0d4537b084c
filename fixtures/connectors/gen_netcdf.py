"""Generate a canned ERA5-style NetCDF-3 payload + decoded CSV twin.

Encodes a spec-faithful classic (CDF-1) file the way CDS serves ERA5:
``tp`` as packed shorts with scale_factor/add_offset and _FillValue,
coordinate vars, and TIME AS THE UNLIMITED (record) DIMENSION so the
reader's per-record slab path is exercised.

Run from the repo root: python fixtures/connectors/gen_netcdf.py
"""

import csv
import os
import struct

HERE = os.path.dirname(os.path.abspath(__file__))

NLAT, NLON, NTIME = 5, 6, 4
LAT0, DLAT = 61.0, -0.25
LON0, DLON = 224.0, 0.25
SCALE, OFFSET, FILL = 1e-4, 0.5, -32767
BASE_HOUR = 473472  # hours since 1900-01-01 for 2024-01-10 00:00


def pad4(b: bytes) -> bytes:
    return b + b"\x00" * ((4 - len(b) % 4) % 4)


def ncname(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">i", len(b)) + pad4(b)


def attrs_block(items):
    """items: [(name, nc_type, [values])] -> attribute list bytes."""
    if not items:
        return struct.pack(">ii", 0, 0)
    out = [struct.pack(">ii", 0x0C, len(items))]
    fmt = {1: "b", 3: "h", 4: "i", 5: "f", 6: "d"}
    for name, t, vals in items:
        out.append(ncname(name))
        out.append(struct.pack(">ii", t, len(vals)))
        if t == 2:
            out.append(pad4("".join(vals).encode()))
        else:
            out.append(pad4(struct.pack(f">{len(vals)}{fmt[t]}", *vals)))
    return b"".join(out)


def tp_raw(t, j, i):
    if (i + j + t) % 13 == 0:
        return FILL
    return (i * 31 + j * 57 + t * 101) % 4001


def main():
    lats = [LAT0 + j * DLAT for j in range(NLAT)]
    lons = [LON0 + i * DLON for i in range(NLON)]

    # --- variable metadata (vsize = padded per-record/full size)
    lat_size = NLAT * 4
    lon_size = NLON * 4
    time_rec = 4
    tp_rec = NLAT * NLON * 2

    def var_block(name, dimids, attrs, nc_type, vsize, begin):
        return (ncname(name) + struct.pack(">i", len(dimids))
                + b"".join(struct.pack(">i", d) for d in dimids)
                + attrs_block(attrs)
                + struct.pack(">iii", nc_type, vsize, begin))

    def header(begins):
        h = b"CDF\x01" + struct.pack(">i", NTIME)
        h += struct.pack(">ii", 0x0A, 3)
        h += ncname("time") + struct.pack(">i", 0)
        h += ncname("latitude") + struct.pack(">i", NLAT)
        h += ncname("longitude") + struct.pack(">i", NLON)
        h += attrs_block([("Conventions", 2, list("CF-1.6"))])
        h += struct.pack(">ii", 0x0B, 4)
        h += var_block("latitude", [1], [("units", 2, list("degrees_north"))],
                       5, pad_len(lat_size), begins["latitude"])
        h += var_block("longitude", [2], [("units", 2, list("degrees_east"))],
                       5, pad_len(lon_size), begins["longitude"])
        h += var_block(
            "time", [0],
            [("units", 2, list("hours since 1900-01-01 00:00:00.0"))],
            4, pad_len(time_rec), begins["time"])
        h += var_block(
            "tp", [0, 1, 2],
            [("scale_factor", 6, [SCALE]), ("add_offset", 6, [OFFSET]),
             ("_FillValue", 3, [FILL]), ("units", 2, list("m"))],
            3, pad_len(tp_rec), begins["tp"])
        return h

    def pad_len(n):
        return (n + 3) // 4 * 4

    zero = {"latitude": 0, "longitude": 0, "time": 0, "tp": 0}
    hlen = len(header(zero))
    begins = {"latitude": hlen, "longitude": hlen + pad_len(lat_size)}
    rec0 = begins["longitude"] + pad_len(lon_size)
    begins["time"] = rec0
    begins["tp"] = rec0 + pad_len(time_rec)
    assert len(header(begins)) == hlen

    data = [header(begins)]
    data.append(pad4(struct.pack(f">{NLAT}f", *lats)))
    data.append(pad4(struct.pack(f">{NLON}f", *lons)))
    for t in range(NTIME):
        data.append(pad4(struct.pack(">i", BASE_HOUR + t)))
        raw = [tp_raw(t, j, i) for j in range(NLAT) for i in range(NLON)]
        data.append(pad4(struct.pack(f">{len(raw)}h", *raw)))

    path = os.path.join(HERE, "era5_tp.nc")
    with open(path, "wb") as fh:
        fh.write(b"".join(data))
    print("era5_tp.nc", os.path.getsize(path), "bytes")

    rows = []
    for t in range(NTIME):
        for j in range(NLAT):
            for i in range(NLON):
                raw = tp_raw(t, j, i)
                rows.append([
                    BASE_HOUR + t, i, j, lons[i], lats[j],
                    "" if raw == FILL else raw * SCALE + OFFSET,
                ])
    with open(os.path.join(HERE, "era5_cells.csv"), "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["hour", "x", "y", "lon", "lat", "tp"])
        w.writerows(rows)
    print("era5_cells.csv", len(rows), "rows")


if __name__ == "__main__":
    main()
