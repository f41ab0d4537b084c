"""Generate a canned ERA5-style NetCDF-4 (HDF5) payload + CSV twin.

Encodes a spec-faithful HDF5 file the way the netCDF-C library lays
out a CDS ERA5 download in its default (HDF5 1.8) mode: superblock
version 0, old-style symbol-table root group, version-1 object
headers, float32/int32 coordinate variables stored contiguously, and
``tp`` as packed int16, CHUNKED with the netCDF default shuffle +
deflate filter pipeline, carrying scale_factor / add_offset /
_FillValue / units attributes. Chunk dims (2,3,4) do not divide the
(4,5,6) data dims, so partial edge chunks are live.

The writer is independent of the reader (aquacache_spark/functions/
hdf5.py) — byte layout is assembled from the public HDF5 format spec
here, and the CSV twin carries the expected decoded cells for the
DuckDB oracle.

Run from the repo root: python fixtures/connectors/gen_netcdf4.py
"""

import csv
import os
import struct
import zlib

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

NLAT, NLON, NTIME = 5, 6, 4
CHUNK = (2, 3, 4)
LAT0, DLAT = 61.0, -0.25
LON0, DLON = 224.0, 0.25
SCALE, OFFSET, FILL = 2e-4, 0.25, -32767
BASE_HOUR = 473472  # hours since 1900-01-01 for 2024-01-10 00:00

UNDEF = 0xFFFFFFFFFFFFFFFF


def pad8(b: bytes) -> bytes:
    return b + b"\x00" * ((8 - len(b) % 8) % 8)


def tp_raw(t, j, i):
    if (i + j + t) % 11 == 0:
        return FILL
    return (i * 37 + j * 53 + t * 97) % 4001


# --- HDF5 piece builders ---------------------------------------------------

def dt_float(size):
    exp = (23, 8, 127) if size == 4 else (52, 11, 1023)
    sign = size * 8 - 1
    return struct.pack("<B3BI", 0x11, 0x20, sign, 0, size) + struct.pack(
        "<HHBBBBI", 0, size * 8, exp[0], exp[1], 0, exp[0], exp[2])


def dt_int(size):
    return struct.pack("<B3BI", 0x10, 0x08, 0, 0, size) + struct.pack(
        "<HH", 0, size * 8)


def dt_string(n):
    return struct.pack("<B3BI", 0x13, 0, 0, 0, n)


def dataspace(dims):
    return struct.pack("<BBB5x", 1, len(dims), 0) + b"".join(
        struct.pack("<Q", d) for d in dims)


def scalar_space():
    return struct.pack("<BBB5x", 1, 0, 0)


def attr(name, dt_bytes, ds_bytes, payload):
    nb = name.encode() + b"\x00"
    return (struct.pack("<BxHHH", 1, len(nb), len(dt_bytes), len(ds_bytes))
            + pad8(nb) + pad8(dt_bytes) + pad8(ds_bytes) + payload)


def num_attr(name, fmt, dt_bytes, value):
    return attr(name, dt_bytes, scalar_space(), struct.pack(fmt, value))


def str_attr(name, s):
    b = s.encode()
    return attr(name, dt_string(len(b)), scalar_space(), b)


def message(mtype, body):
    body = pad8(body)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def ohdr(messages):
    msgs = b"".join(message(t, b) for t, b in messages)
    return (struct.pack("<BxHII", 1, len(messages), 1, len(msgs))
            + b"\x00" * 4 + msgs)


def layout_contiguous(addr, size):
    return struct.pack("<BBQQ", 3, 1, addr, size)


def layout_chunked(btree_addr, chunk_dims, elem_size):
    return (struct.pack("<BBB", 3, 2, len(chunk_dims) + 1)
            + struct.pack("<Q", btree_addr)
            + b"".join(struct.pack("<I", c) for c in chunk_dims)
            + struct.pack("<I", elem_size))


def filter_pipeline():
    # write order: shuffle then deflate (the netCDF-4 default)
    def fdesc(fid, name, ncv, cvals):
        nb = pad8(name.encode() + b"\x00")
        body = struct.pack("<HHHH", fid, len(nb), 1, ncv) + nb
        body += b"".join(struct.pack("<I", v) for v in cvals)
        if ncv % 2:
            body += b"\x00" * 4
        return body

    return (struct.pack("<BB6x", 1, 2)
            + fdesc(2, "shuffle", 1, [2])
            + fdesc(1, "deflate", 1, [4]))


def shuffle(raw: bytes, esize: int) -> bytes:
    a = np.frombuffer(raw, dtype=np.uint8)
    return a.reshape(-1, esize).T.tobytes()


def main():
    lats = [LAT0 + j * DLAT for j in range(NLAT)]
    lons = [LON0 + i * DLON for i in range(NLON)]
    hours = [BASE_HOUR + t for t in range(NTIME)]
    tp = np.array(
        [[[tp_raw(t, j, i) for i in range(NLON)] for j in range(NLAT)]
         for t in range(NTIME)], dtype="<i2")

    out = bytearray(96)  # superblock placeholder

    def put(b: bytes) -> int:
        addr = len(out)
        out.extend(b)
        return addr

    # --- raw data: contiguous coords
    lat_addr = put(np.array(lats, dtype="<f4").tobytes())
    lon_addr = put(np.array(lons, dtype="<f4").tobytes())
    time_addr = put(np.array(hours, dtype="<i4").tobytes())

    # --- tp chunks: shuffle + deflate, fill-padded edge chunks
    chunks = []  # (offsets, nbytes, addr)
    for t0 in range(0, NTIME, CHUNK[0]):
        for j0 in range(0, NLAT, CHUNK[1]):
            for i0 in range(0, NLON, CHUNK[2]):
                block = np.full(CHUNK, FILL, dtype="<i2")
                sl = tp[t0:t0 + CHUNK[0], j0:j0 + CHUNK[1],
                        i0:i0 + CHUNK[2]]
                block[:sl.shape[0], :sl.shape[1], :sl.shape[2]] = sl
                comp = zlib.compress(shuffle(block.tobytes(), 2), 4)
                chunks.append(((t0, j0, i0), len(comp), put(comp)))

    # --- chunk B-tree (v1, node type 1, single leaf)
    def chunk_key(nbytes, offs):
        return (struct.pack("<II", nbytes, 0)
                + b"".join(struct.pack("<Q", o) for o in offs)
                + struct.pack("<Q", 0))

    bt = [b"TREE", struct.pack("<BBH", 1, 0, len(chunks)),
          struct.pack("<QQ", UNDEF, UNDEF)]
    for offs, nbytes, addr in chunks:
        bt.append(chunk_key(nbytes, offs))
        bt.append(struct.pack("<Q", addr))
    bt.append(chunk_key(0, (NTIME + CHUNK[0], 0, 0)))
    btree_addr = put(b"".join(bt))

    # --- object headers
    def coord_ohdr(dims, dtype_b, addr, size, attrs):
        return ohdr([(0x0001, dataspace(dims)), (0x0003, dtype_b),
                     (0x0008, layout_contiguous(addr, size))]
                    + [(0x000C, a) for a in attrs])

    f8 = dt_float(8)
    var_ohdrs = {
        "latitude": coord_ohdr([NLAT], dt_float(4), lat_addr, NLAT * 4,
                               [str_attr("units", "degrees_north")]),
        "longitude": coord_ohdr([NLON], dt_float(4), lon_addr, NLON * 4,
                                [str_attr("units", "degrees_east")]),
        "time": coord_ohdr(
            [NTIME], dt_int(4), time_addr, NTIME * 4,
            [str_attr("units", "hours since 1900-01-01 00:00:00.0")]),
        "tp": ohdr([
            (0x0001, dataspace([NTIME, NLAT, NLON])),
            (0x0003, dt_int(2)),
            (0x000B, filter_pipeline()),
            (0x0008, layout_chunked(btree_addr, list(CHUNK), 2)),
            (0x000C, num_attr("scale_factor", "<d", f8, SCALE)),
            (0x000C, num_attr("add_offset", "<d", f8, OFFSET)),
            (0x000C, num_attr("_FillValue", "<h", dt_int(2), FILL)),
            (0x000C, str_attr("units", "m")),
        ]),
    }
    ohdr_addrs = {name: put(b) for name, b in var_ohdrs.items()}

    # --- root group: local heap (names), SNOD, group B-tree
    names = sorted(ohdr_addrs)  # symbol table is name-ordered
    heap_data = bytearray(b"\x00" * 8)  # offset 0: root's empty name
    name_offs = {}
    for n in names:
        name_offs[n] = len(heap_data)
        heap_data.extend(pad8(n.encode() + b"\x00"))
    heap_seg_addr = put(bytes(heap_data))
    heap_addr = put(b"HEAP" + struct.pack("<B3x", 0)
                    + struct.pack("<QQQ", len(heap_data), UNDEF,
                                  heap_seg_addr))

    snod = [b"SNOD", struct.pack("<BBH", 1, 0, len(names))]
    for n in names:
        snod.append(struct.pack("<QQII16x", name_offs[n], ohdr_addrs[n],
                                0, 0))
    snod_b = b"".join(snod)
    snod_addr = put(snod_b + b"\x00" * (8 + 2 * 4 * 40 - len(snod_b)))

    gbt_addr = put(b"TREE" + struct.pack("<BBH", 0, 0, 1)
                   + struct.pack("<QQ", UNDEF, UNDEF)
                   + struct.pack("<QQQ", 0, snod_addr,
                                 name_offs[names[-1]]))

    root_ohdr = put(ohdr([(0x0011, struct.pack("<QQ", gbt_addr,
                                               heap_addr))]))

    # --- superblock
    sb = (b"\x89HDF\r\n\x1a\n"
          + bytes([0, 0, 0, 0, 0, 8, 8, 0])
          + struct.pack("<HHI", 4, 16, 0)
          + struct.pack("<QQQQ", 0, UNDEF, len(out), UNDEF)
          + struct.pack("<QQII", 0, root_ohdr, 1, 0)
          + struct.pack("<QQ", gbt_addr, heap_addr))
    assert len(sb) == 96, len(sb)
    out[:96] = sb

    path = os.path.join(HERE, "era5_tp_nc4.nc")
    with open(path, "wb") as fh:
        fh.write(bytes(out))
    print("era5_tp_nc4.nc", len(out), "bytes,", len(chunks), "chunks")

    rows = []
    for t in range(NTIME):
        for j in range(NLAT):
            for i in range(NLON):
                raw = tp_raw(t, j, i)
                rows.append([
                    BASE_HOUR + t, i, j, lons[i], lats[j],
                    "" if raw == FILL else raw * SCALE + OFFSET,
                ])
    with open(os.path.join(HERE, "era5_nc4_cells.csv"), "w",
              newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["hour", "x", "y", "lon", "lat", "tp"])
        w.writerows(rows)
    print("era5_nc4_cells.csv", len(rows), "rows")


if __name__ == "__main__":
    main()
