"""Minimal pure-stdlib+numpy HDF5 reader for the netCDF-4 classic model.

The reference's ERA5 connector (R/downloadERA5.R:149-200) accepts
whatever the CDS API serves; alongside the NetCDF-3 classic reader
(functions/netcdf3.py) this covers the NetCDF-4 case — an HDF5
container written by the netCDF-C library in its default (HDF5 1.8,
"earliest" libver) layout:

- superblock version 0/1, 8-byte offsets and lengths;
- old-style groups: symbol-table message -> v1 B-tree (node type 0)
  -> SNOD symbol nodes -> local heap for link names;
- version-1 object headers, with continuation blocks;
- dataspace v1/v2, datatype classes 0 (fixed-point), 1 (float) and
  3 (string);
- data layout message v3, contiguous and chunked classes;
- filter pipeline v1/v2 with shuffle (id 2) and deflate (id 1) —
  exactly the netCDF-4 default compression stack;
- attribute messages v1 (padded) and v3 (the CDS conventions:
  ``scale_factor``/``add_offset``/``_FillValue``/``units``).

Anything outside this subset (superblock v2/3 link-message groups,
fractal heaps, datatype conversions, szip...) raises ``ValueError``
loudly rather than mis-decoding.

Scalar codec only — the distributed path batches whole files through
``mapInPandas`` (sources/gridded.netcdf_cells), one file per task of a
binaryFile scan; chunk inflation is zlib + a vectorized numpy
unshuffle, so a full CDS month decodes in milliseconds per file.
"""

from __future__ import annotations

import struct
import zlib
from typing import Any, Dict, List, Optional

import numpy as np

_SIG = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF


def _u16(d: bytes, o: int) -> int:
    return struct.unpack_from("<H", d, o)[0]


def _u32(d: bytes, o: int) -> int:
    return struct.unpack_from("<I", d, o)[0]


def _u64(d: bytes, o: int) -> int:
    return struct.unpack_from("<Q", d, o)[0]


def _pad8(n: int) -> int:
    return (n + 7) // 8 * 8


class _Datatype:
    """Parsed datatype message: numpy dtype for classes 0/1, byte
    length for class 3 strings."""

    __slots__ = ("cls", "size", "dtype")

    def __init__(self, body: bytes):
        self.cls = body[0] & 0x0F
        version = body[0] >> 4
        if version not in (1, 2, 3):
            raise ValueError(f"unsupported datatype version {version}")
        bits = body[1:4]
        self.size = _u32(body, 4)
        order = ">" if bits[0] & 1 else "<"
        if self.cls == 0:  # fixed-point
            signed = bool(bits[0] & 0x08)
            kind = "i" if signed else "u"
            self.dtype = np.dtype(f"{order}{kind}{self.size}")
        elif self.cls == 1:  # IEEE float
            self.dtype = np.dtype(f"{order}f{self.size}")
        elif self.cls == 3:  # string
            self.dtype = None
        else:
            raise ValueError(f"unsupported datatype class {self.cls}")


def _parse_dataspace(body: bytes) -> List[int]:
    version = body[0]
    if version == 1:
        ndims, flags = body[1], body[2]
        off = 8
    elif version == 2:
        ndims, flags = body[1], body[2]
        off = 4
    else:
        raise ValueError(f"unsupported dataspace version {version}")
    return [_u64(body, off + 8 * i) for i in range(ndims)]


def _parse_attr_payload(dt: _Datatype, dims: List[int], data: bytes) -> Any:
    n = 1
    for s in dims:
        n *= s
    if dt.cls == 3:
        return data[:dt.size * n].split(b"\x00")[0].decode("utf-8")
    vals = np.frombuffer(data[:dt.size * n], dtype=dt.dtype)
    if n == 1:
        return vals[0].item()
    return vals.tolist()


def _parse_attribute(body: bytes) -> tuple:
    version = body[0]
    if version == 1:
        name_size = _u16(body, 2)
        dt_size = _u16(body, 4)
        ds_size = _u16(body, 6)
        off = 8
        name = body[off:off + name_size].split(b"\x00")[0].decode("utf-8")
        off += _pad8(name_size)
        dt = _Datatype(body[off:off + dt_size])
        off += _pad8(dt_size)
        dims = _parse_dataspace(body[off:off + ds_size])
        off += _pad8(ds_size)
    elif version == 3:
        name_size = _u16(body, 2)
        dt_size = _u16(body, 4)
        ds_size = _u16(body, 6)
        off = 9  # +1 charset byte
        name = body[off:off + name_size].split(b"\x00")[0].decode("utf-8")
        off += name_size
        dt = _Datatype(body[off:off + dt_size])
        off += dt_size
        dims = _parse_dataspace(body[off:off + ds_size])
        off += ds_size
    else:
        raise ValueError(f"unsupported attribute message version {version}")
    return name, _parse_attr_payload(dt, dims, body[off:])


class _Dataset:
    __slots__ = ("name", "shape", "dtype", "attrs", "layout_class",
                 "data_addr", "data_size", "chunk_dims", "btree_addr",
                 "filters")

    def __init__(self, name: str):
        self.name = name
        self.shape: List[int] = []
        self.attrs: Dict[str, Any] = {}
        self.filters: List[tuple] = []
        self.layout_class = None
        self.chunk_dims: List[int] = []


class HDF5File:
    """Read-only view over the netCDF-4 subset described above."""

    def __init__(self, data: bytes):
        if data[:8] != _SIG:
            raise ValueError("not an HDF5 file")
        version = data[8]
        if version not in (0, 1):
            raise ValueError(
                f"unsupported HDF5 superblock version {version} "
                "(only 0/1: netCDF-4 default layout)"
            )
        if data[13] != 8 or data[14] != 8:
            raise ValueError("unsupported offset/length size (need 8)")
        self._d = data
        # root group symbol table entry: v0 superblock fixed part is 24
        # bytes + 4 addresses (base/freespace/eof/driver) = 56
        root_entry = 56 if version == 0 else 56 + 4
        ohdr_addr = _u64(data, root_entry + 8)
        self.datasets: Dict[str, _Dataset] = {}
        self._walk_group(ohdr_addr)

    # -- object headers -------------------------------------------------
    def _messages(self, addr: int) -> List[tuple]:
        """All (type, body) messages of a v1 object header, following
        continuation blocks."""
        d = self._d
        if d[addr] != 1:
            raise ValueError(
                f"unsupported object header version {d[addr]} at {addr}"
            )
        nmsgs = _u16(d, addr + 2)
        hdr_size = _u32(d, addr + 8)
        blocks = [(addr + 16, hdr_size)]
        out: List[tuple] = []
        while blocks and len(out) < nmsgs:
            pos, remaining = blocks.pop(0)
            while remaining >= 8 and len(out) < nmsgs:
                mtype = _u16(d, pos)
                msize = _u16(d, pos + 2)
                body = d[pos + 8:pos + 8 + msize]
                pos += 8 + msize
                remaining -= 8 + msize
                if mtype == 0x0010:  # continuation
                    blocks.append((_u64(body, 0), _u64(body, 8)))
                else:
                    out.append((mtype, body))
        return out

    # -- groups ----------------------------------------------------------
    def _walk_group(self, ohdr_addr: int) -> None:
        msgs = self._messages(ohdr_addr)
        stab = next((b for t, b in msgs if t == 0x0011), None)
        if stab is None:
            raise ValueError(
                "group without symbol-table message (new-style groups "
                "unsupported)"
            )
        btree_addr = _u64(stab, 0)
        heap_addr = _u64(stab, 8)
        heap_data = self._heap_data(heap_addr)
        for name_off, child_ohdr in self._group_entries(btree_addr):
            name = heap_data[name_off:].split(b"\x00")[0].decode("utf-8")
            child_msgs = self._messages(child_ohdr)
            if any(t == 0x0011 for t, _ in child_msgs):
                self._walk_group(child_ohdr)  # flat namespace, CDS-style
            else:
                self.datasets[name] = self._dataset(name, child_msgs)

    def _heap_data(self, heap_addr: int) -> bytes:
        d = self._d
        if d[heap_addr:heap_addr + 4] != b"HEAP":
            raise ValueError("bad local heap signature")
        seg_size = _u64(d, heap_addr + 8)
        seg_addr = _u64(d, heap_addr + 24)
        return d[seg_addr:seg_addr + seg_size]

    def _group_entries(self, btree_addr: int) -> List[tuple]:
        """(heap name offset, object header address) pairs from a v1
        group B-tree (node type 0) -> SNOD leaves."""
        d = self._d
        out: List[tuple] = []

        def walk_btree(addr: int) -> None:
            if d[addr:addr + 4] != b"TREE":
                raise ValueError("bad group B-tree signature")
            level = d[addr + 5]
            used = _u16(d, addr + 6)
            # keys/children: key0 child0 key1 ... (keys are 8-byte heap
            # offsets for group trees)
            pos = addr + 24 + 8  # skip left/right siblings + key0
            for _ in range(used):
                child = _u64(d, pos)
                pos += 16  # child + next key
                if level > 0:
                    walk_btree(child)
                else:
                    walk_snod(child)

        def walk_snod(addr: int) -> None:
            if d[addr:addr + 4] != b"SNOD":
                raise ValueError("bad symbol node signature")
            nsyms = _u16(d, addr + 6)
            pos = addr + 8
            for _ in range(nsyms):
                out.append((_u64(d, pos), _u64(d, pos + 8)))
                pos += 40

        walk_btree(btree_addr)
        return out

    # -- datasets --------------------------------------------------------
    def _dataset(self, name: str, msgs: List[tuple]) -> _Dataset:
        ds = _Dataset(name)
        for mtype, body in msgs:
            if mtype == 0x0001:
                ds.shape = _parse_dataspace(body)
            elif mtype == 0x0003:
                dt = _Datatype(body)
                if dt.cls == 3:
                    raise ValueError("string datasets unsupported")
                ds.dtype = dt.dtype
            elif mtype == 0x0008:
                if body[0] != 3:
                    raise ValueError(
                        f"unsupported data layout version {body[0]}"
                    )
                ds.layout_class = body[1]
                if ds.layout_class == 1:  # contiguous
                    ds.data_addr = _u64(body, 2)
                    ds.data_size = _u64(body, 10)
                elif ds.layout_class == 2:  # chunked
                    ndims_p1 = body[2]
                    ds.btree_addr = _u64(body, 3)
                    ds.chunk_dims = [
                        _u32(body, 11 + 4 * i) for i in range(ndims_p1 - 1)
                    ]
                else:
                    raise ValueError(
                        f"unsupported layout class {ds.layout_class}"
                    )
            elif mtype == 0x000B:
                version = body[0]
                nfilters = body[1]
                pos = 8 if version == 1 else 2
                for _ in range(nfilters):
                    fid = _u16(body, pos)
                    name_len = _u16(body, pos + 2)
                    ncv = _u16(body, pos + 6)
                    pos += 8
                    if version == 1 or fid >= 256:
                        pos += _pad8(name_len)
                    cvals = [_u32(body, pos + 4 * i) for i in range(ncv)]
                    pos += 4 * ncv
                    if version == 1 and ncv % 2:
                        pos += 4
                    ds.filters.append((fid, cvals))
            elif mtype == 0x000C:
                k, v = _parse_attribute(body)
                ds.attrs[k] = v
        if ds.dtype is None or ds.layout_class is None:
            raise ValueError(f"dataset {name} missing datatype/layout")
        return ds

    def _defilter(self, raw: bytes, ds: _Dataset) -> bytes:
        """Reverse the pipeline (applied in reverse declaration order)."""
        for fid, cvals in reversed(ds.filters):
            if fid == 1:  # deflate
                raw = zlib.decompress(raw)
            elif fid == 2:  # shuffle
                esize = cvals[0] if cvals else ds.dtype.itemsize
                arr = np.frombuffer(raw, dtype=np.uint8)
                n = arr.size // esize
                raw = arr[:n * esize].reshape(esize, n).T.tobytes()
            else:
                raise ValueError(f"unsupported HDF5 filter id {fid}")
        return raw

    def _chunk_entries(self, addr: int, ndims: int) -> List[tuple]:
        """(chunk byte size, offsets, data address) from a v1 chunk
        B-tree (node type 1)."""
        d = self._d
        key_size = 8 + 8 * (ndims + 1)
        out: List[tuple] = []

        def walk(addr: int) -> None:
            if d[addr:addr + 4] != b"TREE":
                raise ValueError("bad chunk B-tree signature")
            level = d[addr + 5]
            used = _u16(d, addr + 6)
            pos = addr + 24
            for _ in range(used):
                nbytes = _u32(d, pos)
                offsets = [_u64(d, pos + 8 + 8 * i) for i in range(ndims)]
                child = _u64(d, pos + key_size)
                if level > 0:
                    walk(child)
                else:
                    out.append((nbytes, offsets, child))
                pos += key_size + 8

        walk(addr)
        return out

    def read_array(self, name: str) -> np.ndarray:
        """Row-major ndarray of the dataset's raw (packed) values."""
        ds = self.datasets[name]
        shape = tuple(ds.shape)
        if ds.layout_class == 1:
            if ds.data_addr == _UNDEF:
                raise ValueError(f"dataset {name} has no allocated data")
            raw = self._d[ds.data_addr:ds.data_addr + ds.data_size]
            return np.frombuffer(raw, dtype=ds.dtype).reshape(shape)
        out = np.zeros(shape, dtype=ds.dtype)
        cdims = ds.chunk_dims
        for nbytes, offsets, addr in self._chunk_entries(
                ds.btree_addr, len(cdims)):
            raw = self._defilter(self._d[addr:addr + nbytes], ds)
            chunk = np.frombuffer(raw, dtype=ds.dtype).reshape(cdims)
            slices = tuple(
                slice(o, min(o + c, s))
                for o, c, s in zip(offsets, cdims, shape)
            )
            trim = tuple(slice(0, sl.stop - sl.start) for sl in slices)
            out[slices] = chunk[trim]
        return out


class NetCDF4:
    """NetCDF-4 adapter with the same surface as functions/netcdf3.NetCDF3
    (shape / read_raw / read with CDS unpacking), so gridded.netcdf_cells
    can dispatch on magic bytes and keep one kernel."""

    def __init__(self, data: bytes):
        self._h5 = HDF5File(data)
        self.vars = self._h5.datasets

    def shape(self, var: str) -> List[int]:
        return list(self._h5.datasets[var].shape)

    def read_np(self, var: str) -> np.ndarray:
        return self._h5.read_array(var).ravel()

    def read_scaled_np(self, var: str) -> np.ndarray:
        """Float64 values with CDS unpacking applied; fill -> NaN
        (fill compared on the RAW packed values)."""
        ds = self._h5.datasets[var]
        raw = self.read_np(var)
        scale = ds.attrs.get("scale_factor", 1)
        offset = ds.attrs.get("add_offset", 0)
        fill = ds.attrs.get("_FillValue", ds.attrs.get("missing_value"))
        vals = raw.astype(np.float64) * scale + offset
        if fill is not None:
            vals = np.where(raw == fill, np.nan, vals)
        return vals

    def read_raw(self, var: str) -> List[Any]:
        return self.read_np(var).tolist()

    def read(self, var: str) -> List[Optional[float]]:
        vals = self.read_scaled_np(var)
        return [None if np.isnan(v) else v for v in vals.tolist()]


def open_netcdf(data: bytes):
    """Magic-byte dispatch: CDF-1/2 classic -> NetCDF3, HDF5 ->
    NetCDF4; anything else raises."""
    from .netcdf3 import NetCDF3

    if data[:3] == b"CDF":
        return NetCDF3(data)
    if data[:8] == _SIG:
        return NetCDF4(data)
    raise ValueError("not a NetCDF classic or NetCDF-4/HDF5 payload")
