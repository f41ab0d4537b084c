"""Minimal pure-stdlib NetCDF-3 ("classic") reader.

The reference's ERA5 connector hands CDS NetCDF payloads to terra
(R/downloadERA5.R); this decodes them without netCDF4/GDAL — the
ERA5 sibling of the GRIB2 codec (functions/grib2.py), covering the
classic format CDS serves:

- magic ``CDF\\x01`` (32-bit offsets) and ``CDF\\x02`` (64-bit);
- dimension / global-attribute / variable header lists;
- big-endian data payloads for all six external types;
- the CDS packing convention: ``short`` data with ``scale_factor`` /
  ``add_offset`` attributes (decoded value = raw*scale + offset) and
  ``_FillValue``/``missing_value`` -> None.

Record (unlimited-dimension) variables read their per-record slabs.
Scalar codec only — the distributed path batches whole files through
``mapInPandas`` exactly like ``gridded.grib_cells``.
"""

from __future__ import annotations

import struct
from typing import Any, Dict, List, Optional

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
_FMT = {NC_BYTE: "b", NC_CHAR: "s", NC_SHORT: "h", NC_INT: "i",
        NC_FLOAT: "f", NC_DOUBLE: "d"}
_SIZE = {NC_BYTE: 1, NC_CHAR: 1, NC_SHORT: 2, NC_INT: 4, NC_FLOAT: 4,
         NC_DOUBLE: 8}

_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0

    def i4(self) -> int:
        (v,) = struct.unpack_from(">i", self.d, self.pos)
        self.pos += 4
        return v

    def i8(self) -> int:
        (v,) = struct.unpack_from(">q", self.d, self.pos)
        self.pos += 8
        return v

    def name(self) -> str:
        n = self.i4()
        s = self.d[self.pos:self.pos + n].decode("utf-8")
        self.pos += (n + 3) // 4 * 4  # names pad to 4-byte boundary
        return s

    def values(self, nc_type: int, n: int) -> Any:
        size = _SIZE[nc_type]
        total = n * size
        if nc_type == NC_CHAR:
            out = self.d[self.pos:self.pos + n].decode("latin-1")
        else:
            out = list(struct.unpack_from(f">{n}{_FMT[nc_type]}",
                                          self.d, self.pos))
        self.pos += (total + 3) // 4 * 4  # attr payloads pad too
        return out


class NcVar:
    __slots__ = ("name", "dimids", "attrs", "nc_type", "vsize", "begin")

    def __init__(self, name, dimids, attrs, nc_type, vsize, begin):
        self.name = name
        self.dimids = dimids
        self.attrs = attrs
        self.nc_type = nc_type
        self.vsize = vsize
        self.begin = begin


class NetCDF3:
    def __init__(self, data: bytes):
        if data[:3] != b"CDF" or data[3] not in (1, 2):
            raise ValueError("not a NetCDF classic (CDF-1/CDF-2) file")
        self._d = data
        self._offsets64 = data[3] == 2
        r = _Reader(data)
        r.pos = 4
        self.numrecs = r.i4()
        self.dims: List[tuple[str, int]] = []
        tag, count = r.i4(), r.i4()
        if tag == _NC_DIMENSION:
            for _ in range(count):
                self.dims.append((r.name(), r.i4()))
        elif tag != 0 or count != 0:
            raise ValueError("malformed dimension list")
        self.attrs = self._attr_list(r)
        self.vars: Dict[str, NcVar] = {}
        tag, count = r.i4(), r.i4()
        if tag == _NC_VARIABLE:
            for _ in range(count):
                name = r.name()
                ndims = r.i4()
                dimids = [r.i4() for _ in range(ndims)]
                attrs = self._attr_list(r)
                nc_type = r.i4()
                vsize = r.i4()
                begin = r.i8() if self._offsets64 else r.i4()
                self.vars[name] = NcVar(name, dimids, attrs, nc_type,
                                        vsize, begin)
        elif tag != 0 or count != 0:
            raise ValueError("malformed variable list")

    @staticmethod
    def _attr_list(r: _Reader) -> Dict[str, Any]:
        tag, count = r.i4(), r.i4()
        if tag == 0 and count == 0:
            return {}
        if tag != _NC_ATTRIBUTE:
            raise ValueError("malformed attribute list")
        out = {}
        for _ in range(count):
            name = r.name()
            nc_type = r.i4()
            n = r.i4()
            vals = r.values(nc_type, n)
            if isinstance(vals, list) and len(vals) == 1:
                vals = vals[0]
            out[name] = vals
        return out

    def shape(self, var: str) -> List[int]:
        v = self.vars[var]
        return [
            (self.numrecs if size == 0 else size)
            for size in (self.dims[d][1] for d in v.dimids)
        ]

    def _is_record(self, v: NcVar) -> bool:
        return bool(v.dimids) and self.dims[v.dimids[0]][1] == 0

    def read_np(self, var: str):
        """Row-major raw values as a numpy array (no scaling) — the
        vectorized storage the distributed kernel consumes."""
        import numpy as np

        v = self.vars[var]
        shape = self.shape(var)
        n = 1
        for s in shape:
            n *= s
        dt = np.dtype(">" + {1: "i1", 3: "i2", 4: "i4", 5: "f4",
                             6: "f8"}[v.nc_type])
        if not self._is_record(v):
            return np.frombuffer(self._d, dtype=dt, count=n,
                                 offset=v.begin)
        # record variable: one padded slab per record at stride recsize
        per_rec = n // max(self.numrecs, 1)
        recsize = sum(
            w.vsize for w in self.vars.values() if self._is_record(w))
        slabs = [
            np.frombuffer(self._d, dtype=dt, count=per_rec,
                          offset=v.begin + rec * recsize)
            for rec in range(self.numrecs)
        ]
        return (np.concatenate(slabs) if slabs
                else np.zeros(0, dtype=dt))

    def read_scaled_np(self, var: str):
        """Float64 values with CDS unpacking applied; fill -> NaN."""
        import numpy as np

        v = self.vars[var]
        raw = self.read_np(var)
        scale = v.attrs.get("scale_factor", 1)
        offset = v.attrs.get("add_offset", 0)
        fill = v.attrs.get("_FillValue", v.attrs.get("missing_value"))
        vals = raw.astype(np.float64) * scale + offset
        if fill is not None:
            vals = np.where(raw == fill, np.nan, vals)
        return vals

    def read_raw(self, var: str) -> List[Any]:
        """Row-major raw values (no scaling)."""
        return self.read_np(var).tolist()

    def read(self, var: str) -> List[Optional[float]]:
        """Values with CDS unpacking: scale_factor/add_offset applied,
        _FillValue / missing_value -> None."""
        import numpy as np

        vals = self.read_scaled_np(var)
        return [None if np.isnan(x) else x for x in vals.tolist()]
