"""NetCDF-4 / HDF5 subset reader: golden bytes pin the unshuffle and
dispatch semantics; the fixture round-trips against its CSV twin
(writer and reader are independent constructions of the format spec);
unsupported format features must fail loudly, never mis-decode."""

import struct

import pytest

from aquacache_spark.functions.hdf5 import (HDF5File, NetCDF4,
                                            open_netcdf)

FIX = "fixtures/connectors/era5_tp_nc4.nc"


def _nc4(repo_root) -> NetCDF4:
    return NetCDF4((repo_root / FIX).read_bytes())


def test_magic_dispatch(repo_root):
    from aquacache_spark.functions.netcdf3 import NetCDF3

    assert isinstance(
        open_netcdf((repo_root / "fixtures/connectors/era5_tp.nc")
                    .read_bytes()), NetCDF3)
    assert isinstance(open_netcdf((repo_root / FIX).read_bytes()), NetCDF4)
    with pytest.raises(ValueError, match="not a NetCDF"):
        open_netcdf(b"\x00" * 64)


def test_unsupported_superblock_version_loud(repo_root):
    raw = bytearray((repo_root / FIX).read_bytes())
    raw[8] = 2  # superblock v2 uses a different layout entirely
    with pytest.raises(ValueError, match="superblock version 2"):
        HDF5File(bytes(raw))


def test_unsupported_filter_loud(repo_root):
    # corrupt the deflate filter id (1 -> 4 szip) in the pipeline
    # message; reading tp must raise, not return garbage
    raw = bytearray((repo_root / FIX).read_bytes())
    idx = raw.find(b"deflate\x00")
    assert idx > 0
    assert struct.unpack_from("<H", raw, idx - 8)[0] == 1
    struct.pack_into("<H", raw, idx - 8, 4)
    h5 = HDF5File(bytes(raw))
    with pytest.raises(ValueError, match="filter id 4"):
        h5.read_array("tp")


def test_unshuffle_golden():
    # shuffle of int16 [0x0102, 0x0304, 0x0506] (LE bytes 02 01 04 03
    # 06 05) stores low-byte plane then high-byte plane
    import numpy as np

    from aquacache_spark.functions.hdf5 import _Dataset

    ds = _Dataset("x")
    ds.dtype = np.dtype("<i2")
    ds.filters = [(2, [2])]
    h5 = HDF5File.__new__(HDF5File)
    out = h5._defilter(bytes([0x02, 0x04, 0x06, 0x01, 0x03, 0x05]), ds)
    assert np.frombuffer(out, "<i2").tolist() == [0x0102, 0x0304, 0x0506]


def test_coords_and_attrs(repo_root):
    nc = _nc4(repo_root)
    assert nc.shape("tp") == [4, 5, 6]
    assert nc.read_raw("time") == [473472 + t for t in range(4)]
    assert nc.read("latitude")[:2] == [61.0, 60.75]
    ds = nc.vars["tp"]
    assert ds.attrs["scale_factor"] == 2e-4
    assert ds.attrs["add_offset"] == 0.25
    assert ds.attrs["_FillValue"] == -32767
    assert ds.attrs["units"] == "m"
    assert [f for f, _ in ds.filters] == [2, 1]  # shuffle then deflate


def test_chunked_roundtrip_against_csv_twin(repo_root):
    import csv

    nc = _nc4(repo_root)
    hours = nc.read_raw("time")
    vals = nc.read("tp")
    nlat, nlon = 5, 6
    expected = {}
    with open(repo_root / "fixtures/connectors/era5_nc4_cells.csv") as fh:
        for row in csv.DictReader(fh):
            v = None if row["tp"] == "" else float(row["tp"])
            expected[(int(row["hour"]), int(row["x"]), int(row["y"]))] = v
    for t, h in enumerate(hours):
        for j in range(nlat):
            for i in range(nlon):
                got = vals[t * nlat * nlon + j * nlon + i]
                exp = expected[(h, i, j)]
                if exp is None:
                    assert got is None, (h, i, j)
                else:
                    assert got == pytest.approx(exp, abs=1e-12), (h, i, j)


def test_netcdf_cells_dispatches_nc4(spark, repo_root):
    from aquacache_spark.sources.gridded import netcdf_cells

    cells = netcdf_cells(spark, str(repo_root / FIX), "tp")
    rows = cells.collect()
    # 120 cells minus the (i+j+t) % 11 == 0 fills
    fills = sum(1 for t in range(4) for j in range(5) for i in range(6)
                if (i + j + t) % 11 == 0)
    assert len(rows) == 120 - fills
    one = {(r["x"], r["y"]): r["value"] for r in rows
           if r["hour"] == 473472}
    assert one[(1, 0)] == pytest.approx(37 * 2e-4 + 0.25)
    assert (0, 0) not in one  # fill-masked
