"""NetCDF-3 classic reader: hand-constructed golden bytes plus the
ERA5 fixture round-trip against its CSV twin."""

import struct

import pytest

from aquacache_spark.functions.netcdf3 import NetCDF3


def _pad4(b):
    return b + b"\x00" * ((4 - len(b) % 4) % 4)


def _name(s):
    b = s.encode()
    return struct.pack(">i", len(b)) + _pad4(b)


def test_minimal_fixed_var_hand_bytes():
    # CDF-1, one dim d=3, no gatts, one int var v(d) = [7, -1, 2**20]
    header = (
        b"CDF\x01" + struct.pack(">i", 0)
        + struct.pack(">ii", 0x0A, 1) + _name("d") + struct.pack(">i", 3)
        + struct.pack(">ii", 0, 0)                      # no global attrs
        + struct.pack(">ii", 0x0B, 1)
        + _name("v") + struct.pack(">i", 1) + struct.pack(">i", 0)
        + struct.pack(">ii", 0, 0)                      # no var attrs
        + struct.pack(">iii", 4, 12, 0)                 # int, 12 B, begin=0
    )
    begin = len(header)
    header = header[:-4] + struct.pack(">i", begin)
    data = header + struct.pack(">3i", 7, -1, 2 ** 20)
    nc = NetCDF3(data)
    assert nc.dims == [("d", 3)]
    assert nc.shape("v") == [3]
    assert nc.read("v") == [7, -1, 2 ** 20]


def test_name_padding_and_attr_padding():
    # 5-char name pads to 8; short attr (2 bytes) pads to 4
    header = (
        b"CDF\x01" + struct.pack(">i", 0)
        + struct.pack(">ii", 0x0A, 1) + _name("dd") + struct.pack(">i", 1)
        + struct.pack(">ii", 0, 0)
        + struct.pack(">ii", 0x0B, 1)
        + _name("myvar") + struct.pack(">i", 1) + struct.pack(">i", 0)
        + struct.pack(">ii", 0x0C, 1)
        + _name("f") + struct.pack(">ii", 3, 1) + _pad4(struct.pack(">h", -5))
        + struct.pack(">iii", 3, 4, 0)
    )
    begin = len(header)
    header = header[:-4] + struct.pack(">i", begin)
    data = header + _pad4(struct.pack(">h", 42))
    nc = NetCDF3(data)
    assert nc.vars["myvar"].attrs["f"] == -5
    assert nc.read_raw("myvar") == [42]


def test_rejects_non_netcdf():
    with pytest.raises(ValueError, match="not a NetCDF"):
        NetCDF3(b"GRIB" + b"\x00" * 32)


def test_era5_fixture_matches_csv_twin(repo_root):
    import csv

    nc = NetCDF3((repo_root / "fixtures/connectors/era5_tp.nc").read_bytes())
    lats, lons = nc.read("latitude"), nc.read("longitude")
    hours = nc.read_raw("time")
    tp = nc.read("tp")
    got = {}
    for t, h in enumerate(hours):
        for j in range(len(lats)):
            for i in range(len(lons)):
                got[(h, i, j)] = tp[t * len(lats) * len(lons)
                                    + j * len(lons) + i]
    with open(repo_root / "fixtures/connectors/era5_cells.csv") as fh:
        for row in csv.DictReader(fh):
            key = (int(row["hour"]), int(row["x"]), int(row["y"]))
            exp = None if row["tp"] == "" else float(row["tp"])
            if exp is None:
                assert got[key] is None, key
            else:
                assert got[key] == pytest.approx(exp, abs=1e-12), key
    # coordinate vars + packing metadata decoded
    assert lats[0] == 61.0 and lons[0] == 224.0
    assert nc.vars["tp"].attrs["scale_factor"] == 1e-4
    assert nc.numrecs == 4


def test_distributed_netcdf_cells(spark, repo_root):
    from aquacache_spark.sources.gridded import netcdf_cells

    cells = netcdf_cells(
        spark, str(repo_root / "fixtures/connectors/era5_tp.nc"), "tp")
    rows = cells.collect()
    assert len(rows) == 120 - sum(
        1 for t in range(4) for j in range(5) for i in range(6)
        if (i + j + t) % 13 == 0
    )
    one = {(r["hour"], r["x"], r["y"]): r["value"] for r in rows}
    assert one[(473472, 1, 0)] == pytest.approx(0.5031)
    assert (473472, 0, 0) not in one  # fill value dropped
