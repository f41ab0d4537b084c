"""GRIB2 codec: hand-constructed golden bytes (independent of the
fixture generator's encoder) pin the bit order, sign-and-magnitude
scale factors, and bitmap semantics; the distributed grib_cells path
is checked against the fixture CSV twin."""

import struct

from aquacache_spark.functions.grib2 import (_su16, _unpack_simple,
                                             decode_grib2)


def test_simple_packing_hand_computed():
    # nbits=10, values M = [5, 1023, 0]; MSB-first packed stream:
    # 0000000101 1111111111 0000000000 -> bytes 00000001 01111111
    # 11110000 00000000 (padded)
    packed = bytes([0b00000001, 0b01111111, 0b11110000, 0b00000000])
    # R=1.5, E=2 (x4), D=1 (/10): v = (1.5 + M*4) / 10
    vals = _unpack_simple(packed, 3, 1.5, 2, 1, 10, None)
    assert vals == [(1.5 + 5 * 4) / 10, (1.5 + 1023 * 4) / 10, 0.15]


def test_sign_and_magnitude_scale_factors():
    # 0x8002 is -2 in GRIB sign-magnitude (NOT two's complement -32766)
    assert _su16(struct.pack(">H", 0x8002), 0) == -2
    assert _su16(struct.pack(">H", 0x0002), 0) == 2
    # E=-2: step 0.25
    packed = bytes([0b01000000])  # nbits=2, M=[1,0,0,0]
    vals = _unpack_simple(packed, 1, 0.0, -2, 0, 2, None)
    assert vals[0] == 0.25


def test_bitmap_masks_cells():
    # 5 points, bitmap 10110xxx -> present at 0,2,3; M (nbits=8) = 7,9,11
    bitmap = bytes([0b10110000])
    packed = bytes([7, 9, 11])
    vals = _unpack_simple(packed, 5, 0.0, 0, 0, 8, bitmap)
    assert vals == [7.0, None, 9.0, 11.0, None]


def test_nbits_zero_constant_field():
    vals = _unpack_simple(b"", 4, 42.0, 0, 1, 0, None)
    assert vals == [4.2] * 4
    vals = _unpack_simple(b"", 3, 42.0, 0, 1, 0, bytes([0b10100000]))
    assert vals == [4.2, None, 4.2]


def test_fixture_roundtrip_against_csv_twin(repo_root):
    import csv

    from collections import defaultdict

    fixdir = repo_root / "fixtures/connectors/hrdpa_grib"
    expected = defaultdict(dict)
    with open(repo_root / "fixtures/connectors/hrdpa_cells.csv") as fh:
        for row in csv.DictReader(fh):
            v = None if row["value"] == "" else float(row["value"])
            expected[row["file"]][(int(row["x"]), int(row["y"]))] = v
    for path in sorted(fixdir.glob("*.grib2")):
        (m,) = decode_grib2(path.read_bytes())
        assert (m.ni, m.nj) == (12, 10)
        assert (m.discipline, m.param_category, m.param_number) == (0, 1, 8)
        got = {}
        for idx, v in enumerate(m.values):
            j, i = divmod(idx, m.ni)
            got[(i, j)] = v
        assert got == expected[path.name], path.name
        # grid georeferencing
        assert (m.lon(0), m.lat(0)) == (230.0, 60.0)
        assert (round(m.lon(11), 6), round(m.lat(9), 6)) == (232.75, 64.5)


def test_multi_message_stream(repo_root):
    fixdir = repo_root / "fixtures/connectors/hrdpa_grib"
    paths = sorted(fixdir.glob("*.grib2"))[:2]
    blob = paths[0].read_bytes() + paths[1].read_bytes()
    msgs = decode_grib2(blob)
    assert len(msgs) == 2


def test_unsupported_templates_rejected(repo_root):
    import pytest

    fixdir = repo_root / "fixtures/connectors/hrdpa_grib"
    data = bytearray(sorted(fixdir.glob("*.grib2"))[0].read_bytes())
    with pytest.raises(ValueError, match="bad GRIB indicator"):
        decode_grib2(b"XRIB" + bytes(data[4:]))


def test_grib_cells_distributed_decode(spark, repo_root):
    from aquacache_spark.sources.gridded import grib_cells

    cells = grib_cells(
        spark, str(repo_root / "fixtures/connectors/hrdpa_grib/*.grib2"))
    rows = cells.collect()
    # 4 files x 120 cells minus the bitmap-masked ones
    assert len(rows) == 109 * 3 + 110
    one = {(r["x"], r["y"]): r["value"] for r in rows
           if "T06Z" in r["file"]}
    assert one[(1, 0)] == 0.7
    assert (0, 0) not in one  # masked
