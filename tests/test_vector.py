"""Vector store: WKB codec round-trip, JVM point-in-polygon, upsert
classification with geom_id recycling, NHN layer loading."""

import json

import pytest
from pyspark.sql import functions as F

from aquacache_spark.functions import wkb
from aquacache_spark.operators import vector as V

RING = "array<struct<x:double,y:double>>"


def test_wkb_roundtrip():
    for gt, coords in [
        ("point", [(1.5, -2.25)]),
        ("line", [(0.0, 0.0), (1.0, 1.0), (2.0, 0.5)]),
        ("polygon", [(0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (0.0, 3.0)]),
    ]:
        assert wkb.decode(wkb.encode(gt, coords)) == (gt, coords)


def test_wkt_parse():
    gt, coords = wkb.parse_wkt("POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))")
    assert gt == "polygon"
    assert coords == [(0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (0.0, 3.0)]
    assert wkb.parse_wkt("POINT (2 7)") == ("point", [(2.0, 7.0)])


def _poly_df(spark, polys):
    rows = [(pid, [{"x": float(x), "y": float(y)} for x, y in ring])
            for pid, ring in polys]
    return spark.createDataFrame(rows, f"poly_id int, ring {RING}")


def test_point_in_ring_concave(spark):
    # concave "C" shape: inside notch is outside the polygon
    ring = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 7), (7, 7), (7, 3), (0, 3)]
    polys = _poly_df(spark, [(1, ring)])
    pts = spark.createDataFrame(
        [(1, 5.0, 1.5), (2, 5.0, 5.0), (3, 8.5, 5.0), (4, 5.0, 8.5),
         (5, 11.0, 5.0), (6, -1.0, 5.0)],
        "point_id int, px double, py double",
    )
    out = V.point_in_polygon_join(pts, polys)
    got = {r.point_id for r in out.collect()}
    assert got == {1, 3, 4}  # notch point 2 excluded, outside 5/6 excluded


def test_point_in_polygon_join_bbox_prefilter(spark):
    polys = _poly_df(spark, [
        (1, [(0, 0), (4, 0), (4, 4), (0, 4)]),
        (2, [(10, 10), (14, 10), (14, 14), (10, 14)]),
    ])
    pts = spark.createDataFrame(
        [(1, 2.0, 2.0), (2, 12.0, 12.0), (3, 7.0, 7.0)],
        "point_id int, px double, py double",
    )
    got = {(r.point_id, r.poly_id)
           for r in V.point_in_polygon_join(pts, polys).collect()}
    assert got == {(1, 1), (2, 2)}


def test_prepare_features_routes_attributes(spark):
    df = spark.createDataFrame(
        [("A", "polygon", "a basin", 12.5, "YT")],
        "name string, geom_type string, description string, "
        "area_km2 double, province string",
    )
    out = V.prepare_features(
        df, "Basins", feature_name_col="name", description_col="description",
        attr_cols=["area_km2", "province"],
    ).first()
    assert out.layer_name == "Basins" and out.feature_name == "A"
    assert json.loads(out.attributes) == {"area_km2": 12.5, "province": "YT"}
    with pytest.raises(ValueError):
        V.prepare_features(df, "Basins")


def test_upsert_recycles_and_classifies(spark):
    existing = spark.createDataFrame(
        [("L", "f1", "polygon", 111), ("L", "f2", "polygon", 222)],
        "layer_name string, feature_name string, geom_type string, geom_id long",
    )
    incoming = spark.createDataFrame(
        [("L", "f1", "polygon"), ("L", "f3", "polygon")],
        "layer_name string, feature_name string, geom_type string",
    )
    ow = {r.feature_name: (r.action, r.geom_id)
          for r in V.upsert_features(existing, incoming, overwrite=True).collect()}
    assert ow["f1"] == ("update", 111)  # recycled id
    assert ow["f3"][0] == "insert" and ow["f3"][1] not in (111, 222)
    no = {r.feature_name: r.action
          for r in V.upsert_features(existing, incoming, overwrite=False).collect()}
    assert no == {"f1": "skip", "f3": "insert"}
    # deterministic insert ids across runs
    again = {r.feature_name: r.geom_id
             for r in V.upsert_features(existing, incoming, overwrite=True).collect()}
    assert again["f3"] == ow["f3"][1]


def test_load_nhn_basins_fixture(spark, repo_root):
    from aquacache_spark.sources.vector import load_nhn_layer

    empty = spark.createDataFrame(
        [], "layer_name string, feature_name string, geom_type string, geom_id long")
    out = load_nhn_layer(
        spark, "basins", empty,
        payload_path=str(repo_root / "fixtures/connectors/nhn_basins.csv"),
    )
    rows = out.collect()
    assert len(rows) == 6
    assert all(r.action == "insert" for r in rows)
    assert {r.feature_name for r in rows} == {f"NHN basin basin_{i:02d}"
                                              for i in range(6)}
    r0 = next(r for r in rows if r.feature_name == "NHN basin basin_00")
    assert json.loads(r0.attributes) == {"area_km2": 50.5, "province": "BC"}
    assert wkb.decode(bytes(r0.wkb))[0] == "polygon"
    # clip drops far-right basins
    clipped = load_nhn_layer(
        spark, "basins", empty,
        payload_path=str(repo_root / "fixtures/connectors/nhn_basins.csv"),
        clip=(0, 0, 15, 15),
    )
    assert clipped.count() == 2
    with pytest.raises(ValueError):
        load_nhn_layer(spark, "bogus", empty, payload_path="x.csv")
    with pytest.raises(NotImplementedError):
        load_nhn_layer(spark, "basins", empty)


def test_load_nhn_overwrite_semantics(spark, repo_root):
    from aquacache_spark.sources.vector import load_nhn_layer

    existing = spark.createDataFrame(
        [("National Hydro Network - Waterbodies", "NHN waterbody 1000",
          "polygon", 777)],
        "layer_name string, feature_name string, geom_type string, geom_id long",
    )
    out = load_nhn_layer(
        spark, "waterbodies", existing,
        payload_path=str(repo_root / "fixtures/connectors/nhn_waterbodies.csv"),
        overwrite=True,
    )
    acts = {r.feature_name: (r.action, r.geom_id) for r in out.collect()}
    assert acts["NHN waterbody 1000"] == ("update", 777)
    assert sum(1 for a, _ in acts.values() if a == "insert") == 7


class TestGpkgReader:
    def test_reads_layer_with_types_and_chunking(self, spark, repo_root):
        from aquacache_spark.sources.vector import read_gpkg_layer

        path = str(repo_root / "fixtures/connectors/nhn_sample.gpkg")
        # more chunks than rows: empty ranges must be harmless
        df = read_gpkg_layer(spark, path, "basins", n_chunks=64)
        assert df.schema["dataset_name"].dataType.simpleString() == "string"
        assert df.schema["area_km2"].dataType.simpleString() == "double"
        assert df.schema["fid"].dataType.simpleString() == "bigint"
        assert df.schema["geometry"].dataType.simpleString() == "binary"
        rows = df.collect()
        assert len(rows) == 6
        assert {r["dataset_name"] for r in rows} == {
            f"basin_{i:02d}" for i in range(6)
        }

    def test_gpb_header_stripping(self):
        import struct

        from aquacache_spark.functions import wkb as wkb_codec
        from aquacache_spark.sources.vector import gpb_to_wkb

        wkb = wkb_codec.encode_point(1.5, -2.5)
        no_env = b"GP" + bytes([0, 0b001]) + struct.pack("<i", 4326) + wkb
        assert gpb_to_wkb(no_env) == wkb
        # envelope code 1: 4 doubles (minx maxx miny maxy)
        env = struct.pack("<4d", 1.5, 1.5, -2.5, -2.5)
        with_env = b"GP" + bytes([0, 0b011]) + struct.pack("<i", 4326) \
            + env + wkb
        assert gpb_to_wkb(with_env) == wkb
        import pytest

        with pytest.raises(ValueError, match="not a GeoPackage"):
            gpb_to_wkb(b"XX" + no_env[2:])

    def test_non_feature_table_rejected(self, spark, repo_root):
        import pytest

        from aquacache_spark.sources.vector import read_gpkg_layer

        path = str(repo_root / "fixtures/connectors/nhn_sample.gpkg")
        with pytest.raises(ValueError, match="not a feature table"):
            read_gpkg_layer(spark, path, "gpkg_contents")

    def test_waterbodies_decode_matches_csv_payload(self, spark, repo_root):
        """Container read + GPB decode reproduces the decoded-CSV seam
        for the second layer (different schema)."""
        from aquacache_spark.sources.vector import (
            decode_gpkg_geometries, decode_wkt_geometries, read_gpkg_layer,
        )

        gp = decode_gpkg_geometries(read_gpkg_layer(
            spark, str(repo_root / "fixtures/connectors/nhn_sample.gpkg"),
            "waterbodies"))
        cs = decode_wkt_geometries(
            spark.read.option("header", True).option("inferSchema", True)
            .csv(str(repo_root / "fixtures/connectors/nhn_waterbodies.csv")))

        def key(df):
            return sorted(
                (r["waterbody_id"], r["geom_type"],
                 tuple((p["x"], p["y"]) for p in r["ring"]),
                 bytes(r["wkb"]).hex())
                for r in df.collect()
            )

        assert key(gp) == key(cs)


def test_zorder_key_locality_and_clamping(spark):
    """The Morton key must (a) clamp out-of-range coordinates to the
    edge cells, (b) keep bbox neighbours in FEW contiguous z-runs —
    the property that makes min/max row-group pruning work on a
    z-sorted layout (a row-major key would shatter a tall bbox into
    one run per row of cells)."""
    from pyspark.sql import functions as F

    from aquacache_spark.operators.vector import zorder_key

    pts = spark.range(10_000).select(
        F.col("id"),
        (F.lit(50.0) + (F.col("id") % 100) / F.lit(5.0)).alias("lat"),
        (F.lit(-140.0) + (F.col("id") / 100).cast("int") / F.lit(3.0))
        .alias("lon"),
    )
    z = pts.select(
        "id", "lat", "lon",
        zorder_key(F.col("lat"), F.col("lon"),
                   50.0, 70.0, -140.0, -105.0).alias("zkey"))
    rows = sorted(z.collect(), key=lambda r: r["zkey"])
    # bbox = a 4x4-degree square in the middle
    in_box = [i for i, r in enumerate(rows)
              if 58 <= r["lat"] <= 62 and -130 <= r["lon"] <= -126]
    runs = 1 + sum(1 for a, b in zip(in_box, in_box[1:]) if b != a + 1)
    assert len(in_box) > 200
    # locality: the bbox occupies far fewer sorted runs than points
    assert runs < len(in_box) / 4, (runs, len(in_box))

    clamped = spark.createDataFrame(
        [(1, -999.0, 999.0), (2, 50.0, -140.0), (3, 70.0, -105.0)],
        "id long, lat double, lon double")
    out = {r["id"]: r["zkey"] for r in clamped.select(
        "id", zorder_key(F.col("lat"), F.col("lon"),
                         50.0, 70.0, -140.0, -105.0).alias("zkey"))
        .collect()}
    assert out[2] == 0                      # both mins -> cell (0, 0)
    assert out[3] == (1 << 32) - 1          # both maxes -> all bits set
    assert 0 <= out[1] <= (1 << 32) - 1     # clamped inside the domain


def test_hilbert_key_matches_reference_loop(spark):
    # the derived state machine == the textbook xy2d rotation loop,
    # point by point on a 32x32 grid, evaluated through the REAL
    # Column fold
    from pyspark.sql import functions as F

    from aquacache_spark.operators.vector import hilbert_key

    def xy2d(n, x, y):
        d = 0
        s = n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x = s - 1 - x
                    y = s - 1 - y
                x, y = y, x
            s //= 2
        return d

    bits, n = 5, 32
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("gx"),
        (F.col("id") / n).cast("long").alias("gy"))
    # map the integer grid through the quantizer's identity window
    out = grid.select(
        "gx", "gy",
        hilbert_key(F.col("gx").cast("double") / (n - 1),
                    F.col("gy").cast("double") / (n - 1),
                    0.0, 1.0, 0.0, 1.0, bits=bits).alias("h"))
    rows = out.collect()
    assert len(rows) == n * n
    for r in rows:
        assert r["h"] == xy2d(n, r["gx"], r["gy"]), (r["gx"], r["gy"])
    # the defining Hilbert property Morton lacks: consecutive keys
    # are always 4-neighbour grid steps (no long jumps)
    byd = {r["h"]: (r["gx"], r["gy"]) for r in rows}
    assert sorted(byd) == list(range(n * n))
    for d in range(1, n * n):
        (x1, y1), (x2, y2) = byd[d - 1], byd[d]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d
