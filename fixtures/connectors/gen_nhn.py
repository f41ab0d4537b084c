"""Generate the canned NHN layer payloads (decoded-GPKG CSV with WKT
geometry), mimicking the frames terra::vect yields from the NHN
GeoPackages (R/load_nhn.R:96-115) for the basins and waterbodies
layers.

Run from the repo root: python fixtures/connectors/gen_nhn.py
"""

import csv
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def basins():
    rows = []
    for i in range(6):
        x0, y0 = 10 * i, 5 * (i % 3)
        # pentagon around (x0+5, y0+5)
        ring = [(x0, y0), (x0 + 10, y0), (x0 + 12, y0 + 6),
                (x0 + 5, y0 + 11), (x0 - 2, y0 + 6), (x0, y0)]
        wkt = "POLYGON ((" + ", ".join(f"{x} {y}" for x, y in ring) + "))"
        rows.append([f"basin_{i:02d}", f"Drainage basin {i}", wkt,
                     round(50.5 + 7 * i, 1), "YT" if i % 2 else "BC"])
    return ["dataset_name", "description", "geometry", "area_km2",
            "province"], rows


def waterbodies():
    rows = []
    for i in range(8):
        x0, y0 = 3 * i, 2 * i
        ring = [(x0, y0), (x0 + 4, y0), (x0 + 4, y0 + 3), (x0, y0 + 3),
                (x0, y0)]
        wkt = "POLYGON ((" + ", ".join(f"{x} {y}" for x, y in ring) + "))"
        rows.append([1000 + i, wkt, "permanent" if i % 3 else "intermittent",
                     round(1.5 * i + 0.3, 1)])
    return ["waterbody_id", "geometry", "permanency", "area_km2"], rows


def write(name, header, rows):
    with open(os.path.join(HERE, name), "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(header)
        w.writerows(rows)
    print(name, len(rows), "rows")


def write_gpkg(name="nhn_sample.gpkg"):
    """Native GeoPackage fixture: the same basins/waterbodies features
    as the CSVs, but as a real SQLite container with gpkg_contents /
    gpkg_geometry_columns and GPB-wrapped WKB geometry blobs — what
    R/load_nhn.R:96-115 actually opens."""
    import sqlite3
    import struct
    import sys

    sys.path.insert(0, os.path.join(HERE, "..", ".."))
    from aquacache_spark.functions import wkb as wkb_codec

    path = os.path.join(HERE, name)
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    con.executescript("""
        PRAGMA application_id = 0x47504B47;
        CREATE TABLE gpkg_contents (
          table_name TEXT PRIMARY KEY, data_type TEXT, identifier TEXT,
          srs_id INTEGER);
        CREATE TABLE gpkg_geometry_columns (
          table_name TEXT, column_name TEXT, geometry_type_name TEXT,
          srs_id INTEGER, z INTEGER, m INTEGER);
        CREATE TABLE basins (
          fid INTEGER PRIMARY KEY, dataset_name TEXT, description TEXT,
          geom BLOB, area_km2 REAL, province TEXT);
        CREATE TABLE waterbodies (
          fid INTEGER PRIMARY KEY, waterbody_id INTEGER, geom BLOB,
          permanency TEXT, area_km2 REAL);
    """)
    for tbl, gtype in (("basins", "POLYGON"), ("waterbodies", "POLYGON")):
        con.execute("INSERT INTO gpkg_contents VALUES (?, 'features', ?, 4326)",
                    (tbl, tbl))
        con.execute("INSERT INTO gpkg_geometry_columns VALUES "
                    "(?, 'geom', ?, 4326, 0, 0)", (tbl, gtype))

    def gpb(wkt):
        gt, coords = wkb_codec.parse_wkt(wkt)
        # GPB header: magic, version 0, flags (envelope code 0,
        # little-endian byte order), srs_id
        return (b"GP" + bytes([0, 0b00000001])
                + struct.pack("<i", 4326) + wkb_codec.encode(gt, coords))

    _, brows = basins()
    for fid, (ds, desc, wkt, area, prov) in enumerate(brows, start=1):
        con.execute("INSERT INTO basins VALUES (?,?,?,?,?,?)",
                    (fid, ds, desc, gpb(wkt), area, prov))
    _, wrows = waterbodies()
    for fid, (wid, wkt, perm, area) in enumerate(wrows, start=1):
        con.execute("INSERT INTO waterbodies VALUES (?,?,?,?,?)",
                    (fid, wid, gpb(wkt), perm, area))
    con.commit()
    con.close()
    print(name, len(brows) + len(wrows), "features")


if __name__ == "__main__":
    for name, gen in (("nhn_basins.csv", basins),
                      ("nhn_waterbodies.csv", waterbodies)):
        header, rows = gen()
        write(name, header, rows)
    write_gpkg()
