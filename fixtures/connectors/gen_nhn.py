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


if __name__ == "__main__":
    for name, gen in (("nhn_basins.csv", basins),
                      ("nhn_waterbodies.csv", waterbodies)):
        header, rows = gen()
        write(name, header, rows)
