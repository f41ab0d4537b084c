"""Generate the canned decoded-grid raster payloads.

Deterministic synthetic grids mimicking the shapes the reference's
raster connectors emit after NetCDF/GRIB decode (R/downloadERA5.R:379-388,
R/downloadHRDPA.R, R/downloadHRDPS.R): ERA5 hour-ending reanalysis
windows with a trailing PRELIMINARY (ERA5T) step, and an HRDPS forecast
with two issue cycles whose valid ranges overlap — exercising the
selective forecast-replacement path (getNewRasters.R:393-447).

Run from the repo root: python fixtures/connectors/gen_raster.py
"""

import csv
import os

HERE = os.path.dirname(os.path.abspath(__file__))
W = H = 12  # 12x12 grid -> spans multiple 4-cell tiles in tests


def cell_value(tag: str, t: int, x: int, y: int) -> float:
    # smooth-ish deterministic field, 2 decimals
    base = (x * 7 + y * 13 + t * 29 + sum(map(ord, tag))) % 997
    return round(base / 10.0, 2)


def era5():
    rows = []
    # 4 hour-ending windows on 2024-03-01; last one is ERA5T (PRELIMINARY)
    for t in range(4):
        vt = f"2024-03-01 {t + 1:02d}:00:00"
        vf = f"2024-03-01 {t:02d}:00:00"
        flag = "PRELIMINARY" if t == 3 else ""
        for y in range(H):
            for x in range(W):
                rows.append(["", vf, vt, "mm", flag, x, y,
                             cell_value("era5", t, x, y)])
    return rows


def hrdps():
    rows = []
    # two issue cycles 6h apart, 3 lead hours each; the second covers
    # leads 1-3 from 06:00 so valid 07:00-09:00 — no overlap with cycle 1
    # except the 07:00 step which both cover (cycle1 lead 7 omitted ->
    # craft overlap: cycle1 leads 1..6, cycle2 leads 1..3)
    for issued_h, leads in ((0, range(1, 7)), (6, range(1, 4))):
        issued = f"2024-03-01 {issued_h:02d}:00:00"
        for lead in leads:
            vh = issued_h + lead
            vf = f"2024-03-01 {vh:02d}:00:00"
            vt = f"2024-03-01 {vh + 1:02d}:00:00"
            for y in range(H):
                for x in range(W):
                    rows.append([issued, vf, vt, "degC", "", x, y,
                                 cell_value("hrdps", issued_h * 100 + lead, x, y)])
    return rows


def write(name, rows):
    with open(os.path.join(HERE, name), "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["issued", "valid_from", "valid_to", "units", "flag",
                    "x", "y", "value"])
        w.writerows(rows)
    print(name, len(rows), "rows")


if __name__ == "__main__":
    write("era5_apcp.csv", era5())
    write("hrdps_t2m.csv", hrdps())
