"""Generate canned HRDPA GRIB2 fixtures + a decoded-cell CSV twin.

Encodes real GRIB2 (edition 2, grid template 3.0 regular lat/lon,
simple packing 5.0, bitmap 6.0) with the WMO section layout, so the
pure-stdlib decoder (aquacache_spark/functions/grib2.py) is exercised
against independently-constructed bytes; the CSV twin carries the
expected decoded cells for the DuckDB oracle.

Files mimic the datamart naming downloadHRDPA.R scrapes
(YYYYMMDDTHHZ_MSC_HRDPA_APCP-Accum6h_...grib2), including a
preliminary/final pair at one datetime so the dedup rule is live.

Run from the repo root: python fixtures/connectors/gen_grib.py
"""

import csv
import os
import struct

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "hrdpa_grib")

NI, NJ = 12, 10
LAT0, LON0 = 60.0, 230.0
DLAT, DLON = 0.5, 0.25
D_SCALE = 1  # decimal scale: stored M = value * 10


def _sm16(v: int) -> int:
    """int -> GRIB sign-and-magnitude 16-bit."""
    return (0x8000 | -v) if v < 0 else v


def field(t: int):
    """Deterministic 6-h precip field; None = bitmap-masked cell."""
    vals = []
    for j in range(NJ):
        for i in range(NI):
            if (i + j + t) % 11 == 0:
                vals.append(None)
            else:
                vals.append(round((i * 7 + j * 13 + t * 29) % 97 / 10.0, 1))
    return vals


def encode(vals, ref_time, fhours=0):
    year, mon, day, hour = ref_time
    present = [v for v in vals if v is not None]
    mvals = [int(round(v * 10 ** D_SCALE)) for v in present]
    nbits = max(1, max(mvals).bit_length())

    sec1 = struct.pack(
        ">IBHHBBBHBBBBBBB", 21, 1, 54, 0, 2, 1, 1,
        year, mon, day, hour, 0, 0, 0, 1,
    )
    # section 3: grid definition, template 3.0
    tmpl3 = struct.pack(
        ">BBIBIBIII", 6, 0, 6371229, 0, 0, 0, 0, NI, NJ
    ) + struct.pack(
        ">IIiiBiiIIB",
        0, 0,                                 # basic angle, subdivisions
        int(LAT0 * 1e6), int(LON0 * 1e6),     # first point
        0x30,                                 # resolution/component flags
        int((LAT0 + (NJ - 1) * DLAT) * 1e6),
        int((LON0 + (NI - 1) * DLON) * 1e6),
        int(DLON * 1e6), int(DLAT * 1e6),
        0x40,                                 # scan mode: +i, +j (S->N)
    )
    sec3 = struct.pack(">IBBIBBH", 14 + len(tmpl3), 3, 0, NI * NJ, 0, 0, 0) \
        + tmpl3
    # section 4: product definition, template 4.0 (APCP: cat 1 num 8)
    tmpl4 = struct.pack(">BBBBBHBBIBBIBBI", 1, 8, 2, 0, 0, 0, 0, 1,
                        fhours, 1, 0, 0, 255, 0, 0)
    sec4 = struct.pack(">IBHH", 9 + len(tmpl4), 4, 0, 0) + tmpl4
    # section 5: simple packing, R=0, E=0, D=1
    sec5 = struct.pack(">IBIHfHHBB", 21, 5, NI * NJ, 0, 0.0,
                       _sm16(0), _sm16(D_SCALE), nbits, 0)
    # section 6: bitmap
    bm = bytearray((NI * NJ + 7) // 8)
    for idx, v in enumerate(vals):
        if v is not None:
            bm[idx // 8] |= 1 << (7 - idx % 8)
    sec6 = struct.pack(">IBB", 6 + len(bm), 6, 0) + bytes(bm)
    # section 7: MSB-first packed integers
    acc = accbits = 0
    packed = bytearray()
    for mv in mvals:
        acc = (acc << nbits) | mv
        accbits += nbits
        while accbits >= 8:
            accbits -= 8
            packed.append((acc >> accbits) & 0xFF)
    if accbits:
        packed.append((acc << (8 - accbits)) & 0xFF)
    sec7 = struct.pack(">IB", 5 + len(packed), 7) + bytes(packed)

    body = sec1 + sec3 + sec4 + sec5 + sec6 + sec7
    total = 16 + len(body) + 4
    sec0 = b"GRIB" + bytes([0, 0]) + bytes([0]) + bytes([2]) \
        + struct.pack(">Q", total)
    return sec0 + body + b"7777"


FILES = [
    # (name stamp, hour, t-seed, prelim)
    ("20240110T06Z", (2024, 1, 10, 6), 0, False),
    ("20240110T12Z", (2024, 1, 10, 12), 1, True),   # superseded
    ("20240110T12Z", (2024, 1, 10, 12), 2, False),  # analysis wins
    ("20240110T18Z", (2024, 1, 10, 18), 3, False),
]


# HRDPS forecast fixture: two runs of TMP_AGL-2m — 06Z incomplete
# (3 steps), 12Z complete (steps 0..4) — so latest-complete-run
# selection is live (downloadHRDPS.R:39-126).
HRDPS_OUT = os.path.join(HERE, "hrdps_grib")
HRDPS_RUNS = [
    ("20240110T06Z", (2024, 1, 10, 6), range(3)),
    ("20240110T12Z", (2024, 1, 10, 12), range(5)),
]


def main():
    os.makedirs(OUT, exist_ok=True)
    rows = []
    for stamp, rt, t, prelim in FILES:
        tag = "Prelim_" if prelim else ""
        name = (f"{stamp}_MSC_HRDPA-{tag}APCP-Accum6h_Sfc_"
                "RLatLon0.0225_PT0H.grib2")
        vals = field(t)
        with open(os.path.join(OUT, name), "wb") as fh:
            fh.write(encode(vals, rt))
        for idx, v in enumerate(vals):
            j, i = divmod(idx, NI)
            rows.append([
                name, f"{stamp[:4]}-{stamp[4:6]}-{stamp[6:8]} "
                f"{stamp[9:11]}:00:00", i, j,
                LON0 + i * DLON, LAT0 + j * DLAT,
                "" if v is None else v,
            ])
        print(name, sum(v is not None for v in vals), "cells")
    with open(os.path.join(HERE, "hrdpa_cells.csv"), "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["file", "datetime", "x", "y", "lon", "lat", "value"])
        w.writerows(rows)
    print("hrdpa_cells.csv", len(rows), "rows")

    os.makedirs(HRDPS_OUT, exist_ok=True)
    hrows = []
    for stamp, rt, steps in HRDPS_RUNS:
        for step in steps:
            name = (f"{stamp}_MSC_HRDPS_TMP_AGL-2m_RLatLon0.0225_"
                    f"PT{step:03d}H.grib2")
            vals = field(rt[3] * 10 + step)
            with open(os.path.join(HRDPS_OUT, name), "wb") as fh:
                fh.write(encode(vals, rt, fhours=step))
            issue = (f"{stamp[:4]}-{stamp[4:6]}-{stamp[6:8]} "
                     f"{stamp[9:11]}:00:00")
            for idx, v in enumerate(vals):
                j, i = divmod(idx, NI)
                hrows.append([name, issue, step, i, j,
                              "" if v is None else v])
        print(stamp, "HRDPS", len(steps), "steps")
    with open(os.path.join(HERE, "hrdps_cells.csv"), "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["file", "issue", "step", "x", "y", "value"])
        w.writerows(hrows)
    print("hrdps_cells.csv", len(hrows), "rows")

    # CaLDAS snow-depth analyses at the 3-hourly cadence
    # (downloadCaLDAS.R): one file per (day, hour), hours on the 3-h
    # grid; one off-grid-named file must never be selected.
    caldas_out = os.path.join(HERE, "caldas_grib")
    os.makedirs(caldas_out, exist_ok=True)
    crows = []
    for hour, t in ((0, 11), (6, 12), (12, 13), (21, 14)):
        name = (f"20240110T{hour:02d}Z_MSC_CaLDAS-NSRPS_SD_Veg_"
                "RLatLon0.009_PT0H.grib2")
        vals = field(t)
        with open(os.path.join(caldas_out, name), "wb") as fh:
            fh.write(encode(vals, (2024, 1, 10, hour)))
        for idx, v in enumerate(vals):
            j, i = divmod(idx, NI)
            crows.append([name, f"2024-01-10 {hour:02d}:00:00", i, j,
                          "" if v is None else v])
    with open(os.path.join(HERE, "caldas_cells.csv"), "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["file", "datetime", "x", "y", "value"])
        w.writerows(crows)
    print("caldas_cells.csv", len(crows), "rows")


if __name__ == "__main__":
    main()
