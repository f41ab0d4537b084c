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


def _pack_stream(pairs):
    """MSB-first bit packing of (value, width) pairs, zero-padded to a
    byte boundary — one spec 'block' of a complex-packed section 7.
    Vectorized (numpy bit-scatter + packbits) so operational-size
    grids encode in milliseconds for the decode throughput check."""
    import numpy as np

    pairs = list(pairs)
    if not pairs:
        return b""
    v = np.fromiter((p[0] for p in pairs), dtype=np.int64, count=len(pairs))
    w = np.fromiter((p[1] for p in pairs), dtype=np.int64, count=len(pairs))
    ends = np.cumsum(w)
    starts = ends - w
    total = int(ends[-1])
    bits = np.zeros((total + 7) // 8 * 8, dtype=np.uint8)
    for b in range(int(w.max())):
        sel = w > b
        bits[starts[sel] + b] = (v[sel] >> (w[sel] - 1 - b)) & 1
    return np.packbits(bits).tobytes()


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


def _complex_sec57(mvals, spatial_order=0, group_len=7):
    """Sections 5+7 for complex packing (5.2) / spatial differencing
    (5.3, orders 1-2): fixed group length with the last group short
    (len_bits=0, length reference carries the common length), per-group
    min as reference, per-group offset width; 5.3 stores the initial
    value(s) + overall difference minimum as 2-octet sign-magnitude
    ints and packs order-th differences minus that minimum."""
    order = spatial_order
    seq = list(mvals)
    extra = b""
    if order:
        h = seq[:order]
        if order == 1:
            diffs = [0] + [seq[i] - seq[i - 1] for i in range(1, len(seq))]
        else:
            diffs = [0, 0] + [seq[i] - 2 * seq[i - 1] + seq[i - 2]
                              for i in range(2, len(seq))]
        gmin = min(diffs[order:]) if len(diffs) > order else 0
        seq = [0] * order + [x - gmin for x in diffs[order:]]
        extra = struct.pack(
            ">" + "H" * (order + 1),
            *[_sm16(v) for v in h + [gmin]],
        )
    groups = [seq[i:i + group_len] for i in range(0, len(seq), group_len)]
    refs = [min(g) for g in groups]
    offs = [[x - r for x in g] for g, r in zip(groups, refs)]
    widths = [max(o).bit_length() for o in offs]
    nbits = max((r.bit_length() for r in refs), default=0) or 1
    wbits = max((w.bit_length() for w in widths), default=0) or 1
    ng = len(groups)
    last_len = len(groups[-1]) if groups else 0
    template = 3 if order else 2
    sec5 = struct.pack(
        ">IBIHfHHBB", 47 + (2 if order else 0), 5, len(mvals), template,
        0.0, _sm16(0), _sm16(D_SCALE), nbits, 0,
    ) + struct.pack(
        ">BBIIIBBIBIB", 1, 0, 0, 0, ng, 0, wbits, group_len, 1, last_len, 0,
    )
    if order:
        sec5 += struct.pack(">BB", order, 2)
    payload = (
        extra
        + _pack_stream((r, nbits) for r in refs)
        + _pack_stream((w, wbits) for w in widths)
        + _pack_stream(
            (o, widths[g])
            for g, grp in enumerate(offs) if widths[g]
            for o in grp
        )
    )
    sec7 = struct.pack(">IB", 5 + len(payload), 7) + payload
    return sec5, sec7


SP_LAT, SP_LON = -36.0885, 245.305  # the HRDPS rotated-pole parameters


def rotate_to_true(latr, lonr):
    """Independent rotated->geographic check values for the CSV twin:
    matrix composition Rz(lam_p) @ Ry(pi/2 - phi_p) applied to the
    rotated-frame unit vector (the decoder expands the same convention
    as scalar trig)."""
    import numpy as np

    phi_p = np.radians(-SP_LAT)
    lam_p = np.radians(SP_LON - 180.0)
    th = np.pi / 2 - phi_p
    ry = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                   [-np.sin(th), 0, np.cos(th)]])
    rz = np.array([[np.cos(lam_p), -np.sin(lam_p), 0],
                   [np.sin(lam_p), np.cos(lam_p), 0], [0, 0, 1]])
    pr, lr = np.radians(latr), np.radians(lonr)
    u = np.array([np.cos(pr) * np.cos(lr), np.cos(pr) * np.sin(lr),
                  np.sin(pr)])
    v = rz @ ry @ u
    lat = float(np.degrees(np.arcsin(np.clip(v[2], -1, 1))))
    lon = float(np.degrees(np.arctan2(v[1], v[0])) % 360.0)
    return round(lat, 10), round(lon, 10)


def encode(vals, ref_time, fhours=0, packing=0, spatial_order=0,
           grid_template=0):
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
    if grid_template == 1:  # rotated lat/lon: append south pole + angle
        def sm32(v: int) -> int:  # GRIB sign-and-magnitude int32
            return (0x80000000 | -v) if v < 0 else v

        tmpl3 += struct.pack(
            ">IIf", sm32(int(SP_LAT * 1e6)), sm32(int(SP_LON * 1e6)), 0.0)
    sec3 = struct.pack(">IBBIBBH", 14 + len(tmpl3), 3, 0, NI * NJ, 0, 0,
                       grid_template) + tmpl3
    # section 4: product definition, template 4.0 (APCP: cat 1 num 8)
    tmpl4 = struct.pack(">BBBBBHBBIBBIBBI", 1, 8, 2, 0, 0, 0, 0, 1,
                        fhours, 1, 0, 0, 255, 0, 0)
    sec4 = struct.pack(">IBHH", 9 + len(tmpl4), 4, 0, 0) + tmpl4
    # section 6: bitmap
    bm = bytearray((NI * NJ + 7) // 8)
    for idx, v in enumerate(vals):
        if v is not None:
            bm[idx // 8] |= 1 << (7 - idx % 8)
    sec6 = struct.pack(">IBB", 6 + len(bm), 6, 0) + bytes(bm)
    if packing == 0:
        # section 5: simple packing, R=0, E=0, D=1; octets 6-9 carry the
        # PRESENT count (the number of points in section 7), per spec —
        # the grid size lives in section 3.
        sec5 = struct.pack(">IBIHfHHBB", 21, 5, len(mvals), 0, 0.0,
                           _sm16(0), _sm16(D_SCALE), nbits, 0)
        sec7 = struct.pack(
            ">IB", 5 + len(_pack_stream((m, nbits) for m in mvals)), 7
        ) + _pack_stream((m, nbits) for m in mvals)
    else:
        sec5, sec7 = _complex_sec57(mvals, spatial_order=spatial_order)

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

    # Complex-packed twin of the HRDPA set: what production ECCC files
    # actually use (templates 5.2 / 5.3 with spatial differencing) —
    # same listing semantics (prelim/final pair at 12Z), packing varies
    # per file so every decode branch is differentially oracled.
    complex_out = os.path.join(HERE, "hrdpa_complex_grib")
    os.makedirs(complex_out, exist_ok=True)
    crows2 = []
    for (stamp, rt, t, prelim), (packing, order) in zip(
        [(s, r, t + 20, p) for s, r, t, p in FILES],
        [(2, 0), (3, 1), (3, 2), (3, 2)],
    ):
        tag = "Prelim_" if prelim else ""
        name = (f"{stamp}_MSC_HRDPA-{tag}APCP-Accum6h_Sfc_"
                "RLatLon0.0225_PT0H.grib2")
        vals = field(t)
        with open(os.path.join(complex_out, name), "wb") as fh:
            fh.write(encode(vals, rt, packing=packing, spatial_order=order))
        for idx, v in enumerate(vals):
            j, i = divmod(idx, NI)
            crows2.append([
                name, f"{stamp[:4]}-{stamp[4:6]}-{stamp[6:8]} "
                f"{stamp[9:11]}:00:00", i, j,
                LON0 + i * DLON, LAT0 + j * DLAT,
                "" if v is None else v,
            ])
        print(name, f"5.{packing}", f"order={order}",
              sum(v is not None for v in vals), "cells")
    with open(os.path.join(HERE, "hrdpa_complex_cells.csv"), "w",
              newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["file", "datetime", "x", "y", "lon", "lat", "value"])
        w.writerows(crows2)
    print("hrdpa_complex_cells.csv", len(crows2), "rows")

    # ROTATED lat/lon twin (grid template 3.1 + complex packing — the
    # actual shape of a production ECCC file, hence the 'RLatLon' in
    # the datamart names): grid coords are rotated-pole, the CSV twin
    # carries TRUE geographic lat/lon from an independent matrix
    # implementation of the unrotation.
    rot_out = os.path.join(HERE, "hrdpa_rot_grib")
    os.makedirs(rot_out, exist_ok=True)
    rrows = []
    for (stamp, rt, t), (packing, order) in zip(
        [("20240110T06Z", (2024, 1, 10, 6), 30),
         ("20240110T12Z", (2024, 1, 10, 12), 31)],
        [(2, 0), (3, 2)],
    ):
        name = (f"{stamp}_MSC_HRDPA-APCP-Accum6h_Sfc_"
                "RLatLon0.0225_PT0H.grib2")
        vals = field(t)
        with open(os.path.join(rot_out, name), "wb") as fh:
            fh.write(encode(vals, rt, packing=packing,
                            spatial_order=order, grid_template=1))
        for idx, v in enumerate(vals):
            j, i = divmod(idx, NI)
            tlat, tlon = rotate_to_true(LAT0 + j * DLAT, LON0 + i * DLON)
            rrows.append([
                name, f"{stamp[:4]}-{stamp[4:6]}-{stamp[6:8]} "
                f"{stamp[9:11]}:00:00", i, j, tlon, tlat,
                "" if v is None else v,
            ])
        print(name, "rotated", f"5.{packing}",
              sum(v is not None for v in vals), "cells")
    with open(os.path.join(HERE, "hrdpa_rot_cells.csv"), "w",
              newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["file", "datetime", "x", "y", "lon", "lat", "value"])
        w.writerows(rrows)
    print("hrdpa_rot_cells.csv", len(rrows), "rows")

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
