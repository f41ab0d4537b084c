"""Generate the canned Aquarius payload + its expected-output mirror.

The payload (``aquarius_09AA-M3.json``) has the shape the Aquarius
``getTimeSeriesCorrectedData`` client returns (Points with
offset-stamped timestamps and nullable numeric values, Approvals,
Grades, Qualifiers interval lists). The expected CSV is computed by a
deliberately LOOP-BASED replica of the reference semantics
(R/downloadAquarius.R:130-574) — findInterval snapping, later-interval
overwrite, per-level qualifier collapse, comma-append — kept
independent of the Spark implementation so the oracle comparison is a
genuine cross-check, not a shared-code tautology.

Run from the repo root:  python fixtures/connectors/gen_aquarius.py
"""

import bisect
import json
import math
import os
from datetime import datetime, timedelta

HERE = os.path.dirname(os.path.abspath(__file__))

# ids mirror aquacache_spark/sources/dims.py (positional, append-only)
GRADE_CODES = ["A", "B", "C", "D", "E", "N", "UNK", "UNS",
               "MISS", "HD", "HI"]
APPROVAL_CODES = ["A", "C", "N", "R", "UNK", "UNS"]
QUALIFIER_CODES = ["DRY", "EST", "ICE", "SUS", "UNK", "UNS",
                   "BW", "DD", "US-DISTURB", "INT", "HW-MISS", "ICE-EST",
                   "LW-MISS", "OOW", "PMMAX", "PMMIN", "PYMAX", "PYMIN",
                   "REL"]
GID = {c: i + 1 for i, c in enumerate(GRADE_CODES)}
AID = {c: i + 1 for i, c in enumerate(APPROVAL_CODES)}
QID = {c: i + 1 for i, c in enumerate(QUALIFIER_CODES)}

# R/downloadAquarius.R mappings (raw -> db code)
APPROVAL_MAP = {"800": "N", "900": "C", "950": "C", "975": "A",
                "1200": "A", "1300": "A"}
GRADE_MAP = {"0": "UNS", "-5": "MISS", "-3": "E", "-2": "N", "-1": "UNS",
             "5": "A", "4": "B", "3": "C", "2": "E", "10": "HD", "11": "HI",
             "12": "D", "14": "B", "15": "A", "21": "C", "30": "B", "31": "B"}
QUALIFIER_MAP = {"BKW": "BW", "DD": "DD", "DRY": "DRY", "E": "US-DISTURB",
                 "ES": "SUS", "FI": "INT", "HW-MISS": "HW-MISS",
                 "ICE": "ICE", "ICE-EST": "ICE-EST", "LW-MISS": "LW-MISS",
                 "OOW": "OOW", "PMMAX": "PMMAX", "PMMIN": "PMMIN",
                 "PYMAX": "PYMAX", "PYMIN": "PYMIN", "REL": "REL"}

OFFSET = "-07:00"
BASE_UTC = datetime(2025, 1, 10, 0, 0, 0)  # UTC range start


def aq_ts(utc: datetime) -> str:
    """Offset-stamped Aquarius timestamp string for a UTC instant."""
    local = utc - timedelta(hours=7)
    return local.strftime("%Y-%m-%dT%H:%M:%S.0000000") + OFFSET


def build_payload():
    points = []
    for i in range(97):  # 15-min cadence, 24h + 1
        utc = BASE_UTC + timedelta(minutes=15 * i)
        if i in (13, 57):  # NA values -> dropped by the connector
            points.append({"Timestamp": aq_ts(utc), "Value": {"Numeric": None}})
            continue
        v = round(10 + math.sin(i / 10.0), 3)
        points.append({"Timestamp": aq_ts(utc), "Value": {"Numeric": v}})
    # duplicate point (Aquarius "in unknown circumstances" duplication)
    points.append(dict(points[20]))

    def iv(start_min, end_min, **kw):
        d = {"StartTime": aq_ts(BASE_UTC + timedelta(minutes=start_min)),
             "EndTime": aq_ts(BASE_UTC + timedelta(minutes=end_min))}
        d.update(kw)
        return d

    payload = {
        "Points": points,
        # second approval starts BETWEEN points (367 min) -> snaps back
        # to the 360-min point and overwrites the first approval there
        "Approvals": [iv(0, 360, ApprovalLevel=900),
                      iv(367, 1440, ApprovalLevel=1200)],
        "Grades": [iv(0, 1440, GradeCode="5"),
                   iv(720, 780, GradeCode="-2"),
                   iv(1200, 1260, GradeCode="99")],  # unmapped -> UNK
        "Qualifiers": [iv(120, 180, Identifier="ICE"),
                       iv(150, 240, Identifier="ICE"),   # same level: collapse
                       iv(210, 300, Identifier="BKW"),   # overlap: append
                       iv(600, 660, Identifier="ZZZ")],  # unmapped -> UNK
    }
    return payload


def parse_aq(ts: str) -> datetime:
    # replica of the R %z reformat+parse: strip the :, parse with offset
    body, off = ts[:-6], ts[-6:]
    sign = 1 if off[0] == "+" else -1
    hh, mm = int(off[1:3]), int(off[4:6])
    body = body.split(".")[0]  # 7-digit Aquarius fraction; always .0000000
    local = datetime.strptime(body, "%Y-%m-%dT%H:%M:%S")
    return local - sign * timedelta(hours=hh, minutes=mm)


def expected(payload):
    # Points: parse, drop NA, dedupe exact rows, sort (R:135-160)
    pts = [(parse_aq(p["Timestamp"]), p["Value"]["Numeric"])
           for p in payload["Points"] if p["Value"]["Numeric"] is not None]
    seen, ts = set(), []
    for row in pts:
        if row not in seen:
            seen.add(row)
            ts.append(row)
    ts.sort(key=lambda r: r[0])
    times = [r[0] for r in ts]

    def map_intervals(raw, key, mapping, ids):
        out = []
        for r in raw:
            code = mapping.get(str(r[key]))
            level = ids[code] if code is not None else ids["UNK"]
            out.append([level, parse_aq(r["StartTime"]), parse_aq(r["EndTime"])])
        return out

    approvals = map_intervals(payload["Approvals"], "ApprovalLevel",
                              APPROVAL_MAP, AID)
    grades = map_intervals(payload["Grades"], "GradeCode", GRADE_MAP, GID)
    quals = map_intervals(payload["Qualifiers"], "Identifier",
                          QUALIFIER_MAP, QID)

    # collapse same-level overlapping qualifier intervals (R:458-483);
    # split() orders levels as CHARACTER strings
    by_level = {}
    for lvl, s, e in quals:
        by_level.setdefault(lvl, []).append([lvl, s, e])
    collapsed = []
    for lvl in sorted(by_level, key=str):
        ivs = sorted(by_level[lvl], key=lambda r: (r[1], r[2]))
        cur = ivs[0]
        for nxt in ivs[1:]:
            if nxt[1] <= cur[2]:
                if nxt[2] > cur[2]:
                    cur[2] = nxt[2]
            else:
                collapsed.append(cur)
                cur = nxt
        collapsed.append(cur)

    def snap(t):
        # R: before ts_min -> first point; exact match -> that point;
        # else findInterval (last point <= t), capped at n_ts
        if t < times[0]:
            return times[0]
        i = bisect.bisect_right(times, t) - 1
        return times[i]

    def apply_intervals(col_vals, intervals, append=False):
        for lvl, s, e in intervals:
            st, ed = snap(s), snap(e)
            for i, t in enumerate(times):
                if st <= t <= ed:
                    if append and col_vals[i] is not None:
                        col_vals[i] = f"{col_vals[i]},{lvl}"
                    else:
                        col_vals[i] = str(lvl) if append else lvl
        return col_vals

    approval = apply_intervals([None] * len(ts), approvals)
    grade = apply_intervals([None] * len(ts), grades)
    qualifier = apply_intervals([None] * len(ts), collapsed, append=True)

    rows = []
    for i, (t, v) in enumerate(ts):
        rows.append((
            t.strftime("%Y-%m-%d %H:%M:%S"), v,
            grade[i] if grade[i] is not None else GID["UNS"],
            approval[i] if approval[i] is not None else AID["UNS"],
            qualifier[i] if qualifier[i] is not None else str(QID["UNS"]),
        ))
    return rows


def main():
    payload = build_payload()
    with open(os.path.join(HERE, "aquarius_09AA-M3.json"), "w") as f:
        json.dump(payload, f, indent=1)
    rows = expected(payload)
    with open(os.path.join(HERE, "aquarius_expected.csv"), "w") as f:
        f.write("datetime,value,grade,approval,qualifier\n")
        for r in rows:
            f.write(",".join(f'"{x}"' for x in r) + "\n")
    print(f"wrote {len(rows)} expected rows")


if __name__ == "__main__":
    main()
