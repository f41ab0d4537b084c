"""Generate the canned ECCC water-quality payload + import key,
mimicking the open-data portal long-term monitoring CSV shape
(R/downloadECCCwq.R:106-115) with censoring flags and an unmapped
variable to exercise the reject path.

Run from the repo root: python fixtures/connectors/gen_ecccwq.py
"""

import csv
import os

HERE = os.path.dirname(os.path.abspath(__file__))

SITE = "YT08AA0017"
VARS = [
    # (variable, unit, values per sample with optional flag)
    ("PH", "PH UNITS", [("7.84", ""), ("7.91", ""), ("8.02", "")]),
    ("ARSENIC TOTAL", "MG/L", [("0.0005", "<"), ("0.0007", ""), ("0.0006", "")]),
    ("TURBIDITY", "NTU", [("1200", ">"), ("3.1", ""), ("2.7", "")]),
    ("MYSTERY COMPOUND", "UG/L", [("1.0", ""), ("2.0", ""), ("3.0", "")]),
    ("LEAD EXTRACTABLE", "UG/L", [("0.2", "?"), ("0.3", ""), ("0.4", "")]),
]
SAMPLES = ["2024-02-01 10:15:00", "2024-03-05 09:40:00", "2024-04-10 11:05:00"]


def payload():
    rows = []
    for si, dt in enumerate(SAMPLES):
        for vi, (var, unit, vals) in enumerate(VARS):
            v, flag = vals[si]
            rows.append([SITE, dt, flag, v, unit, var, f"S{si:03d}A{vi}"])
        # a second bottle for the same instant -> distinct sample id,
        # exercised by the comma-join in import_source_id
        rows.append([SITE, dt, "", "7.99", "PH UNITS", "PH", f"S{si:03d}B"])
    # another site, filtered out
    rows.append(["YT09ZZ0001", SAMPLES[0], "", "6.5", "PH UNITS", "PH", "X1"])
    with open(os.path.join(HERE, "ecccwq_lt.csv"), "w", newline="",
              encoding="utf-8") as fh:
        w = csv.writer(fh)
        w.writerow(["SITE_NO", "DATE_TIME_HEURE", "FLAG_MARQUEUR",
                    "VALUE_VALEUR", "UNIT_UNITE", "VARIABLE",
                    "SAMPLE_ID_ECHANTILLON"])
        w.writerows(rows)
    print("ecccwq_lt.csv", len(rows), "rows")


def key():
    rows = [
        # input_param, input_unit, parameter_id, conversion, offset,
        # result_type, sample_fraction_id, matrix_state_id
        ("PH", "PH UNITS", 101, 1.0, 0.0, 1, 19, 4),
        ("ARSENIC TOTAL", "MG/L", 205, 1000.0, 0.0, 1, 17, 4),  # mg/L -> ug/L
        ("TURBIDITY", "NTU", 310, 1.0, 0.0, 1, 19, 4),
        ("LEAD EXTRACTABLE", "UG/L", 220, 1.0, 0.0, 1, 18, 4),
        # MYSTERY COMPOUND deliberately unmapped
    ]
    with open(os.path.join(HERE, "ecccwq_key.csv"), "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["input_param", "input_unit", "parameter_id", "conversion",
                    "result_offset", "result_type", "sample_fraction_id",
                    "matrix_state_id"])
        w.writerows(rows)
    print("ecccwq_key.csv", len(rows), "rows")


if __name__ == "__main__":
    payload()
    key()
