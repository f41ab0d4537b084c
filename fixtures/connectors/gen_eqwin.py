"""Generate canned EQWin Access-export tables (stations, samples,
results-with-params pre-join, import mapping key, parameter flags)
mimicking the eqstns/eqsampls/eqdetail/eqparams shapes read by
R/downloadEQWin.R:105-160.  Deterministic; exercises every branch of
the normalization: '<'/'>' detection-limit parsing, conversion+offset,
non-numeric rejects, the SampleClass/blank-wording sample-type ladder,
unknown-time datetimes, required fraction/speciation drops, unmapped
parameters, and note collapse with duplicate wording.

Run from the repo root: python fixtures/connectors/gen_eqwin.py
"""

import csv
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def w(name, header, rows):
    with open(os.path.join(HERE, name), "w", newline="", encoding="utf-8") as fh:
        cw = csv.writer(fh)
        cw.writerow(header)
        cw.writerows(rows)
    print(name, len(rows), "rows")


# eqstns (R/downloadEQWin.R:81-96): StnType drives media/collection defaults
w("eqwin_stations.csv", ["StnId", "StnCode", "StnDesc", "StnType"], [
    [101, "(W1)", "Willow Creek at mouth", "SW"],
    [102, "(GW1)", "Willow Creek well 1", "GW"],
    [103, "(X9)", "Unused station", "SW"],
])

# eqsampls (R/downloadEQWin.R:110-124); CollectDateTime is local (MST)
# text straight out of Access.  SampleClass ladder: M routine, D
# replicate, I incident, XX unknown; blank wording in SampleNo/comments
# overrides the class (R/downloadEQWin.R:626-652).
w("eqwin_samples.csv",
  ["SampleId", "SampleNo", "StnId", "CollectDateTime", "SampleClass",
   "SampleComments"], [
    [1, "W1-2024-001", 101, "2024-06-01 10:30:00", "M", "routine monthly"],
    [2, "W1-2024-002", 101, "2024-06-01 10:45:00", "D", "duplicate of 001"],
    [3, "W1-2024-003", 101, "2024-06-15", "M", ""],  # date-only -> unknown time
    [4, "W1-2024-004", 101, "2024-07-01 00:00:00", "I", "spill response"],
    [5, "W1-2024-005", 101, "2024-07-02 09:00:00", "XX", ""],
    [6, "W1-TB-01", 101, "2024-07-03 08:00:00", "M", "Trip Blank for run 5"],
    [7, "W1-2024-006", 101, "2024-07-03 08:05:00", "M", "lab blank QC"],
    [8, "BLANK-7", 101, "2024-07-03 08:10:00", "M", "field rinse"],
    [9, "W1-2024-007", 101, "2024-07-04 12:00:00", "M",
     "W1-2024-007"],  # comment duplicates SampleNo -> note dedupe
    [10, "W1-2024-008", 101, "2024-07-05 13:00:00", "M",
     "all params unmapped"],  # every result dropped -> sample dropped
    [11, "GW1-2024-001", 102, "2024-06-20 14:00:00", "M", "well purge sample"],
])

# eqdetail INNER JOIN eqparams (R/downloadEQWin.R:129-160) pre-joined,
# one row per result.
rows = []


def r(sid, pid, res, code, qual, comment, pcode, pdesc, units):
    rows.append([sid, pid, res, code, qual, comment, pcode, pdesc, units])


for sid in (1, 2, 3, 4, 5, 6, 7, 8, 9, 11):
    # pH: plain numeric, mapped 1:1
    r(sid, 201, f"{7.0 + sid * 0.1:.1f}", "", "", "", "pH", "pH field", "pH units")
    # Zinc in ug/L with <DL rows and a conversion to mg/L
    res = "<0.5" if sid % 3 == 0 else f"{sid * 2.5:.1f}"
    r(sid, 202, res, "ICP", "ok", f"zinc run {sid}", "Zn-T", "Zinc total", "ug/L")
# extras on sample 1: above-DL, spaced prefix, non-numeric reject,
# duplicate note wording, unmapped parameter
r(1, 203, "> 1200", "TURB", "", "sensor saturated", "Turb", "Turbidity", "NTU")
r(1, 204, "n/a", "", "", "instrument failure", "DO", "Dissolved oxygen", "mg/L")
r(1, 205, "4.2", "LAB", "ok", "ok", "SO4", "Sulphate", "mg/L")
r(1, 299, "9.9", "", "", "", "Mystery", "No mapping", "?" )
# sample 10: only unmapped params -> whole sample dropped
r(10, 299, "1.0", "", "", "", "Mystery", "No mapping", "?")
r(10, 298, "2.0", "", "", "", "Riddle", "Also unmapped", "?")
# fraction-required parameter where the mapping has no fraction -> dropped
r(2, 206, "0.8", "", "", "", "Cu-D", "Copper dissolved", "ug/L")
# speciation-required parameter with mapping speciation present -> kept
r(2, 207, "12.0", "", "", "", "NO3", "Nitrate", "mg/L")

w("eqwin_results.csv",
  ["SampleId", "ParamId", "Result", "ResultCode", "ResultQuality",
   "DetailComment", "ParamCode", "ParamDesc", "Units"], rows)

# import key (discrete.import_parameter_mappings): input_param+input_unit
# -> canonical target; blank conversion -> 1, blank offset -> 0
# (R/downloadEQWin.R:687-699).
w("eqwin_mapping.csv",
  ["input_param", "input_unit", "parameter_id", "conversion",
   "result_offset", "result_type", "sample_fraction_id",
   "result_speciation_id", "matrix_state_id"], [
    ["pH", "pH units", 1001, "", "", 1, "", "", 1],
    ["Zn-T", "ug/L", 1002, "0.001", "", 1, 19, "", 1],   # ug/L -> mg/L
    ["Turb", "NTU", 1003, "", "", 1, "", "", 1],
    ["DO", "mg/L", 1004, "", "0.05", 1, "", "", 1],
    ["SO4", "mg/L", 1005, "2.0", "1.5", 1, 19, "", 1],   # affine transform
    ["Cu-D", "ug/L", 1006, "0.001", "", 1, "", "", 1],   # fraction required but absent
    ["NO3", "mg/L", 1007, "", "", 1, 19, 44, 1],
])

# public.parameters requiredness flags (R/downloadEQWin.R:711-733)
w("eqwin_parameters.csv",
  ["parameter_id", "sample_fraction", "result_speciation"], [
    [1001, "false", "false"],
    [1002, "true", "false"],
    [1003, "false", "false"],
    [1004, "false", "false"],
    [1005, "true", "false"],
    [1006, "true", "false"],   # requires fraction; mapping has none -> drop
    [1007, "true", "true"],
])
