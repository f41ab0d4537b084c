"""Import-mapping resolution kernel (sources/import_mappings.py) vs
the reference's documented selection rules
(R/import_mappings.R:1266-1315)."""

from aquacache_spark.sources.import_mappings import resolve_mappings

SCHEMA = ("import_mapping_id int, priority int, active boolean,"
          " source_match map<string,string>, parameter_id int")


def _resolve(spark, records_rows, mapping_rows):
    records = spark.createDataFrame(
        records_rows, "record_id int, brand string, size string")
    mappings = spark.createDataFrame(mapping_rows, SCHEMA)
    out = resolve_mappings(records, mappings)
    return {r["record_id"]: r for r in out.collect()}


def test_specificity_beats_single_criterion(spark):
    by = _resolve(
        spark,
        [(1, "B1", "7"), (2, "B1", "9")],
        [(1, 1, True, {"brand": "B1"}, 101),
         (2, 1, True, {"brand": "B1", "size": "7"}, 102)],
    )
    assert by[1]["parameter_id"] == 102  # 2 criteria beat 1 at equal priority
    assert by[2]["parameter_id"] == 101


def test_priority_beats_specificity(spark):
    by = _resolve(
        spark,
        [(1, "B1", "7")],
        [(1, 0, True, {"size": "7"}, 103),
         (2, 1, True, {"brand": "B1", "size": "7"}, 102)],
    )
    # priority sorts first (:1298-1303): the less specific priority-0
    # rule wins over the 2-criterion priority-1 rule
    assert by[1]["parameter_id"] == 103


def test_tie_is_ambiguous(spark):
    by = _resolve(
        spark,
        [(1, "B2", "5")],
        [(4, 1, True, {"brand": "B2"}, 104),
         (5, 1, True, {"brand": "B2"}, 105)],
    )
    r = by[1]
    assert r["status"] == "ambiguous"
    assert r["import_mapping_id"] is None and r["parameter_id"] is None


def test_id_breaks_tie_only_below_top(spark):
    # a strictly better (priority, size) on top of a tied pair is fine
    by = _resolve(
        spark,
        [(1, "B2", "5")],
        [(4, 1, True, {"brand": "B2"}, 104),
         (5, 1, True, {"brand": "B2"}, 105),
         (6, 0, True, {"brand": "B2"}, 106)],
    )
    assert by[1]["status"] == "matched" and by[1]["parameter_id"] == 106


def test_inactive_ignored(spark):
    by = _resolve(
        spark,
        [(1, "B3", "1")],
        [(7, 1, False, {"brand": "B3"}, 107)],
    )
    assert by[1]["status"] == "unmapped"


def test_unknown_criterion_key_never_matches(spark):
    by = _resolve(
        spark,
        [(1, "B1", "1")],
        [(8, 1, True, {"no_such_key": "B1"}, 108),
         (9, 2, True, {"brand": "B1"}, 109)],
    )
    assert by[1]["parameter_id"] == 109


def test_empty_criterion_matches_null_field(spark):
    # record-side NULL coerces to '' before comparison (:1267-1272)
    by = _resolve(
        spark,
        [(1, "B1", None)],
        [(1, 1, True, {"brand": "B1", "size": ""}, 110)],
    )
    assert by[1]["status"] == "matched" and by[1]["parameter_id"] == 110


def test_no_match_is_unmapped(spark):
    by = _resolve(
        spark,
        [(1, "ZZZ", "0")],
        [(1, 1, True, {"brand": "B1"}, 101)],
    )
    r = by[1]
    assert r["status"] == "unmapped"
    assert r["import_mapping_id"] is None and r["parameter_id"] is None
