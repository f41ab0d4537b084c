"""downloadEQWin normalization kernels (sources/eqwin.py) against the
reference's documented behavior (R/downloadEQWin.R:43-742)."""

import pathlib

from pyspark.sql import functions as F

from aquacache_spark.sources import eqwin

FIX = pathlib.Path(__file__).resolve().parent.parent / "fixtures" / "connectors"

TYPES = {"sample-routine": 1, "QC-sample-field replicate": 3,
         "QC-sample-field blank": 4, "QC-sample-trip blank": 5,
         "QC-sample-lab blank": 6, "sample-other": 7, "unknown": 8}
MEDIA = {"surface water": 1, "groundwater": 2}
COLLECT = {"Water Bottle (direct fill)": 27, "Pump": 14}


def _normalized(spark):
    def csv(name):
        return spark.read.csv(str(FIX / name), header=True)

    return eqwin.normalize_eqwin(
        stations=csv("eqwin_stations.csv"),
        samples=csv("eqwin_samples.csv"),
        results=csv("eqwin_results.csv"),
        mapping=csv("eqwin_mapping.csv"),
        parameters=csv("eqwin_parameters.csv"),
        type_ids=eqwin.resolve_type_ids(TYPES),
        media_ids=MEDIA,
        collection_ids=COLLECT,
    )


class TestResolveTypeIds:
    def test_replicate_prefers_qc_sample_other(self):
        ids = eqwin.resolve_type_ids({**TYPES, "QC-sample-other": 9})
        assert ids["replicate"] == 9

    def test_replicate_falls_back(self):
        assert eqwin.resolve_type_ids(TYPES)["replicate"] == 3

    def test_missing_label_is_none(self):
        few = {"sample-routine": 1}
        ids = eqwin.resolve_type_ids(few)
        assert ids["trip_blank"] is None and ids["routine"] == 1


class TestSampleLadder:
    def rows(self, spark):
        samp, _ = _normalized(spark)
        return {r["import_source_id"]: r for r in samp.collect()}

    def test_ladder(self, spark):
        by = self.rows(spark)
        assert by["EQWin-1"]["sample_type"] == 1     # M routine
        assert by["EQWin-2"]["sample_type"] == 3     # D -> replicate fallback
        assert by["EQWin-4"]["sample_type"] == 7     # I -> sample-other
        assert by["EQWin-5"]["sample_type"] == 8     # XX -> unknown
        assert by["EQWin-6"]["sample_type"] == 5     # 'Trip Blank' wording
        assert by["EQWin-7"]["sample_type"] == 6     # 'lab blank' wording
        assert by["EQWin-8"]["sample_type"] == 4     # bare 'BLANK' in SampleNo

    def test_blank_wording_overrides_class(self, spark):
        # sample 6 is class M but wording wins (R:626-652 checks text first)
        assert self.rows(spark)["EQWin-6"]["sample_type"] == 5

    def test_resultless_sample_dropped(self, spark):
        assert "EQWin-10" not in self.rows(spark)

    def test_station_defaults(self, spark):
        by = self.rows(spark)
        assert (by["EQWin-1"]["media_id"], by["EQWin-1"]["collection_method"]) == (1, 27)
        assert (by["EQWin-11"]["media_id"], by["EQWin-11"]["collection_method"]) == (2, 14)

    def test_datetime_unknown_time(self, spark):
        by = self.rows(spark)
        # date-only + exact-midnight both get 12:00 local = 19:00 UTC (MST)
        assert str(by["EQWin-3"]["datetime"]) == "2024-06-15 19:00:00"
        assert str(by["EQWin-4"]["datetime"]) == "2024-07-01 19:00:00"
        # a real time is just shifted
        assert str(by["EQWin-1"]["datetime"]) == "2024-06-01 17:30:00"

    def test_note_dedupes_sample_no(self, spark):
        note = self.rows(spark)["EQWin-9"]["note"]
        assert note == "W1-2024-007; EQWin SampleClass: M"


class TestResultParsing:
    def rows(self, spark):
        _, res = _normalized(spark)
        return res.collect()

    def test_below_detection(self, spark):
        rows = [r for r in self.rows(spark)
                if r["sample_key"] == 3 and r["parameter_id"] == 1002]
        (r,) = rows
        assert r["result"] is None
        assert r["result_condition"] == eqwin.BELOW_DETECTION_ID
        assert abs(r["result_condition_value"] - 0.0005) < 1e-12  # 0.5 ug/L -> mg/L

    def test_above_detection_with_space(self, spark):
        rows = [r for r in self.rows(spark) if r["parameter_id"] == 1003]
        (r,) = rows
        assert r["result_condition"] == eqwin.ABOVE_DETECTION_ID
        assert r["result_condition_value"] == 1200.0

    def test_affine_transform(self, spark):
        rows = [r for r in self.rows(spark) if r["parameter_id"] == 1005]
        (r,) = rows
        assert abs(r["result"] - (4.2 * 2.0 + 1.5)) < 1e-12

    def test_nonnumeric_dropped(self, spark):
        assert not [r for r in self.rows(spark) if r["parameter_id"] == 1004]

    def test_unmapped_dropped(self, spark):
        assert not [r for r in self.rows(spark)
                    if r["parameter_id"] in (None, 299, 298)]

    def test_required_fraction_dropped(self, spark):
        # Cu-D (1006) requires a fraction; the mapping carries none
        assert not [r for r in self.rows(spark) if r["parameter_id"] == 1006]

    def test_speciation_satisfied_kept(self, spark):
        rows = [r for r in self.rows(spark) if r["parameter_id"] == 1007]
        (r,) = rows
        assert r["result_speciation_id"] == 44 and r["result"] == 12.0

    def test_result_note_collapse(self, spark):
        rows = [r for r in self.rows(spark)
                if r["sample_key"] == 1 and r["parameter_id"] == 1005]
        (r,) = rows
        # 'LAB; ok' -- 'ok' duplicated across quality+comment collapses
        assert r["note"] == "LAB; ok"


class TestCollapseNote:
    def test_all_empty_is_null(self, spark):
        df = spark.range(1).select(
            eqwin.collapse_note(F.lit(""), F.lit(None), F.lit("  ")).alias("n")
        )
        assert df.first()["n"] is None

    def test_order_preserved(self, spark):
        df = spark.range(1).select(
            eqwin.collapse_note(
                F.lit("b"), F.lit("a"), F.lit("b"), F.lit("c")
            ).alias("n")
        )
        assert df.first()["n"] == "b; a; c"


def test_collect_datetime_named_zone_dst(spark):
    """tz= applies real DST arithmetic: America/Vancouver is UTC-8 in
    winter, UTC-7 in summer; the fixed-offset default stays UTC-7
    year-round (MST)."""
    from aquacache_spark.sources.eqwin import collect_datetime_to_utc
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("2024-01-15 10:00:00",), ("2024-07-15 10:00:00",),
         ("2024-07-15",)],
        "dt string",
    ).select(
        collect_datetime_to_utc(
            F.col("dt"), tz="America/Vancouver").alias("named"),
        collect_datetime_to_utc(F.col("dt")).alias("fixed"),
    )
    rows = [(str(r["named"]), str(r["fixed"])) for r in df.collect()]
    assert rows[0] == ("2024-01-15 18:00:00", "2024-01-15 17:00:00")  # PST
    assert rows[1] == ("2024-07-15 17:00:00", "2024-07-15 17:00:00")  # PDT
    # date-only -> unknown_time_local 12:00 local, then zone conversion
    assert rows[2] == ("2024-07-15 19:00:00", "2024-07-15 19:00:00")
