"""Connector payload parsing against canned fixtures — the reference's
own network-free test strategy (canned payloads in
tests/testthat/test-downloadWSC.R; SWOB fixtures
tests/testthat/fixtures/swob-minute-0000.xml)."""

import pytest
from pyspark.sql import functions as F

from aquacache_spark.sources import registry
from aquacache_spark.sources.dims import (
    APPROVAL_CODES,
    QUALIFIER_CODES,
    default_type_dims,
    type_code_to_id,
)

A_ID = type_code_to_id(APPROVAL_CODES)
Q_ID = type_code_to_id(QUALIFIER_CODES)

CONTRACT = ["datetime", "value", "grade", "approval", "qualifier",
            "owner", "contributor"]


class TestWSC:
    @pytest.fixture(scope="class")
    def wsc(self, spark, repo_root):
        out = registry.get_source("downloadWSC")(
            spark, location="09EA004", parameter=47,
            start_datetime="2026-03-01 00:00:00",
            end_datetime="2026-03-03 00:00:00",
            payload_path=str(repo_root / "fixtures/connectors/wsc_09EA004.csv"),
        )
        return {str(r["datetime"]): r for r in out.collect()}, out

    def test_reference_contract_columns(self, wsc):
        # expect_named(res, c(...)) in test-downloadWSC.R
        _, out = wsc
        assert out.columns == CONTRACT

    def test_row_count_and_values(self, wsc):
        rows, _ = wsc
        assert len(rows) == 96
        # n=0: value 100 + 0 + 3.5 (n%11==0)
        assert rows["2026-03-01 00:00:00"]["value"] == pytest.approx(103.5)
        # n=7 (03:30): missing value parsed as NULL, row kept (R keeps NA)
        assert rows["2026-03-01 03:30:00"]["value"] is None

    def test_qualifier_mapping(self, wsc):
        rows, _ = wsc
        # n=0 -> code -1 -> UNS; n=1 -> 10 -> ICE; n=2 -> 20 -> EST;
        # n=4 -> 40 -> DRY; n=8 -> '' (NA) -> UNK
        assert rows["2026-03-01 00:00:00"]["qualifier"] == Q_ID["UNS"]
        assert rows["2026-03-01 00:30:00"]["qualifier"] == Q_ID["ICE"]
        assert rows["2026-03-01 01:00:00"]["qualifier"] == Q_ID["EST"]
        assert rows["2026-03-01 02:00:00"]["qualifier"] == Q_ID["DRY"]
        assert rows["2026-03-01 04:00:00"]["qualifier"] == Q_ID["UNK"]

    def test_approval_mapping_and_unmapped_literal_6(self, wsc):
        rows, _ = wsc
        # n=0 Final->A; n=2 Provisional->N; n=4 Checked->R; n=5/6 ->UNS;
        # n=7 'Mystery/Mystère' -> the reference's literal id 6
        assert rows["2026-03-01 00:00:00"]["approval"] == A_ID["A"]
        assert rows["2026-03-01 01:00:00"]["approval"] == A_ID["N"]
        assert rows["2026-03-01 02:00:00"]["approval"] == A_ID["R"]
        assert rows["2026-03-01 02:30:00"]["approval"] == A_ID["UNS"]
        assert rows["2026-03-01 03:30:00"]["approval"] == 6

    def test_grade_is_uns_and_org_stamped(self, wsc):
        rows, _ = wsc
        from aquacache_spark.sources.dims import GRADE_CODES
        g = type_code_to_id(GRADE_CODES)
        for r in rows.values():
            assert r["grade"] == g["UNS"]
            assert r["owner"] == 1 and r["contributor"] == 1

    def test_no_payload_raises_with_url(self, spark):
        with pytest.raises(NotImplementedError, match="wateroffice"):
            registry.get_source("downloadWSC")(
                spark, location="09EA004", parameter=47,
                start_datetime="2026-03-01 00:00:00",
                end_datetime="2026-03-03 00:00:00",
            )


class TestNWIS:
    @pytest.fixture(scope="class")
    def nwis(self, spark, repo_root):
        out = registry.get_source("downloadNWIS")(
            spark, location="09380000", parameter="00060",
            start_datetime="2026-03-01 00:00:00",
            end_datetime="2026-03-03 00:00:00",
            payload_path=str(
                repo_root / "fixtures/connectors/nwis_09380000.rdb"
            ),
        )
        return {str(r["datetime"]): r for r in out.collect()}, out

    def test_na_values_dropped(self, nwis):
        rows, _ = nwis
        assert len(rows) == 91  # 96 - 5 missing (i % 19 == 5)
        assert "2026-03-01 02:30:00" not in rows  # i=5 missing

    def test_flow_conversion_cfs_to_cms(self, nwis):
        rows, _ = nwis
        assert rows["2026-03-01 00:00:00"]["value"] == \
            pytest.approx(12000 * 0.028316832)

    def test_approval_extraction(self, nwis):
        rows, _ = nwis
        # i=0 'A'->A; i=1 'P'->N; i=8 'R'->A; i=9 'e' (no APR lead)->UNK
        assert rows["2026-03-01 00:00:00"]["approval"] == A_ID["A"]
        assert rows["2026-03-01 00:30:00"]["approval"] == A_ID["N"]
        assert rows["2026-03-01 04:00:00"]["approval"] == A_ID["A"]
        assert rows["2026-03-01 04:30:00"]["approval"] == A_ID["UNK"]

    def test_qualifier_extraction(self, nwis):
        rows, _ = nwis
        # i=0 'A' -> rest '' -> 'U' -> UNK; i=2 'A e' -> EST;
        # i=4 'A ice' -> ICE; i=5 missing; 'P Ice i' at i=5 dropped, but
        # i=16 'P Ice i' -> ICE; i=6 'A <' -> EST; i=10 'A [4]' -> UNK
        assert rows["2026-03-01 00:00:00"]["qualifier"] == Q_ID["UNK"]
        assert rows["2026-03-01 01:00:00"]["qualifier"] == Q_ID["EST"]
        assert rows["2026-03-01 02:00:00"]["qualifier"] == Q_ID["ICE"]
        assert rows["2026-03-01 08:00:00"]["qualifier"] == Q_ID["ICE"]
        assert rows["2026-03-01 03:00:00"]["qualifier"] == Q_ID["EST"]
        assert rows["2026-03-01 05:00:00"]["qualifier"] == Q_ID["UNK"]

    def test_temperature_and_level_conversions(self, spark):
        from aquacache_spark.sources.nwis import convert_nwis_units

        df = spark.createDataFrame([(212.0,)], ["v"])
        got = df.select(
            convert_nwis_units(F.col("v"), "00011").alias("c"),
            convert_nwis_units(F.col("v"), "00065").alias("m"),
            convert_nwis_units(F.col("v"), "99999").alias("raw"),
        ).first()
        assert got["c"] == pytest.approx(100.0)
        assert got["m"] == pytest.approx(212.0 * 0.3048)
        assert got["raw"] == 212.0


class TestSWOBMinute:
    @pytest.fixture(scope="class")
    def swob(self, spark, repo_root):
        out = registry.get_source("downloadECCCwxMinute")(
            spark, location="CVXY", parameter="temp",  # alias -> air_temp
            start_datetime="2026-03-15 00:00:00",
            end_datetime="2026-03-15 00:10:00",
            path=str(repo_root / "fixtures/connectors/swob"),
        )
        return {str(r["datetime"]): r for r in out.collect()}, out

    def test_contract_columns(self, swob):
        _, out = swob
        assert out.columns == CONTRACT

    def test_window_filter_and_alias(self, swob):
        rows, _ = swob
        # minutes 0..10 inclusive; minute 11 excluded by end bound
        assert len(rows) == 11
        assert rows["2026-03-15 00:01:00"]["value"] == pytest.approx(1.1)

    def test_dedupe_keeps_last_occurrence(self, swob):
        rows, _ = swob
        # minute 0 re-observed in the later file with 9.9 — fromLast=TRUE
        assert rows["2026-03-15 00:00:00"]["value"] == pytest.approx(9.9)

    def test_defaults_stamped(self, swob):
        rows, _ = swob
        r = rows["2026-03-15 00:05:00"]
        assert r["grade"] == type_code_to_id(
            __import__("aquacache_spark.sources.dims",
                       fromlist=["GRADE_CODES"]).GRADE_CODES)["UNS"]
        assert r["approval"] == A_ID["UNS"]
        assert r["qualifier"] == Q_ID["UNS"]
        assert r["owner"] == 2 and r["contributor"] == 2

    def test_dispatch_contract(self, spark, repo_root):
        out = registry.dispatch(
            spark, "downloadECCCwxMinute",
            {"location": "CVXY", "parameter": "stn_press",
             "start_datetime": "2026-03-15 00:00:00",
             "end_datetime": "2026-03-15 23:59:59",
             "path": str(repo_root / "fixtures/connectors/swob")},
        )
        vals = [r["value"] for r in out.orderBy("datetime").collect()]
        assert len(vals) == 12
        assert vals[0] == pytest.approx(915.0)


class TestAquarius:
    @pytest.fixture(scope="class")
    def aq(self, spark, repo_root):
        out = registry.get_source("downloadAquarius")(
            spark, location="09AA-M3", parameter="Wind Gust Vel.Corrected",
            start_datetime="2025-01-10 00:00:00",
            end_datetime="2025-01-11 00:00:00",
            payload_path=str(
                repo_root / "fixtures/connectors/aquarius_09AA-M3.json"
            ),
        )
        rows = {str(r["datetime"]): r for r in out.collect()}
        return rows, out

    def test_na_and_duplicates_dropped(self, aq):
        rows, _ = aq
        assert len(rows) == 95  # 97 points - 2 NA; duplicate collapsed

    def test_boundary_snapping_extends_backwards(self, aq):
        rows, _ = aq
        # the 1200->A approval starts at 06:07:30, BETWEEN points; the
        # reference snaps it back to the 06:00 point (findInterval)
        assert rows["2025-01-10 06:00:00"]["approval"] == A_ID["A"]
        assert rows["2025-01-10 05:45:00"]["approval"] == A_ID["C"]

    def test_qualifier_collapse_and_append(self, aq):
        rows, _ = aq
        ice = str(Q_ID["ICE"])
        bw = str(Q_ID["BW"])
        # two overlapping ICE intervals collapsed into [02:00, 04:00]
        assert rows["2025-01-10 02:45:00"]["qualifier"] == ice
        # BKW overlap appends in character-sorted level order
        assert rows["2025-01-10 03:45:00"]["qualifier"] == f"{ice},{bw}"
        assert rows["2025-01-10 04:15:00"]["qualifier"] == bw

    def test_unmapped_codes_fall_to_unk(self, aq):
        rows, _ = aq
        from aquacache_spark.sources.dims import GRADE_CODES
        G_ID = type_code_to_id(GRADE_CODES)
        assert rows["2025-01-10 20:30:00"]["grade"] == G_ID["UNK"]
        assert rows["2025-01-10 10:00:00"]["qualifier"] == str(Q_ID["UNK"])

    def test_difference_mode_runs_increments(self, spark, repo_root):
        out = registry.get_source("downloadAquarius")(
            spark, location="09AA-M3", parameter="x",
            start_datetime="2025-01-10 06:00:00",
            end_datetime="2025-01-11 00:00:00",
            payload_path=str(
                repo_root / "fixtures/connectors/aquarius_09AA-M3.json"
            ),
            difference=True, reset_drop=20.0, min_pos=0.0,
        ).orderBy("datetime").collect()
        # trimmed back to the requested start; values are increments
        assert str(out[0]["datetime"]) >= "2025-01-10 06:00:00"
        # monotone sine segment: increment == value step (positive part)
        assert all(r["value"] is not None for r in out)

    def test_empty_interval_lists_fall_back_to_uns(self, spark, tmp_path):
        import json

        payload = {
            "Points": [
                {"Timestamp": "2025-01-10T00:00:00.0000000-00:00",
                 "Value": {"Numeric": 1.0}},
                {"Timestamp": "2025-01-10T01:00:00.0000000-00:00",
                 "Value": {"Numeric": 2.0}},
            ],
            "Approvals": [], "Grades": [], "Qualifiers": [],
        }
        p = tmp_path / "aq_empty.json"
        p.write_text(json.dumps(payload))
        out = registry.get_source("downloadAquarius")(
            spark, location="x", parameter="y",
            start_datetime="2025-01-10 00:00:00",
            end_datetime="2025-01-11 00:00:00", payload_path=str(p),
        ).collect()
        from aquacache_spark.sources.dims import GRADE_CODES
        G_ID = type_code_to_id(GRADE_CODES)
        assert all(r["grade"] == G_ID["UNS"] for r in out)
        assert all(r["approval"] == A_ID["UNS"] for r in out)
        assert all(r["qualifier"] == str(Q_ID["UNS"]) for r in out)


class TestECCCwx:
    def test_daily_table_stamps_6utc_next_day(self, spark, repo_root):
        out = registry.get_source("downloadECCCwx")(
            spark, location="50430", parameter="mean_temp",
            start_datetime="2024-03-01 00:00:00",
            end_datetime="2024-03-15 00:00:00", interval="day",
            payload_path=str(
                repo_root / "fixtures/connectors/ecccwx_daily_50430.csv"
            ),
        ).orderBy("datetime").collect()
        # date + 30h: values for Mar 1 land at Mar 2 06:00 UTC
        assert str(out[0]["datetime"]) == "2024-03-02 06:00:00"
        assert out[0]["value"] == pytest.approx(-4.0)

    def test_na_parameter_rows_dropped(self, spark, repo_root):
        out = registry.get_source("downloadECCCwx")(
            spark, location="50430", parameter="total_precip",
            start_datetime="2024-03-01 00:00:00",
            end_datetime="2024-03-15 00:00:00", interval="day",
            payload_path=str(
                repo_root / "fixtures/connectors/ecccwx_daily_50430.csv"
            ),
        ).collect()
        assert len(out) == 9  # day index 4 has an empty value

    def test_missing_parameter_errors(self, spark, repo_root):
        with pytest.raises(ValueError, match="not available"):
            registry.get_source("downloadECCCwx")(
                spark, location="50430", parameter="nope",
                start_datetime="2024-03-01 00:00:00",
                end_datetime="2024-03-15 00:00:00",
                payload_path=str(
                    repo_root / "fixtures/connectors/ecccwx_daily_50430.csv"
                ),
            )

    def test_date_only_end_extends_to_end_of_day(self, spark, repo_root):
        out = registry.get_source("downloadECCCwx")(
            spark, location="50430", parameter="temp",
            start_datetime="2024-03-01 00:00:00",
            end_datetime="2024-03-02", interval="hour",
            payload_path=str(
                repo_root / "fixtures/connectors/ecccwx_hourly_50430.csv"
            ),
        ).agg(F.max("datetime").alias("m")).collect()
        assert str(out[0]["m"]) == "2024-03-02 23:00:00"


class TestAquariusBatch:
    def test_batch_matches_per_payload_runs_and_never_single_partitions(
        self, spark, repo_root, tmp_path
    ):
        """A batch of payloads normalizes in ONE pass with per-payload
        windows — results identical to per-payload runs, and the plan
        has no single-partition global sort (VERDICT r2 finding on the
        qualifier-collapse window)."""
        import shutil

        from aquacache_spark.sources.aquarius import (
            normalize_aquarius, normalize_aquarius_batch,
        )

        fix = repo_root / "fixtures/connectors/aquarius_09AA-M3.json"
        a, b = tmp_path / "pay_a.json", tmp_path / "pay_b.json"
        shutil.copy(fix, a)
        shutil.copy(fix, b)

        batch = normalize_aquarius_batch(spark, [str(a), str(b)])
        p = batch._sc._jvm.PythonSQLUtils.explainString(
            batch._jdf.queryExecution(), "formatted"
        )
        assert "SinglePartition" not in p

        rows = batch.collect()
        per_payload = {}
        for r in rows:
            per_payload.setdefault(r["payload"].split("/")[-1], []).append(
                (str(r["datetime"]), r["value"], r["grade"], r["approval"],
                 r["qualifier"])
            )
        assert set(per_payload) == {"pay_a.json", "pay_b.json"}
        single = sorted(
            (str(r["datetime"]), r["value"], r["grade"], r["approval"],
             r["qualifier"])
            for r in normalize_aquarius(spark, str(a)).collect()
        )
        assert sorted(per_payload["pay_a.json"]) == single
        assert sorted(per_payload["pay_b.json"]) == single
