"""ECCC water-quality connector + snow-course survey connector."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from aquacache_spark.sources.ecccwq import download_ecccwq, read_ecccwq_csv
from aquacache_spark.sources.snowcourse import (
    station_move_adjust,
    survey_means,
)


@pytest.fixture(scope="module")
def wq_key(spark, repo_root):
    return spark.read.option("header", True).option("inferSchema", True).csv(
        str(repo_root / "fixtures/connectors/ecccwq_key.csv")
    )


def _run(spark, repo_root, key, tz="MST"):
    return download_ecccwq(
        spark, "YT08AA0017", key,
        "2024-01-01 00:00:00", "2024-12-31 23:59:59", tz=tz,
        payload_path=str(repo_root / "fixtures/connectors/ecccwq_lt.csv"),
    )


def test_ecccwq_samples_and_tz(spark, repo_root, wq_key):
    out = _run(spark, repo_root, wq_key)
    samples = {r.datetime: r.import_source_id
               for r in out["samples"].collect()}
    # MST (-7) local 10:15 -> 17:15 UTC
    key0 = dt.datetime(2024, 2, 1, 17, 15)
    assert key0 in samples
    assert samples[key0] == "S000A0,S000A1,S000A2,S000A3,S000A4,S000B"
    assert len(samples) == 3


def test_ecccwq_results_censoring_and_conversion(spark, repo_root, wq_key):
    out = _run(spark, repo_root, wq_key)
    res = out["results"].collect()
    by_param = {}
    for r in res:
        by_param.setdefault(r.parameter_id, []).append(r)
    # arsenic mg/L -> ug/L (x1000); first sample censored '<'
    ars = sorted(by_param[205], key=lambda r: r.datetime)
    assert ars[0].result is None
    assert ars[0].result_condition == 1
    assert ars[0].result_condition_value == pytest.approx(0.5)
    assert ars[1].result == pytest.approx(0.7)
    # turbidity '>' censored above detection
    turb = sorted(by_param[310], key=lambda r: r.datetime)
    assert turb[0].result is None and turb[0].result_condition == 2
    assert turb[0].result_condition_value == pytest.approx(1200.0)
    # unmapped variable + bad flag end up in rejects, not results
    assert 220 in by_param and len(by_param[220]) == 2  # '?' row skipped
    reasons = {(r.input_param, r.reject_reason)
               for r in out["rejects"].collect()}
    assert ("MYSTERY COMPOUND", "no mapping") in reasons
    assert ("LEAD EXTRACTABLE", "unrecognized flag") in reasons


def test_ecccwq_guards(spark, repo_root, wq_key):
    with pytest.raises(NotImplementedError):
        download_ecccwq(spark, "X", wq_key, "2024-01-01", "2024-01-02")
    with pytest.raises(ValueError, match="unknown tz"):
        read_ecccwq_csv(
            spark, str(repo_root / "fixtures/connectors/ecccwq_lt.csv"),
            "Mars/Olympus",
        )


def _meas(spark, rows):
    return spark.createDataFrame(
        rows, "location string, survey_id int, survey_date date, "
              "target_date date, swe double, depth double, exclude_flag boolean")


def test_survey_means_unpivot_and_shift(spark):
    d = dt.date(2024, 3, 1)
    m = _meas(spark, [
        ("L1", 1, d, d, 100.0, 80.0, False),
        ("L1", 1, d, d, 110.0, None, False),
        ("L1", 1, d, d, 900.0, 900.0, True),   # excluded
        ("L1", 2, d, d, None, None, False),    # dropped by null filter
    ])
    out = {r.parameter: r for r in survey_means(m).collect()}
    assert out["swe"].result == pytest.approx(105.0)
    assert out["depth"].result == pytest.approx(80.0)
    # 19 h shift: noon MST in UTC
    assert out["swe"].datetime == dt.datetime(2024, 3, 1, 19, 0, 0)


def test_station_move_adjust_ratio(spark):
    def mk(loc, rows):
        return spark.createDataFrame(
            [(loc, p, dt.datetime(2024, 3, d, 19), v) for p, d, v in rows],
            "location string, parameter string, datetime timestamp, "
            "result double",
        )
    old = mk("OLD", [("swe", 1, 100.0), ("swe", 2, 110.0), ("swe", 3, 90.0),
                     ("depth", 1, 50.0), ("depth", 2, 55.0)])
    new = mk("NEW", [("swe", 2, 220.0), ("swe", 3, 180.0), ("swe", 4, 200.0),
                     ("depth", 2, 110.0)])
    out = station_move_adjust(old, new)
    rows = {(r.parameter, r.datetime.day): (r.result, r.adjusted)
            for r in out.collect()}
    # offset_swe = mean(new on {2,3}) / mean(old on {2,3}) = 200/100 = 2
    assert rows[("swe", 1)] == (pytest.approx(200.0), True)
    # overlapping old days dropped; new rows pass through unscaled
    assert rows[("swe", 2)] == (pytest.approx(220.0), False)
    assert rows[("swe", 4)] == (pytest.approx(200.0), False)
    # offset_depth = 110/55 = 2 applied to old day 1
    assert rows[("depth", 1)] == (pytest.approx(100.0), True)
    assert ("depth", 2) in rows and rows[("depth", 2)][1] is False


def test_hydat_version_check():
    import warnings as W

    from aquacache_spark.sources.hydat import (
        hydat_version_check,
        update_hydat_datums,
    )

    # same version -> no-op, no fetch needed
    r = hydat_version_check("2024-06-17", "20240617")
    assert r == {"updated": False, "new_hydat": False, "version": "20240617"}
    # newer remote -> fetch, verified by reading the version back
    r = hydat_version_check("2024-01-01", "20240617",
                            fetcher=lambda: "2024-06-17")
    assert r["updated"] and r["new_hydat"]
    # silent download failure detected by re-check
    with W.catch_warnings(record=True) as w:
        W.simplefilter("always")
        r = hydat_version_check("2024-01-01", "20240617",
                                fetcher=lambda: "2024-01-01")
        assert not r["updated"] and any("Failed" in str(x.message) for x in w)
    # no local copy and no fetcher -> explicit stub error
    import pytest as _pt
    with _pt.raises(NotImplementedError):
        hydat_version_check(None, "20240617")
    with W.catch_warnings(record=True) as w:
        W.simplefilter("always")
        update_hydat_datums()
        assert any("not implemented" in str(x.message) for x in w)
