"""Closed-form tests for the non-interactive imputeMissing pipeline
(operators/impute_pipeline.py): candidate discovery radius/parameter/
record-rate gates, exact offset recovery from a shifted donor, and
gap-bound enforcement in the fill."""

import pytest
from pyspark.sql import functions as F

from aquacache_spark.operators.impute_pipeline import (
    donor_candidates,
    impute_from_donor,
    impute_from_donors,
    score_donors,
)


@pytest.fixture()
def catalog(spark):
    timeseries = spark.createDataFrame(
        [
            (1, 10, "level", 900),    # target
            (2, 11, "level", 900),    # good donor, ~19 km away
            (3, 12, "level", 900),    # outside radius
            (4, 11, "temp", 900),     # wrong parameter
            (5, 11, "level", 3600),   # too-coarse record rate
            (6, 11, "flow", 900),     # extra_params candidate
        ],
        ["timeseries_id", "location_id", "parameter", "record_rate_seconds"],
    )
    locations = spark.createDataFrame(
        [(10, 60.0, -135.0), (11, 60.1, -135.2), (12, 62.0, -140.0)],
        ["location_id", "lat", "lon"],
    )
    return timeseries, locations


def test_candidate_gates(spark, catalog):
    timeseries, locations = catalog
    got = donor_candidates(timeseries, locations, target_tsid=1, radius_km=50.0)
    ids = [r["timeseries_id"] for r in got.collect()]
    assert ids == [2]  # 3 too far, 4 wrong param, 5 too coarse, 6 not requested
    with_extra = donor_candidates(
        timeseries, locations, target_tsid=1, radius_km=50.0,
        extra_params=["flow"],
    )
    assert [r["timeseries_id"] for r in with_extra.collect()] == [2, 6]
    d = got.collect()[0]["distance_km"]
    assert 10 < d < 30  # ~0.1 deg lat + 0.2 deg lon at 60N


def _measurements(spark):
    # target ts1: value = bin index; donor ts2 = target + 2.5 exactly,
    # present everywhere; target missing bins 4..5 (gap of 2) and 8 (gap of 1)
    rows = []
    for i in range(12):
        ts = f"2024-01-01 {i:02d}:00:00"
        if i not in (4, 5, 8):
            rows.append((1, ts, float(i)))
        rows.append((2, ts, float(i) + 2.5))
    return spark.createDataFrame(
        rows, ["timeseries_id", "datetime", "value"]
    ).withColumn("datetime", F.col("datetime").cast("timestamp"))


def test_offset_scoring_exact(spark, catalog):
    timeseries, locations = catalog
    meas = _measurements(spark)
    cands = donor_candidates(timeseries, locations, 1, 50.0)
    scored = score_donors(meas, cands, target_tsid=1, rate_seconds=3600).collect()
    assert len(scored) == 1
    assert scored[0]["timeseries_id"] == 2
    assert scored[0]["avg_offset"] == pytest.approx(2.5)
    assert scored[0]["sd_on_offset"] == pytest.approx(0.0)
    assert scored[0]["overlap_points"] == 9


def test_fill_with_gap_bounds(spark, catalog):
    # Feed score_donors output straight into impute_from_donor: the scored
    # avg_offset (donor - target = +2.5) must be SUBTRACTED by the fill
    # (imputeMissing.R:1106-1107), recovering the target exactly.
    timeseries, locations = catalog
    meas = _measurements(spark)
    cands = donor_candidates(timeseries, locations, 1, 50.0)
    best = score_donors(meas, cands, target_tsid=1, rate_seconds=3600).first()
    assert best["avg_offset"] == pytest.approx(2.5)
    out = impute_from_donor(
        meas, target_tsid=1, donor_tsid=best["timeseries_id"],
        avg_offset=best["avg_offset"],
        rate_seconds=3600, min_gap=2,
    )
    rows = {str(r["bin_start"]): r for r in out.collect()}
    assert len(rows) == 12  # dense spine
    # the 2-long gap is filled with donor - 2.5 == truth
    assert rows["2024-01-01 04:00:00"]["value"] == 4.0
    assert rows["2024-01-01 04:00:00"]["imputed"] is True
    assert rows["2024-01-01 05:00:00"]["value"] == 5.0
    # the 1-long gap is below min_gap -> left NULL
    assert rows["2024-01-01 08:00:00"]["value"] is None
    assert rows["2024-01-01 08:00:00"]["imputed"] is False
    # present values pass through unimputed
    assert rows["2024-01-01 03:00:00"]["value"] == 3.0
    assert rows["2024-01-01 03:00:00"]["imputed"] is False

    capped = impute_from_donor(
        meas, target_tsid=1, donor_tsid=2, avg_offset=2.5,
        rate_seconds=3600, min_gap=1, max_gap=1,
    )
    crows = {str(r["bin_start"]): r for r in capped.collect()}
    assert crows["2024-01-01 08:00:00"]["value"] == 8.0   # short gap filled
    assert crows["2024-01-01 04:00:00"]["value"] is None  # long gap skipped


def test_multi_target_one_pass(spark):
    # Two targets, each with its own donor+offset, filled in one call.
    # ts1 gap at bins 4..5 (donor ts2 = target + 2.5); ts3 gap at bin 2
    # (donor ts4 = target - 1.0). Windows are partitioned per target.
    rows = []
    for i in range(8):
        ts = f"2024-01-01 {i:02d}:00:00"
        if i not in (4, 5):
            rows.append((1, ts, float(i)))
        rows.append((2, ts, float(i) + 2.5))
        if i != 2:
            rows.append((3, ts, 10.0 * i))
        rows.append((4, ts, 10.0 * i - 1.0))
    meas = spark.createDataFrame(
        rows, ["timeseries_id", "datetime", "value"]
    ).withColumn("datetime", F.col("datetime").cast("timestamp"))
    assignments = spark.createDataFrame(
        [(1, 2, 2.5), (3, 4, -1.0)],
        ["target_tsid", "donor_tsid", "avg_offset"],
    )
    out = impute_from_donors(meas, assignments, rate_seconds=3600, min_gap=1)
    got = {(r["target_tsid"], str(r["bin_start"])): r for r in out.collect()}
    assert len(got) == 16  # two 8-bin dense spines
    assert got[(1, "2024-01-01 04:00:00")]["value"] == 4.0
    assert got[(1, "2024-01-01 04:00:00")]["imputed"] is True
    assert got[(1, "2024-01-01 05:00:00")]["value"] == 5.0
    assert got[(3, "2024-01-01 02:00:00")]["value"] == 20.0
    assert got[(3, "2024-01-01 02:00:00")]["imputed"] is True
    assert got[(3, "2024-01-01 03:00:00")]["value"] == 30.0
    assert got[(3, "2024-01-01 03:00:00")]["imputed"] is False
