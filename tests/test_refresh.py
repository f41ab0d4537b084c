"""refresh_calculated_daily composition: stage-order and skip-guard
semantics that the oracle query can't isolate on its own.

The key ordering property (patch_48.R:604-702): Feb-29 smoothing runs
BEFORE the tail trim, so a trailing (past-last-measurement) Mar-1 spine
row can still serve as the leap day's `a` neighbor even though the trim
deletes it from the output.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from aquacache_spark.operators.refresh import (
    feb29_smooth_ref,
    refresh_calculated_daily,
    stats_ladder,
)


def _raw(spark):
    rows = []
    # series A: history around the 1995 leap window + a tail ending ON
    # Feb 29 1996 (so Mar 1 1996 exists only as a trailing spine row)
    d = datetime.date(1995, 2, 26)
    while d <= datetime.date(1995, 3, 4):
        rows.append(("A", f"{d} 00:00:00", 10.0 + d.day))
        d += datetime.timedelta(days=1)
    d = datetime.date(1996, 2, 26)
    while d <= datetime.date(1996, 2, 29):
        rows.append(("A", f"{d} 00:00:00", 20.0 + d.day))
        d += datetime.timedelta(days=1)
    # series B extends the GLOBAL max past Mar 1 1996
    rows.append(("B", "1995-06-01 00:00:00", 1.0))
    rows.append(("B", "1996-03-05 00:00:00", 2.0))
    df = spark.createDataFrame(rows, "series string, ts string, value double")
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def test_smooth_runs_before_trim(spark):
    out = refresh_calculated_daily(
        _raw(spark), [], series_col="series", dt_col="ts",
        today="2026-01-15",
    ).collect()
    a_rows = {r["date"]: r for r in out if r["series"] == "A"}
    # tail trim: nothing for A past its last raw day
    assert max(a_rows) == datetime.date(1996, 2, 29)
    feb29 = a_rows[datetime.date(1996, 2, 29)]
    # smoothed stats exist ONLY if the (later-trimmed) Mar-1 trailing
    # spine row was still present when smoothing ran: q50 = avg of the
    # Feb-28 and Mar-1 neighbors' q50 (both have 1995 history).
    assert feb29["q50"] is not None
    b_q50 = a_rows[datetime.date(1996, 2, 28)]["q50"]
    # Mar-1's laddered q50 == its single 1995-03-01 hist value (11.0+1)
    assert feb29["q50"] == pytest.approx((b_q50 + 11.0) / 2.0)
    # LEAST of the neighbor counts
    assert feb29["doy_count"] == 1


def test_skip_guard_late_winter(spark):
    for today in ("2026-02-29", "2026-03-01", "2026-03-02"):
        out = refresh_calculated_daily(
            _raw(spark), [], series_col="series", dt_col="ts", today=today,
        ).collect()
        feb29 = [
            r for r in out
            if r["series"] == "A" and r["date"] == datetime.date(1996, 2, 29)
        ][0]
        # unsmoothed leap-day row: no DOY history (doy is NULL) -> the
        # ladder leaves quantiles NULL and max/min fall back to value
        assert feb29["q50"] is None
        assert feb29["max"] == feb29["value"]


def test_ladder_value_fallbacks(spark):
    df = spark.createDataFrame(
        [("A", datetime.date(2020, 1, 5), 3.0, 5, 0, None, None, None,
          None, None, None, None, None, None),
         ("A", datetime.date(2021, 1, 5), 7.0, 5, 1, 3.0, 3.0, 3.0,
          3.0, 3.0, 3.0, 3.0, 3.0, None)],
        "series string, date date, value double, doy int, doy_count long,"
        "hist_min double, hist_max double, hist_mean double, q10 double,"
        "q25 double, q50 double, q75 double, q90 double,"
        "percent_historic_range double",
    )
    out = {r["date"]: r for r in stats_ladder(df).collect()}
    first = out[datetime.date(2020, 1, 5)]
    assert first["max"] == 3.0 and first["min"] == 3.0  # value fallback
    assert first["q50"] is None and first["doy_count"] == 1
    second = out[datetime.date(2021, 1, 5)]
    assert second["max"] == 3.0 and second["doy_count"] == 2
    assert second["q50"] == 3.0
