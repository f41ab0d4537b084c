"""End-to-end test of the dailyUpdate orchestrator (R/dailyUpdate.R)
with a canned fetch — network-free, the reference's own test strategy."""

import datetime

from pyspark.sql import functions as F

from aquacache_spark.daily_update import daily_update, select_series

DT = datetime.datetime


def _catalog(spark):
    return spark.createDataFrame(
        [
            (1, "downloadWSC", '{"location": "09AB001"}', True, DT(2024, 1, 2, 12)),
            (2, "downloadWSC", '{"location": "09AB002"}', False, DT(2024, 1, 2, 12)),
            (3, None, None, True, None),  # no source_fx -> never fetched
        ],
        "timeseries_id int, source_fx string, source_fx_args string, "
        "active boolean, last_data_point timestamp",
    )


def test_select_series_active_handling(spark):
    cat = _catalog(spark)
    assert [r["timeseries_id"] for r in
            select_series(cat).collect()] == [1]
    assert sorted(r["timeseries_id"] for r in
                  select_series(cat, active="all").collect()) == [1, 2]
    assert [r["timeseries_id"] for r in
            select_series(cat, timeseries_id=[2], active="all").collect()] == [2]


def test_daily_update_continuous_cycle(spark):
    cat = _catalog(spark)
    meas = spark.createDataFrame(
        [(1, DT(2024, 1, 2, h), float(h)) for h in (0, 6, 12)],
        "timeseries_id int, datetime timestamp, value double",
    )
    existing_daily = spark.createDataFrame(
        [(1, datetime.date(2024, 1, 2), 6.0, 3),
         (1, datetime.date(2024, 1, 9), 99.0, 1)],  # beyond last point -> trim
        "timeseries_id int, date date, value double, n int",
    )

    def fetch(s, tasks):
        assert "group_key" in tasks.columns  # fetch groups derived
        return s.createDataFrame(
            # one stale point (<= watermark, must be dropped), two new
            [(1, DT(2024, 1, 2, 6), 99.0),
             (1, DT(2024, 1, 2, 18), 9.0),
             (1, DT(2024, 1, 3, 0), 4.0)],
            "timeseries_id int, datetime timestamp, value double",
        )

    report = daily_update(
        spark,
        continuous_catalog=cat,
        fetch_continuous=fetch,
        measurements=meas,
        existing_daily=existing_daily,
        discrete_stage=lambda: {"synced": 1},
        hydat_stage=None,
    )
    c = report["continuous"]
    assert c["new_points"] == 2          # stale point filtered by watermark
    assert c["daily_update"] == 1        # Jan 2 mean changes (adds 18h point)
    assert c["daily_insert"] == 1        # Jan 3 is new
    assert c["tail_trim_rows"] == 1      # Jan 9 ghost row flagged
    # watermark advanced to the newest fetched point
    wm = {r["timeseries_id"]: r["last_data_point"]
          for r in report["catalog_refreshed"].collect()}
    assert wm[1] == DT(2024, 1, 3, 0)
    assert report["discrete"] == {"synced": 1}
    assert report["hydat"] == {"skipped": True}
    assert report["images"] == {"skipped": True}


def test_daily_update_respects_toggles(spark):
    report = daily_update(
        spark,
        continuous=False,
        discrete=False,
        hydat=False,
        images=False,
        rasters=False,
    )
    assert "continuous" not in report
    assert report["discrete"] == {"skipped": True}
