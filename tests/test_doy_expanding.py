"""Equivalence: doy_stats_expanding (Arrow expanding-window kernel, the
years-deep scale path) vs doy_stats (self-join, the oracle-checked
design) — same rows, same stats, including leap-day NULLs and the
30-year month-clamped window."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from aquacache_spark.operators.doy import doy_stats, doy_stats_expanding


@pytest.fixture(scope="module")
def daily(spark):
    # 2 series x 40 years of daily data on a sparse grid: every 13th
    # day-of-year kept, so cells have deep history but the frame stays
    # small; includes Feb 29s (doy NULL) and values with a NULL hole
    rows = []
    for sid in (1, 2):
        for year in range(1980, 2020):
            d0 = dt.date(year, 1, 1)
            for k in range(0, 366, 13):
                d = d0 + dt.timedelta(days=k)
                if d.year != year:
                    continue
                v = (
                    None
                    if (year % 17 == 0 and k == 26)
                    else round(10 + sid + math.sin(k / 58.0) + year % 7, 3)
                )
                rows.append((sid, d, v))
            if year % 4 == 0 and (year % 100 != 0 or year % 400 == 0):
                rows.append((sid, dt.date(year, 2, 29), 5.0 + sid))
    return spark.createDataFrame(
        rows, "timeseries_id int, date date, value double"
    )


def frames_equal(a, b):
    cols = sorted(a.columns)
    pa = a.toPandas()[cols].sort_values(cols).reset_index(drop=True)
    pb = b.toPandas()[cols].sort_values(cols).reset_index(drop=True)
    assert pa.shape == pb.shape
    import pandas as pd

    for c in cols:
        ca, cb = pa[c], pb[c]
        if pd.api.types.is_float_dtype(ca) or pd.api.types.is_float_dtype(cb):
            ca = pd.to_numeric(ca, errors="coerce").round(9)
            cb = pd.to_numeric(cb, errors="coerce").round(9)
            ok = (ca.isna() & cb.isna()) | ((ca - cb).abs() < 1e-9)
            assert ok.all(), (c, pa[~ok.to_numpy()].head(), pb[~ok.to_numpy()].head())
        else:
            assert (ca.astype(str) == cb.astype(str)).all(), c


def test_expanding_matches_join_all_years(spark, daily):
    keys = ["timeseries_id"]
    frames_equal(doy_stats(daily, keys), doy_stats_expanding(daily, keys))


def test_expanding_matches_join_30yr_window(spark, daily):
    keys = ["timeseries_id"]
    frames_equal(
        doy_stats(daily, keys, years_window=30),
        doy_stats_expanding(daily, keys, years_window=30),
    )
