"""Unit tests for the sequential (applyInPandas) kernels against
closed-form expectations — FIXTURES.md §7 scenarios."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from aquacache_spark.operators.increments import compute_increments, compute_increments_pd
from aquacache_spark.operators.period import calculate_period, detect_period_pd


def ts(*args):
    return dt.datetime(*args)


class TestIncrementsKernel:
    def test_monotone_cumulative(self):
        pdf = pd.DataFrame({
            "t": [ts(2024, 1, 1, h) for h in range(5)],
            "v": [0.0, 1.0, 3.0, 3.0, 7.0],
        })
        out = compute_increments_pd(pdf, "t", "v", reset_drop=10, min_pos=0.0,
                                    max_gap_seconds=None)
        assert out["increment"].tolist() == [0.0, 1.0, 2.0, 0.0, 4.0]

    def test_reset_on_large_drop(self):
        # gauge emptied: 90 -> 2 (drop 88 >= reset_drop 10) => increment 0,
        # baseline restarts; next 5 counts from 2.
        pdf = pd.DataFrame({
            "t": [ts(2024, 1, 1, h) for h in range(4)],
            "v": [80.0, 90.0, 2.0, 5.0],
        })
        out = compute_increments_pd(pdf, "t", "v", 10, 0.0, None)
        assert out["increment"].tolist() == [0.0, 10.0, 0.0, 3.0]

    def test_min_pos_noise_floor(self):
        pdf = pd.DataFrame({
            "t": [ts(2024, 1, 1, h) for h in range(3)],
            "v": [10.0, 10.2, 11.2],
        })
        out = compute_increments_pd(pdf, "t", "v", 10, 0.5, None)
        assert out["increment"].tolist() == [0.0, 0.0, 1.0]

    def test_gap_breaks_chain(self):
        pdf = pd.DataFrame({
            "t": [ts(2024, 1, 1, 0), ts(2024, 1, 1, 1), ts(2024, 1, 3, 0),
                  ts(2024, 1, 3, 1)],
            "v": [5.0, 6.0, 50.0, 51.0],
        })
        out = compute_increments_pd(pdf, "t", "v", 10, 0.0, 7200)
        inc = out["increment"].tolist()
        assert inc[0] == 0.0 and inc[1] == 1.0
        assert pd.isna(inc[2])  # chain broken across the 2-day gap
        assert inc[3] == 1.0

    def test_distributed_matches_kernel(self, spark):
        pdf = pd.DataFrame({
            "k": [1] * 5 + [2] * 5,
            "t": [ts(2024, 1, 1, h) for h in range(5)] * 2,
            "v": [0.0, 4.0, 9.0, 1.0, 3.0] * 2,
        })
        df = spark.createDataFrame(pdf)
        out = (
            compute_increments(df, keys=["k"], dt_col="t", value_col="v",
                               reset_drop=5, min_pos=0.0)
            .orderBy("k", "t").toPandas()
        )
        expected = compute_increments_pd(pdf[pdf.k == 1].copy(), "t", "v", 5, 0.0, None)
        assert out[out.k == 1]["increment"].tolist() == expected["increment"].tolist()
        assert out[out.k == 2]["increment"].tolist() == expected["increment"].tolist()


class TestPeriodKernel:
    def test_constant_daily(self):
        pdf = pd.DataFrame({"t": [ts(2023, 12, 18) + dt.timedelta(days=i)
                                  for i in range(17)]})
        out = detect_period_pd(pdf, "t")
        assert set(out["period_seconds"]) == {86400.0}

    def test_cadence_change_detected(self):
        # 10 hourly points then 10 six-hourly: period switches after 3
        # consecutive new gaps (R/calculate_period.R:85-107)
        hourly = [ts(2024, 1, 1) + dt.timedelta(hours=i) for i in range(10)]
        sixh = [hourly[-1] + dt.timedelta(hours=6 * (i + 1)) for i in range(10)]
        out = detect_period_pd(pd.DataFrame({"t": hourly + sixh}), "t")
        periods = out["period_seconds"].tolist()
        assert periods[0] == 3600.0
        assert periods[-1] == 21600.0

    def test_iso8601_rendering(self, spark):
        pdf = pd.DataFrame({
            "k": [1] * 3,
            "t": [ts(2023, 12, 18) + dt.timedelta(days=i) for i in range(3)],
        })
        df = spark.createDataFrame(pdf)
        out = calculate_period(df, keys=["k"], dt_col="t").toPandas()
        assert set(out["period"]) == {"P1DT0H0M0S"}  # snapshot value,
        # tests/testthat/_snaps/calculate_period.md:8-24
