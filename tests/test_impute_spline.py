import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from aquacache_spark.operators.impute import (
    natural_cubic_spline, spline_fill, spline_fill_pd,
)


class TestSplineKernel:
    def test_reproduces_linear_exactly(self):
        x = np.array([0.0, 1, 2, 3, 4])
        y = 2 * x + 1
        xq = np.array([0.5, 1.7, 3.3])
        got = natural_cubic_spline(x, y, xq)
        np.testing.assert_allclose(got, 2 * xq + 1, atol=1e-12)

    def test_interpolates_knots_exactly(self):
        rng = np.random.default_rng(7)
        x = np.sort(rng.uniform(0, 10, 12))
        y = rng.normal(size=12)
        got = natural_cubic_spline(x, y, x)
        np.testing.assert_allclose(got, y, atol=1e-10)

    def test_smooth_function_accuracy(self):
        x = np.linspace(0, 2 * np.pi, 25)
        y = np.sin(x)
        xq = np.linspace(0.3, 5.9, 40)
        got = natural_cubic_spline(x, y, xq)
        np.testing.assert_allclose(got, np.sin(xq), atol=5e-3)

    def test_two_knots_falls_back_to_linear(self):
        got = natural_cubic_spline(
            np.array([0.0, 10.0]), np.array([0.0, 5.0]), np.array([4.0])
        )
        assert got[0] == pytest.approx(2.0)


class TestSplineFill:
    def test_fills_gap_and_flags(self, spark):
        base = dt.datetime(2024, 1, 1)
        ts = [base + dt.timedelta(hours=i) for i in range(20)]
        vals = [float(np.sin(i / 3.0)) for i in range(20)]
        vals[7] = None
        vals[8] = None
        pdf = pd.DataFrame({"k": 1, "t": ts, "v": vals})
        out = (
            spline_fill(spark.createDataFrame(pdf), keys=["k"],
                        dt_col="t", value_col="v")
            .orderBy("t").toPandas()
        )
        assert out["imputed"].sum() == 2
        for i in (7, 8):
            assert out["v"][i] == pytest.approx(np.sin(i / 3.0), abs=5e-3)
        # known points untouched
        assert out["v"][0] == pytest.approx(np.sin(0.0), abs=1e-12)
