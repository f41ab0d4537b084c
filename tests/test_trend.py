"""Closed-form Mann-Kendall / Sen's slope checks."""

import math

from pyspark.sql import functions as F

from aquacache_spark.operators.trend import mann_kendall


def test_strictly_increasing_series(spark):
    # x = [1..6] daily: every pair ascending -> S = C(6,2) = 15,
    # no ties -> Var = 6*5*17/18 = 28.333..., slope = 1 everywhere
    rows = [("a", f"2020-01-0{i}", float(i)) for i in range(1, 7)]
    df = spark.createDataFrame(rows, "k string, date string, value double") \
        .withColumn("date", F.col("date").cast("date"))
    out = mann_kendall(df, ["k"]).collect()[0]
    assert out["n_days"] == 6 and out["s_stat"] == 15
    assert abs(out["var_s"] - 6 * 5 * 17 / 18) < 1e-9
    assert abs(out["z"] - (15 - 1) / math.sqrt(6 * 5 * 17 / 18)) < 1e-9
    assert abs(out["sen_slope"] - 1.0) < 1e-9


def test_all_tied_series_has_null_z(spark):
    rows = [("a", f"2020-01-0{i}", 2.5) for i in range(1, 5)]
    df = spark.createDataFrame(rows, "k string, date string, value double") \
        .withColumn("date", F.col("date").cast("date"))
    out = mann_kendall(df, ["k"]).collect()[0]
    # S = 0, tie group of 4 -> Var = [4*3*13 - 4*3*13]/18 = 0 -> z NULL
    assert out["s_stat"] == 0 and out["var_s"] == 0.0
    assert out["z"] is None and out["sen_slope"] == 0.0


def test_decreasing_with_tie(spark):
    # values [3, 3, 1]: pairs (3,3)->0, (3,1)->-1, (3,1)->-1 => S=-2;
    # ties: one group t=2 -> tiesum = 2*1*9 = 18;
    # Var = [3*2*11 - 18]/18 = 48/18
    rows = [("a", "2020-01-01", 3.0), ("a", "2020-01-02", 3.0),
            ("a", "2020-01-03", 1.0)]
    df = spark.createDataFrame(rows, "k string, date string, value double") \
        .withColumn("date", F.col("date").cast("date"))
    out = mann_kendall(df, ["k"]).collect()[0]
    assert out["s_stat"] == -2
    assert abs(out["var_s"] - 48 / 18) < 1e-9
    assert abs(out["z"] - (-2 + 1) / math.sqrt(48 / 18)) < 1e-9
