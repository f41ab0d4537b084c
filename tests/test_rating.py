"""Rating-curve application: closed-form checks + the ln/exp
cross-engine parity sweep the oracle depends on."""

import duckdb
from pyspark.sql import functions as F

from aquacache_spark.operators.rating import apply_rating_curves


def _fixture(spark):
    curves = spark.createDataFrame(
        [("s1", 10, "2024-01-01 00:00:00", "2024-02-01 00:00:00")],
        "series string, curve_id int, start_dt string, end_dt string"
    ).withColumns({"start_dt": F.col("start_dt").cast("timestamp"),
                   "end_dt": F.col("end_dt").cast("timestamp")})
    points = spark.createDataFrame(
        [(10, 1.0, 2.0), (10, 10.0, 200.0), (10, 100.0, 20000.0)],
        "curve_id int, stage double, discharge double")
    return curves, points


def test_exact_point_and_interpolation(spark):
    import math

    curves, points = _fixture(spark)
    meas = spark.createDataFrame(
        [(1, "s1", "2024-01-10 00:00:00", 10.0),    # exact point
         (2, "s1", "2024-01-10 00:00:00", 31.622776601683793),  # sqrt(1000)
         (3, "s1", "2024-01-10 00:00:00", 0.5),     # below range
         (4, "s1", "2024-01-10 00:00:00", 150.0),   # above range
         (5, "s2", "2024-01-10 00:00:00", 10.0)],   # no curve
        "event_id int, series string, ts string, stage double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["event_id"]: r for r in
           apply_rating_curves(meas, curves, points).collect()}
    assert out[1]["discharge"] == 200.0 and out[1]["in_range"]
    # log-log: between (10, 200) and (100, 20000) the exponent is 2,
    # so Q(sqrt(1000)) = 200 * (sqrt(1000)/10)^2 = 2000
    assert abs(out[2]["discharge"] - 2000.0) < 1e-6
    assert out[3]["discharge"] is None and not out[3]["in_range"]
    assert out[4]["discharge"] is None and not out[4]["in_range"]
    assert out[5]["discharge"] is None and not out[5]["in_range"]
    assert out[5]["curve_id"] is None


def test_shift_applies_before_lookup(spark):
    curves, points = _fixture(spark)
    shifts = spark.createDataFrame(
        [("s1", "2024-01-05 00:00:00", "2024-01-15 00:00:00", 5.0)],
        "series string, start_dt string, end_dt string, shift double"
    ).withColumns({"start_dt": F.col("start_dt").cast("timestamp"),
                   "end_dt": F.col("end_dt").cast("timestamp")})
    meas = spark.createDataFrame(
        [(1, "s1", "2024-01-10 00:00:00", 5.0),   # shifted -> exact 10
         (2, "s1", "2024-01-20 00:00:00", 5.0)],  # outside shift window
        "event_id int, series string, ts string, stage double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["event_id"]: r for r in
           apply_rating_curves(meas, curves, points, shifts).collect()}
    assert out[1]["adjusted_stage"] == 10.0
    assert out[1]["discharge"] == 200.0
    assert out[2]["shift"] == 0.0 and out[2]["adjusted_stage"] == 5.0


def test_ln_exp_cross_engine_parity(spark):
    # the oracle's only transcendental math: quantized exp(ln-chain)
    # must agree bit-for-bit with DuckDB over a dense value grid
    sp = spark.range(1, 100001).select(
        (F.col("id") / 500.0 + 0.5).alias("x"))
    s = sp.select(
        F.floor(F.exp(F.log(F.col("x")) * 1.5 + 0.7) * 1e6 + 0.5)
        .cast("long").alias("q")).agg(F.sum("q")).collect()[0][0]
    d = duckdb.sql("""
        SELECT sum(CAST(floor(exp(ln(x) * 1.5 + 0.7) * 1e6
                              + CAST(0.5 AS DOUBLE)) AS BIGINT))
        FROM (SELECT id / CAST(500 AS DOUBLE) + CAST(0.5 AS DOUBLE) AS x
              FROM (SELECT unnest(generate_series(1, 100000)) AS id))
    """).fetchone()[0]
    assert s == d

def test_zero_flow_bottom_point_linear_fallback(spark):
    # a zero-discharge bottom point (common in rating tables) must NOT
    # yield (in_range=true, discharge=NULL): log-log is undefined at
    # d=0, so the bracket falls back to linear interpolation
    curves = spark.createDataFrame(
        [("s1", 10, "2024-01-01 00:00:00", "2024-02-01 00:00:00")],
        "series string, curve_id int, start_dt string, end_dt string"
    ).withColumns({"start_dt": F.col("start_dt").cast("timestamp"),
                   "end_dt": F.col("end_dt").cast("timestamp")})
    points = spark.createDataFrame(
        [(10, 0.0, 0.0), (10, 2.0, 8.0), (10, 4.0, 40.0)],
        "curve_id int, stage double, discharge double")
    meas = spark.createDataFrame(
        [(1, "s1", "2024-01-10 00:00:00", 1.0),   # zero-d lower bracket
         (2, "s1", "2024-01-10 00:00:00", 0.0),   # exact at zero point
         (3, "s1", "2024-01-10 00:00:00", 3.0)],  # positive bracket: log
        "event_id int, series string, ts string, stage double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["event_id"]: r for r in
           apply_rating_curves(meas, curves, points).collect()}
    # linear between (0,0) and (2,8): Q(1) = 4
    assert out[1]["in_range"] and out[1]["discharge"] == 4.0
    assert out[2]["in_range"] and out[2]["discharge"] == 0.0
    # log-log between (2,8) and (4,40): exponent log(5)/log(2)
    import math
    expect = math.exp(math.log(8.0)
                      + (math.log(3.0) - math.log(2.0))
                      / (math.log(4.0) - math.log(2.0))
                      * (math.log(40.0) - math.log(8.0)))
    assert abs(out[3]["discharge"] - expect) < 1e-9
    # every in_range row carries a discharge (the ADVICE invariant)
    full = apply_rating_curves(meas, curves, points)
    bad = full.where(F.col("in_range") & F.col("discharge").isNull())
    assert bad.count() == 0
