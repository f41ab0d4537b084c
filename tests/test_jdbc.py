"""Real-JDBC connector round trip (VERDICT r3 'Next round' #8).

The generic ``read_jdbc`` source (sources/registry.py — the
RWIS/EQWin/HYDAT access path, R/downloadRWIS.R:16) previously had
unit coverage via injected frames only. The Spark distribution ships
the embedded Derby JDBC driver, so the full path — Spark JDBC write
into a real database file, registry dispatch with jsonb-style args,
JDBC scan, contract normalization — runs against an actual JDBC URL
here, no injection anywhere.
"""

import json

from pyspark.sql import functions as F

DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


def _make_db(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/rwisdb;create=true"
    rows = [
        ("2024-01-10 00:00:00", -12.5, "ALASKA-HWY-KM-123"),
        ("2024-01-10 01:00:00", -13.0, "ALASKA-HWY-KM-123"),
        ("2024-01-10 02:00:00", None, "ALASKA-HWY-KM-123"),  # sensor gap
        ("2024-01-10 03:00:00", -11.75, "ALASKA-HWY-KM-123"),
    ]
    df = spark.createDataFrame(
        rows, "datetime string, value double, station string")
    (df.write.format("jdbc").option("url", url)
     .option("dbtable", "rwis_obs").option("driver", DERBY).save())
    return url


def test_read_jdbc_roundtrip_and_contract(spark, tmp_path):
    from aquacache_spark.sources.registry import dispatch

    url = _make_db(spark, tmp_path)
    # jsonb-style args exactly as a catalog row would carry them
    out = dispatch(spark, "read_jdbc", json.dumps({
        "url": url, "table": "rwis_obs", "driver": DERBY}))
    rows = out.orderBy("datetime").collect()
    # contract: timestamp datetime, double value, NULL value dropped,
    # non-contract columns (station) pruned
    assert out.columns == ["datetime", "value"]
    assert [r["value"] for r in rows] == [-12.5, -13.0, -11.75]
    assert str(rows[0]["datetime"]) == "2024-01-10 00:00:00"
    assert dict(out.dtypes) == {"datetime": "timestamp", "value": "double"}


def test_jdbc_filter_pushdown(spark, tmp_path):
    """Watermark trims must reach the database, not Spark — a tail
    poll of a multi-year RWIS table cannot scan it all."""
    from aquacache_spark.sources.registry import get_source

    url = f"jdbc:derby:{tmp_path}/pushdb;create=true"
    spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "k int, value double"
    ).write.format("jdbc").option("url", url) \
        .option("dbtable", "t").option("driver", DERBY).save()
    df = get_source("read_jdbc")(spark, url=url, table="t", driver=DERBY) \
        .where(F.col("k") > 95)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "k" in plan.split("PushedFilters")[1].split("]")[0]
    assert df.count() == 4
