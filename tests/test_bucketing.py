"""Bucketed co-located joins: the 100 TB fact-fact join strategy.

SURVEY §7.0/§4 call for bucketing on (timeseries_id) so repeated
measurement<->measurement joins (sync reconciliation, compound
alignment) avoid re-shuffling the fact table every query. This test
pins the physical plan: joining two tables bucketed on the same key
must produce NO Exchange on either side."""

import pytest
from pyspark.sql import functions as F


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # warehouse.dir is a static conf — use the session default (the
    # spark-warehouse dir is gitignored) and drop the db afterwards
    spark.sql("CREATE DATABASE IF NOT EXISTS buckdemo")
    try:
        df = spark.range(0, 10000).select(
            (F.col("id") % 50).alias("timeseries_id"),
            F.timestamp_seconds(F.col("id") * 60).alias("datetime"),
            (F.col("id") * 0.5).alias("value"),
        )
        for name in ("buckdemo.local_m", "buckdemo.remote_m"):
            (df.write.mode("overwrite")
               .bucketBy(8, "timeseries_id").sortBy("timeseries_id")
               .saveAsTable(name))
        a = spark.table("buckdemo.local_m")
        b = spark.table("buckdemo.remote_m")
        joined = a.join(b, ["timeseries_id"]).groupBy("timeseries_id").count()
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        join_section = plan.split("HashAggregate")[0]
        assert "Exchange" not in join_section, (
            "bucketed fact-fact join re-shuffled:\n" + join_section
        )
        assert joined.count() > 0
    finally:
        spark.sql("DROP DATABASE IF EXISTS buckdemo CASCADE")
