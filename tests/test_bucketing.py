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


def test_doy_selfjoin_is_shuffle_free_on_bucketed_daily(spark):
    """The DOY historical self-join (series, doy) + its aggregate over a
    series-bucketed daily table must be ENTIRELY exchange-free: with
    requireAllClusterKeysForCoPartition=false (an opt-in for bucketed
    deployments — see session.py note; it caps join parallelism at the
    subset-key count, so it is NOT the session default),
    HashPartitioning(series) from the bucketed scan satisfies clustering
    on (series, doy) for the join and on the full grouping key for the
    agg — equal join/group keys imply equal series bucket. This is the
    sf1+/100 TB plan: daily stats recompute with zero shuffles.

    Broadcast is disabled to force the SMJ path the real scale hits —
    at 100 TB the history side is the same huge table, not a broadcast.
    """
    from aquacache_spark.operators.doy import doy_stats

    spark.sql("CREATE DATABASE IF NOT EXISTS doybuck")
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_cp = spark.conf.get("spark.sql.requireAllClusterKeysForCoPartition")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try:
        df = spark.range(0, 40000).select(
            (F.col("id") % 50).alias("series"),
            F.date_add(
                F.lit("2000-01-01").cast("date"), (F.col("id") / 50).cast("int")
            ).alias("date"),
            (F.col("id") * 0.5).alias("value"),
        )
        (df.write.mode("overwrite")
           .bucketBy(8, "series").sortBy("series")
           .saveAsTable("doybuck.daily"))
        out = doy_stats(spark.table("doybuck.daily"), keys=["series"])
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan, (
            "DOY self-join over bucketed daily re-shuffled:\n" + plan
        )
        assert out.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", old_cp)
        spark.sql("DROP DATABASE IF EXISTS doybuck CASCADE")
