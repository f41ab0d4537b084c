"""global_rank (operators/rank.py): exact distributed total-order
ranking without a single-partition exchange."""

from pyspark.sql import functions as F

from aquacache_spark.operators.rank import global_rank


def test_global_rank_matches_local_sort(spark):
    df = spark.range(5_000).select(
        (F.col("id") * 2654435761 % 9973).alias("k"),
        F.col("id").alias("uid"))
    out = global_rank(df, ["k", "uid"], rank_col="r")
    rows = out.collect()
    expect = sorted(rows, key=lambda x: (x["k"], x["uid"]))
    assert [r["r"] for r in expect] == list(range(1, len(rows) + 1))
    # partition-layout invariance of the RESULT
    again = global_rank(df.repartition(17), ["k", "uid"], "r").collect()
    assert {(r["k"], r["uid"], r["r"]) for r in rows} == \
        {(r["k"], r["uid"], r["r"]) for r in again}


def test_global_rank_ties_skew_and_no_single_partition(spark):
    # 90% of keys identical (range-partitioner stress): ranks must
    # still be a permutation of 1..n with the tiebreaker deciding
    df = spark.range(2_000).select(
        F.when(F.col("id") % 10 != 0, 7).otherwise(F.col("id"))
        .alias("k"),
        F.col("id").alias("uid"))
    out = global_rank(df, ["k", "uid"], "r")
    got = sorted((r["k"], r["uid"], r["r"]) for r in out.collect())
    ranks = sorted(r for _, _, r in got)
    assert ranks == list(range(1, 2_001))
    # the plan must not contain a single-partition exchange: the whole
    # point is avoiding the global-window bottleneck
    p = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert "Exchange SinglePartition" not in p


def test_global_rank_empty_and_single_row(spark):
    empty = spark.createDataFrame([], "k long, uid long")
    assert global_rank(empty, ["k", "uid"], "r").count() == 0
    one = spark.createDataFrame([(5, 1)], "k long, uid long")
    assert global_rank(one, ["k", "uid"], "r").collect()[0]["r"] == 1
