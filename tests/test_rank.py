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


def test_pointer_jumping_converges_on_deep_chain(spark):
    """A 5000-node path has diameter 5000 — plain min-label would need
    5000 rounds; pointer jumping must resolve it inside 16 (log-depth)
    and agree with duplicate_clusters on a random shallow graph."""
    from aquacache_spark.operators.dedup import duplicate_clusters
    from aquacache_spark.operators.graph import connected_components

    ids = spark.range(5_000).select(F.col("id").alias("doc_id"))
    chain = spark.range(4_999).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    out = connected_components(chain, ids, max_iters=16)
    rows = out.collect()
    assert all(r["component_rep"] == 0 for r in rows)
    assert all(r["component_size"] == 5_000 for r in rows)

    # random shallow graph: parity with the min-label operator
    pairs = spark.range(300).select(
        (F.col("id") * 7919 % 500).alias("id_a"),
        (F.col("id") * 104729 % 500).alias("id_b"),
    ).where(F.col("id_a") != F.col("id_b"))
    nodes = spark.range(500).select(F.col("id").alias("doc_id"))
    a = {(r["doc_id"], r["component_rep"]) for r in
         connected_components(pairs, nodes).collect()}
    b = {(r["doc_id"], r["cluster_rep"]) for r in
         duplicate_clusters(pairs, nodes).collect()}
    assert a == b
