"""local_df contract: LocalRelation fast path with list-style schema
must infer types from the DATA (like createDataFrame(list, names)),
not from pandas dtypes — an int column containing None stays long,
never silently widens to double."""

from aquacache_spark.session import local_df


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


def test_int_with_none_stays_long(spark):
    df = local_df(spark, [(1, None), (2, 3)], ["a", "b"])
    assert df.schema.simpleString() == "struct<a:bigint,b:bigint>"
    assert [r["b"] for r in df.orderBy("a").collect()] == [None, 3]


def test_list_schema_still_plans_local_relation(spark):
    df = local_df(spark, [(1, "x")], ["a", "b"])
    assert "LocalTableScan" in _plan(df)
    assert "ExistingRDD" not in _plan(df)


def test_ddl_schema_branch_unchanged(spark):
    df = local_df(spark, [(1, "x")], "a long, b string")
    assert df.schema.simpleString() == "struct<a:bigint,b:string>"
    assert "LocalTableScan" in _plan(df)


def test_local_df_null_doubles_arrow_independent(spark):
    """A None in a double column must reach Spark as NULL (never NaN)
    regardless of spark.sql.execution.arrow.pyspark.enabled — sessions
    built outside configure() (the driver's own) default it off, and
    the non-Arrow pandas converter ships float64 NaN for None unless
    the frame stays object-dtyped."""
    from aquacache_spark.session import local_df

    key = "spark.sql.execution.arrow.pyspark.enabled"
    orig = spark.conf.get(key)
    try:
        for setting in ("true", "false"):
            spark.conf.set(key, setting)
            df = local_df(spark, [(0, None), (1, 0.5)], "a int, b double")
            rows = {r.a: r.b for r in df.collect()}
            assert rows[0] is None, f"arrow={setting} shipped {rows[0]!r}"
            assert rows[1] == 0.5
    finally:
        spark.conf.set(key, orig)
