"""synchronize_discrete gap-delete boundary semantics
(R/synchronize_discrete.R:280-388) pinned on crafted second-resolution
data — the oracle query's event-derived fixture never produces
1-second-adjacent samples, so the margins are asserted here."""

from pyspark.sql import functions as F

from aquacache_spark.operators.discrete_sync import (
    result_sync_actions,
    sample_sync_actions,
)


def _df(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    if "datetime" in df.columns:
        df = df.withColumn("datetime", F.col("datetime").cast("timestamp"))
    return df


def _actions(spark, local_rows, remote_rows, **kw):
    local = _df(
        spark, local_rows,
        "series int, datetime string, import_source string, no_update boolean",
    )
    remote = _df(spark, remote_rows, "series int, datetime string")
    out = sample_sync_actions(
        local, remote, keys=["series"],
        start="2024-01-01 00:00:00", end="2024-02-01 00:00:00",
        source_fx="src", **kw,
    )
    return {r["datetime"].strftime("%H:%M:%S"): r["action"]
            for r in out.collect() if r["series"] == 1}


def test_middle_gap_one_second_margins(spark):
    # remote at :00 and :10; locals at :00 (matched), :01 (= prev+1 ->
    # delete), :09 (= next-1 -> delete) would both go; but the
    # reference's BETWEEN prev+1 AND curr-1 EXCLUDES nothing else —
    # sub-margin survivors only exist at sub-second precision, which
    # the domain truncates away; assert the inclusive bounds exactly.
    a = _actions(
        spark,
        [(1, "2024-01-10 12:00:00", "src", False),
         (1, "2024-01-10 12:00:01", "src", False),
         (1, "2024-01-10 12:00:05", "src", False),
         (1, "2024-01-10 12:00:09", "src", False),
         (1, "2024-01-10 12:00:10", "src", False)],
        [(1, "2024-01-10 12:00:00"), (1, "2024-01-10 12:00:10")],
    )
    assert a["12:00:00"] == "matched" and a["12:00:10"] == "matched"
    assert a["12:00:01"] == "delete"
    assert a["12:00:05"] == "delete"
    assert a["12:00:09"] == "delete"


def test_head_strict_and_source_scoping(spark):
    a = _actions(
        spark,
        [(1, "2024-01-10 11:59:59", "src", False),   # head gap -> delete
         (1, "2024-01-10 11:59:58", "other", False),  # wrong source -> keep
         (1, "2024-01-10 11:59:57", "src", True)],    # protected -> keep
        [(1, "2024-01-10 12:00:00")],
    )
    assert a["11:59:59"] == "delete"
    assert a["11:59:58"] == "keep"
    assert a["11:59:57"] == "keep"


def test_tail_requires_two_remote_samples(spark):
    # single remote sample: the reference's j==length branch needs
    # delete_has_prev (j > 1), so trailing locals survive
    one = _actions(
        spark,
        [(1, "2024-01-10 12:00:05", "src", False)],
        [(1, "2024-01-10 12:00:00")],
    )
    assert one["12:00:05"] == "keep"
    # two remote samples: trailing locals go
    two = _actions(
        spark,
        [(1, "2024-01-10 12:00:05", "src", False)],
        [(1, "2024-01-10 11:00:00"), (1, "2024-01-10 12:00:00")],
    )
    assert two["12:00:05"] == "delete"


def test_no_remote_samples_no_deletes_and_inserts(spark):
    out = sample_sync_actions(
        _df(spark, [(1, "2024-01-10 12:00:00", "src", False)],
            "series int, datetime string, import_source string, no_update boolean"),
        _df(spark, [(2, "2024-01-11 00:00:00")], "series int, datetime string"),
        keys=["series"], start="2024-01-01 00:00:00",
        end="2024-02-01 00:00:00", source_fx="src",
    ).collect()
    by_series = {r["series"]: r["action"] for r in out}
    assert by_series[1] == "keep"     # series 1 has no remote data
    assert by_series[2] == "insert"   # remote-only series


def test_result_null_safe_key_matching(spark):
    local = spark.createDataFrame(
        [(1, 10, None, 5.0, False),
         (1, 11, 2, 6.0, False),
         (1, 12, 1, 7.0, True)],
        "sample_id int, parameter_id int, fraction_id int, result double,"
        " no_update boolean",
    )
    remote = spark.createDataFrame(
        [(1, 10, None, 5.5),   # NULL key matches NULL -> update
         (1, 11, 1, 6.0),      # different fraction -> no match
         (1, 12, 1, 9.0)],     # protected
        "sample_id int, parameter_id int, fraction_id int, result double",
    )
    acts = {
        (r["parameter_id"], r["fraction_id"]): r["action"]
        for r in result_sync_actions(
            local, remote,
            key_cols=["sample_id", "parameter_id", "fraction_id"],
        ).collect()
    }
    assert acts[(10, None)] == "update"
    assert acts[(11, 2)] == "delete"   # local unmatched, unprotected
    assert acts[(11, 1)] == "insert"   # remote unmatched
    assert acts[(12, 1)] == "protected"
