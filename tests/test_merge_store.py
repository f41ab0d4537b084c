from pyspark.sql import functions as F

from aquacache_spark.sources.store import ParquetMergeStore


def make_df(spark, rows):
    return spark.createDataFrame(
        rows, ["timeseries_id", "datetime", "value"]
    ).withColumn("datetime", F.col("datetime").cast("timestamp"))


def test_merge_update_and_do_nothing(spark, tmp_path):
    path = str(tmp_path / "store")
    store = ParquetMergeStore(spark, path, ["timeseries_id", "datetime"])

    base = make_df(spark, [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 01:00:00", 2.0),
        (2, "2024-01-01 00:00:00", 5.0),
    ])
    stats = store.merge(base)
    assert stats["inserted"] == 3

    # update mode: collision replaces, new row inserts
    upd = make_df(spark, [
        (1, "2024-01-01 01:00:00", 20.0),
        (1, "2024-01-01 02:00:00", 3.0),
    ])
    stats = store.merge(upd, on_conflict="update")
    assert stats == {"inserted": 1, "updated": 1, "kept": 0}
    got = {
        (r["timeseries_id"], str(r["datetime"])): r["value"]
        for r in store.read().collect()
    }
    assert got[(1, "2024-01-01 01:00:00")] == 20.0
    assert got[(1, "2024-01-01 02:00:00")] == 3.0
    assert got[(2, "2024-01-01 00:00:00")] == 5.0  # untouched series intact

    # do_nothing mode: collision keeps existing
    upd2 = make_df(spark, [
        (1, "2024-01-01 02:00:00", 99.0),
        (3, "2024-01-01 00:00:00", 7.0),
    ])
    stats = store.merge(upd2, on_conflict="do_nothing")
    assert stats["kept"] == 1 and stats["inserted"] == 1
    got = {
        (r["timeseries_id"], str(r["datetime"])): r["value"]
        for r in store.read().collect()
    }
    assert got[(1, "2024-01-01 02:00:00")] == 3.0  # kept
    assert got[(3, "2024-01-01 00:00:00")] == 7.0  # inserted


def test_merge_rewrites_only_touched_buckets(spark, tmp_path):
    path = str(tmp_path / "store2")
    store = ParquetMergeStore(spark, path, ["timeseries_id", "datetime"],
                              n_buckets=8)
    base = make_df(spark, [(i, "2024-01-01 00:00:00", float(i)) for i in range(40)])
    store.merge(base)
    import os

    before = {
        b: os.path.getmtime(os.path.join(path, b))
        for b in os.listdir(path) if b.startswith("bucket=")
    }
    import time

    time.sleep(1.1)
    store.merge(make_df(spark, [(1, "2024-01-01 00:00:00", 111.0)]))
    after = {
        b: os.path.getmtime(os.path.join(path, b))
        for b in os.listdir(path) if b.startswith("bucket=")
    }
    changed = [b for b in before if after[b] != before[b]]
    assert len(changed) == 1  # only the bucket holding series 1
