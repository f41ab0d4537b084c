import json

import pytest
from pyspark.sql import functions as F

from aquacache_spark.sources import registry


def test_dispatch_parquet(spark, tmp_path):
    p = str(tmp_path / "src.parquet")
    spark.range(5).select(
        F.timestamp_seconds(F.col("id") * 3600).alias("dt"),
        (F.col("id") * 1.5).alias("v"),
    ).write.parquet(p)
    df = registry.dispatch(
        spark, "read_parquet",
        json.dumps({"path": p, "dt_col": "dt", "value_col": "v"}),
    )
    assert df.columns == ["datetime", "value"]
    assert df.count() == 5


def test_dispatch_unknown_source(spark):
    with pytest.raises(KeyError, match="unknown source_fx"):
        registry.dispatch(spark, "nope", "{}")


def test_http_stub_raises(spark):
    # downloadAquarius's payload normalization is real (sources/aquarius.py)
    # but the fetch is injectable-only: without a payload_path it must
    # raise NotImplementedError (no network in this environment).
    with pytest.raises(NotImplementedError, match="Aquarius fetch"):
        registry.get_source("downloadAquarius")(
            spark, "09AB001", "Stage.Preliminary",
            "2024-01-01 00:00:00", "2024-01-02 00:00:00",
        )


def test_contract_validation_drops_nulls(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", 1.0), ("2024-01-01 01:00:00", None)],
        ["datetime", "value"],
    )
    out = registry.validate_contract(df)
    assert out.count() == 1


def test_multimodal_feature_plumbing(spark):
    from aquacache_spark.operators.multimodal import extract_media_features

    df = spark.createDataFrame(
        [(1, bytearray(b"hello world")), (2, bytearray(b""))],
        ["media_id", "content"],
    )
    out = extract_media_features(df).orderBy("media_id").collect()
    assert out[0]["n_bytes"] == 11
    assert len(out[0]["sha256"]) == 64
    assert len(out[0]["feature"]) == 8
    assert out[1]["n_bytes"] == 0
