"""ECCC long-term water-quality connector (R/downloadECCCwq.R:23-474)
— CSV transform + import-key mapping real, fetch/cache injectable.

Reference pipeline: read the open-data CSV (SITE_NO, DATE_TIME_HEURE,
FLAG_MARQUEUR, VALUE_VALEUR, UNIT_UNITE, VARIABLE, SAMPLE_ID), filter
location + window, convert the file's local timezone to UTC, then per
sample datetime build a samples row (import_source_id = the distinct
ECCC sample ids joined with commas) and per result row resolve the
(VARIABLE, UNIT) pair through the import key (parameter_id, conversion,
result_offset, result_type, sample_fraction_id, matrix_state), apply
``value * conversion + result_offset``, and map censoring flags:
``<`` -> below-detection (condition_value = converted value, result
NULL), ``>`` -> above-detection, any other non-blank flag -> row
skipped (downloadECCCwq.R:325-360).

Spark-first: the whole per-sample/per-result double loop collapses to
one broadcast join (the key is catalog-sized) plus compiled ``when()``
dispatch — map-only over the file mass, so a national all-sites
backfill is a single pass.  Unmapped variables are returned as a
reject frame instead of warnings, same information, one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# fixed-offset zones the ECCC files ship in (reference converts via tz
# attr; a named-tz DST rule is deliberately avoided, matching the
# repo-wide integer-offset convention of operators/daily.local_day)
TZ_OFFSET_HOURS = {"UTC": 0, "AST": -4, "EST": -5, "CST": -6, "MST": -7,
                   "PST": -8, "YST": -9}

ECCC_COLUMNS = {
    "SITE_NO": "site",
    "DATE_TIME_HEURE": "local_dt",
    "FLAG_MARQUEUR": "flag",
    "VALUE_VALEUR": "raw_value",
    "UNIT_UNITE": "input_unit",
    "UNIT_UNITÉ": "input_unit",  # bilingual header, as shipped by ECCC
    "VARIABLE": "input_param",
    "SAMPLE_ID_ECHANTILLON": "sample_id",
    "SAMPLE_ID_ÉCHANTILLON": "sample_id",
}


def read_ecccwq_csv(spark: SparkSession, path: str, tz: str) -> DataFrame:
    """Read + normalize the ECCC file: column renames, local->UTC shift."""
    if tz not in TZ_OFFSET_HOURS:
        raise ValueError(f"unknown tz {tz!r}; known: {sorted(TZ_OFFSET_HOURS)}")
    raw = spark.read.option("header", True).csv(path)
    for src, dst in ECCC_COLUMNS.items():
        if src in raw.columns:
            raw = raw.withColumnRenamed(src, dst)
    missing = [d for d in ECCC_COLUMNS.values() if d not in raw.columns]
    if missing:
        raise ValueError(f"ECCC file missing required columns: {missing}")
    off = TZ_OFFSET_HOURS[tz]
    return raw.withColumn(
        "datetime",
        F.to_timestamp("local_dt") - F.expr(f"INTERVAL {off} HOURS"),
    ).withColumn("raw_value", F.col("raw_value").cast("double"))


def download_ecccwq(
    spark: SparkSession,
    location: str,
    key: DataFrame,
    start_datetime: str,
    end_datetime: str,
    tz: str = "UTC",
    payload_path: str | None = None,
    below_condition_id: int = 1,
    above_condition_id: int = 2,
) -> dict[str, DataFrame]:
    """-> {"samples", "results", "rejects"} per the getNewDiscrete
    contract (R/downloadECCCwq.R:265-282, 305-392).

    ``key`` columns: input_param, input_unit, parameter_id, conversion,
    result_offset, result_type, sample_fraction_id, matrix_state_id.
    """
    if payload_path is None:
        raise NotImplementedError(
            "ECCC water-quality fetch requires the open-data portal; pass "
            "payload_path with the monitoring CSV"
        )
    f = read_ecccwq_csv(spark, payload_path, tz)
    scoped = f.where(
        (F.col("site") == location)
        & (F.col("datetime") >= F.to_timestamp(F.lit(start_datetime)))
        & (F.col("datetime") <= F.to_timestamp(F.lit(end_datetime)))
    )
    # samples: one row per distinct datetime; import_source_id is the
    # sorted distinct ECCC sample ids, comma-joined (the reference uses
    # appearance order — sorted here for partition-order determinism)
    samples = (
        scoped.groupBy("datetime")
        .agg(F.array_join(F.array_sort(F.collect_set("sample_id")), ",")
             .alias("import_source_id"))
    )
    keyed = scoped.where(F.length(F.coalesce("input_param", F.lit(""))) > 0) \
        .join(F.broadcast(key), ["input_param", "input_unit"], "left")
    unmapped = F.col("parameter_id").isNull()
    flag = F.coalesce(F.col("flag"), F.lit(""))
    bad_flag = ~flag.isin("", "<", ">")
    rejects = keyed.where(unmapped | bad_flag).select(
        "datetime", "input_param", "input_unit", "flag",
        F.when(unmapped, "no mapping").otherwise("unrecognized flag")
        .alias("reject_reason"),
    )
    conv = (F.col("raw_value") * F.col("conversion") + F.col("result_offset"))
    censored = flag.isin("<", ">")
    results = keyed.where(~unmapped & ~bad_flag).select(
        "datetime",
        "result_type",
        "parameter_id",
        "sample_fraction_id",
        "matrix_state_id",
        F.when(censored, None).otherwise(conv).alias("result"),
        F.when(flag == "<", below_condition_id)
        .when(flag == ">", above_condition_id)
        .otherwise(F.lit(None)).cast("int").alias("result_condition"),
        F.when(censored, conv).alias("result_condition_value"),
    )
    return {"samples": samples, "results": results, "rejects": rejects}
