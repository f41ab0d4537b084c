"""SWOB-ML minute-weather XML connector (``downloadECCCwxMinute``).

Reference: R/downloadECCCwxMinute.R:36-159 fetches per-day windows,
extracts one element per observation, drops NA, **de-duplicates
datetimes keeping the last occurrence** (:132-133,
``!duplicated(datetime, fromLast = TRUE)``), resolves parameter
aliases (:352-377: temp->air_temp, wind_spd->avg_wnd_spd_10m_pst1mt,
wind_dir->avg_wnd_dir_10m_pst1mt, wind_gust->max_wnd_spd_10m_pst1mt,
stn_press->stn_pres, dew_point->dwpt_temp), and stamps UNS
grade/approval/qualifier and the ECCC organization (:385-417).

The payload format parsed here is raw SWOB-ML — the
``om:ObservationCollection`` schema of the reference's own fixtures
(tests/testthat/fixtures/swob-minute-0000.xml): observation sampling
time under om:samplingTime/gml:TimeInstant/gml:timePosition and an
``<elements><element name uom value/></elements>`` block under
om:result.

Spark-first: the built-in XML source parses a *directory* of minute
files distributed (one task per file split), and element selection is
explode + filter column ops. No Python per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register_source

# R/downloadECCCwxMinute.R:352-364
SWOB_PARAMETER_ALIASES = {
    "temp": "air_temp",
    "wind_spd": "avg_wnd_spd_10m_pst1mt",
    "wind_dir": "avg_wnd_dir_10m_pst1mt",
    "wind_gust": "max_wnd_spd_10m_pst1mt",
    "stn_press": "stn_pres",
    "dew_point": "dwpt_temp",
}


def resolve_swob_parameter(parameter: str) -> str:
    """Alias -> SWOB element name (R/downloadECCCwxMinute.R:369-377)."""
    return SWOB_PARAMETER_ALIASES.get(parameter.lower().strip(),
                                      parameter.lower().strip())


def parse_swob_xml(spark: SparkSession, path: str) -> DataFrame:
    """Parse SWOB-ML observation files into long form.

    Output: one row per (observation datetime, element): (file, datetime,
    name, uom, value-as-string). ``file`` is the source file name, used
    for deterministic keep-last de-duplication.
    """
    raw = (
        spark.read.format("xml")
        .option("rowTag", "om:Observation")
        .load(path)
    )
    ts = F.col("`om:samplingTime`.`gml:TimeInstant`.`gml:timePosition`")
    elements = F.col("`om:result`.elements.element")
    return (
        raw.select(
            F.input_file_name().alias("file"),
            F.to_timestamp(ts).alias("datetime"),
            F.explode(elements).alias("el"),
        )
        .select(
            "file", "datetime",
            F.col("el._name").alias("name"),
            F.col("el._uom").alias("uom"),
            F.col("el._value").alias("value"),
        )
    )


# backwards-compatible simplified-format reader kept for generic XML
# landing zones (rowTag-configurable)
@register_source("read_swob_xml")
def read_swob_xml(
    spark: SparkSession,
    path: str,
    element: str,
    **_,
) -> DataFrame:
    """One element's (datetime, value, uom) series from SWOB-ML files."""
    el = parse_swob_xml(spark, path)
    return el.where(F.col("name") == element).select(
        "datetime",
        F.col("value").cast("double").alias("value"),
        "uom",
    )


def download_ecccwx_minute(
    spark: SparkSession,
    location: str,
    parameter: str,
    start_datetime: str,
    end_datetime: str,
    path: str | None = None,
    grade: int | None = None,
    approval: int | None = None,
    qualifier: int | None = None,
    organization_id: int | None = None,
    fetcher=None,
) -> DataFrame:
    """downloadECCCwxMinute (R/downloadECCCwxMinute.R:36): read SWOB-ML
    (``path`` points at canned/landed minute files; ``fetcher`` would
    pull the realtime API), extract one element, window-filter, drop
    NA, de-duplicate datetimes keeping the last occurrence, stamp
    defaults."""
    if path is None:
        if fetcher is None:
            raise NotImplementedError(
                "downloadECCCwxMinute: no network in this environment; "
                "pass path= to landed SWOB-ML minute files or "
                "fetcher=url->path"
            )
        path = fetcher(location, parameter, start_datetime, end_datetime)
    el = resolve_swob_parameter(parameter)
    from pyspark.sql import Window

    parsed = (
        parse_swob_xml(spark, path)
        .where(F.col("name") == el)
        .select(
            "file", "datetime", F.col("value").cast("double").alias("value")
        )
        .where(
            F.col("datetime").isNotNull()
            & (F.col("datetime") >= F.lit(start_datetime).cast("timestamp"))
            & (F.col("datetime") <= F.lit(end_datetime).cast("timestamp"))
            & F.col("value").isNotNull()
        )
    )
    # !duplicated(datetime, fromLast=TRUE): keep the *last* row per
    # datetime; file order (lexicographic = chronological for SWOB
    # minute files) is the deterministic arrival order
    w = Window.partitionBy("datetime").orderBy(F.col("file").desc())
    deduped = (
        parsed.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .drop("__rk", "file")
    )
    return deduped.select(
        "datetime", "value",
        F.lit(grade).cast("int").alias("grade"),
        F.lit(approval).cast("int").alias("approval"),
        F.lit(qualifier).cast("int").alias("qualifier"),
        F.lit(organization_id).cast("int").alias("owner"),
        F.lit(organization_id).cast("int").alias("contributor"),
    )
