"""ECCC historical-weather connector — weathercan-table column fan-out
(R/downloadECCCwx.R:17-188), fetch injectable.

``weathercan::weather_dl`` returns one WIDE table per station/interval;
the connector selects ONE parameter column and normalizes:

- hourly tables carry ``time`` (a full timestamp) -> used directly;
- daily(+) tables carry only ``date`` -> datetime = date + 30 hours
  (daily values aggregate observation hours 07..23 of the day plus
  00..06 of the NEXT day, so they are stamped 06:00 UTC next day,
  :127-132);
- window filter is INCLUSIVE both ends, NA values drop (:136-140);
- a date-only end_datetime means "end of that day" — the reference
  adds ``60*60*23.9999`` seconds (:66-71), reproduced exactly;
- ``wind_dir`` arrives in tens of degrees -> ×10 (:180-183);
- QC defaults UNS, ECCC organization as owner/contributor (:141-178).

Spark-first: the payload is a CSV scan + one projection/filter —
map-only at any scale; the parameter existence check reads only the
header (schema, no data pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dims import (APPROVAL_CODES, GRADE_CODES, QUALIFIER_CODES,
                   type_code_to_id)

_UNS_GRADE = type_code_to_id(GRADE_CODES)["UNS"]
_UNS_APPROVAL = type_code_to_id(APPROVAL_CODES)["UNS"]
_UNS_QUALIFIER = type_code_to_id(QUALIFIER_CODES)["UNS"]


def download_ecccwx(
    spark: SparkSession,
    location: str,
    parameter: str,
    start_datetime: str,
    end_datetime: str,
    interval: str = "hour",
    payload_path: str | None = None,
    organization_id: int = 2,
) -> DataFrame:
    if payload_path is None:
        raise NotImplementedError(
            "ECCC weather fetch requires network access; pass "
            "payload_path with a canned weathercan-style CSV table"
        )
    dl = spark.read.option("header", True).csv(payload_path)
    if parameter not in dl.columns:
        raise ValueError(
            f"downloadECCCwx: parameter {parameter!r} is not available "
            "in the downloaded data"
        )
    if "time" in dl.columns:  # hourly
        dt = F.to_timestamp("time")
    elif "date" in dl.columns:  # daily or coarser: stamp 06:00 next day
        dt = F.to_timestamp("date") + F.expr("INTERVAL 30 HOURS")
    else:
        raise ValueError(
            "downloadECCCwx: column named 'time' or 'date' not found"
        )
    start = F.lit(start_datetime).cast("timestamp")
    end = F.lit(end_datetime).cast("timestamp")
    if len(end_datetime) == 10:
        # date-only end means end-of-day: + 60*60*23.9999 s (:66-71)
        end = end + F.expr("INTERVAL 86399.64 SECONDS")

    value = F.col(parameter).cast("double")
    if parameter == "wind_dir":
        value = value * 10.0  # tens of degrees -> degrees (:180-183)

    return (
        dl.select(dt.alias("datetime"), value.alias("value"))
        .where(
            F.col("datetime").between(start, end)
            & F.col("value").isNotNull()
        )
        .select(
            "datetime", "value",
            F.lit(_UNS_GRADE).alias("grade"),
            F.lit(_UNS_APPROVAL).alias("approval"),
            F.lit(_UNS_QUALIFIER).alias("qualifier"),
            F.lit(organization_id).alias("owner"),
            F.lit(organization_id).alias("contributor"),
        )
    )
