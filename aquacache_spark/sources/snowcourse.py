"""Snow-course survey connector (R/downloadSnowCourse.R:88-420) —
survey aggregation + station-move ratio adjustment, DB fetch
injectable (the reference reads a snow-survey PostgreSQL database;
any jdbc/parquet frame with the same columns works here).

Reference pipeline per location:

1. Survey measurements (possibly several per survey) filtered on
   ``exclude_flag IS FALSE AND (swe IS NOT NULL OR depth IS NOT NULL)``
   collapse to per-survey means, emitted as TWO result rows — one for
   the SWE parameter, one for depth (downloadSnowCourse.R:184-199).
2. Survey/target dates shift +68400 s — 19 h, noon MST expressed in
   UTC (:230-240).
3. When a station moved, overlapping survey dates between the old and
   new location calibrate a per-parameter ratio offset
   ``mean(new means over common dates) / mean(old means over common
   dates)``; old-location history is scaled by it and old rows whose
   dates the new station also has are discarded (:243-330).

Spark-first: per-survey means are one partial-aggregated groupBy; the
swe/depth fan-out is a stack() unpivot; the calibration is a tiny
cross-computed aggregate (two scalars) applied map-side — no loops, so
recalibrating every moved station in the network is one job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.daily import exact_mean

NOON_MST_SHIFT_S = 68400  # 19 h: survey dates stored at noon MST, in UTC

PARAM_SWE = "swe"
PARAM_DEPTH = "depth"


def survey_means(measurements: DataFrame) -> DataFrame:
    """Per-survey mean SWE/depth, unpivoted to parameter rows.

    Input: (location, survey_id, survey_date, target_date, swe, depth,
    exclude_flag).  Output: one row per (survey, parameter in
    {swe, depth}) with the mean over included measurements; surveys
    where a parameter is entirely NULL yield no row for it (the
    reference's NaN means are dropped on insert)."""
    kept = measurements.where(
        (~F.coalesce(F.col("exclude_flag"), F.lit(False)))
        & (F.col("swe").isNotNull() | F.col("depth").isNotNull())
    )
    agg = kept.groupBy("location", "survey_id", "survey_date", "target_date").agg(
        exact_mean(F.col("swe")).alias(PARAM_SWE),
        exact_mean(F.col("depth")).alias(PARAM_DEPTH),
    )
    long = agg.selectExpr(
        "location", "survey_id", "survey_date", "target_date",
        f"stack(2, '{PARAM_SWE}', {PARAM_SWE}, '{PARAM_DEPTH}', {PARAM_DEPTH}) "
        "AS (parameter, result)",
    ).where(F.col("result").isNotNull())
    return long.select(
        "location", "survey_id", "parameter", "result",
        (F.col("survey_date").cast("timestamp")
         + F.expr(f"INTERVAL {NOON_MST_SHIFT_S} SECONDS")).alias("datetime"),
        (F.col("target_date").cast("timestamp")
         + F.expr(f"INTERVAL {NOON_MST_SHIFT_S} SECONDS")).alias("target_datetime"),
    )


def station_move_adjust(old_meas: DataFrame, new_meas: DataFrame) -> DataFrame:
    """Calibrate + merge a moved station's history
    (downloadSnowCourse.R:243-330).

    Per parameter: offset = mean(new results on common datetimes) /
    mean(old results on common datetimes); old rows are scaled by it;
    old rows on datetimes the new station covers are dropped; the
    union is the continuous record.  The offset frame is two rows —
    broadcast — so the scaling pass is map-only over the history."""
    common = (
        old_meas.select("datetime").distinct()
        .join(new_meas.select("datetime").distinct(), "datetime")
    )
    def _cal(df):
        return (
            df.join(F.broadcast(common), "datetime")
            .groupBy("parameter")
            .agg(exact_mean(F.col("result")).alias("m"))
        )
    offsets = (
        _cal(new_meas).withColumnRenamed("m", "m_new")
        .join(_cal(old_meas).withColumnRenamed("m", "m_old"), "parameter")
        .select("parameter", (F.col("m_new") / F.col("m_old")).alias("offset"))
    )
    adjusted_old = (
        old_meas.join(new_meas.select("datetime").distinct(), "datetime",
                      "left_anti")
        .join(F.broadcast(offsets), "parameter", "left")
        .withColumn("result",
                    F.col("result") * F.coalesce(F.col("offset"), F.lit(1.0)))
        .drop("offset")
        .withColumn("adjusted", F.lit(True))
    )
    return new_meas.withColumn("adjusted", F.lit(False)) \
        .unionByName(adjusted_old)
