"""Deterministic hydromet fixtures (FIXTURES.md; reference
R/create_test_DB.R:369-1450 closed forms).

All series generated JVM-side from ``spark.range`` + expressions — no
driver loops — so the fixture scales to any cadence/range. Values
follow the reference's closed forms exactly:

  ts1: 15-min,  round(10 + sin(epoch/86400)*0.25, 3)   water level
  ts2: 15-min,  round(4 + cos(epoch/43200)*1.5, 3)     water temp (n%37 imputed)
  ts9: 1-hour,  round(138 + sin(epoch/216000)*18 + cos(epoch/604800)*7, 3)
  ts6: compound — priority fallback (ts1 primary, ts2 backup from use_from)
  ts10: compound — 'cond / (1 + 0.0191 * (temp - 25))' (temp=ts2, cond=ts9)

Corrections: one offset_linear +0.25 on ts1 over [2023-01-03,
2023-01-04) (create_test_DB.R:1142-1151). Grades: ts1 A then B split at
2022-01-01.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.corrections import Correction

START = "2022-06-01 00:00:00"
END = "2023-06-01 00:00:00"

# ts1 audit-history fixtures: the first ingest was biased +1.0 inside
# this window and inserted spurious points inside the January gap; the
# correction batch committed at AUDIT_FIX restored both.
AUDIT_WINDOW = ("2023-02-10 00:00:00", "2023-02-14 23:59:59")
AUDIT_FIX = "2023-03-15 00:00:00"


@dataclass
class FixtureStore:
    timeseries: DataFrame
    measurements: DataFrame
    corrections: list = field(default_factory=list)
    compounds: dict = field(default_factory=dict)  # tsid -> definition
    grades: DataFrame | None = None  # interval QC (code, start_dt, end_dt)
    # append-only audit/version log (the reference's audit.* tables,
    # patch_55.R:2006-2119): one row per committed version of a
    # measurement key, tombstones flagged. None -> no history recorded;
    # as-of reads then see the live table at every timestamp.
    measurement_versions: DataFrame | None = None


def build_store(spark: SparkSession, start: str = START, end: str = END) -> FixtureStore:
    # range count guard: bound spark.range upfront
    import datetime as dt

    span = int(
        (dt.datetime.fromisoformat(end) - dt.datetime.fromisoformat(start)).total_seconds()
    )

    def series(tsid, step, expr, imputed="false"):
        n = span // step + 1
        return (
            spark.range(0, n)
            .withColumn(
                "datetime",
                F.timestamp_seconds(
                    F.unix_timestamp(F.lit(start).cast("timestamp"))
                    + F.col("id") * step
                ),
            )
            .withColumn("epoch", F.unix_timestamp("datetime").cast("double"))
            .withColumn("n", F.col("id") + 1)
            .select(
                F.lit(tsid).alias("timeseries_id"),
                "datetime",
                F.expr(expr).cast("double").alias("value"),
                F.expr(imputed).alias("imputed"),
                F.lit(False).alias("no_update"),
            )
        )

    ts1 = series(1, 900, "round(10 + sin(epoch/86400)*0.25, 3)")
    # ts1 gaps: drop a window so the ts6 compound's backup member kicks in
    ts1 = ts1.where(
        ~F.col("datetime").between(
            F.lit("2023-01-10 00:00:00").cast("timestamp"),
            F.lit("2023-01-12 00:00:00").cast("timestamp"),
        )
    )
    ts2 = series(2, 900, "round(4 + cos(epoch/43200)*1.5, 3)", imputed="n % 37 = 0")
    ts9 = series(9, 3600,
                 "round(138 + sin(epoch/216000)*18 + cos(epoch/604800)*7, 3)")
    measurements = ts1.unionByName(ts2).unionByName(ts9)

    timeseries = spark.createDataFrame(
        [
            (1, "basic", "instantaneous", 900, 0, True),
            (2, "basic", "instantaneous", 900, 0, True),
            (9, "basic", "mean", 3600, 0, True),
            (6, "compound", "instantaneous", 900, 0, True),
            (10, "compound", "mean", 3600, 0, True),
        ],
        ["timeseries_id", "timeseries_type", "aggregation_type",
         "record_rate_seconds", "timezone_daily_calc", "active"],
    )

    corrections = [
        Correction(1, 1, "2023-01-03 00:00:00", "2023-01-04 00:00:00",
                   "offset_linear", value1=0.25),
    ]
    compounds = {
        6: {
            "expression": None,
            "members": [
                {"alias": "primary_level", "timeseries_id": 1, "priority": 1,
                 "use_from": None, "use_to": None},
                {"alias": "backup_level", "timeseries_id": 2, "priority": 2,
                 "use_from": "2023-01-05 00:00:00", "use_to": None},
            ],
        },
        10: {
            "expression": "cond / (1 + 0.0191 * (temp - 25))",
            "members": [
                {"alias": "temp", "timeseries_id": 2, "priority": 1,
                 "use_from": None, "use_to": None},
                {"alias": "cond", "timeseries_id": 9, "priority": 1,
                 "use_from": None, "use_to": None},
            ],
        },
    }
    # Grades: ts1 A then B split at 2023-01-01, one unusable-'N' window
    # (excluded from daily calc, patch_48.R:340-350) and one zero-width
    # 'N' marker that must NOT exclude anything (g.start_dt <> g.end_dt).
    grades = spark.createDataFrame(
        [
            (1, "A", start, "2023-01-01 00:00:00"),
            (1, "B", "2023-01-01 00:00:00", end),
            (1, "N", "2023-02-01 00:00:00", "2023-02-05 00:00:00"),
            (1, "N", "2023-03-01 00:00:00", "2023-03-01 00:00:00"),
        ],
        ["timeseries_id", "grade_code", "start_dt", "end_dt"],
    ).select(
        "timeseries_id", "grade_code",
        F.col("start_dt").cast("timestamp").alias("start_dt"),
        F.col("end_dt").cast("timestamp").alias("end_dt"),
    )
    # Version log for ts1 (audit.* shape, patch_55.R:2006-2119): the
    # first ingest (version 1, committed at each point's own datetime)
    # carried a +1.0 bias inside AUDIT_WINDOW and spurious hourly points
    # inside the January gap; a correction batch (version 2, committed
    # at AUDIT_FIX) re-issued the window at the live values and
    # tombstoned the spurious points. The log's LATEST state therefore
    # equals the live `measurements` table — as-of reads at t >=
    # AUDIT_FIX reproduce live, earlier ones see the bad first ingest.
    in_w = F.col("datetime").between(
        F.lit(AUDIT_WINDOW[0]).cast("timestamp"),
        F.lit(AUDIT_WINDOW[1]).cast("timestamp"),
    )

    def vrow(df, version, modified, deleted, bias=0.0):
        mod = (
            F.col("datetime") if modified is None
            else F.lit(modified).cast("timestamp")
        )
        return df.select(
            "timeseries_id", "datetime",
            (F.col("value") + F.lit(bias)).alias("value"), "imputed",
            F.lit(version).alias("version_id"), mod.alias("modified_at"),
            F.lit(deleted).alias("deleted"),
        )

    spurious = series(1, 3600, "round(10 + sin(epoch/86400)*0.25, 3)").where(
        F.col("datetime").between(
            F.lit("2023-01-10 01:00:00").cast("timestamp"),
            F.lit("2023-01-11 23:00:00").cast("timestamp"),
        )
    )
    measurement_versions = (
        vrow(ts1.where(~in_w), 1, None, False)
        .unionByName(vrow(ts1.where(in_w), 1, None, False, bias=1.0))
        .unionByName(vrow(spurious, 1, None, False))
        .unionByName(vrow(ts1.where(in_w), 2, AUDIT_FIX, False))
        .unionByName(vrow(spurious, 2, AUDIT_FIX, True))
    )
    return FixtureStore(timeseries, measurements, corrections, compounds,
                        grades=grades,
                        measurement_versions=measurement_versions)
