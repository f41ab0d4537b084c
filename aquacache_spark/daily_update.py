"""The scheduled-maintenance orchestrator (R/dailyUpdate.R:28-...).

The reference's nightly entry point sequences: continuous ingest →
daily-stat recalculation → discrete ingest → HYDAT refresh → images →
rasters, honoring per-series ``active`` flags and id subsets. Here each
stage is a composition of the already-tested operators, with the
network-facing fetch injectable (the environment is network-free; the
reference itself tests these loops against canned payloads).

Design notes (Spark-first, 100 TB):

- The catalog slice is tiny (one row per series) — it drives which
  *partitions* of the fact tables are touched. Every heavy step below
  is keyed on (timeseries_id, date-range) so recomputation is scoped,
  never whole-table (getNewContinuous.R's per-series loop becomes the
  changed-ranges → closure → scoped-recompute cascade of
  streaming/incremental.py).
- Fetches are grouped by cache-sharing key (fetch_task_groups) so one
  task serves all series of one remote payload.
- Results are plain dicts of counts — the reference's console
  diagnostics, machine-readable.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.daily import daily_rollup
from .operators.maintenance import timeseries_bounds_refresh
from .sources.registry import fetch_task_groups, validate_contract
from .streaming.incremental import (
    expand_changed_ranges,
    incremental_daily_refresh,
    trim_daily_tail,
)


def select_series(
    catalog: DataFrame,
    timeseries_id: Sequence[int] | str = "all",
    active: str = "default",
) -> DataFrame:
    """dailyUpdate.R id-subset + active handling: 'default' honors the
    catalog's active flag, 'all' ignores it; source-less series are
    never fetched."""
    if active not in ("default", "all"):
        raise ValueError("active must be 'default' or 'all'")
    out = catalog.where(F.col("source_fx").isNotNull())
    if active == "default":
        out = out.where(F.col("active"))
    if timeseries_id != "all":
        out = out.where(F.col("timeseries_id").isin(list(timeseries_id)))
    return out


def ingest_continuous(
    spark: SparkSession,
    catalog: DataFrame,
    fetch: Callable[[SparkSession, DataFrame], DataFrame],
    measurements: DataFrame,
    existing_daily: DataFrame,
    dependencies: Optional[DataFrame] = None,
) -> dict:
    """getNewContinuous → refresh pipeline for one run:

    1. group the catalog by cache-sharing fetch key;
    2. ``fetch`` returns the new contract rows (timeseries_id,
       datetime, value) — in production a connector batch, in tests a
       canned frame;
    3. high-watermark filter: only rows past each series'
       last_data_point survive (getNewContinuous.R incremental pull);
    4. changed (series, date-range) slices → scoped daily recompute →
       merge-action classification; tail trim rows flagged for delete.

    Returns counts per step plus the refreshed frames under ``_df``
    keys (callers persist them through their store).
    """
    tasks = fetch_task_groups(catalog)
    new_rows = validate_contract(fetch(spark, tasks), key_cols=("timeseries_id",))
    wm = catalog.select(
        "timeseries_id", F.col("last_data_point").alias("__wm")
    )
    fresh = (
        new_rows.join(F.broadcast(wm), "timeseries_id", "left")
        .where(F.col("__wm").isNull() | (F.col("datetime") > F.col("__wm")))
        .drop("__wm")
    )
    combined = measurements.unionByName(fresh.select(measurements.columns))
    ranges = fresh.groupBy("timeseries_id").agg(
        F.min("datetime").alias("min_dt"), F.max("datetime").alias("max_dt")
    )
    if dependencies is not None:
        ranges = expand_changed_ranges(ranges, dependencies)
    refreshed = incremental_daily_refresh(
        combined, ranges, existing_daily,
        lambda scoped: daily_rollup(scoped, keys=["timeseries_id"]),
    )
    trims = trim_daily_tail(existing_daily, combined)
    actions = {
        r["merge_action"]: r["n"]
        for r in refreshed.groupBy("merge_action").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    return {
        "new_points": fresh.count(),
        "daily_insert": actions.get("insert", 0),
        "daily_update": actions.get("update", 0),
        "daily_unchanged": actions.get("unchanged", 0),
        "tail_trim_rows": trims.count(),
        "_measurements_df": combined,
        "_daily_df": refreshed,
        "_trim_df": trims,
    }


def refresh_watermarks(catalog: DataFrame, measurements: DataFrame) -> DataFrame:
    """last_data_point / bounds maintenance after ingest (the reference
    updates continuous.timeseries after each pull)."""
    last = measurements.groupBy("timeseries_id").agg(
        F.max("datetime").alias("__last")
    )
    return (
        catalog.join(last, "timeseries_id", "left")
        .withColumn(
            "last_data_point",
            F.greatest(F.coalesce("last_data_point", "__last"), "__last"),
        )
        .drop("__last")
    )


def daily_update(
    spark: SparkSession,
    *,
    continuous_catalog: Optional[DataFrame] = None,
    fetch_continuous: Optional[Callable[[SparkSession, DataFrame], DataFrame]] = None,
    measurements: Optional[DataFrame] = None,
    existing_daily: Optional[DataFrame] = None,
    dependencies: Optional[DataFrame] = None,
    discrete_stage: Optional[Callable[[], dict]] = None,
    hydat_stage: Optional[Callable[[], dict]] = None,
    images_stage: Optional[Callable[[], dict]] = None,
    rasters_stage: Optional[Callable[[], dict]] = None,
    timeseries_id: Sequence[int] | str = "all",
    active: str = "default",
    continuous: bool = True,
    discrete: bool = True,
    hydat: bool = True,
    images: bool = True,
    rasters: bool = True,
) -> dict:
    """dailyUpdate.R:28 — run the enabled stages in the reference's
    order and collect per-stage diagnostics. Discrete/hydat/images/
    rasters stages are injectable closures over their own operator
    compositions (operators/discrete_sync.py, the hydat merge, media
    watermarks, raster model_asof); a missing closure marks the stage
    skipped, mirroring the reference's toggle parameters."""
    report: dict = {}
    if continuous and continuous_catalog is not None:
        cat = select_series(continuous_catalog, timeseries_id, active)
        report["continuous"] = ingest_continuous(
            spark, cat, fetch_continuous, measurements, existing_daily,
            dependencies,
        )
        report["catalog_refreshed"] = refresh_watermarks(
            cat, report["continuous"]["_measurements_df"]
        )
        report["bounds_refreshed"] = timeseries_bounds_refresh(
            report["catalog_refreshed"],
            report["continuous"]["_measurements_df"],
        ) if "start_datetime" in continuous_catalog.columns else None
    for name, enabled, stage in (
        ("discrete", discrete, discrete_stage),
        ("hydat", hydat, hydat_stage),
        ("images", images, images_stage),
        ("rasters", rasters, rasters_stage),
    ):
        if enabled and stage is not None:
            report[name] = stage()
        else:
            report[name] = {"skipped": True}
    return report
