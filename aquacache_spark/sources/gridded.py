"""Gridded-model raster connectors: HRDPA / HRDPS listing normalization
and run selection (R/downloadHRDPA.R:11, R/downloadHRDPS.R:11).

The reference's four gridded connectors (ERA5/HRDPA/HRDPS/CaLDAS) are
HTTP directory scrapes + GRIB decodes. The network fetch and the
terra/GDAL decode are environment adapters (stubbed here, like the
multimodal decode); everything between them — filename parsing,
analysis-vs-preliminary dedup, accumulation-window derivation, and
latest-complete-run selection — is pure relational logic, implemented
as codegen'd column expressions over a *listing* frame so a 30-day
scrape of thousands of files normalizes in one map pass.

Downstream, the selected references flow into the tiled raster store
(sources/raster.py, operators/raster.py) exactly as the reference's
files list flows into insertACModelRaster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hrdpa_normalize(
    listing: DataFrame,
    parameter: str,
    start_datetime,
    file_col: str = "file",
    path_col: str = "path",
) -> DataFrame:
    """Normalize an HRDPA directory listing (R/downloadHRDPA.R:80-125).

    Per file: ``datetime`` parsed from the leading ``YYYYMMDDTHH``
    stamp (:83-87), ``prelim`` when the name contains 'Prelim' (:112);
    rows before ``start_datetime`` drop (:121); when a datetime has
    more than one file, every *preliminary* row of that datetime drops
    (the analysis supersedes it, :123-125 — the reference's
    ``!(prelim & duplicates)`` keeps finals and singletons only);
    ``valid_from``/``valid_to`` span the accumulation window — 6 h when
    the parameter name contains '6h', else 24 h (:173-180); flag is
    'PRELIMINARY' or NULL (:181); model 'HRDPA'.

    One window count keyed by datetime (tiny listing frame); all else
    map-only.
    """
    accum_h = 6 if "6h" in parameter else 24
    parsed = listing.select(
        F.col(file_col).alias("file"),
        F.col(path_col).alias("path"),
        F.to_timestamp(
            F.substring(F.col(file_col), 1, 11), "yyyyMMdd'T'HH"
        ).alias("datetime"),
        F.col(file_col).contains("Prelim").alias("prelim"),
    ).where(F.col("datetime") >= F.lit(start_datetime))
    from pyspark.sql import Window

    n_at = F.count(F.lit(1)).over(Window.partitionBy("datetime"))
    return (
        parsed.withColumn("__n", n_at)
        .where(~(F.col("prelim") & (F.col("__n") > 1)))
        .select(
            "file", "path", "datetime", "prelim",
            (F.col("datetime") - F.expr(f"INTERVAL {accum_h} HOURS"))
            .alias("valid_from"),
            F.col("datetime").alias("valid_to"),
            F.when(F.col("prelim"), "PRELIMINARY").alias("flag"),
            F.lit("HRDPA").alias("model"),
            F.lit(False).alias("forecast"),
        )
    )


def hrdps_select_run(
    runs: DataFrame,
    last_issued,
    min_steps: int = 48,
    issue_col: str = "issue",
    steps_col: str = "n_steps",
) -> DataFrame:
    """Latest-complete-run selection (R/downloadHRDPS.R:39-126).

    ``runs``: one row per model run directory with its available
    timestep count. A run is *complete* when it has at least
    ``min_steps`` forecast files (:53-55); the newest complete run wins
    (:124-126); nothing is emitted when the database's last issued
    forecast (``last_issued``) is already >= that run (:119-121, the
    connector's no-new-forecast exit).
    """
    complete = runs.where(F.col(steps_col) >= min_steps)
    latest = complete.orderBy(F.desc(issue_col)).limit(1)
    if last_issued is not None:
        latest = latest.where(F.col(issue_col) > F.lit(last_issued))
    return latest


def hrdps_forecast_steps(
    run: DataFrame,
    parameter: str,
    base_col: str = "base_url",
    issue_col: str = "issue",
    n_steps: int = 48,
) -> DataFrame:
    """Expand the selected run into per-step references
    (R/downloadHRDPS.R:137-199): source URL
    ``{base}/{HHH}/{YYYYMMDDTHH}Z_MSC_HRDPS_{param}_RLatLon0.0225_PT{HHH}H.grib2``
    (:148-157), hourly valid windows ``[issue + s, issue + s + 1h)``
    (:194-195), model 'HRDPS', forecast-typed. Map-only ``sequence``
    explode — no Python, no shuffle.
    """
    stamp = F.date_format(F.col(issue_col), "yyyyMMdd'T'HH")
    step = F.explode(F.sequence(F.lit(0), F.lit(n_steps))).alias("step")
    out = run.select(F.col(base_col), F.col(issue_col), stamp.alias("__stamp"), step)
    hhh = F.lpad(F.col("step").cast("string"), 3, "0")
    return out.select(
        F.col(issue_col).alias("issued"),
        F.col("step"),
        F.concat(
            F.col(base_col), F.lit("/"), hhh, F.lit("/"), F.col("__stamp"),
            F.lit(f"Z_MSC_HRDPS_{parameter}_RLatLon0.0225_PT"), hhh,
            F.lit("H.grib2"),
        ).alias("source"),
        (F.col(issue_col) + F.col("step") * F.expr("INTERVAL 1 HOUR"))
        .alias("valid_from"),
        (F.col(issue_col) + (F.col("step") + 1) * F.expr("INTERVAL 1 HOUR"))
        .alias("valid_to"),
        F.lit(None).cast("string").alias("flag"),
        F.lit("HRDPS").alias("model"),
        F.lit(True).alias("forecast"),
    )


def fetch_grib(url: str):  # pragma: no cover - environment adapter
    """GRIB fetch+decode adapter (terra::rast in the reference). No
    network or GDAL in this environment; a deployment injects one that
    returns a cells frame for operators/raster.tile_cells."""
    raise NotImplementedError(
        "GRIB fetch/decode requires network + GDAL; inject a fetcher "
        "returning (x, y, value) cells and feed operators/raster.tile_cells"
    )
