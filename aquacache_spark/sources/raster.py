"""Raster-series connectors: ERA5 / HRDPA / HRDPS / CaLDAS decoded-grid
normalization (fetch + NetCDF/GRIB decode injectable).

Reference surface: R/downloadERA5.R:17 (CDS reanalysis, hour-ending
accumulation windows ``valid_from = t-1h, valid_to = t``, ``issued``
recovered from the file timestamp, ERA5T recent data flagged
preliminary), R/downloadHRDPA.R:11 (6h/24h precip accumulation
analyses), R/downloadHRDPS.R (forecast: one raster per lead hour,
``valid_from = issued + lead``), R/downloadCaLDAS.R (hourly snow
analysis).  Each returns a list of rasters + attributes which
insertACRaster/insertACModelRaster split into ``rasters_reference``
(metadata) and tiled ``rasters`` rows (R/insertACRaster.R:97-109).

This environment has no network and no GDAL/NetCDF stack, so the fetch
+ decode step is injectable: connectors accept ``payload_path`` — a CSV
of already-decoded grid cells, one row per (timestep, cell):

    issued,valid_from,valid_to,units,flag,x,y,value

(blank issued/flag allowed).  Everything downstream of decode is real
and distributed: timestamp normalization, per-source window derivation,
deterministic reference-id assignment, and tiling via
operators/raster.tile_cells.  A production deployment swaps the CSV
read for a mapInPandas decode over binary GRIB blobs — the contract out
of this module is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import md5_int
from ..operators.raster import tile_cells

GRID_SCHEMA = "issued string, valid_from string, valid_to string, " \
              "units string, flag string, x int, y int, value double"


def _read_grid_payload(spark: SparkSession, payload_path: str) -> DataFrame:
    return (
        spark.read.schema(GRID_SCHEMA).option("header", True).csv(payload_path)
        .withColumn("issued", F.to_timestamp("issued"))
        .withColumn("valid_from", F.to_timestamp("valid_from"))
        .withColumn("valid_to", F.to_timestamp("valid_to"))
    )


def _stamp_reference_id(df: DataFrame, series: str) -> DataFrame:
    """Deterministic reference id: portable md5-int of the natural key
    (series, valid_from, issued) — reproducible across engines and
    re-runs, unlike the reference's serial PK (insertACRaster.R:97)."""
    return df.withColumn(
        "reference_id",
        md5_int(F.concat_ws(
            "|", F.lit(series),
            F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss"),
            F.coalesce(F.date_format("issued", "yyyy-MM-dd HH:mm:ss"), F.lit("")),
        )),
    )


def _window_filter(df: DataFrame, start_datetime: str, end_datetime: str) -> DataFrame:
    return df.where(
        (F.col("valid_to") > F.to_timestamp(F.lit(start_datetime)))
        & (F.col("valid_to") <= F.to_timestamp(F.lit(end_datetime)))
    )


def normalize_grid(
    spark: SparkSession,
    series: str,
    payload_path: str,
    start_datetime: str,
    end_datetime: str,
    accum_hours: int | None,
    reanalysis: bool,
) -> DataFrame:
    """Shared normalization: window filter, per-source valid_from
    derivation, issued/flag defaulting, reference-id stamping.

    Output: one row per (reference_id, cell) —
    (reference_id, valid_from, valid_to, issued, units, flag, x, y, value).
    """
    g = _window_filter(_read_grid_payload(spark, payload_path),
                       start_datetime, end_datetime)
    if accum_hours is not None:
        # accumulation windows are hour-ending (downloadERA5.R:379-382,
        # downloadHRDPA.R parameter Accum6h/Accum24h)
        g = g.withColumn(
            "valid_from",
            F.coalesce("valid_from",
                       F.col("valid_to") - F.expr(f"INTERVAL {accum_hours} HOURS")),
        )
    if reanalysis:
        # reanalysis has no forecast issue cycle: issued defaults to the
        # valid time; recent (ERA5T-style) rows keep their PRELIMINARY flag
        g = g.withColumn("issued", F.coalesce("issued", "valid_to"))
    g = g.withColumn("flag", F.coalesce("flag", F.lit("FINAL")))
    return _stamp_reference_id(g, series).select(
        "reference_id", "valid_from", "valid_to", "issued", "units", "flag",
        "x", "y", "value",
    )


def to_reference_and_tiles(
    cells: DataFrame, series: str, tile: int = 16
) -> tuple[DataFrame, DataFrame]:
    """Split a normalized grid batch into the two store tables
    (insertACRaster.R:4-8 data model): ``rasters_reference`` metadata
    rows and row-major tiles.

    Reference rows are catalog-sized (one per timestep); tiles carry the
    mass.  Tiling shuffles once on (reference_id, tile_x, tile_y) — the
    store's clustering key, so the write is already co-located for
    bbox-pruned reads.
    """
    reference = (
        cells.groupBy("reference_id", "valid_from", "valid_to", "issued",
                      "units", "flag")
        .agg(F.count("*").alias("n_cells"))
        .withColumn("raster_series_id", F.lit(series))
    )
    tiles = tile_cells(cells, tile=tile, keys=["reference_id"])
    return reference, tiles


def download_era5(spark: SparkSession, parameter: str, start_datetime: str,
                  end_datetime: str, payload_path: str | None = None,
                  **_) -> DataFrame:
    """ERA5-Land reanalysis (R/downloadERA5.R:17): hour-ending 1h
    windows, issued := valid time, ERA5T rows arrive flagged
    PRELIMINARY and are replaced on the final release."""
    if payload_path is None:
        raise NotImplementedError(
            "ERA5 fetch requires the CDS API; pass payload_path with a "
            "decoded-grid CSV (see sources/raster.py docstring)"
        )
    return normalize_grid(spark, f"ERA5:{parameter}", payload_path,
                          start_datetime, end_datetime,
                          accum_hours=1, reanalysis=True)


def download_hrdpa(spark: SparkSession, parameter: str, start_datetime: str,
                   end_datetime: str, payload_path: str | None = None,
                   **_) -> DataFrame:
    """HRDPA precip accumulation analysis (R/downloadHRDPA.R:11):
    6h or 24h hour-ending windows derived from the parameter name."""
    if payload_path is None:
        raise NotImplementedError(
            "HRDPA fetch requires the ECCC datamart; pass payload_path "
            "with a decoded-grid CSV"
        )
    accum = 24 if "24" in parameter else 6
    return normalize_grid(spark, f"HRDPA:{parameter}", payload_path,
                          start_datetime, end_datetime,
                          accum_hours=accum, reanalysis=False)


def download_hrdps(spark: SparkSession, parameter: str, start_datetime: str,
                   end_datetime: str, payload_path: str | None = None,
                   **_) -> DataFrame:
    """HRDPS forecast (R/downloadHRDPS.R): one raster per lead hour;
    the payload carries issued + valid_from per row (valid_from =
    issued + lead)."""
    if payload_path is None:
        raise NotImplementedError(
            "HRDPS fetch requires the ECCC datamart; pass payload_path "
            "with a decoded-grid CSV"
        )
    return normalize_grid(spark, f"HRDPS:{parameter}", payload_path,
                          start_datetime, end_datetime,
                          accum_hours=1, reanalysis=False)


def download_caldas(spark: SparkSession, parameter: str, start_datetime: str,
                    end_datetime: str, payload_path: str | None = None,
                    **_) -> DataFrame:
    """CaLDAS snow analysis (R/downloadCaLDAS.R): hourly analysis
    grid, treated as an hour-ending 1h window like ERA5 but with a
    real issue cycle."""
    if payload_path is None:
        raise NotImplementedError(
            "CaLDAS fetch requires the ECCC datamart; pass payload_path "
            "with a decoded-grid CSV"
        )
    return normalize_grid(spark, f"CaLDAS:{parameter}", payload_path,
                          start_datetime, end_datetime,
                          accum_hours=1, reanalysis=False)
