"""National Hydro Network loader + bulk geometry codec
(R/load_nhn.R:1-528, fetch/GPKG-decode injectable).

The reference downloads two national GeoPackages (``rhn_nhn_hnet`` /
``rhn_nhn_hhyd``), reads a fixed set of layers, constructs the
database's unique ``feature_name`` per layer (load_nhn.R:228-243,
278-288 — a layer-specific prefix + the NHN feature id), routes the
remaining attribute columns to JSON, clips to a bbox, and inserts via
insertACVector with ``overwrite`` semantics.

No GDAL here, so the GPKG decode is injectable: layers arrive as CSV
with a WKT ``geometry`` column plus attribute columns (the exact frame
``terra::vect`` would yield).  Everything after decode is real and
distributed: WKT -> (ring, wkb) via an Arrow-batched kernel, layer
normalization as column expressions, bbox clip, and the relational
upsert from operators/vector.py.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import wkb as wkb_codec
from ..operators.vector import prepare_features, upsert_features, with_bbox

# layer -> (layer_name in the vectors table, feature prefix, id column,
# attribute columns preserved as JSON) — load_nhn.R:186-243,278-288
NHN_LAYERS = {
    "basins": ("National Hydro Network - Basins", "NHN basin ", "dataset_name",
               ("area_km2", "province")),
    "junctions": ("National Hydro Network - Hydro Junctions",
                  "NHN hydro junction ", "junction_id", ("junction_type",)),
    "flowpaths": ("National Hydro Network - Flowpaths", "NHN flowpath ",
                  "flowpath_id", ("flow_direction", "length_km")),
    "waterbodies": ("National Hydro Network - Waterbodies", "NHN waterbody ",
                    "waterbody_id", ("permanency", "area_km2")),
}

RING_TYPE = "array<struct<x:double,y:double>>"


def decode_wkt_geometries(df: DataFrame, wkt_col: str = "geometry") -> DataFrame:
    """Bulk WKT -> (geom_type, ring, wkb): Arrow-batched kernel via
    mapInPandas (the decode seam where a production build would read
    GPKG/shapefile binary instead)."""
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name != wkt_col
    )
    out_schema = (fields + ", " if fields else "") + \
        f"geom_type string, ring {RING_TYPE}, wkb binary"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            geoms = [wkb_codec.parse_wkt(s) for s in pdf[wkt_col]]
            out = pdf.drop(columns=[wkt_col]).copy()
            out["geom_type"] = [g[0] for g in geoms]
            out["ring"] = [[{"x": x, "y": y} for x, y in g[1]] for g in geoms]
            out["wkb"] = [wkb_codec.encode(g[0], g[1]) for g in geoms]
            yield out

    return df.mapInPandas(kernel, schema=out_schema)


def load_nhn_layer(
    spark: SparkSession,
    layer: str,
    existing: DataFrame,
    payload_path: str | None = None,
    clip: tuple[float, float, float, float] | None = None,
    overwrite: bool = False,
) -> DataFrame:
    """One NHN layer end-to-end: decode -> feature_name construction ->
    attribute JSON routing -> bbox clip -> upsert classification.

    Returns the merge-action frame (geom_id, action, ...) — the Spark
    analog of load_nhn.R's per-layer insertACVector call."""
    if layer not in NHN_LAYERS:
        raise ValueError(f"unknown NHN layer {layer!r}; "
                         f"valid: {sorted(NHN_LAYERS)}")
    if payload_path is None:
        raise NotImplementedError(
            "NHN fetch requires the NRCan archive; pass payload_path with "
            "a decoded layer CSV (WKT geometry column)"
        )
    layer_name, prefix, id_col, attr_cols = NHN_LAYERS[layer]
    raw = spark.read.option("header", True).option("inferSchema", True) \
        .csv(payload_path)
    g = decode_wkt_geometries(raw)
    # unique key construction (load_nhn.R:228-243): prefix + feature id
    g = g.withColumn("__fname", F.concat(F.lit(prefix), F.col(id_col).cast("string")))
    feats = prepare_features(
        g, layer_name, feature_name_col="__fname",
        description_col="description" if "description" in g.columns else None,
        description=None if "description" in g.columns
        else f"{layer_name} feature",
        attr_cols=[c for c in attr_cols if c in g.columns],
    )
    if clip is not None:
        xmin, ymin, xmax, ymax = clip
        feats = with_bbox(feats).where(
            (F.col("xmin") <= xmax) & (F.col("xmax") >= xmin)
            & (F.col("ymin") <= ymax) & (F.col("ymax") >= ymin)
        ).drop("xmin", "xmax", "ymin", "ymax")
    return upsert_features(existing, feats, overwrite=overwrite)
