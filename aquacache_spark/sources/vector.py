"""National Hydro Network loader + bulk geometry codec
(R/load_nhn.R:1-528, fetch/GPKG-decode injectable).

The reference downloads two national GeoPackages (``rhn_nhn_hnet`` /
``rhn_nhn_hhyd``), reads a fixed set of layers, constructs the
database's unique ``feature_name`` per layer (load_nhn.R:228-243,
278-288 — a layer-specific prefix + the NHN feature id), routes the
remaining attribute columns to JSON, clips to a bbox, and inserts via
insertACVector with ``overwrite`` semantics.

No GDAL here, but none is needed for the container: GeoPackage is
SQLite, so ``read_gpkg_layer`` opens the national archive with the
stdlib driver — catalog tables on the driver process, feature rows
read by EXECUTORS over disjoint rowid ranges (the partitioned-JDBC
pattern) — and ``decode_gpkg_geometries`` strips the GPB header and
decodes the WKB with the pure-stdlib codec (functions/wkb.py). A CSV
payload with a WKT ``geometry`` column remains supported as the
injectable decode seam.  Everything after decode is distributed:
layer normalization as column expressions, bbox clip, and the
relational upsert from operators/vector.py.
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


_SQLITE_TO_SPARK = {
    "INTEGER": "bigint", "INT": "bigint", "MEDIUMINT": "bigint",
    "REAL": "double", "DOUBLE": "double", "FLOAT": "double",
    "TEXT": "string", "VARCHAR": "string", "BLOB": "binary",
}


def gpb_to_wkb(blob: bytes) -> bytes:
    """Strip the GeoPackage binary header (GPB, OGC 12-128r19 §2.1.3):
    magic 'GP', version, flags byte (bits 1-3 = envelope contents
    code), int32 srs_id, optional envelope — the rest is standard WKB,
    which functions/wkb.py decodes."""
    if blob[:2] != b"GP":
        raise ValueError("not a GeoPackage geometry blob")
    flags = blob[3]
    env_code = (flags >> 1) & 0b111
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}.get(env_code)
    if env_len is None:
        raise ValueError(f"invalid GPB envelope code {env_code}")
    return bytes(blob[8 + env_len:])


def read_gpkg_layer(
    spark: SparkSession,
    path: str,
    table: str,
    n_chunks: int = 16,
) -> DataFrame:
    """Distributed read of one GeoPackage feature table — GPKG is
    SQLite, so the container opens with the stdlib driver; the driver
    process reads only the catalog (gpkg_geometry_columns, PRAGMA
    table_info, rowid bounds) and EXECUTORS each read a disjoint rowid
    range — the partitioned-JDBC pattern without a JDBC jar. At scale
    the .gpkg sits on shared storage and the scan parallelizes across
    the cluster; per-chunk work is an index-range sqlite scan.

    Output: attribute columns (sqlite decltypes mapped to Spark types)
    plus the geometry as ``geometry binary`` (raw GPB blob).
    """
    import sqlite3

    uri = f"file:{path}?mode=ro"
    con = sqlite3.connect(uri, uri=True)
    try:
        row = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns "
            "WHERE table_name = ?", (table,)
        ).fetchone()
        if row is None:
            raise ValueError(f"{table!r} is not a feature table in {path}")
        geom_col = row[0]
        info = con.execute(f'PRAGMA table_info("{table}")').fetchall()
        lo_hi = con.execute(
            f'SELECT min(rowid), max(rowid) FROM "{table}"'
        ).fetchone()
    finally:
        con.close()
    lo, hi = (lo_hi[0] or 0), (lo_hi[1] or -1)

    attr_cols = [name for _, name, *_ in info if name != geom_col]
    types = {
        name: _SQLITE_TO_SPARK.get(
            (decl or "TEXT").split("(")[0].strip().upper(), "string")
        for _, name, decl, *_ in info
    }
    schema = ", ".join(
        [f"`{c}` {types[c]}" for c in attr_cols] + ["geometry binary"]
    )
    n = max(1, min(n_chunks, hi - lo + 1))
    step = (hi - lo + n) // n if hi >= lo else 1
    bounds = spark.range(n).select(
        (F.lit(lo) + F.col("id") * step).alias("__lo"),
        F.least(F.lit(lo) + (F.col("id") + 1) * step - 1, F.lit(hi))
        .alias("__hi"),
    )
    sel = ", ".join([f'"{c}"' for c in attr_cols] + [f'"{geom_col}"'])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for b_lo, b_hi in zip(pdf["__lo"], pdf["__hi"]):
                c = sqlite3.connect(uri, uri=True)
                try:
                    cur = c.execute(
                        f'SELECT {sel} FROM "{table}" '
                        "WHERE rowid BETWEEN ? AND ?",
                        (int(b_lo), int(b_hi)),
                    )
                    rows = cur.fetchall()
                finally:
                    c.close()
                out = pd.DataFrame(
                    rows, columns=attr_cols + ["geometry"], dtype=object
                )
                yield out

    return bounds.mapInPandas(kernel, schema=schema)


def decode_gpkg_geometries(df: DataFrame, geom_col: str = "geometry") -> DataFrame:
    """Bulk GPB blob -> (geom_type, ring, wkb), Arrow-batched — the
    native-container sibling of decode_wkt_geometries."""
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name != geom_col
    )
    out_schema = (fields + ", " if fields else "") + \
        f"geom_type string, ring {RING_TYPE}, wkb binary"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            wkbs = [gpb_to_wkb(b) for b in pdf[geom_col]]
            geoms = [wkb_codec.decode(w) for w in wkbs]
            out = pdf.drop(columns=[geom_col]).copy()
            out["geom_type"] = [g[0] for g in geoms]
            out["ring"] = [[{"x": x, "y": y} for x, y in g[1]] for g in geoms]
            out["wkb"] = wkbs
            yield out

    return df.mapInPandas(kernel, schema=out_schema)


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
    gpkg_path: str | None = None,
    gpkg_table: str | None = None,
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
    if payload_path is None and gpkg_path is None:
        raise NotImplementedError(
            "NHN fetch requires the NRCan archive; pass gpkg_path with a "
            "downloaded GeoPackage (read natively, R/load_nhn.R:96-115) "
            "or payload_path with a decoded layer CSV (WKT geometry)"
        )
    layer_name, prefix, id_col, attr_cols = NHN_LAYERS[layer]
    if gpkg_path is not None:
        raw = read_gpkg_layer(spark, gpkg_path, gpkg_table or layer)
        g = decode_gpkg_geometries(raw)
    else:
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
