"""Catalog / database maintenance (R/maintain.R, R/generateACLocationCode.R).

The reference's housekeeping pass re-expressed as pure DataFrame
transforms, so each check is a testable operator instead of imperative
SQL-over-connection:

- ``visibility_expiry_flip`` — maintain.R visibility_check: rows whose
  ``private_expiry`` has passed become ``share_with =
  ['public_reader']``, and expiry is nulled wherever the row is public.
- ``timeseries_bounds_refresh`` — maintain.R timeseries_check /
  refresh_basic_timeseries_datetime_bounds: recompute each series'
  [start, end] from the measurement facts and patch stale dim rows.
- ``location_checks`` — maintain.R locations_check: flag locations
  referenced by no fact table (candidate deletes) and locations with no
  point feature in the vector store (candidate inserts).
- ``generate_location_codes`` — generateACLocationCode.R:120-188: assign
  each new (lat, lon) point its smallest containing drainage-basin
  polygon, derive the ``NNAA[-TT]-#####`` code prefix from the basin
  name + location-type suffix, and number new codes after the existing
  per-prefix maximum.

Scale: every check is one scan + catalog-sized broadcast joins. The
bounds refresh aggregates the fact table on its partition key
(timeseries_id) — map-side combine, one shuffle. Code generation
broadcasts the basin polygons (catalog-sized) against the new-point
batch; the reference's per-point loop becomes one PIP join + two
windows over the (tiny) batch.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

PUBLIC = "public_reader"


def visibility_expiry_flip(
    df: DataFrame,
    today: Column,
    share_col: str = "share_with",
    expiry_col: str = "private_expiry",
) -> DataFrame:
    """maintain.R:204-242 — two UPDATEs as one projection.

    1. ``share_with != ['public_reader'] AND private_expiry < today``
       → share_with becomes ``['public_reader']``;
    2. any row now public gets ``private_expiry = NULL``.
    """
    public = F.array(F.lit(PUBLIC))
    expired = (
        F.col(expiry_col).isNotNull()
        & (F.col(expiry_col) < today)
        & ~(F.col(share_col) == public)
    )
    share2 = F.when(expired, public).otherwise(F.col(share_col))
    expiry2 = F.when(share2 == public, F.lit(None).cast("date")).otherwise(
        F.col(expiry_col)
    )
    return df.withColumn(share_col, share2).withColumn(expiry_col, expiry2)


def timeseries_bounds_refresh(
    timeseries: DataFrame,
    measurements: DataFrame,
    ts_col: str = "timeseries_id",
    dt_col: str = "datetime",
) -> DataFrame:
    """maintain.R:51-93 — recompute per-series datetime bounds from the
    facts and patch dim rows that disagree (null-safe compare).

    Output: the refreshed dim with ``bounds_changed`` flagging patched
    rows; series with no measurements keep their stored bounds.
    """
    actual = measurements.groupBy(ts_col).agg(
        F.min(dt_col).alias("__lo"), F.max(dt_col).alias("__hi")
    )
    j = timeseries.join(actual, ts_col, "left")
    changed = (
        F.col("__lo").isNotNull()
        & (
            ~F.col("start_datetime").eqNullSafe(F.col("__lo"))
            | ~F.col("end_datetime").eqNullSafe(F.col("__hi"))
        )
    )
    return (
        j.withColumn("bounds_changed", changed)
        .withColumn(
            "start_datetime",
            F.when(changed, F.col("__lo")).otherwise(F.col("start_datetime")),
        )
        .withColumn(
            "end_datetime",
            F.when(changed, F.col("__hi")).otherwise(F.col("end_datetime")),
        )
        .drop("__lo", "__hi")
    )


def location_checks(
    locations: DataFrame,
    used_location_ids: DataFrame,
    vector_features: DataFrame,
    id_col: str = "location_id",
    code_col: str = "location_code",
) -> DataFrame:
    """maintain.R:95-201 — orphan + missing-point-feature flags.

    ``used_location_ids``: one column ``location_id`` — the union of the
    FK-referencing tables' ids (the reference discovers them from
    pg_constraint; here the caller unions its fact tables).
    ``vector_features``: (layer_name, feature_name) from the vector
    store. Output adds ``orphan`` and ``missing_point``.
    """
    used = used_location_ids.select(
        F.col(used_location_ids.columns[0]).alias("__uid")
    ).distinct()
    feats = vector_features.where(F.col("layer_name") == "Locations").select(
        F.lower(F.col("feature_name")).alias("__feat")
    ).distinct()
    return (
        locations.join(
            F.broadcast(used), locations[id_col] == used["__uid"], "left"
        )
        .withColumn("orphan", F.col("__uid").isNull())
        .drop("__uid")
        .join(
            F.broadcast(feats),
            F.lower(locations[code_col]) == feats["__feat"],
            "left",
        )
        .withColumn("missing_point", F.col("__feat").isNull())
        .drop("__feat")
    )


def _ring_area2(ring: Column) -> Column:
    """Twice the (absolute) shoelace area of a closed-or-open ring
    (array<struct<x,y>>) — the ST_Area ordering key of
    generateACLocationCode.R:134 without a geometry lib."""
    n = F.size(ring)
    idx = F.sequence(F.lit(0), n - 1)
    terms = F.transform(
        idx,
        lambda i: (
            F.element_at(ring, i + 1)["x"] * F.element_at(ring, (i + 1) % n + 1)["y"]
            - F.element_at(ring, (i + 1) % n + 1)["x"] * F.element_at(ring, i + 1)["y"]
        ),
    )
    return F.abs(F.aggregate(terms, F.lit(0.0), lambda a, x: a + x))


def generate_location_codes(
    points: DataFrame,
    basins: DataFrame,
    location_types: DataFrame,
    existing_codes: DataFrame,
) -> DataFrame:
    """generateACLocationCode.R:120-188 as a distributed batch.

    - ``points``: (point_id, px, py, type_id) — the new locations, in
      input order (point_id ascending replays the reference's loop).
    - ``basins``: (feature_name, ring) polygons; each point takes its
      smallest containing basin (ST_Area ASC LIMIT 1 analog).
    - ``location_types``: (type_id, type_suffix); missing suffix → 'OT'.
    - ``existing_codes``: one column of already-assigned codes; new
      numbers continue after the per-prefix numeric maximum (the
      reference extracts the trailing digits of MAX(location_code); we
      take the numeric max of the extracted suffixes, which also orders
      correctly past 99999).

    Code shape: first 2 digits + 2-3 letters of the basin name, '-',
    type suffix, '-', sequence left-padded to 5 digits (wider once
    beyond 99999).
    """
    from .vector import point_in_polygon_join

    hits = point_in_polygon_join(points, basins.withColumn(
        "__area2", _ring_area2(F.col("ring"))
    ))
    best = Window.partitionBy("point_id").orderBy("__area2", "feature_name")
    assigned = (
        hits.withColumn("__rn", F.row_number().over(best))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__area2")
    )
    prefix = F.concat(
        F.regexp_extract(F.col("feature_name"), r"^([0-9]{2}[A-Za-z]{2,3})", 1),
        F.lit("-"),
        F.coalesce(F.col("type_suffix"), F.lit("OT")),
    )
    assigned = assigned.join(
        F.broadcast(location_types), "type_id", "left"
    ).withColumn("prefix", prefix)
    base = (
        existing_codes.select(
            F.regexp_extract(F.col(existing_codes.columns[0]),
                             r"^(.*)-([0-9]+)$", 1).alias("prefix"),
            F.regexp_extract(F.col(existing_codes.columns[0]),
                             r"([0-9]+)$", 1).cast("long").alias("__sfx"),
        )
        .groupBy("prefix")
        .agg(F.max("__sfx").alias("__base"))
    )
    w = Window.partitionBy("prefix").orderBy("point_id")
    seq = F.coalesce(F.col("__base"), F.lit(0)) + F.row_number().over(w)
    return (
        assigned.join(F.broadcast(base), "prefix", "left")
        .withColumn("__seq", seq)
        .withColumn(
            "location_code",
            # lpad truncates past its width in both engines, so widen
            # explicitly once the sequence outgrows 5 digits
            # (generateACLocationCode.R format_suffix)
            F.concat(
                F.col("prefix"),
                F.lit("-"),
                F.when(
                    F.length(F.col("__seq").cast("string")) > 5,
                    F.col("__seq").cast("string"),
                ).otherwise(F.lpad(F.col("__seq").cast("string"), 5, "0")),
            ),
        )
        .select("point_id", "feature_name", "prefix", "location_code")
    )


def masked_location_points(
    locations: DataFrame,
    min_offset_m: float,
    max_offset_m: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    seed_col: str = "seed",
    earth_radius_m: float = 6371008.8,
    spheroid: bool = False,
) -> DataFrame:
    """Deterministic public location masking
    (reference inst/patches/DEV_locs_masking.R:397-462,
    ``public.location_masked_point``): two md5-derived uniforms from the
    caller's seed — ``md5(seed || ':bearing')`` / ``':distance'`` first
    8 hex chars as uint32 / 4294967295 — pick a bearing in [0, 2π) and a
    distance in [min, max] metres; the point projects forward along
    that bearing. Stable across queries (masking, not randomization),
    and a pure map-side expression here.

    The reference projects on the WGS84 spheroid (ST_Project on
    geography); the default here is the spherical forward formula on
    the mean Earth radius — centimetre-scale difference at
    masking-scale offsets, bit-reproducible in the DuckDB oracle —
    and ``spheroid=True`` opts into the exact Vincenty direct
    projection (functions/geodesy.py) for PostGIS parity.

    Output: input columns + masked_lat, masked_lon, offset_m,
    bearing_rad.
    """
    if min_offset_m < 0 or max_offset_m < min_offset_m:
        raise ValueError("offsets must satisfy 0 <= min <= max")

    def u(tag: str) -> Column:
        h = F.substring(F.md5(F.concat(F.col(seed_col), F.lit(":" + tag))), 1, 8)
        return F.conv(h, 16, 10).cast("double") / 4294967295.0

    dist = F.lit(float(min_offset_m)) + F.lit(
        float(max_offset_m - min_offset_m)) * u("distance")
    bearing = 2.0 * math.pi * u("bearing")
    if spheroid:
        from ..functions.geodesy import with_vincenty_projection

        staged = locations.withColumn("offset_m", dist).withColumn(
            "bearing_rad", bearing)
        return with_vincenty_projection(
            staged, F.col(lat_col), F.col(lon_col),
            F.col("bearing_rad"), F.col("offset_m"),
            lat_out="masked_lat", lon_out="masked_lon",
        )
    lat1 = F.radians(F.col(lat_col))
    lon1 = F.radians(F.col(lon_col))
    delta = dist / F.lit(earth_radius_m)
    lat2 = F.asin(
        F.sin(lat1) * F.cos(delta) + F.cos(lat1) * F.sin(delta) * F.cos(bearing)
    )
    lon2 = lon1 + F.atan2(
        F.sin(bearing) * F.sin(delta) * F.cos(lat1),
        F.cos(delta) - F.sin(lat1) * F.sin(lat2),
    )
    return locations.select(
        "*",
        F.degrees(lat2).alias("masked_lat"),
        F.degrees(lon2).alias("masked_lon"),
        dist.alias("offset_m"),
        bearing.alias("bearing_rad"),
    )


def cleanup_share_with(
    df: DataFrame,
    role: str,
    replacement: str | None = None,
    col: str = "share_with",
):
    """Role removal/replacement across ``share_with`` arrays
    (public.cleanup_share_with_role, patch_45.R:104-210).

    Without a replacement, the role is removed; a row where it is the
    SOLE entry cannot be emptied — the reference refuses the whole run,
    we mark the row ``blocked`` so callers can assert the count is
    zero before committing.  With a replacement, ``array_replace`` then
    distinct + ascending sort (the reference's SELECT DISTINCT ...
    ORDER BY).  Returns the frame with (matched, only_role, action,
    <col>_new) appended — map-only, no shuffle.
    """
    sw = F.col(col)
    matched = F.array_contains(sw, role)
    removed = F.filter(
        F.array_remove(sw, role), lambda x: x.isNotNull()
    )
    only_role = matched & (F.size(removed) == 0)
    if replacement is None:
        new_arr = F.when(matched & ~only_role, removed).otherwise(sw)
        action = (
            F.when(only_role, "blocked")
            .when(matched, "updated")
            .otherwise("unchanged")
        )
    else:
        replaced = F.array_sort(
            F.array_distinct(
                F.filter(
                    F.transform(
                        sw,
                        lambda x: F.when(x == role, F.lit(replacement))
                        .otherwise(x),
                    ),
                    lambda x: x.isNotNull(),
                )
            )
        )
        new_arr = F.when(matched, replaced).otherwise(sw)
        action = F.when(matched, "updated").otherwise("unchanged")
    return (
        df.withColumn("matched", matched)
        .withColumn("only_role", only_role)
        .withColumn("action", action)
        .withColumn(f"{col}_new", new_arr)
    )


def validate_share_with(
    df: DataFrame,
    roles: DataFrame,
    col: str = "share_with",
    role_col: str = "role_name",
) -> DataFrame:
    """Every share_with entry must name an existing role
    (public.validate_share_with trigger, patch_11.R:415-424).  Returns
    the frame + (unknown_roles, share_with_valid); the roles dim is
    catalog-sized -> collected into one literal array so the check is
    a map-only expression (no join)."""
    known = [r[role_col] for r in roles.select(role_col).distinct().collect()]
    known_arr = F.array(*[F.lit(k) for k in sorted(known)])
    unknown = F.array_sort(
        F.filter(
            F.array_distinct(F.col(col)),
            lambda x: x.isNull() | ~F.array_contains(known_arr, x),
        )
    )
    return df.withColumn("unknown_roles", unknown).withColumn(
        "share_with_valid", F.size("unknown_roles") == 0
    )
