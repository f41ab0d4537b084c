"""Bilingual denormalized metadata views — the reference's main
human/catalog read surface.

Reference parity:
- ``public.location_metadata_en`` / ``_fr``:
  /root/reference/inst/patches/patch_45.R:381-472 — locations star
  (location_types, projects, networks, current datum conversion +
  datum_list, First Nations location_names + languages) with
  ``array_agg(DISTINCT ...)`` project/network rollups and a
  ``jsonb_agg(DISTINCT jsonb_build_object(...))`` names payload.
- ``continuous.timeseries_metadata_en`` / ``_fr``:
  patch_45.R:489-572 — 12-dimension timeseries star (locations,
  parameters, media_types, aggregation_types, locations_z, projects,
  networks, datum_conversions, timeseries_types, location_types) plus
  the resolved unit name.
- ``public.get_parameter_unit_name(parameter_id, matrix_state_id)``:
  patch_39.R:846-861 via ``get_parameter_unit_id`` (patch_39.R:818) —
  matrix_state_code picks the parameter's units_liquid / units_solid /
  units_gas column, then resolves the unit name. (patch_51.R:2961
  consumes the same helper.)

Spark-first shape (NOT the reference's GROUP-BY-every-column SQL):
the m:n bridge rollups are pre-aggregated per location FIRST —
``sort_array(collect_set(...))`` over the (bridge x dim) join, one
shuffle keyed on location_id over narrow rows — and the final view is
a pure broadcast star join with no aggregation of the wide
denormalized row at all. Every dimension and every per-location
rollup is catalog-class (the reference's locations/timeseries tables
are thousands of rows), so the whole view is map-side against the
driving catalog; nothing here ever touches measurement-cardinality
data.

Determinism notes (vs the reference):
- ``array_agg(DISTINCT ...)`` order is engine-private in Postgres;
  here rollups are SORTED (sort_array) so results are comparable.
- the reference's array_agg keeps a NULL element for locations with
  no project/network (LEFT JOIN before the agg); here those become
  empty arrays — the jsonb names payload already had the same
  FILTER-based semantics in the reference.
- the jsonb payload is emitted as a compact JSON-array STRING with
  struct-field key order and elements sorted lexicographically
  (Postgres jsonb_agg DISTINCT sorts by jsonb comparison; a byte sort
  of the rendered objects is the engine-portable analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parameter_unit_map(
    parameters: DataFrame,
    matrix_states: DataFrame,
    units: DataFrame,
) -> DataFrame:
    """The set-based form of ``get_parameter_unit_name`` (patch_39.R:
    846): every (parameter_id, matrix_state_id) pair resolved to its
    unit_id and unit_name in one broadcast pass — a scalar-function
    call per row in the reference, a catalog-sized dimension table
    here (joinable anywhere the scalar would be called).

    ``parameters`` must expose parameter_id, units_liquid,
    units_solid, units_gas; ``matrix_states`` matrix_state_id +
    matrix_state_code; ``units`` unit_id + unit_name. Output:
    (parameter_id, matrix_state_id, unit_id, unit_name) — unit_id is
    NULL for codes other than liquid/solid/gas, mirroring the
    function's ELSE NULL branch.
    """
    uid = (
        F.when(F.col("matrix_state_code") == "liquid", F.col("units_liquid"))
        .when(F.col("matrix_state_code") == "solid", F.col("units_solid"))
        .when(F.col("matrix_state_code") == "gas", F.col("units_gas"))
    )
    return (
        parameters.crossJoin(F.broadcast(matrix_states))
        .withColumn("unit_id", uid)
        .join(F.broadcast(units), "unit_id", "left")
        .select("parameter_id", "matrix_state_id", "unit_id", "unit_name")
    )


def _name_rollup(
    bridge: DataFrame, dim: DataFrame, dim_key: str, name_col: str,
    out_col: str,
) -> DataFrame:
    """Per-location sorted distinct names over an m:n bridge —
    the ``array_agg(DISTINCT ...)`` rollup, pre-aggregated before the
    star join so the wide row is never grouped. NULL names (bridge
    rows pointing at no dim row) are dropped; locations absent from
    the bridge simply miss from the rollup (the star join left-joins
    and coalesces to an empty array)."""
    return (
        bridge.join(F.broadcast(dim), dim_key, "left")
        .where(F.col(name_col).isNotNull())
        .groupBy("location_id")
        .agg(F.sort_array(F.collect_set(F.col(name_col))).alias(out_col))
    )


def _fn_names_json(
    location_names: DataFrame, languages: DataFrame, lang: str,
) -> DataFrame:
    """The First Nations names payload: per-location JSON array of
    {language key, language name, name} objects, element-sorted —
    patch_45.R's ``jsonb_agg(DISTINCT jsonb_build_object(...))
    FILTER (WHERE ln.location_id IS NOT NULL)``. The en view labels
    the key ``language_code``/``language_name_en``; the fr view
    ``language_id``/``language_name_fr`` (reference parity)."""
    if lang == "en":
        obj = F.to_json(F.struct(
            F.col("language_id").alias("language_code"),
            F.col("language_name_en"),
            F.col("name"),
        ))
    else:
        obj = F.to_json(F.struct(
            F.col("language_id"),
            F.col("language_name_fr"),
            F.col("name"),
        ))
    return (
        location_names.join(F.broadcast(languages), "language_id", "left")
        .groupBy("location_id")
        .agg(F.concat(
            F.lit("["),
            F.array_join(F.sort_array(F.collect_set(obj)), ","),
            F.lit("]"),
        ).alias("__fn"))
    )


def _current_datum(datum_conversions: DataFrame,
                   datum_list: DataFrame) -> DataFrame:
    """current=true datum conversion + datum name lookup (both
    languages carried; the view picks one)."""
    return (
        datum_conversions.where(F.col("current"))
        .join(F.broadcast(datum_list),
              F.col("datum_id_to") == F.col("datum_id"), "left")
        .select("location_id", "conversion_m",
                "datum_name_en", "datum_name_fr")
    )


def location_metadata(
    locations: DataFrame,
    location_types: DataFrame,
    locations_projects: DataFrame,
    projects: DataFrame,
    locations_networks: DataFrame,
    networks: DataFrame,
    datum_conversions: DataFrame,
    datum_list: DataFrame,
    location_names: DataFrame,
    languages: DataFrame,
    lang: str = "en",
) -> DataFrame:
    """``public.location_metadata_en`` / ``_fr`` (patch_45.R:381-472).

    One broadcast star join over the locations catalog; projects /
    networks / First Nations names arrive pre-rolled-up per location.
    Column names match the reference view exactly (the fr view's
    accented French names included)."""
    en = lang == "en"
    name_col = "name" if en else "name_fr"
    proj = _name_rollup(locations_projects, projects, "project_id",
                        name_col, "__projects")
    net = _name_rollup(locations_networks, networks, "network_id",
                       name_col, "__networks")
    fn = _fn_names_json(location_names, languages, lang)
    datum = _current_datum(datum_conversions, datum_list)

    base = (
        locations
        .join(F.broadcast(location_types),
              F.col("location_type") == F.col("type_id"), "left")
        .join(F.broadcast(datum), "location_id", "left")
        .join(F.broadcast(proj), "location_id", "left")
        .join(F.broadcast(net), "location_id", "left")
        .join(F.broadcast(fn), "location_id", "left")
    )
    empty = F.array().cast("array<string>")
    projects_c = F.coalesce("__projects", empty)
    networks_c = F.coalesce("__networks", empty)
    fn_c = F.coalesce("__fn", F.lit("[]"))
    if en:
        return base.select(
            "location_id",
            F.col("name"),
            F.col("alias"),
            "location_code",
            F.col("type").alias("location_type"),
            "latitude", "longitude",
            F.col("conversion_m").alias("elevation"),
            F.col("datum_name_en").alias("datum"),
            "note",
            projects_c.alias("projects"),
            networks_c.alias("networks"),
            fn_c.alias("fn_names"),
        )
    return base.select(
        "location_id",
        F.col("name_fr").alias("nom"),
        F.col("alias"),
        F.col("location_code").alias("code_de_site"),
        F.col("type_fr").alias("type_de_site"),
        "latitude", "longitude",
        F.col("conversion_m").alias("altitude"),
        F.col("datum_name_fr").alias("datum"),
        "note",
        projects_c.alias("projets"),
        networks_c.alias("réseaux"),
        fn_c.alias("noms_premières_nations"),
    )


def timeseries_metadata(
    timeseries: DataFrame,
    locations: DataFrame,
    location_types: DataFrame,
    parameters: DataFrame,
    matrix_states: DataFrame,
    units: DataFrame,
    media_types: DataFrame,
    aggregation_types: DataFrame,
    locations_z: DataFrame,
    locations_projects: DataFrame,
    projects: DataFrame,
    locations_networks: DataFrame,
    networks: DataFrame,
    datum_conversions: DataFrame,
    datum_list: DataFrame,
    timeseries_types: DataFrame,
    lang: str = "en",
) -> DataFrame:
    """``continuous.timeseries_metadata_en`` / ``_fr``
    (patch_45.R:489-572): the 12-dimension timeseries catalog star,
    units resolved through :func:`parameter_unit_map` (the set-based
    ``get_parameter_unit_name``), projects/networks pre-rolled-up.

    INNER join to locations (reference: ``JOIN locations``), LEFT to
    every other dimension."""
    en = lang == "en"
    name_col = "name" if en else "name_fr"
    proj = _name_rollup(locations_projects, projects, "project_id",
                        name_col, "__projects")
    net = _name_rollup(locations_networks, networks, "network_id",
                       name_col, "__networks")
    datum = _current_datum(datum_conversions, datum_list)
    unit_map = parameter_unit_map(parameters, matrix_states, units)

    # project locations down to the view's columns — ts.note must win
    # over loc.note (reference selects ts.note), and location_code is
    # not part of this view
    loc_sel = locations.select(
        "location_id", "name", "name_fr", "alias", "location_type",
        "latitude", "longitude")
    base = (
        timeseries
        .join(F.broadcast(loc_sel), "location_id")
        .join(F.broadcast(location_types),
              F.col("location_type") == F.col("type_id"), "left")
        .join(F.broadcast(parameters.select("parameter_id",
                                            "param_name",
                                            "param_name_fr")),
              "parameter_id", "left")
        .join(F.broadcast(unit_map),
              ["parameter_id", "matrix_state_id"], "left")
        .join(F.broadcast(media_types), "media_id", "left")
        .join(F.broadcast(aggregation_types), "aggregation_type_id",
              "left")
        .join(F.broadcast(locations_z), "z_id", "left")
        .join(F.broadcast(timeseries_types), "timeseries_type", "left")
        .join(F.broadcast(datum), "location_id", "left")
        .join(F.broadcast(proj), "location_id", "left")
        .join(F.broadcast(net), "location_id", "left")
    )
    empty = F.array().cast("array<string>")
    projects_c = F.coalesce("__projects", empty)
    networks_c = F.coalesce("__networks", empty)
    if en:
        return base.select(
            "timeseries_id",
            "location_id",
            F.col("name").alias("location_name"),
            F.col("type").alias("location_type"),
            F.col("alias").alias("alias_name"),
            F.col("z_meters").alias("depth_height_m"),
            "latitude", "longitude",
            F.col("conversion_m").alias("location_elevation"),
            projects_c.alias("projects"),
            networks_c.alias("networks"),
            "media_type",
            F.col("param_name").alias("parameter_name"),
            F.col("unit_name").alias("units"),
            "aggregation_type",
            F.col("record_rate").alias("recording_rate"),
            "sensor_priority",
            "start_datetime", "end_datetime",
            "note",
            F.col("timeseries_type").alias("timeseries_type_code"),
            F.col("timeseries_type_name").alias("timeseries_type"),
            F.col("description").alias("timeseries_type_description"),
            "last_new_data",
        )
    return base.select(
        "timeseries_id",
        "location_id",
        F.col("name_fr").alias("nom_endroit"),
        F.col("type_fr").alias("type_endroit"),
        F.col("alias").alias("nom_alias"),
        F.col("z_meters").alias("profondeur_hauteur_m"),
        "latitude", "longitude",
        F.col("conversion_m").alias("élévation_endroit"),
        projects_c.alias("projets"),
        networks_c.alias("réseaux"),
        F.col("media_type_fr").alias("type_de_média"),
        F.col("param_name_fr").alias("nom_paramètre"),
        F.col("unit_name").alias("unités"),
        F.col("aggregation_type_fr").alias("type_agrégation"),
        F.col("record_rate").alias("fréquence_enregistrement"),
        F.col("sensor_priority").alias("priorité_capteur"),
        F.col("start_datetime").alias("début"),
        F.col("end_datetime").alias("fin"),
        "note",
        F.col("timeseries_type").alias("code_type_serie_temporelle"),
        F.col("timeseries_type_name").alias("type_serie_temporelle"),
        F.col("description_fr").alias("description_type_serie_temporelle"),
        F.col("last_new_data").alias("dernier_nouvelles_donnees"),
    )
