"""Bilingual denormalized metadata views — the reference's main
human/catalog read surface.

Reference parity:
- ``discrete.samples_metadata_en`` / ``_fr``:
  /root/reference/inst/patches/patch_43.R:171-418 (preserved by
  patch_52.R:338-470) — samples star (locations, sub_locations,
  media_types, collection_methods, sample_types, grade/approval/
  qualifier_types, organizations x4, LATERAL first-current datum
  conversion, LATERAL project/network ``array_agg(DISTINCT ...)``
  rollups). The fr view resolves every bilingual dimension through
  ``COALESCE(x_fr, x)``.
- ``discrete.results_metadata_en`` / ``_fr``:
  patch_43.R:419-652 — results JOIN samples_metadata_{en,fr} plus the
  result-side dimensions (parameters, matrix_states, sample_fractions,
  result_types/conditions/value_types/speciations, protocols_methods,
  laboratories) and get_parameter_unit_name units.
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
        F.col("timeseries_type_name_fr").alias("type_serie_temporelle"),
        F.col("description_fr").alias("description_type_serie_temporelle"),
        F.col("last_new_data").alias("dernier_nouvelles_donnees"),
    )


def _resolved_rollup(
    bridge: DataFrame, dim: DataFrame, dim_key: str, lang: str,
    out_col: str,
) -> DataFrame:
    """Per-location sorted distinct resolved names — the discrete
    views' LATERAL ``array_agg(DISTINCT COALESCE(name_fr, name)
    ORDER BY ...)`` (patch_43.R:383-405). The en rollup uses ``name``;
    the fr rollup resolves AND sorts by ``COALESCE(name_fr, name)``."""
    resolved = (F.col("name") if lang == "en"
                else F.coalesce("name_fr", "name"))
    return (
        bridge.join(F.broadcast(dim), dim_key, "left")
        .where(resolved.isNotNull())
        .groupBy("location_id")
        .agg(F.sort_array(F.collect_set(resolved)).alias(out_col))
    )


def _first_current_datum(datum_conversions: DataFrame) -> DataFrame:
    """The discrete views' LATERAL datum pick (patch_43.R:364-372):
    among current=true conversions for the location, the one with the
    smallest conversion_id (ORDER BY conversion_id LIMIT 1) — a
    min_by, never a window over the fact."""
    return (
        datum_conversions.where(F.col("current"))
        .groupBy("location_id")
        .agg(F.min_by("conversion_m", "conversion_id")
             .alias("conversion_m"))
    )


def samples_metadata(
    samples: DataFrame,
    locations: DataFrame,
    sub_locations: DataFrame,
    media_types: DataFrame,
    collection_methods: DataFrame,
    sample_types: DataFrame,
    grade_types: DataFrame,
    approval_types: DataFrame,
    qualifier_types: DataFrame,
    organizations: DataFrame,
    datum_conversions: DataFrame,
    locations_projects: DataFrame,
    projects: DataFrame,
    locations_networks: DataFrame,
    networks: DataFrame,
    lang: str = "en",
) -> DataFrame:
    """``discrete.samples_metadata_en`` / ``_fr``
    (patch_43.R:171-418, preserved by patch_52.R:338-470).

    Spark-first shape: ``samples`` is the only fact; every dimension
    is catalog-class and broadcast, the project/network rollups and
    the first-current datum are pre-aggregated per location (narrow
    shuffles over bridge/conversion tables), so the view itself is a
    pure broadcast star with zero fact shuffles — the same plan at
    100 TB of samples.

    The fr view resolves bilingual names via COALESCE(x_fr, x)
    exactly where the reference does (loc.name, sub_location_name,
    media_type, sample_type, organization names, project/network
    rollups); grade/approval/qualifier descriptions use the ``_fr``
    column directly (reference parity — no coalesce there)."""
    en = lang == "en"

    def co(fr_col: str, en_col: str):
        return F.col(en_col) if en else F.coalesce(fr_col, en_col)

    proj = _resolved_rollup(locations_projects, projects, "project_id",
                            lang, "__projects")
    net = _resolved_rollup(locations_networks, networks, "network_id",
                           lang, "__networks")
    datum = _first_current_datum(datum_conversions)

    loc = locations.select(
        "location_id", "location_code",
        co("name_fr", "name").alias("__loc_name"),
        F.col("alias").alias("__alias"),
        "latitude", "longitude")
    subl = sub_locations.select(
        "sub_location_id",
        co("sub_location_name_fr", "sub_location_name")
        .alias("__subloc_name"),
        F.col("latitude").alias("__sub_lat"),
        F.col("longitude").alias("__sub_lon"))
    med = media_types.select(
        "media_id", co("media_type_fr", "media_type").alias("__media"))
    cm = collection_methods.select(
        F.col("collection_method_id"),
        F.col("collection_method").alias("__cm"))
    st = sample_types.select(
        "sample_type_id",
        co("sample_type_fr", "sample_type").alias("__stype"))
    gt = grade_types.select(
        "grade_type_id",
        F.col("grade_type_code").alias("__grade_code"),
        (F.col("grade_type_description") if en
         else F.col("grade_type_description_fr")).alias("__grade_desc"))
    at = approval_types.select(
        "approval_type_id",
        F.col("approval_type_code").alias("__appr_code"),
        (F.col("approval_type_description") if en
         else F.col("approval_type_description_fr")).alias("__appr_desc"))
    qt = qualifier_types.select(
        "qualifier_type_id",
        F.col("qualifier_type_code").alias("__qual_code"),
        (F.col("qualifier_type_description") if en
         else F.col("qualifier_type_description_fr")).alias("__qual_desc"))

    def org(role: str) -> DataFrame:
        return organizations.select(
            F.col("organization_id").alias(f"__{role}_id"),
            co("name_fr", "name").alias(f"__{role}_name"))

    base = (
        samples
        .join(F.broadcast(loc), "location_id")
        .join(F.broadcast(subl), "sub_location_id", "left")
        .join(F.broadcast(med), "media_id", "left")
        .join(F.broadcast(cm),
              F.col("collection_method") == F.col("collection_method_id"),
              "left")
        .join(F.broadcast(st),
              F.col("sample_type") == F.col("sample_type_id"), "left")
        .join(F.broadcast(gt),
              F.col("sample_grade") == F.col("grade_type_id"), "left")
        .join(F.broadcast(at),
              F.col("sample_approval") == F.col("approval_type_id"),
              "left")
        .join(F.broadcast(qt),
              F.col("sample_qualifier") == F.col("qualifier_type_id"),
              "left")
        .join(F.broadcast(org("owner")),
              F.col("owner") == F.col("__owner_id"), "left")
        .join(F.broadcast(org("contrib")),
              F.col("contributor") == F.col("__contrib_id"), "left")
        .join(F.broadcast(org("commis")),
              F.col("comissioning_org") == F.col("__commis_id"), "left")
        .join(F.broadcast(org("sampl")),
              F.col("sampling_org") == F.col("__sampl_id"), "left")
        .join(F.broadcast(datum), "location_id", "left")
        .join(F.broadcast(proj), "location_id", "left")
        .join(F.broadcast(net), "location_id", "left")
    )
    projects_c = F.coalesce("__projects", F.array().cast("array<string>"))
    networks_c = F.coalesce("__networks", F.array().cast("array<string>"))
    head = [
        F.col("sample_id"), F.col("location_id"), F.col("location_code"),
        F.col("__loc_name").alias("location_name" if en else "nom_endroit"),
        F.col("__alias").alias("alias_name" if en else "nom_alias"),
        F.col("latitude"), F.col("longitude"),
        F.col("conversion_m").alias(
            "location_elevation" if en else "élévation_endroit"),
        projects_c.alias("projects" if en else "projets"),
        networks_c.alias("networks" if en else "réseaux"),
        F.col("sub_location_id"),
        F.col("__subloc_name").alias(
            "sub_location_name" if en else "nom_sous_endroit"),
        F.col("__sub_lat").alias(
            "sub_location_latitude" if en else "latitude_sous_endroit"),
        F.col("__sub_lon").alias(
            "sub_location_longitude" if en else "longitude_sous_endroit"),
        F.col("media_id"),
        F.col("__media").alias("media_type" if en else "type_de_média"),
        F.col("z").alias(
            "depth_height_m" if en else "profondeur_hauteur_m"),
        F.col("datetime"),
        F.col("target_datetime").alias(
            "target_datetime" if en else "datetime_cible"),
        F.col("collection_method").alias("collection_method_id"),
        F.col("__cm").alias(
            "collection_method" if en else "méthode_collecte"),
        F.col("sample_type").alias("sample_type_id"),
        F.col("__stype").alias(
            "sample_type" if en else "type_échantillon"),
        F.col("linked_with").alias("linked_sample_id"),
        F.col("sample_volume_ml").alias(
            "sample_volume_ml" if en else "volume_échantillon_ml"),
        F.col("purge_volume_l").alias(
            "purge_volume_l" if en else "volume_purge_l"),
        F.col("purge_time_min").alias(
            "purge_time_min" if en else "durée_purge_min"),
        F.col("flow_rate_l_min").alias(
            "flow_rate_l_min" if en else "débit_l_min"),
        F.col("wave_hgt_m").alias(
            "wave_hgt_m" if en else "hauteur_vague_m"),
        F.col("sample_grade").alias("sample_grade_id"),
        F.col("__grade_code").alias(
            "sample_grade_code" if en else "code_grade_échantillon"),
        F.col("__grade_desc").alias(
            "sample_grade_description" if en
            else "description_grade_échantillon"),
        F.col("sample_approval").alias("sample_approval_id"),
        F.col("__appr_code").alias(
            "sample_approval_code" if en
            else "code_approbation_échantillon"),
        F.col("__appr_desc").alias(
            "sample_approval_description" if en
            else "description_approbation_échantillon"),
        F.col("sample_qualifier").alias("sample_qualifier_id"),
        F.col("__qual_code").alias(
            "sample_qualifier_code" if en
            else "code_qualificatif_échantillon"),
        F.col("__qual_desc").alias(
            "sample_qualifier_description" if en
            else "description_qualificatif_échantillon"),
        F.col("owner").alias("owner_id"),
        F.col("__owner_name").alias("owner_name" if en else "propriétaire"),
        F.col("contributor").alias("contributor_id"),
        F.col("__contrib_name").alias(
            "contributor_name" if en else "contributeur"),
        F.col("comissioning_org").alias("commissioning_org_id"),
        F.col("__commis_name").alias(
            "commissioning_org_name" if en else "organisme_mise_service"),
        F.col("sampling_org").alias("sampling_org_id"),
        F.col("__sampl_name").alias(
            "sampling_org_name" if en else "organisme_échantillonnage"),
        F.col("field_visit_id"), F.col("data_sharing_agreement_id"),
        F.col("documents"), F.col("import_source"),
        F.col("import_source_id"), F.col("no_update"), F.col("note"),
        F.col("share_with"), F.col("private_expiry"),
        F.col("created"), F.col("created_by"),
        F.col("modified"), F.col("modified_by"),
    ]
    return base.select(*head)


def results_metadata(
    results: DataFrame,
    samples_meta: DataFrame,
    parameters: DataFrame,
    matrix_states: DataFrame,
    units: DataFrame,
    sample_fractions: DataFrame,
    result_types: DataFrame,
    result_conditions: DataFrame,
    result_value_types: DataFrame,
    result_speciations: DataFrame,
    protocols_methods: DataFrame,
    laboratories: DataFrame,
    lang: str = "en",
) -> DataFrame:
    """``discrete.results_metadata_en`` / ``_fr`` (patch_43.R:419-652):
    results JOIN samples_metadata_{en,fr} (the view built by
    :func:`samples_metadata`), result-side dims broadcast, units via
    :func:`parameter_unit_map` (the set-based get_parameter_unit_name).

    Scale shape: the results x samples_metadata join is the view's
    only fact-fact join and is a plain equi-join on sample_id — AQE
    broadcasts it when the sample batch is catalog-sized, otherwise
    both sides hash-partition on sample_id once; every other join is
    a broadcast of a code table. No fact ever shuffles twice."""
    en = lang == "en"

    def co(fr_col: str, en_col: str):
        return F.col(en_col) if en else F.coalesce(fr_col, en_col)

    # project the samples view down to the columns the results view
    # re-exports, renamed so nothing collides with the result columns
    keep = {
        ("location_id",): "location_id",
        ("location_code",): "location_code",
        ("location_name", "nom_endroit"): None,
        ("alias_name", "nom_alias"): None,
        ("latitude",): "latitude",
        ("longitude",): "longitude",
        ("location_elevation", "élévation_endroit"): None,
        ("projects", "projets"): None,
        ("networks", "réseaux"): None,
        ("sub_location_id",): "sub_location_id",
        ("sub_location_name", "nom_sous_endroit"): None,
        ("sub_location_latitude", "latitude_sous_endroit"): None,
        ("sub_location_longitude", "longitude_sous_endroit"): None,
        ("media_id",): "media_id",
        ("media_type", "type_de_média"): None,
        ("depth_height_m", "profondeur_hauteur_m"): None,
        ("datetime",): "datetime",
        ("target_datetime", "datetime_cible"): None,
        ("collection_method_id",): "collection_method_id",
        ("collection_method", "méthode_collecte"): None,
        ("sample_type_id",): "sample_type_id",
        ("sample_type", "type_échantillon"): None,
        ("sample_grade_id",): "sample_grade_id",
        ("sample_grade_code", "code_grade_échantillon"): None,
        ("sample_grade_description",
         "description_grade_échantillon"): None,
        ("sample_approval_id",): "sample_approval_id",
        ("sample_approval_code", "code_approbation_échantillon"): None,
        ("sample_approval_description",
         "description_approbation_échantillon"): None,
        ("sample_qualifier_id",): "sample_qualifier_id",
        ("sample_qualifier_code", "code_qualificatif_échantillon"): None,
        ("sample_qualifier_description",
         "description_qualificatif_échantillon"): None,
    }
    sm_cols = [F.col("sample_id")]
    for names, out in keep.items():
        src = names[0] if en or len(names) == 1 else names[1]
        sm_cols.append(F.col(f"`{src}`").alias(out or src))
    sm_cols += [
        F.col("owner_id").alias("sample_owner_id"),
        F.col("owner_name" if en else "propriétaire").alias(
            "sample_owner_name" if en else "propriétaire_échantillon"),
        F.col("contributor_id").alias("sample_contributor_id"),
        F.col("contributor_name" if en else "contributeur").alias(
            "sample_contributor_name" if en
            else "contributeur_échantillon"),
        F.col("import_source").alias(
            "sample_import_source" if en
            else "source_importation_échantillon"),
        F.col("import_source_id").alias(
            "sample_import_source_id" if en
            else "id_source_importation_échantillon"),
        F.col("note").alias("sample_note" if en else "note_échantillon"),
        F.col("no_update").alias(
            "sample_no_update" if en else "no_update_échantillon"),
        F.col("share_with").alias(
            "sample_share_with" if en else "share_with_échantillon"),
        F.col("private_expiry").alias(
            "sample_private_expiry" if en
            else "private_expiry_échantillon"),
    ]
    sm = samples_meta.select(*sm_cols)

    par = parameters.select(
        "parameter_id",
        co("param_name_fr", "param_name").alias("__param"),
        "cas_number")
    ms = matrix_states.select(
        "matrix_state_id", "matrix_state_code",
        co("matrix_state_name_fr", "matrix_state_name").alias("__mstate"))
    um = parameter_unit_map(parameters, matrix_states, units).select(
        "parameter_id", "matrix_state_id", "unit_name")
    sf_ = sample_fractions.select(
        "sample_fraction_id", F.col("sample_fraction").alias("__frac"))
    rt = result_types.select(
        F.col("result_type_id"), F.col("result_type").alias("__rtype"))
    rc = result_conditions.select(
        F.col("result_condition_id"),
        F.col("result_condition").alias("__rcond"))
    rvt = result_value_types.select(
        F.col("result_value_type_id"),
        F.col("result_value_type").alias("__rvtype"))
    rs = result_speciations.select(
        "result_speciation_id",
        F.col("result_speciation").alias("__rspec"))
    pm = protocols_methods.select(
        F.col("protocol_id"),
        F.col("protocol_name").alias("__proto_name"),
        F.col("protocol_description").alias("__proto_desc"),
        F.col("url").alias("__proto_url"))
    lab = laboratories.select(
        F.col("lab_id").alias("__lab_id"),
        F.col("lab_name").alias("__lab_name"))

    base = (
        results
        .join(sm, "sample_id")
        .join(F.broadcast(par), "parameter_id", "left")
        .join(F.broadcast(ms), "matrix_state_id", "left")
        .join(F.broadcast(um), ["parameter_id", "matrix_state_id"],
              "left")
        .join(F.broadcast(sf_), "sample_fraction_id", "left")
        .join(F.broadcast(rt),
              F.col("result_type") == F.col("result_type_id"), "left")
        .join(F.broadcast(rc),
              F.col("result_condition") == F.col("result_condition_id"),
              "left")
        .join(F.broadcast(rvt),
              F.col("result_value_type")
              == F.col("result_value_type_id"), "left")
        .join(F.broadcast(rs), "result_speciation_id", "left")
        .join(F.broadcast(pm),
              F.col("protocol_method") == F.col("protocol_id"), "left")
        .join(F.broadcast(lab),
              F.col("laboratory") == F.col("__lab_id"), "left")
    )
    sm_out = [c for c in sm.columns if c != "sample_id"]
    tail = [
        F.col("parameter_id"),
        F.col("__param").alias(
            "parameter_name" if en else "nom_paramètre"),
        F.col("cas_number"),
        F.col("matrix_state_id"), F.col("matrix_state_code"),
        F.col("__mstate").alias(
            "matrix_state_name" if en else "état_matrice"),
        F.col("unit_name").alias("units" if en else "unités"),
        F.col("sample_fraction_id"),
        F.col("__frac").alias(
            "sample_fraction" if en else "fraction_échantillon"),
        F.col("result_type").alias("result_type_id"),
        F.col("__rtype").alias("result_type" if en else "type_résultat"),
        F.col("result").alias("result" if en else "résultat"),
        F.col("result_condition").alias("result_condition_id"),
        F.col("__rcond").alias(
            "result_condition" if en else "condition_résultat"),
        F.col("result_condition_value").alias(
            "result_condition_value" if en
            else "valeur_condition_résultat"),
        F.col("result_value_type").alias("result_value_type_id"),
        F.col("__rvtype").alias(
            "result_value_type" if en else "type_valeur_résultat"),
        F.col("result_speciation_id"),
        F.col("__rspec").alias(
            "result_speciation" if en else "spéciation_résultat"),
        F.col("protocol_method").alias("protocol_method_id"),
        F.col("__proto_name").alias(
            "protocol_method" if en else "méthode_protocole"),
        F.col("__proto_desc").alias(
            "protocol_description" if en else "description_protocole"),
        F.col("__proto_url").alias(
            "protocol_url" if en else "url_protocole"),
        F.col("laboratory").alias("lab_id"),
        F.col("__lab_name").alias("lab_name" if en else "nom_laboratoire"),
        F.col("analysis_datetime").alias(
            "analysis_datetime" if en else "datetime_analyse"),
    ]
    sample_flags = [
        "sample_no_update" if en else "no_update_échantillon",
        "sample_share_with" if en else "share_with_échantillon",
        "sample_private_expiry" if en else "private_expiry_échantillon",
    ]
    sm_head = [F.col(f"`{c}`") for c in sm_out if c not in sample_flags
               and not c.startswith(("sample_owner", "sample_contributor",
                                     "sample_import", "sample_note",
                                     "propriétaire", "contributeur",
                                     "source_importation",
                                     "id_source_importation",
                                     "note_échantillon"))]
    sm_ids = [F.col(f"`{c}`") for c in sm_out
              if c.startswith(("sample_owner", "sample_contributor",
                               "sample_import", "sample_note",
                               "propriétaire", "contributeur",
                               "source_importation",
                               "id_source_importation",
                               "note_échantillon"))]
    return base.select(
        F.col("result_id"), F.col("sample_id"),
        *sm_head, *sm_ids, *tail,
        F.col(f"`{sample_flags[0]}`"),
        F.col("no_update").alias(
            "result_no_update" if en else "no_update_résultat"),
        F.col(f"`{sample_flags[1]}`"),
        F.col("share_with").alias(
            "result_share_with" if en else "share_with_résultat"),
        F.col(f"`{sample_flags[2]}`"),
        F.col("private_expiry").alias(
            "result_private_expiry" if en else "private_expiry_résultat"),
        F.col("created"), F.col("created_by"),
        F.col("modified"), F.col("modified_by"),
    )
