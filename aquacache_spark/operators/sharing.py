"""Data-sharing-agreement checks + the CSW catalog layer
(inst/patches/patch_32.R).

Three reference surfaces, re-expressed set-wise:

- ``check_timeseries_data_sharing_agreements_overlap``
  (patch_32.R:259-289): a deferred constraint trigger barring two
  agreements of one timeseries from overlapping in time — replayed for
  the whole table as one self-join.
- ``files.check_default_data_sharing_agreement`` (patch_32.R:304-330):
  ``continuous.timeseries.default_data_sharing_agreement_id`` must
  reference a document whose type is 'data sharing agreement' —
  replayed as a broadcast membership probe.
- ``public.get_csw_layer()`` (patch_32.R:1415-1520): the wide
  Catalogue-Service-for-the-Web read view — recent corrected daily
  values joined to location / parameter / ownership / datum metadata,
  with the water-level datum offset applied.

Scale: agreements / catalog tables are catalog-sized; every dim join
broadcasts. The only measurement-cardinality input is the corrected
daily table in ``csw_layer``, which is filtered to the trailing window
BEFORE any join (predicate reaches the scan) and only ever joined on
its partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# the table default for end_dt is 'infinity' (patch_32.R:124); rows
# loaded from stores that cannot represent it use NULL — both spell
# "no end" here
_INF_TS = "9999-01-01 00:00:00"


def sharing_agreement_overlap_validation(agreements: DataFrame) -> DataFrame:
    """patch_32.R:259-289 overlap trigger replayed for every row:
    an agreement is in violation when ANOTHER agreement of the same
    timeseries (different primary key) satisfies
    ``NEW.start_dt < end_dt AND NEW.end_dt > start_dt``.

    Input: (timeseries_data_sharing_agreement_id, timeseries_id,
    data_sharing_agreement_id, start_dt, end_dt — NULL = infinity).
    Output: the input + ``violation`` (the trigger is symmetric, so
    both members of an overlapping pair flag).
    """
    inf = F.lit(_INF_TS).cast("timestamp")
    o = agreements.select(
        F.col("timeseries_data_sharing_agreement_id").alias("__o_id"),
        F.col("timeseries_id").alias("__o_ts"),
        F.col("start_dt").alias("__o_s"),
        F.coalesce(F.col("end_dt"), inf).alias("__o_e"),
    )
    hits = (
        agreements.join(
            o,
            (F.col("timeseries_id") == F.col("__o_ts"))
            & (F.col("timeseries_data_sharing_agreement_id")
               != F.col("__o_id"))
            & (F.col("start_dt") < F.col("__o_e"))
            & (F.coalesce(F.col("end_dt"), inf) > F.col("__o_s")),
            "left_semi",
        )
        .select("timeseries_data_sharing_agreement_id")
        .withColumn("__hit", F.lit(True))
    )
    return (
        agreements.join(hits, "timeseries_data_sharing_agreement_id", "left")
        .select(
            *agreements.columns,
            F.coalesce(F.col("__hit"), F.lit(False)).alias("violation"),
        )
    )


def default_agreement_type_validation(
    timeseries: DataFrame,
    documents: DataFrame,
    document_types: DataFrame,
    agreement_type: str = "data sharing agreement",
) -> DataFrame:
    """files.check_default_data_sharing_agreement (patch_32.R:304-330):
    a non-NULL ``default_data_sharing_agreement_id`` must reference a
    document whose ``document_types.type`` equals ``agreement_type``.

    Output: (timeseries_id, default_data_sharing_agreement_id,
    reject_reason) — NULL reason = accepted (including the NULL-id
    early return), 'invalid_document_type' otherwise (the trigger does
    not distinguish a missing document from a mistyped one; neither
    does this).
    """
    ok_docs = (
        documents.join(
            F.broadcast(
                document_types.where(F.col("type") == agreement_type)
                .select("document_type_id")),
            "document_type_id",
        )
        .select(F.col("document_id").alias("__doc"))
        .withColumn("__ok", F.lit(True))
    )
    out = timeseries.join(
        F.broadcast(ok_docs),
        F.col("default_data_sharing_agreement_id") == F.col("__doc"),
        "left",
    )
    reason = F.when(
        F.col("default_data_sharing_agreement_id").isNotNull()
        & F.col("__ok").isNull(),
        F.lit("invalid_document_type"),
    )
    return out.select("timeseries_id", "default_data_sharing_agreement_id",
                      reason.alias("reject_reason"))


def csw_layer(
    locations: DataFrame,
    location_types: DataFrame,
    timeseries: DataFrame,
    sub_locations: DataFrame,
    parameters: DataFrame,
    daily_corrected: DataFrame,
    drainage_areas: DataFrame,
    datum_conversions: DataFrame,
    datum_list: DataFrame,
    owners: DataFrame,
    organizations: DataFrame,
    as_of_date,
    location_type_ids=(1, 2, 16),
    parameter_ids=(1150, 1165, 21, 1220),
    window_days: int = 30,
) -> DataFrame:
    """public.get_csw_layer() (patch_32.R:1415-1520): one row per
    (location, parameter, recent day) with station naming, the latest
    owner, drainage area, and — for 'water level' only — the current
    datum conversion added to value/mean/min/max and the datum names
    attached.

    Deviations from the PL/pgSQL, none semantic: the LATERAL
    ``ORDER BY start_dt DESC, end_dt DESC LIMIT 1`` owner pick is a
    row_number window per location (same order + organization_id DESC
    as a deterministic final tie-break — LIMIT 1 without one is
    nondeterministic in Postgres too); ``NOW()`` is the explicit
    ``as_of_date`` so results replay; the drainage subquery's
    ``ST_Area(geom::geography)`` happens upstream (``drainage_areas``
    carries feature_name → drainage_area_km2, produced by the vector
    tier) because the view only consumes the scalar.

    ``daily_corrected`` must carry (timeseries_id, date, value,
    percent_historic_range, mean, min, max, doy_count) — the
    measurements_calculated_daily_corrected shape.
    """
    recent = daily_corrected.where(
        F.col("date") >= F.date_sub(F.lit(as_of_date).cast("date"),
                                    window_days)
    )
    ts = timeseries.where(
        F.col("parameter_id").isin(*[int(p) for p in parameter_ids]))
    loc = (
        locations.join(
            F.broadcast(location_types.select(
                F.col("type_id"), F.col("type"))),
            locations["location_type"] == F.col("type_id"),
        )
        .where(F.col("type_id").isin(*[int(t) for t in location_type_ids])
               & (F.col("jurisdictional_relevance") == True))  # noqa: E712
    )
    # LATERAL latest-owner per location: owners ride their timeseries'
    # location; newest (start_dt, end_dt, organization_id) wins
    own = (
        owners.join(F.broadcast(timeseries.select(
            "timeseries_id", F.col("location_id").alias("__own_loc"))),
            "timeseries_id")
        .join(F.broadcast(organizations.select(
            "organization_id",
            F.col("name").alias("owner_name"),
            F.col("name_fr").alias("owner_name_fr"))),
            "organization_id")
    )
    w = Window.partitionBy("__own_loc").orderBy(
        F.desc("start_dt"), F.desc("end_dt"), F.desc("organization_id"))
    own1 = (
        own.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(F.col("__own_loc").alias("location_id"),
                "owner_name", "owner_name_fr")
    )
    cur_datum = (
        datum_conversions.where(F.col("current") == True)  # noqa: E712
        .join(F.broadcast(datum_list.select(
            F.col("datum_id").alias("datum_id_to"),
            "datum_name_en", "datum_name_fr")), "datum_id_to", "left")
        .select("location_id", "conversion_m",
                "datum_name_en", "datum_name_fr")
    )
    j = (
        recent
        .join(F.broadcast(ts), "timeseries_id")
        .join(F.broadcast(loc), "location_id")
        .join(F.broadcast(sub_locations.select(
            "sub_location_id", "sub_location_name",
            "sub_location_name_fr")), "sub_location_id", "left")
        .join(F.broadcast(parameters.select(
            "parameter_id", "param_name", "param_name_fr",
            F.col("unit_default").alias("param_units"))), "parameter_id")
        .join(F.broadcast(drainage_areas.select(
            F.col("feature_name"), "drainage_area_km2")),
            F.col("location_code") == F.col("feature_name"), "left")
        .join(F.broadcast(cur_datum), "location_id", "left")
        .join(F.broadcast(own1), "location_id", "left")
    )
    is_wl = F.col("param_name") == "water level"
    conv = F.coalesce(F.col("conversion_m"), F.lit(0.0))
    shift = lambda c: F.when(is_wl, F.col(c) + conv).otherwise(F.col(c))  # noqa: E731,E501
    return j.select(
        F.col("location_code").alias("location"),
        F.when(F.col("sub_location_name").isNotNull(),
               F.concat(F.col("name"), F.lit(" - "),
                        F.col("sub_location_name")))
        .otherwise(F.col("name")).alias("station_name"),
        F.when(F.col("sub_location_name_fr").isNotNull(),
               F.concat(F.col("name_fr"), F.lit(" - "),
                        F.col("sub_location_name_fr")))
        .otherwise(F.col("name_fr")).alias("station_name_fr"),
        "latitude", "longitude",
        F.col("type"), "owner_name", "owner_name_fr",
        "timeseries_id", "parameter_id", "param_name", "param_name_fr",
        "param_units", "date",
        shift("value").alias("value"),
        "percent_historic_range",
        shift("mean").alias("mean"),
        shift("min").alias("min"),
        shift("max").alias("max"),
        "doy_count", "drainage_area_km2",
        F.when(is_wl, F.col("datum_name_en")).alias("datum_name_en"),
        F.when(is_wl, F.col("datum_name_fr")).alias("datum_name_fr"),
    )
