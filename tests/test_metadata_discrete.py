# -*- coding: utf-8 -*-
"""Closed-form semantics of the discrete bilingual metadata views
(patch_43.R): first-current datum pick, COALESCE(x_fr, x) fallbacks,
inner location join, results-side unit resolution."""

import pytest
from pyspark.sql import functions as F

from aquacache_spark.operators.metadata import (
    results_metadata, samples_metadata)


def _dims(spark):
    locations = spark.createDataFrame(
        [(1, "LOC-1", "Alpha", "Alphafr", None, 60.0, -135.0),
         (2, "LOC-2", "Beta", None, "b-alias", 61.0, -136.0)],
        "location_id long, location_code string, name string,"
        " name_fr string, alias string, latitude double,"
        " longitude double")
    sub_locations = spark.createDataFrame(
        [(10, "Well A", "Puits A", 60.1, -135.1),
         (11, "Well B", None, 60.2, -135.2)],
        "sub_location_id long, sub_location_name string,"
        " sub_location_name_fr string, latitude double,"
        " longitude double")
    media_types = spark.createDataFrame(
        [(5, "surface water", "eau de surface")],
        "media_id long, media_type string, media_type_fr string")
    collection_methods = spark.createDataFrame(
        [(7, "grab")],
        "collection_method_id long, collection_method string")
    sample_types = spark.createDataFrame(
        [(3, "routine", None)],
        "sample_type_id long, sample_type string,"
        " sample_type_fr string")
    grade_types = spark.createDataFrame(
        [(1, "A", "good", "bon")],
        "grade_type_id long, grade_type_code string,"
        " grade_type_description string,"
        " grade_type_description_fr string")
    approval_types = spark.createDataFrame(
        [(1, "APP", "approved", "approuvé")],
        "approval_type_id long, approval_type_code string,"
        " approval_type_description string,"
        " approval_type_description_fr string")
    qualifier_types = spark.createDataFrame(
        [(1, "Q1", "qual", "qualfr")],
        "qualifier_type_id long, qualifier_type_code string,"
        " qualifier_type_description string,"
        " qualifier_type_description_fr string")
    organizations = spark.createDataFrame(
        [(20, "Org EN", "Org FR"), (21, "Solo EN", None)],
        "organization_id long, name string, name_fr string")
    # location 1 carries TWO current=true conversions: the smaller
    # conversion_id must win (ORDER BY conversion_id LIMIT 1)
    datum_conversions = spark.createDataFrame(
        [(1, 100, 12.5, True), (1, 101, 99.9, True),
         (1, 99, 7.0, False), (2, 200, 3.25, True)],
        "location_id long, conversion_id long, conversion_m double,"
        " current boolean")
    projects = spark.createDataFrame(
        [(1, "Proj B", "Projet B"), (2, "Proj A", None)],
        "project_id long, name string, name_fr string")
    locations_projects = spark.createDataFrame(
        [(1, 1), (1, 2)], "location_id long, project_id long")
    networks = spark.createDataFrame(
        [(1, "Net", "Réseau")], "network_id long, name string,"
        " name_fr string")
    locations_networks = spark.createDataFrame(
        [(1, 1)], "location_id long, network_id long")
    return dict(
        locations=locations, sub_locations=sub_locations,
        media_types=media_types, collection_methods=collection_methods,
        sample_types=sample_types, grade_types=grade_types,
        approval_types=approval_types, qualifier_types=qualifier_types,
        organizations=organizations,
        datum_conversions=datum_conversions,
        locations_projects=locations_projects, projects=projects,
        locations_networks=locations_networks, networks=networks)


def _samples(spark):
    cols = ("sample_id long, location_id long, sub_location_id long,"
            " media_id long, z double, datetime timestamp,"
            " target_datetime timestamp, collection_method long,"
            " sample_type long, linked_with long,"
            " sample_volume_ml double, purge_volume_l double,"
            " purge_time_min double, flow_rate_l_min double,"
            " wave_hgt_m double, sample_grade long,"
            " sample_approval long, sample_qualifier long, owner long,"
            " contributor long, comissioning_org long,"
            " sampling_org long, field_visit_id long,"
            " data_sharing_agreement_id long, documents string,"
            " import_source string, import_source_id string,"
            " no_update boolean, note string, share_with string,"
            " private_expiry timestamp, created timestamp,"
            " created_by string, modified timestamp,"
            " modified_by string")
    base = [None] * 35
    s1 = list(base)
    s1[0:4] = [100, 1, 10, 5]
    s1[7:9] = [7, 3]
    s1[15:22] = [1, 1, 1, 20, 21, 20, 21]
    s2 = list(base)
    s2[0:2] = [101, 2]
    s2[2] = 11
    s3 = list(base)  # unknown location: INNER join drops it
    s3[0:2] = [102, 999]
    return spark.createDataFrame([tuple(s1), tuple(s2), tuple(s3)],
                                 cols)


def test_samples_metadata_semantics(spark):
    d = _dims(spark)
    out_en = {r["sample_id"]: r for r in samples_metadata(
        _samples(spark), **d, lang="en").collect()}
    out_fr = {r["sample_id"]: r for r in samples_metadata(
        _samples(spark), **d, lang="fr").collect()}
    # unknown location dropped (reference: JOIN public.locations)
    assert set(out_en) == {100, 101}
    # first-current datum: conversion_id 100 (12.5) wins over 101
    assert out_en[100]["location_elevation"] == 12.5
    assert out_en[101]["location_elevation"] == 3.25
    # en names; fr COALESCE falls back where _fr is NULL
    assert out_en[100]["location_name"] == "Alpha"
    assert out_fr[100]["nom_endroit"] == "Alphafr"
    assert out_fr[101]["nom_endroit"] == "Beta"  # name_fr NULL
    assert out_fr[100]["nom_sous_endroit"] == "Puits A"
    assert out_fr[101]["nom_sous_endroit"] == "Well B"  # fr NULL
    assert out_fr[100]["type_échantillon"] == "routine"  # fr NULL
    # org coalesce per role
    assert out_en[100]["owner_name"] == "Org EN"
    assert out_fr[100]["propriétaire"] == "Org FR"
    assert out_fr[100]["contributeur"] == "Solo EN"  # name_fr NULL
    # rollups: en sorted by en name, fr resolved THEN sorted
    assert out_en[100]["projects"] == ["Proj A", "Proj B"]
    assert out_fr[100]["projets"] == ["Proj A", "Projet B"]
    assert out_en[101]["projects"] == []  # no bridge rows
    # grade/approval descriptions use the _fr column directly
    assert out_fr[100]["description_grade_échantillon"] == "bon"
    assert out_fr[100]["description_approbation_échantillon"] \
        == "approuvé"


def test_results_metadata_semantics(spark):
    d = _dims(spark)
    sm_en = samples_metadata(_samples(spark), **d, lang="en")
    sm_fr = samples_metadata(_samples(spark), **d, lang="fr")
    parameters = spark.createDataFrame(
        [(50, "iron", "fer", 1, None, None, "7439-89-6"),
         (51, "lead", None, None, 2, None, None)],
        "parameter_id long, param_name string, param_name_fr string,"
        " units_liquid long, units_solid long, units_gas long,"
        " cas_number string")
    matrix_states = spark.createDataFrame(
        [(1, "liquid", "water", "eau"), (2, "solid", "soil", None)],
        "matrix_state_id long, matrix_state_code string,"
        " matrix_state_name string, matrix_state_name_fr string")
    units = spark.createDataFrame(
        [(1, "mg/L"), (2, "mg/kg")], "unit_id long, unit_name string")
    sample_fractions = spark.createDataFrame(
        [(1, "dissolved")],
        "sample_fraction_id long, sample_fraction string")
    result_types = spark.createDataFrame(
        [(1, "numeric")], "result_type_id long, result_type string")
    result_conditions = spark.createDataFrame(
        [(1, "below DL")],
        "result_condition_id long, result_condition string")
    result_value_types = spark.createDataFrame(
        [(1, "actual")],
        "result_value_type_id long, result_value_type string")
    result_speciations = spark.createDataFrame(
        [(1, "total")],
        "result_speciation_id long, result_speciation string")
    protocols_methods = spark.createDataFrame(
        [(1, "EPA 200.8", "ICP-MS", "https://example.org/epa2008")],
        "protocol_id long, protocol_name string,"
        " protocol_description string, url string")
    laboratories = spark.createDataFrame(
        [(1, "Maxxam")], "lab_id long, lab_name string")
    results = spark.createDataFrame(
        [(1000, 100, 50, 1, 1, 1, 0.42, None, None, 1, 1, 1, 1,
          None, False, "public_reader", None, None, None, None, None),
         (1001, 100, 51, 1, 1, 1, 0.01, None, None, 1, 1, 1, 1,
          None, False, "public_reader", None, None, None, None, None)],
        "result_id long, sample_id long, parameter_id long,"
        " matrix_state_id long, sample_fraction_id long,"
        " result_type long, result double, result_condition long,"
        " result_condition_value double, result_value_type long,"
        " result_speciation_id long, protocol_method long,"
        " laboratory long, analysis_datetime timestamp,"
        " no_update boolean, share_with string,"
        " private_expiry timestamp, created timestamp,"
        " created_by string, modified timestamp, modified_by string")
    args = dict(
        parameters=parameters, matrix_states=matrix_states,
        units=units, sample_fractions=sample_fractions,
        result_types=result_types,
        result_conditions=result_conditions,
        result_value_types=result_value_types,
        result_speciations=result_speciations,
        protocols_methods=protocols_methods,
        laboratories=laboratories)
    en = {r["result_id"]: r for r in results_metadata(
        results, sm_en, lang="en", **args).collect()}
    fr = {r["result_id"]: r for r in results_metadata(
        results, sm_fr, lang="fr", **args).collect()}
    # get_parameter_unit_name: liquid state -> units_liquid
    assert en[1000]["units"] == "mg/L"
    # lead has no units_liquid -> NULL units (the function's NULL arm)
    assert en[1001]["units"] is None
    assert en[1000]["parameter_name"] == "iron"
    assert fr[1000]["nom_paramètre"] == "fer"
    assert fr[1001]["nom_paramètre"] == "lead"  # fr NULL -> en
    assert fr[1000]["état_matrice"] == "eau"
    assert en[1000]["matrix_state_name"] == "water"
    # sample-side passthrough renames
    assert en[1000]["sample_owner_name"] == "Org EN"
    assert fr[1000]["propriétaire_échantillon"] == "Org FR"
    assert en[1000]["location_name"] == "Alpha"
    assert en[1000]["lab_name"] == "Maxxam"
    assert en[1000]["protocol_url"] == "https://example.org/epa2008"
