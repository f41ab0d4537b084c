"""Discrete (sample/result) pipeline: the water-quality star schema.

Reference contract (R/getNewDiscrete.R:8-35; fixture inserts
R/create_test_DB.R:1155-1420): discrete connectors return
``{samples, results}`` pairs — a sample row (who/where/when/how) plus
one result row per analyte with condition handling (below-detection ->
``result NULL, result_condition_value <limit>``), fraction, speciation
and value-type codes. `downloadEQWin` additionally maps source
parameter codes through ``discrete.import_parameter_mappings``
(R/downloadEQWin.R:43).

Spark-first: two fact DataFrames + broadcast mapping dims; validation
is a set of column-expression checks; linked samples (replicate/blank
trios) validated with a self semi-join.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SAMPLE_REQUIRED = ("sample_id", "location_id", "datetime", "media_id")
RESULT_REQUIRED = ("result_id", "sample_id", "parameter_id", "result_type")


@dataclass
class DiscreteBatch:
    samples: DataFrame
    results: DataFrame


def validate_batch(batch: DiscreteBatch) -> DiscreteBatch:
    """Contract checks mirroring getNewDiscrete's validation:

    - required columns present;
    - every result references an existing sample (FK semi-join);
    - below-detection rows carry a condition value instead of a result;
    - ``linked_with`` references resolve to samples in the batch.
    """
    for c in SAMPLE_REQUIRED:
        if c not in batch.samples.columns:
            raise ValueError(f"samples missing required column {c!r}")
    for c in RESULT_REQUIRED:
        if c not in batch.results.columns:
            raise ValueError(f"results missing required column {c!r}")

    orphan = batch.results.join(
        batch.samples.select("sample_id"), "sample_id", "left_anti"
    )
    n_orphan = orphan.count()
    if n_orphan:
        raise ValueError(f"{n_orphan} results reference unknown samples")

    if "result_condition_value" in batch.results.columns:
        bad = batch.results.where(
            F.col("result").isNull()
            & F.col("result_condition_value").isNull()
            & (F.col("result_type") == "lab")
        ).count()
        if bad:
            raise ValueError(
                f"{bad} lab results have neither a value nor a detection condition"
            )

    if "linked_with" in batch.samples.columns:
        broken = (
            batch.samples.where(F.col("linked_with").isNotNull())
            .join(
                batch.samples.select(F.col("sample_id").alias("linked_with")),
                "linked_with",
                "left_anti",
            )
            .count()
        )
        if broken:
            raise ValueError(f"{broken} samples link to missing samples")
    return batch


def map_parameters(
    results: DataFrame,
    mapping: DataFrame,
    src_col: str = "source_parameter",
    mapped_col: str = "parameter_id",
) -> DataFrame:
    """Source-code -> canonical parameter mapping with unmapped passthrough
    (import_parameter_mappings, R/downloadEQWin.R)."""
    m = mapping.select(
        F.col("source_parameter").alias(src_col),
        F.col("parameter_id").alias("__mapped"),
    )
    return (
        results.join(F.broadcast(m), src_col, "left")
        .withColumn(mapped_col, F.coalesce("__mapped", F.col(mapped_col)))
        .drop("__mapped")
    )


def results_wide(batch: DiscreteBatch, parameters: Sequence[str] | None = None) -> DataFrame:
    """Long results -> one row per sample with a column per parameter
    (the analyst-facing pivot; reference keeps long form in SQL)."""
    r = batch.results
    piv = (
        r.groupBy("sample_id")
        .pivot("parameter_id", parameters)
        .agg(F.first("result"))
    )
    return batch.samples.join(piv, "sample_id", "left")


def resolve_matrix_states(
    results: DataFrame,
    matrix_states: DataFrame,
    media_types: DataFrame,
    parameters: DataFrame,
    media_col: str = "sample_media_id",
    param_col: str = "parameter_id",
    id_col: str = "matrix_state_id",
    label_col: str = "matrix_state",
) -> DataFrame:
    """Matrix-state resolution ladder for discrete results, set-wise.

    Port of ``public.resolve_matrix_state_id`` and its helpers
    (reference inst/patches/patch_39.R:798-970) plus the R-side label
    resolver (reference R/utils.R:861-1131) — the trigger logic that
    assigns a physical matrix state to every inserted result:

    1. an explicit ``matrix_state_id`` wins (patch_39.R:941-943);
    2. else a text label: ''/'NA'/'NULL' count as absent, a pure
       integer string is taken as the id (utils.R:884-891), otherwise
       the label matches ``matrix_states`` on lower(code/name/name_fr)
       — 0 hits → ``unknown_matrix_state``, >1 → ``ambiguous_matrix_state``
       (the reference raises; set-wise these become reject reasons,
       utils.R:893-921);
    3. else the parent media's default state — accepted outright when
       ``parameter_id`` is absent, or when the parameter defines a unit
       for that state's code (units_liquid/solid/gas,
       patch_39.R:945-963);
    4. else, if the parameter has exactly ONE state with a unit, that
       state (get_unique_parameter_matrix_state_id, patch_39.R:892-918);
    5. else NULL.

    All dims are catalog-sized broadcasts; the results side is one
    map pass — linear at fact scale. Output: input columns (minus the
    helper ``label_col``) with resolved ``matrix_state_id``,
    ``resolved_via`` ∈ {explicit, numeric_label, label, media_default,
    unique_parameter_state, unresolved} and ``reject_reason``.
    """
    ms = matrix_states.select(
        F.col("matrix_state_id").alias("__ms_id"),
        F.lower("matrix_state_code").alias("__code"),
        F.lower("matrix_state_name").alias("__name"),
        F.lower("matrix_state_name_fr").alias("__name_fr"),
    )
    labels = (
        ms.select(
            "__ms_id",
            F.explode(F.array("__code", "__name", "__name_fr")).alias("__lab"),
        )
        .where(F.col("__lab").isNotNull())
        .distinct()  # code == name on one row is a single vote
        .groupBy("__lab")
        .agg(F.count(F.lit(1)).alias("__n_lab"),
             F.min("__ms_id").alias("__lab_id"))
    )
    med = media_types.select(
        F.col("media_id").alias("__media_id"),
        F.col("default_matrix_state_id").alias("__med_def"),
    )
    med_code = ms.select(F.col("__ms_id").alias("__med_def"),
                         F.col("__code").alias("__med_code"))
    par = parameters.select(
        F.col("parameter_id").alias("__param_id"),
        "units_liquid", "units_solid", "units_gas",
    )
    # exactly-one-unit state per parameter (patch_39.R:892-918)
    par_states = (
        par.select(
            "__param_id",
            F.explode(F.array(
                F.struct(F.lit("liquid").alias("c"), F.col("units_liquid").alias("u")),
                F.struct(F.lit("solid").alias("c"), F.col("units_solid").alias("u")),
                F.struct(F.lit("gas").alias("c"), F.col("units_gas").alias("u")),
            )).alias("s"),
        )
        .where(F.col("s.u").isNotNull())
        .join(ms.select(F.col("__code").alias("c2"), "__ms_id"),
              F.col("s.c") == F.col("c2"))
        .groupBy("__param_id")
        .agg(F.count(F.lit(1)).alias("__n_states"),
             F.min("__ms_id").alias("__uniq_id"))
        .select(F.col("__param_id").alias("__ps_param_id"),
                F.when(F.col("__n_states") == 1, F.col("__uniq_id"))
                .alias("__uniq_id"))
    )

    has_label = label_col in results.columns
    r = results.withColumn(
        "__norm",
        F.lower(F.trim(F.col(label_col).cast("string")))
        if has_label else F.lit(None).cast("string"),
    ).withColumn(
        "__norm",
        F.when(F.col("__norm").isin("", "na", "null"), None)
        .otherwise(F.col("__norm")),
    ).withColumn(
        "__is_num", F.coalesce(F.col("__norm").rlike("^[+-]?[0-9]+$"), F.lit(False))
    )
    if id_col not in r.columns:
        r = r.withColumn(id_col, F.lit(None).cast("int"))
    r = (
        r.join(F.broadcast(labels),
               (F.col("__norm") == F.col("__lab")) & ~F.col("__is_num"), "left")
        .join(F.broadcast(med), F.col(media_col) == F.col("__media_id"), "left")
        .join(F.broadcast(med_code), "__med_def", "left")
        .join(F.broadcast(par), F.col(param_col) == F.col("__param_id"), "left")
        .join(F.broadcast(par_states),
              F.col(param_col) == F.col("__ps_param_id"), "left")
    )
    unit_for_med = (
        F.when(F.col("__med_code") == "liquid", F.col("units_liquid"))
        .when(F.col("__med_code") == "solid", F.col("units_solid"))
        .when(F.col("__med_code") == "gas", F.col("units_gas"))
    )
    explicit = F.col(id_col).isNotNull()
    numeric = F.col("__norm").isNotNull() & F.col("__is_num")
    labelled = F.col("__norm").isNotNull() & ~F.col("__is_num")
    label_ok = labelled & (F.col("__n_lab") == 1)
    med_ok = F.col("__med_def").isNotNull() & (
        F.col(param_col).isNull() | unit_for_med.isNotNull()
    )
    via = (
        F.when(explicit, "explicit")
        .when(numeric, "numeric_label")
        .when(label_ok, "label")
        .when(labelled, None)  # unknown/ambiguous label: rejected below
        .when(med_ok, "media_default")
        .when(F.col("__uniq_id").isNotNull(), "unique_parameter_state")
        .otherwise("unresolved")
    )
    resolved = (
        F.when(explicit, F.col(id_col))
        .when(numeric, F.col("__norm").cast("int"))
        .when(label_ok, F.col("__lab_id"))
        .when(labelled, None)
        .when(med_ok, F.col("__med_def"))
        .otherwise(F.col("__uniq_id"))
    )
    # label errors only surface when the label was actually consulted —
    # an explicit id short-circuits before it (utils.R:1058-1065)
    reject = F.when(
        ~explicit & labelled & F.col("__n_lab").isNull(),
        "unknown_matrix_state",
    ).when(~explicit & labelled & (F.col("__n_lab") > 1),
           "ambiguous_matrix_state")
    keep = [c for c in results.columns if c not in (id_col, label_col)]
    return r.select(
        *keep,
        resolved.cast("int").alias(id_col),
        via.alias("resolved_via"),
        reject.alias("reject_reason"),
    )
