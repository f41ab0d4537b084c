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
