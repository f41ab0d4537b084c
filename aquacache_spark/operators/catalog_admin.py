"""Catalog-admin inserts (R/addACTimeseries.R, R/addACLocation.R).

The reference's add* functions are imperative per-argument validators
(~850 LoC of stop() checks) followed by inserts and an immediate
backfill. Re-expressed set-wise: every constraint becomes an anti-join
or predicate producing a ``reject_reason``, evaluated for the whole
batch in one pass — the first failing check in the reference's order
wins, NULL reason = accepted. Callers then merge accepted rows into the
catalog and hand them to the ingest cascade (daily_update.py) for the
backfill the reference kicks off inline.

Scale: dims are catalog-sized broadcasts; the only shuffle is the
batch-internal duplicate window over the candidate key — exactly the
unique constraint the reference's INSERT would trip on.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# the reference's unique constraint on continuous.timeseries
# (addACTimeseries.R duplicate check before insert)
TS_KEY = ("location_id", "parameter_id", "media_id", "aggregation_type",
          "record_rate")


def validate_new_timeseries(
    new_rows: DataFrame,
    locations: DataFrame,
    parameters: DataFrame,
    media: DataFrame,
    aggregation_types: DataFrame,
    existing: DataFrame,
) -> DataFrame:
    """addACTimeseries.R:197-374 constraint ladder, set-wise.

    Checks, in the reference's stop() order (first failure reported):

    1. ``start_datetime`` NULL            (:197)
    2. unknown ``location_id``            (:228-246)
    3. unknown ``parameter_id``           (:293-303)
    4. unknown ``media_id``               (:318-327)
    5. unknown ``aggregation_type``       (:358-374)
    6. duplicate of an existing catalog row on the unique key
    7. duplicate within the batch (first occurrence by ``row_id`` wins)

    Output: the batch + ``reject_reason`` (NULL = insertable).
    ``row_id`` must be a stable input-order column (the reference
    processes vectors positionally).
    """
    def mark(df: DataFrame, dim: DataFrame, key: str, flag: str) -> DataFrame:
        d = dim.select(F.col(dim.columns[0]).alias("__k")).distinct()
        return (
            df.join(F.broadcast(d), df[key] == F.col("__k"), "left")
            .withColumn(flag, F.col("__k").isNull())
            .drop("__k")
        )

    out = mark(new_rows, locations, "location_id", "__no_loc")
    out = mark(out, parameters, "parameter_id", "__no_param")
    out = mark(out, media, "media_id", "__no_media")
    out = mark(out, aggregation_types, "aggregation_type", "__no_agg")

    exist_keys = existing.select(*TS_KEY).distinct().withColumn(
        "__exists", F.lit(True)
    )
    out = out.join(F.broadcast(exist_keys), list(TS_KEY), "left")

    w = Window.partitionBy(*TS_KEY).orderBy("row_id")
    out = out.withColumn("__batch_rn", F.row_number().over(w))

    reason = (
        F.when(F.col("start_datetime").isNull(), "start_datetime_null")
        .when(F.col("__no_loc"), "unknown_location")
        .when(F.col("__no_param"), "unknown_parameter")
        .when(F.col("__no_media"), "unknown_media")
        .when(F.col("__no_agg"), "unknown_aggregation_type")
        .when(F.col("__exists"), "duplicate_of_existing")
        .when(F.col("__batch_rn") > 1, "duplicate_in_batch")
    )
    return out.withColumn("reject_reason", reason).drop(
        "__no_loc", "__no_param", "__no_media", "__no_agg", "__exists",
        "__batch_rn",
    )


def insert_timeseries(
    catalog: DataFrame,
    validated: DataFrame,
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """Append the accepted rows (reject_reason IS NULL) to the catalog —
    the INSERT after the ladder. Returns the merged catalog; the caller
    backfills via daily_update.ingest_continuous, mirroring the
    reference's immediate getNewContinuous call."""
    cols = list(columns or catalog.columns)
    accepted = validated.where(F.col("reject_reason").isNull()).select(*cols)
    return catalog.unionByName(accepted)
