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
    return validate_batch(
        new_rows,
        fk_checks=[
            ("location_id", locations, "unknown_location"),
            ("parameter_id", parameters, "unknown_parameter"),
            ("media_id", media, "unknown_media"),
            ("aggregation_type", aggregation_types,
             "unknown_aggregation_type"),
        ],
        unique_key=TS_KEY,
        existing=existing,
        null_checks=[("start_datetime", "start_datetime_null")],
    )


def validate_batch(
    new_rows: DataFrame,
    fk_checks: Sequence[tuple],
    unique_key: Sequence[str],
    existing: DataFrame,
    null_checks: Sequence[tuple] = (),
    order_col: str = "row_id",
) -> DataFrame:
    """The add* validator family, declaratively: the same ladder as
    validate_new_timeseries for any catalog table.

    The reference repeats this shape for every insert entry point —
    addACImageSeries.R:44 (location FK + unique series),
    addACRasterSeries.R (parameter/model FKs), addACOrg.R:69 (unique
    name), addACLocation.R (type/datum FKs) — so the engine exposes one
    operator configured by:

    - ``null_checks``: [(col, reason), ...] — required fields;
    - ``fk_checks``: [(col, dim_df, reason), ...] — dim membership
      (dim's first column), checked in order;
    - ``unique_key`` + ``existing``: the INSERT's unique constraint,
      against the current catalog and within the batch (first by
      ``order_col`` wins).
    """
    out = new_rows
    flags: list[tuple] = []
    for i, (col, dim, rsn) in enumerate(fk_checks):
        d = dim.select(F.col(dim.columns[0]).alias("__k")).distinct()
        flag = f"__fk_{i}"
        out = (
            out.join(F.broadcast(d), out[col] == F.col("__k"), "left")
            .withColumn(flag, F.col("__k").isNull())
            .drop("__k")
        )
        flags.append((flag, rsn))

    exist_keys = existing.select(*unique_key).distinct().withColumn(
        "__exists", F.lit(True)
    )
    out = out.join(F.broadcast(exist_keys), list(unique_key), "left")
    w = Window.partitionBy(*unique_key).orderBy(order_col)
    out = out.withColumn("__batch_rn", F.row_number().over(w))

    ladder = (
        [(F.col(c).isNull(), rsn) for c, rsn in null_checks]
        + [(F.col(flag), rsn) for flag, rsn in flags]
        + [(F.col("__exists"), "duplicate_of_existing"),
           (F.col("__batch_rn") > 1, "duplicate_in_batch")]
    )
    reason = F.when(*ladder[0])
    for cond, rsn in ladder[1:]:
        reason = reason.when(cond, rsn)
    return out.withColumn("reject_reason", reason).drop(
        "__exists", "__batch_rn", *[f for f, _ in flags]
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
