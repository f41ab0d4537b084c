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


def validate_no_overlap(
    batch: DataFrame,
    existing: DataFrame,
    keys: Sequence[str],
    start_col: str,
    end_col: str,
    order_col: str,
) -> DataFrame:
    """Interval non-overlap validator — the set-wise analog of the
    reference's exclusion constraints and overlap-prevention triggers
    (boreholes.prevent_geology_overlap / prevent_permafrost_overlap,
    patch_23.R:356-379; the tstzrange ``WITH &&`` constraints on the QC
    tables, patch_55.R:227-255): a half-open [start, end) interval may
    not overlap another interval of the same key.

    Per batch row, ``reject_reason`` is 'overlaps_existing' when it
    overlaps any existing interval of its key, else
    'overlaps_in_batch' when it overlaps an earlier batch row
    (``order_col`` = insertion order — the trigger fires row-wise, so
    the earlier of an in-batch pair wins), else NULL. The in-batch
    check is pessimistic about chains (a row overlapping only an
    already-rejected row is still flagged), which is the safe direction
    for a validator.

    Both probes are equi-joins on the keys + interval predicates over
    interval-table-sized frames.
    """
    ex = existing.select(
        *[F.col(k).alias(f"__e_{k}") for k in keys],
        F.col(start_col).alias("__e_s"),
        F.col(end_col).alias("__e_e"),
    )
    cond_e = [batch[k] == ex[f"__e_{k}"] for k in keys] + [
        batch[start_col] < ex["__e_e"], batch[end_col] > ex["__e_s"]
    ]
    hits_e = (
        batch.join(ex, cond_e, "left_semi")
        .select(*keys, order_col)
        .withColumn("__hit_e", F.lit(True))
    )
    b2 = batch.select(
        *[F.col(k).alias(f"__b_{k}") for k in keys],
        F.col(start_col).alias("__b_s"),
        F.col(end_col).alias("__b_e"),
        F.col(order_col).alias("__b_o"),
    )
    cond_b = [batch[k] == b2[f"__b_{k}"] for k in keys] + [
        batch[start_col] < b2["__b_e"], batch[end_col] > b2["__b_s"],
        b2["__b_o"] < batch[order_col],
    ]
    hits_b = (
        batch.join(b2, cond_b, "left_semi")
        .select(*keys, order_col)
        .withColumn("__hit_b", F.lit(True))
    )
    out = (
        batch.join(hits_e, [*keys, order_col], "left")
        .join(hits_b, [*keys, order_col], "left")
    )
    reason = (
        F.when(F.col("__hit_e"), "overlaps_existing")
        .when(F.col("__hit_b"), "overlaps_in_batch")
    )
    return out.select(*batch.columns, reason.alias("reject_reason"))


def classify_unit_updates(
    parameters: DataFrame,
    updates: DataFrame,
    matrix_states: DataFrame,
    results: DataFrame,
    timeseries: DataFrame,
    measurements: DataFrame,
) -> DataFrame:
    """Unit-change guard (inst/patches/patch_52.R:
    prevent_used_parameter_unit_update + parameter_matrix_state_has_
    results), set-wise over a batch of proposed parameter updates.

    A proposed change to units_liquid/solid/gas is BLOCKED when the
    old unit is set, differs from the new one (IS DISTINCT FROM —
    NULLing a set unit is a change), and the parameter has usage in
    that matrix state: a discrete result, or a continuous timeseries
    with at least one measurement. Unchanged units are 'noop',
    unguarded changes 'update'.

    One melt (3 phases per parameter), usage derived with two
    left-semi EXISTS probes unioned — the fact tables are only ever
    semi-joined on their partition keys, never widened.

    Output: (parameter_id, phase, old_unit, new_unit, action).
    """
    ms = matrix_states.select("matrix_state_id", "matrix_state_code")
    discrete_usage = (
        results.join(ms, "matrix_state_id")
        .select("parameter_id", F.col("matrix_state_code").alias("phase"))
        .distinct()
    )
    measured_ts = timeseries.join(
        measurements.select("timeseries_id").distinct(),
        "timeseries_id", "left_semi")
    continuous_usage = (
        measured_ts.join(ms, "matrix_state_id")
        .select("parameter_id", F.col("matrix_state_code").alias("phase"))
        .distinct()
    )
    usage = discrete_usage.unionByName(continuous_usage).distinct() \
        .withColumn("__used", F.lit(True))

    melted = None
    for phase in ("liquid", "solid", "gas"):
        part = (
            parameters.select(
                "parameter_id",
                F.col(f"units_{phase}").alias("old_unit"))
            .join(updates.select(
                "parameter_id",
                F.col(f"units_{phase}").alias("new_unit")),
                "parameter_id")
            .withColumn("phase", F.lit(phase))
        )
        melted = part if melted is None else melted.unionByName(part)
    j = melted.join(usage, ["parameter_id", "phase"], "left")
    distinct_change = ~F.col("old_unit").eqNullSafe(F.col("new_unit"))
    action = (
        F.when(~distinct_change, "noop")
        .when(F.col("old_unit").isNotNull()
              & F.coalesce(F.col("__used"), F.lit(False)), "blocked")
        .otherwise("update")
    )
    return j.select("parameter_id", "phase", "old_unit", "new_unit",
                    action.alias("action"))
