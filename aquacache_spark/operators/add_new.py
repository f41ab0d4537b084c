"""Direct-append API with overwrite modes (R/addNewContinuous.R:16).

The reference appends user-supplied continuous data to one basic
timeseries at a time, with three overwrite strategies and a stack of
normalization defaults. Re-expressed set-wise: one pass classifies a
whole batch spanning MANY series into merge actions, so the writer
(ParquetMergeStore / Delta MERGE) applies them in bulk.

Semantics ported:

- rows with NULL value are dropped up front (R/addNewContinuous.R:66-73);
- non-basic target series are rejected — the reference raises
  (R/addNewContinuous.R:37-45); set-wise that is ``action='reject'``;
- defaults (R/addNewContinuous.R:139-175): grade / approval / qualifier
  fall back to the 'UNS' (unspecified) code, owner and
  data-sharing-agreement fall back to the series' catalog defaults,
  ``imputed`` / ``no_update`` default FALSE;
- period assignment (R/addNewContinuous.R:230-236): instantaneous
  series always get period 0; other aggregation types keep a supplied
  period (NULL when absent — the reference then runs calculate_period,
  available here as operators/period.py and left to the caller so this
  stays one map-side pass);
- overwrite='no' (R/addNewContinuous.R:317-337): incoming rows whose
  (series, datetime) already exists are dropped (``action='skip'``);
- overwrite='conflict' (R/addNewContinuous.R:343-356): existing match
  → ``update`` (the reference's ON CONFLICT update of value / period /
  imputed / no_update), else ``insert``;
- overwrite='all' (R/addNewContinuous.R:287-316): additionally, every
  existing row inside the incoming batch's per-series [min, max]
  datetime range that is NOT re-sent is ``delete`` — the reference's
  "wipe and replace the temporal range".

Scale: the existence probe is an equi-join on (series, datetime) — the
store's bucketing key, so co-located at 100 TB; the 'all'-mode delete
scan prunes the existing fact to the per-series range via a broadcast
bounds join before the anti-join, so it touches only affected
partitions, never the full history.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNSPECIFIED = "UNS"  # public.grade/approval/qualifier_types code (R:75-101)

_QC_DEFAULT_COLS = ("grade", "approval", "qualifier")


def normalize_incoming(
    incoming: DataFrame,
    catalog: DataFrame,
    ts_col: str = "timeseries_id",
    value_col: str = "value",
) -> DataFrame:
    """NA drop + defaults fill + period assignment + basic-only guard.

    ``catalog``: (ts_col, timeseries_type, aggregation_type,
    default_owner, default_data_sharing_agreement_id) — catalog-sized,
    broadcast. Adds ``__reject`` (non-basic target) instead of raising,
    so one batch can span valid and invalid series.
    """
    cat = F.broadcast(catalog.select(
        ts_col,
        "timeseries_type",
        "aggregation_type",
        F.col("default_owner").alias("__def_owner"),
        F.col("default_data_sharing_agreement_id").alias("__def_dsa"),
    ))
    inc = incoming.where(F.col(value_col).isNotNull()).join(cat, ts_col, "left")

    def ensure(df: DataFrame, col: str, default) -> DataFrame:
        if col in df.columns:
            return df.withColumn(col, F.coalesce(F.col(col), default))
        return df.withColumn(col, default)

    for qc in _QC_DEFAULT_COLS:
        inc = ensure(inc, qc, F.lit(UNSPECIFIED))
    inc = ensure(inc, "owner", F.col("__def_owner"))
    inc = ensure(inc, "data_sharing_agreement_id", F.col("__def_dsa"))
    inc = ensure(inc, "imputed", F.lit(False))
    inc = ensure(inc, "no_update", F.lit(False))
    period = (
        F.when(F.col("aggregation_type") == "instantaneous", F.lit(0.0))
        .otherwise(F.col("period_seconds") if "period_seconds" in inc.columns
                   else F.lit(None).cast("double"))
    )
    return (
        inc.withColumn("period_seconds", period)
        .withColumn(
            "__reject",
            F.col("timeseries_type").isNull()
            | (F.col("timeseries_type") != "basic"),
        )
        .drop("timeseries_type", "__def_owner", "__def_dsa")
    )


def add_new_continuous(
    incoming: DataFrame,
    existing: DataFrame,
    catalog: DataFrame,
    overwrite: str = "no",
    ts_col: str = "timeseries_id",
    dt_col: str = "datetime",
    value_col: str = "value",
    payload_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Classify a normalized batch into merge actions per overwrite mode.

    Output: (ts_col, dt_col, payload columns..., action) with action ∈
    {'insert', 'update', 'skip', 'delete', 'reject'}. ``existing`` needs
    only (ts_col, dt_col) plus, for 'all'-mode deletes, the payload
    columns it should surface on delete rows (emitted NULL here — the
    delete key is (series, datetime)).
    """
    if overwrite not in ("no", "all", "conflict"):
        raise ValueError(
            "overwrite must be one of 'no', 'all', 'conflict'"
        )  # R/addNewContinuous.R:47-52
    inc = normalize_incoming(incoming, catalog, ts_col, value_col)
    if payload_cols is None:
        payload_cols = [
            c for c in inc.columns
            if c not in (ts_col, dt_col, "__reject", "aggregation_type")
        ]

    ex_keys = existing.select(
        F.col(ts_col), F.col(dt_col), F.lit(True).alias("__exists")
    )
    probed = inc.join(ex_keys, [ts_col, dt_col], "left")

    if overwrite == "no":
        action = (
            F.when(F.col("__reject"), "reject")
            .when(F.col("__exists"), "skip")
            .otherwise("insert")
        )
    else:
        action = (
            F.when(F.col("__reject"), "reject")
            .when(F.col("__exists"), "update")
            .otherwise("insert")
        )
    out = probed.select(
        ts_col, dt_col, *payload_cols, action.alias("action")
    )

    if overwrite != "all":
        return out

    # wipe-and-replace range deletes (R/addNewContinuous.R:287-316):
    # existing rows inside the incoming per-series datetime range whose
    # datetime was not re-sent. Bounds are catalog-sized -> broadcast;
    # the range filter prunes store partitions before the anti-join.
    valid = inc.where(~F.col("__reject"))
    bounds = valid.groupBy(ts_col).agg(
        F.min(dt_col).alias("__lo"), F.max(dt_col).alias("__hi")
    )
    in_range = (
        existing.select(ts_col, dt_col)
        .join(F.broadcast(bounds), ts_col)
        .where(F.col(dt_col).between(F.col("__lo"), F.col("__hi")))
        .drop("__lo", "__hi")
    )
    deletes = in_range.join(
        valid.select(ts_col, dt_col), [ts_col, dt_col], "left_anti"
    ).select(
        ts_col, dt_col,
        *[F.lit(None).cast(out.schema[c].dataType).alias(c)
          for c in payload_cols],
        F.lit("delete").alias("action"),
    )
    return out.unionByName(deletes)


def add_new_discrete(
    samples: DataFrame,
    results: DataFrame,
    organizations: DataFrame,
    approvals: DataFrame,
    grades: DataFrame,
    qualifiers: DataFrame,
    max_sample_id: int = 0,
    batch_key: str = "batch_id",
) -> DataFrame:
    """Batch-set-wise ``addNewDiscrete`` (R/addNewDiscrete.R:30-120):
    the reference inserts ONE sample + its results per transaction; a
    cluster ingests a whole batch in one pass, classifying every row
    into the action the transactional writer would take.

    Semantics ported:

    - owner is REQUIRED and must resolve against ``organizations``
      (the reference errors; set-wise that is
      ``action='reject_unknown_owner'``) — contributor is optional but
      must resolve when present;
    - approval / grade / qualifier are optional code strings that must
      resolve against their dim tables when present;
    - valid samples get sequential ``sample_id`` after
      ``max_sample_id``, ordered deterministically by (location_id,
      datetime, batch key) — the find_discrete_sample_id analog;
    - results attach to their batch's sample id; a NULL result with no
      ``result_condition`` is dropped (the reference's documented NA
      rule), and conditions 1/2 (below/above detection limit) REQUIRE
      ``result_condition_value``;
    - results of rejected samples reject with the sample's reason.

    Output one action frame: (entity 'sample'|'result', batch key,
    entity_id, action, sample_id). All dim lookups broadcast (code
    tables); the only shuffle is the window assigning sample ids —
    keyed by nothing data-dependent, it is a tiny batch-sized sort at
    ingest cadence, not a fact-table operation.
    """
    org = F.broadcast(organizations.select(
        F.col("name").alias("__org_name"),
        F.col("organization_id").alias("__org_id")))
    s = (
        samples
        .join(org, F.col("owner") == F.col("__org_name"), "left")
        .withColumnRenamed("__org_id", "__owner_id").drop("__org_name")
        .join(org, F.col("contributor") == F.col("__org_name"), "left")
        .withColumnRenamed("__org_id", "__contrib_id").drop("__org_name")
    )
    for dim, col in ((approvals, "approval"), (grades, "grade"),
                     (qualifiers, "qualifier")):
        d = F.broadcast(dim.select(
            F.col("code").alias(f"__{col}_code"),
            F.lit(True).alias(f"__{col}_ok")))
        s = s.join(d, F.col(col) == F.col(f"__{col}_code"), "left") \
            .drop(f"__{col}_code")
    reason = (
        F.when(F.col("__owner_id").isNull(),
               F.lit("reject_unknown_owner"))
        .when(F.col("contributor").isNotNull()
              & F.col("__contrib_id").isNull(),
              F.lit("reject_unknown_contributor"))
        .when(F.col("approval").isNotNull()
              & F.col("__approval_ok").isNull(),
              F.lit("reject_unknown_approval"))
        .when(F.col("grade").isNotNull() & F.col("__grade_ok").isNull(),
              F.lit("reject_unknown_grade"))
        .when(F.col("qualifier").isNotNull()
              & F.col("__qualifier_ok").isNull(),
              F.lit("reject_unknown_qualifier"))
    )
    s = s.withColumn("__reason", reason)
    from pyspark.sql import Window

    w = Window.orderBy("location_id", "datetime", batch_key)
    ok = s.where(F.col("__reason").isNull()).withColumn(
        "__sid", F.row_number().over(w) + F.lit(max_sample_id))
    sample_actions = (
        ok.select(F.lit("sample").alias("entity"), F.col(batch_key),
                  F.col("location_id").cast("long").alias("entity_id"),
                  F.lit("insert").alias("action"),
                  F.col("__sid").alias("sample_id"))
        .unionByName(
            s.where(F.col("__reason").isNotNull()).select(
                F.lit("sample").alias("entity"), F.col(batch_key),
                F.col("location_id").cast("long").alias("entity_id"),
                F.col("__reason").alias("action"),
                F.lit(None).cast("long").alias("sample_id")))
    )
    sid_map = ok.select(F.col(batch_key), F.col("__sid"))
    rej_map = s.where(F.col("__reason").isNotNull()).select(
        F.col(batch_key), F.col("__reason"))
    r = (
        results
        .join(F.broadcast(sid_map), batch_key, "left")
        .join(F.broadcast(rej_map), batch_key, "left")
    )
    r_action = (
        F.when(F.col("__reason").isNotNull(), F.col("__reason"))
        .when(F.col("result").isNull()
              & F.col("result_condition").isNull(),
              F.lit("drop_na_result"))
        .when(F.col("result_condition").isin(1, 2)
              & F.col("result_condition_value").isNull(),
              F.lit("reject_condition_value_missing"))
        .otherwise(F.lit("insert"))
    )
    result_actions = r.select(
        F.lit("result").alias("entity"), F.col(batch_key),
        F.col("result_id").cast("long").alias("entity_id"),
        r_action.alias("action"),
        F.col("__sid").alias("sample_id"),
    )
    return sample_actions.unionByName(result_actions)
