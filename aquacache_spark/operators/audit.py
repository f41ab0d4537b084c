"""Audit as-of reconstruction for interval QC tables.

Reference: ``audit.continuous_qc_rows_as_of``
(inst/patches/patch_55.R:2336-2520). Reconstructs a grades / approvals
/ qualifiers interval table as it stood at ``as_of``:

- ``future_changes``: the FIRST audit-log entry per row with
  ``action_timestamp > as_of`` (``DISTINCT ON ... ORDER BY
  action_timestamp, log_id``); its ``original_data`` IS the row's state
  at ``as_of``. Rows inserted after ``as_of`` have NULL original fields
  and NULL row_created, so the ``row_created <= as_of`` filter drops
  them; rows deleted after ``as_of`` exist only in the log and are
  resurrected via the full outer join.
- ``snapshot``: current rows FULL OUTER JOIN future changes on row id —
  the log's original state wins wherever a future change exists.
- filters: ``row_created <= as_of``; window overlap ``end_dt >
  p_start OR (start_dt = end_dt AND start_dt >= p_start)`` (zero-width
  intervals are kept when they sit on/after the window start) and
  ``start_dt < p_end``.

Spark-first: one window (first-change-per-row) + one full outer join on
the row id; both shuffle on the row id only. The log scan prunes on
``action_timestamp > as_of`` (pushed to the scan); at 100 TB the log is
date-partitioned on action_timestamp so the predicate prunes partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FIELD_COLS = ("timeseries_id", "type_id", "start_dt", "end_dt")


def rows_as_of(
    current: DataFrame,
    log: DataFrame,
    as_of: str,
    field_cols: tuple[str, ...] = FIELD_COLS,
) -> DataFrame:
    """Generic table snapshot at ``as_of`` — the audit.*_as_of family
    (patch_55.R:2336-2420), parameterized by field columns so the same
    reconstruction serves QC intervals, corrections, and compound
    definitions.

    ``current``: (row_id, *field_cols, row_created). ``log``: (log_id,
    action_timestamp, orig_row_id, orig_<field>..., new_row_id,
    row_created); NULL orig_* = the row did not exist before the
    change (insert). Current FULL OUTER first-post-as_of log change;
    the log's original values win; rows created after ``as_of`` drop.
    """
    return _rows_as_of(current, log, as_of, field_cols)


def qc_rows_as_of(
    current: DataFrame,
    log: DataFrame,
    as_of: str,
    window_start: str | None = None,
    window_end: str | None = None,
) -> DataFrame:
    """Reconstruct the interval table at ``as_of``.

    ``current`` columns: row_id, timeseries_id, type_id, start_dt,
    end_dt, row_created. ``log`` columns: log_id, action_timestamp,
    orig_row_id, orig_timeseries_id, orig_type_id, orig_start_dt,
    orig_end_dt, new_row_id, row_created (NULL orig_* = the row did not
    exist before the change, i.e. an insert).
    """
    return _rows_as_of(current, log, as_of, FIELD_COLS,
                       window_start, window_end)


def _rows_as_of(
    current: DataFrame,
    log: DataFrame,
    as_of: str,
    field_cols: tuple[str, ...],
    window_start: str | None = None,
    window_end: str | None = None,
) -> DataFrame:
    as_of_ts = F.lit(as_of).cast("timestamp")
    fut = log.where(F.col("action_timestamp") > as_of_ts).withColumn(
        "__key", F.coalesce(F.col("orig_row_id"), F.col("new_row_id"))
    )
    w = Window.partitionBy("__key").orderBy("action_timestamp", "log_id")
    first = (
        fut.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            F.col("__key").alias("__f_row_id"),
            *[F.col(f"orig_{c}").alias(f"__f_{c}") for c in field_cols],
            F.col("row_created").alias("__f_created"),
        )
    )
    c = current.select(
        F.col("row_id").alias("__c_row_id"),
        *[F.col(col).alias(f"__c_{col}") for col in field_cols],
        F.col("row_created").alias("__c_created"),
    )
    j = c.join(first, c["__c_row_id"] == first["__f_row_id"], "full_outer")
    has_future = F.col("__f_row_id").isNotNull()

    def pick(col: str):
        # the reference's CASE WHEN f.row_id IS NOT NULL THEN f.x ELSE
        # c.x — NOT a coalesce: a future change with NULL original
        # field must yield NULL (post-as_of insert), not the current
        # value.
        return F.when(has_future, F.col(f"__f_{col}")).otherwise(
            F.col(f"__c_{col}")
        )

    snap = j.select(
        F.coalesce(F.col("__f_row_id"), F.col("__c_row_id")).alias("row_id"),
        *[pick(col).alias(col) for col in field_cols],
        F.when(has_future, F.col("__f_created"))
        .otherwise(F.col("__c_created"))
        .alias("row_created"),
    )
    out = snap.where(F.col("row_created") <= as_of_ts)
    if window_start is not None:
        ws = F.lit(window_start).cast("timestamp")
        out = out.where(
            (F.col("end_dt") > ws)
            | ((F.col("start_dt") == F.col("end_dt")) & (F.col("start_dt") >= ws))
        )
    if window_end is not None:
        out = out.where(F.col("start_dt") < F.lit(window_end).cast("timestamp"))
    return out.drop("row_created")
