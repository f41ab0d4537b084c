"""Discrete-data synchronization: import-source-scoped sample deletes
and null-safe-key result reconciliation.

Reference: ``R/synchronize_discrete.R``. Two distinct semantics:

**Sample gap deletes** (:280-388): the remote's sample datetimes, sorted
per series, partition the sync window into gaps; local samples inside a
gap are deleted ONLY when their ``import_source`` matches the series'
source function and they are not ``no_update``-protected. The boundary
rules are deliberately asymmetric and are preserved exactly:

- head gap ``(start, first_remote)``: strict bounds (:289-291);
- middle gaps ``[prev+1s, next-1s]``: one-second margins
  (:355-358, ``BETWEEN prev + 1 AND curr - 1`` on POSIXct seconds);
- tail gap ``(last_remote, end)``: strict bounds, and only when the
  remote returned **at least two** dated samples (:318 —
  ``j == length(inRemote) && delete_has_prev`` needs ``j > 1``);
- no dated remote samples at all -> no deletes (the loop never runs).

**Result reconciliation** (:500-860): remote results match local rows
by NULL-SAFE equality over the result key columns (parameter_id,
result_type, fraction, ... — a missing/NA remote key matches only NULL
locally, :555-591); matched rows update when the value differs,
``no_update`` rows are immune (:768-773), unmatched local rows are
deleted (:836-855), unmatched remote rows insert.

Spark-first: the gap classification is one per-series ordered window
(running max / min of remote datetimes around each local row) — no
join explosion, shuffles once on the series key; the result
reconciliation is a single full-outer join on the null-safe key.
Both scale linearly with the sync window.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sample_sync_actions(
    local: DataFrame,
    remote: DataFrame,
    keys: Sequence[str],
    start: str,
    end: str,
    source_fx: str,
    dt_col: str = "datetime",
    src_col: str = "import_source",
    no_update_col: str = "no_update",
) -> DataFrame:
    """Classify samples: matched / delete / keep / insert.

    ``delete`` = local-only rows the reference's gap logic would remove
    (import-source-scoped, no_update-protected, boundary rules above);
    ``keep`` = local-only rows it would leave; ``insert`` = remote-only
    datetimes.
    """
    r = remote.select(*keys, F.col(dt_col)).distinct()
    l = local.select(
        *keys, F.col(dt_col), F.col(src_col), F.col(no_update_col)
    )

    # carry the local payload columns through the union (NULL on the
    # remote side) — avoids a join-back shuffle after the window pass
    univ = l.select(
        *keys, dt_col, src_col, no_update_col, F.lit(0).alias("__is_r")
    ).unionByName(
        r.select(
            *keys, dt_col,
            F.lit(None).cast("string").alias(src_col),
            F.lit(None).cast("boolean").alias(no_update_col),
            F.lit(1).alias("__is_r"),
        )
    )
    # range frames need a numeric order key; datetimes are second-
    # resolution here (the reference's +-1s margins operate on seconds)
    univ = univ.withColumn("__sec", F.unix_timestamp(F.col(dt_col)))
    rdt = F.when(F.col("__is_r") == 1, F.col("__sec"))
    w_prev = (
        Window.partitionBy(*keys)
        .orderBy("__sec")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy(*keys)
        .orderBy("__sec")
        .rangeBetween(0, Window.unboundedFollowing)
    )
    # Everything below derives from ONE pass over the windowed universe
    # — per-series remote count and local-presence-at-datetime are
    # window aggregates sharing the union's single exchange (their
    # partition keys are supersets of the sort partitioning), so the
    # inputs are never re-scanned for a groupBy or an anti-join (the
    # join-based version re-executed both input plans up to 3x).
    w_part = Window.partitionBy(*keys)
    w_dt = Window.partitionBy(*keys, dt_col)
    marked = (
        univ.withColumn("__prev_r", F.max(rdt).over(w_prev))
        .withColumn("__next_r", F.min(rdt).over(w_next))
        .withColumn("__n_remote", F.sum("__is_r").over(w_part))
        .withColumn(
            "__has_local", F.max(1 - F.col("__is_r")).over(w_dt)
        )
    )

    loc = marked.where(F.col("__is_r") == 0)
    s = F.unix_timestamp(F.lit(start).cast("timestamp"))
    e = F.unix_timestamp(F.lit(end).cast("timestamp"))
    sec, prev, nxt = F.col("__sec"), F.col("__prev_r"), F.col("__next_r")
    # null-safe: a NULL prev/next must read as "not at a remote
    # datetime", not as three-valued NULL (which would poison ~in_remote)
    in_remote = prev.eqNullSafe(sec) | nxt.eqNullSafe(sec)
    head = prev.isNull() & nxt.isNotNull() & (sec > s) & (sec < nxt)
    middle = (
        prev.isNotNull() & nxt.isNotNull()
        & (sec >= prev + 1) & (sec <= nxt - 1)
    )
    tail = (
        prev.isNotNull() & nxt.isNull() & (F.col("__n_remote") >= 2)
        & (sec > prev) & (sec < e)
    )
    deletable = (
        ~in_remote
        & (F.col(src_col) == F.lit(source_fx))
        & ~F.col(no_update_col)
        & (head | middle | tail)
    )
    local_actions = loc.select(
        *keys, dt_col, src_col, no_update_col,
        F.when(in_remote, F.lit("matched"))
        .when(deletable, F.lit("delete"))
        .otherwise(F.lit("keep"))
        .alias("action"),
    )
    inserts = (
        marked.where((F.col("__is_r") == 1) & (F.col("__has_local") == 0))
        .select(
            *keys, dt_col,
            F.lit(source_fx).alias(src_col),  # :902 import_source <- source_fx
            F.lit(False).alias(no_update_col),
            F.lit("insert").alias("action"),
        )
    )
    return local_actions.unionByName(inserts)


def result_sync_actions(
    local: DataFrame,
    remote: DataFrame,
    key_cols: Sequence[str],
    value_col: str = "result",
    no_update_col: str = "no_update",
) -> DataFrame:
    """Classify results: insert / update / delete / unchanged / protected.

    Key matching is NULL-SAFE over ``key_cols`` (reference :555-591: a
    missing remote key value matches only a NULL local one). ``update``
    when the value differs null-safely; ``protected`` local matches are
    immune (:768-773); unmatched locals -> ``delete`` unless protected
    (:836-855: ``!checked & !no_update``); unmatched remotes ->
    ``insert``.
    """
    l = local.select(
        *[F.col(c).alias(f"__l_{c}") for c in key_cols],
        F.col(value_col).alias("__l_v"),
        F.col(no_update_col).alias("__l_prot"),
    )
    r = remote.select(
        *[F.col(c).alias(f"__r_{c}") for c in key_cols],
        F.col(value_col).alias("__r_v"),
    ).withColumn("__in_r", F.lit(1))
    cond = None
    for c in key_cols:
        eq = F.col(f"__l_{c}").eqNullSafe(F.col(f"__r_{c}"))
        cond = eq if cond is None else (cond & eq)
    j = l.withColumn("__in_l", F.lit(1)).join(r, cond, "full_outer")

    action = (
        F.when(F.col("__in_l").isNull(), F.lit("insert"))
        .when(
            F.col("__in_r").isNull(),
            F.when(F.col("__l_prot"), F.lit("protected")).otherwise(
                F.lit("delete")
            ),
        )
        .when(F.col("__l_prot"), F.lit("protected"))
        .when(F.col("__l_v").eqNullSafe(F.col("__r_v")), F.lit("unchanged"))
        .otherwise(F.lit("update"))
    )
    out = j.select(
        *[
            F.coalesce(F.col(f"__l_{c}"), F.col(f"__r_{c}")).alias(c)
            for c in key_cols
        ],
        F.col("__l_v").alias(f"local_{value_col}"),
        F.col("__r_v").alias(f"remote_{value_col}"),
        action.alias("action"),
    )
    return out
