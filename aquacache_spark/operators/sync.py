"""Reconciliation: remote <-> local full-outer diff with null-safe
per-column comparison.

Reference semantics (R/synchronize_continuous.R:566-742):
- composite-key set difference both directions; first divergence
  datetime = cutoff (:583-614)
- from the cutoff: full outer join on datetime, per-column null-safe
  diff (``same_or_na``, :659-668), then DELETE local-only rows, upsert
  changed/new rows; rows flagged ``no_update`` are immune (:11,576-579)

Spark-first: one ``full_outer`` join on the key + ``eqNullSafe``
comparisons classifying each row as insert / update / delete /
unchanged — the exact shape Delta's MERGE consumes (matched-update /
not-matched-insert / matched-delete). The join shuffles both sides on
the composite key once; at 100 TB the sync window bounds the input
(reconcile from watermark, not full history).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reconcile(
    local: DataFrame,
    remote: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    no_update_col: str | None = None,
) -> DataFrame:
    """Classify every key as insert/update/delete/unchanged.

    Output: keys..., action, local_<col>..., remote_<col>... where
    action ∈ {insert, update, delete, unchanged}. ``no_update`` local
    rows are always 'unchanged' (protected, reference :11).
    """
    l = local.select(
        *keys,
        *[F.col(c).alias(f"local_{c}") for c in compare_cols],
        *( [F.col(no_update_col).alias("__prot")] if no_update_col else [] ),
    ).withColumn("__in_l", F.lit(1))
    r = remote.select(
        *keys, *[F.col(c).alias(f"remote_{c}") for c in compare_cols]
    ).withColumn("__in_r", F.lit(1))

    j = l.join(r, list(keys), "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"local_{c}").eqNullSafe(F.col(f"remote_{c}"))

    action = (
        F.when(F.col("__in_l").isNull(), F.lit("insert"))
        .when(F.col("__in_r").isNull(), F.lit("delete"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("update"))
    )
    if no_update_col:
        action = F.when(
            F.coalesce(F.col("__prot"), F.lit(False)), F.lit("unchanged")
        ).otherwise(action)
    out = j.withColumn("action", action).drop("__in_l", "__in_r")
    if no_update_col:
        out = out.drop("__prot")
    return out


def divergence_cutoff(
    local: DataFrame,
    remote: DataFrame,
    keys: Sequence[str],
    dt_col: str,
    value_col: str,
) -> DataFrame:
    """First datetime per series where local and remote disagree
    (set-difference both directions, min) — R/synchronize_continuous.R:583-614."""
    group = [k for k in keys if k != dt_col]
    l = local.select(*keys, dt_col, F.col(value_col).alias("__v"))
    r = remote.select(*keys, dt_col, F.col(value_col).alias("__v"))
    only_l = l.exceptAll(r)
    only_r = r.exceptAll(l)
    diffs = only_l.unionByName(only_r)
    return diffs.groupBy(*group).agg(F.min(dt_col).alias("cutoff"))
