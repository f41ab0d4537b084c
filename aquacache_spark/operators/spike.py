"""Hampel spike detection — rolling-median/MAD outlier flags for
sensor QC.

The reference's grade/qualifier workflow marks bad sensor excursions
by hand (R/adjust_functions.R applies the resulting segments); this
operator supplies the automated detector a large-scale deployment
needs in front of it: a point is a spike when it deviates from its
window's median by more than ``t * 1.4826 * MAD`` (the classic Hampel
identifier; 1.4826 scales MAD to a Gaussian sigma).

Both the median and the MAD are computed over a per-row
``collect_list`` window frame materialized as a sorted array, so the
whole detector is codegen'd array expressions — no UDF, one exchange
(the per-series window shuffle).  Median interpolation is
``(a + b) / 2`` on exact doubles, bit-identical across engines.

Boundary rows use their clipped frame (the same convention as the
reference's rolling median in calculate_period, R/calculate_period.R:83).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MAD_SIGMA = 1.4826


def _arr_median(arr: Column) -> Column:
    """Exact median of a sorted non-empty array (0-based F.get)."""
    m = F.size(arr)
    mid = (m / 2).cast("int")
    odd = m % 2 == 1
    return F.when(odd, F.get(arr, mid)).otherwise(
        (F.get(arr, mid - 1) + F.get(arr, mid)) / 2.0
    )


def hampel_flags(
    df: DataFrame,
    keys: Sequence[str],
    dt_col: str = "datetime",
    value_col: str = "value",
    k: int = 5,
    t: float = 3.0,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-series Hampel identifier over a ±k-point window.

    Output adds ``window_median``, ``mad`` and ``is_spike``.  NULL
    values are never flagged and do not enter their neighbors'
    windows.  Pass ``tiebreak_cols`` (e.g. a row id) when ``dt_col``
    can tie — a ROWS frame over a non-total order makes the frame
    CONTENTS nondeterministic.
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(dt_col, *tiebreak_cols)
        .rowsBetween(-k, k)
    )
    v = F.col(value_col)
    df = df.withColumn(
        "__win", F.array_sort(F.collect_list(v).over(w))
    )
    med = _arr_median(F.col("__win"))
    df = df.withColumn("window_median", med)
    devs = F.array_sort(
        F.transform(
            F.col("__win"), lambda x: F.abs(x - F.col("window_median"))
        )
    )
    df = df.withColumn("mad", _arr_median(devs))
    return df.withColumn(
        "is_spike",
        F.coalesce(
            F.when(
                v.isNotNull(),
                F.abs(v - F.col("window_median"))
                > F.lit(t) * F.lit(MAD_SIGMA) * F.col("mad"),
            ),
            F.lit(False),
        ),
    ).drop("__win")
