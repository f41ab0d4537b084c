"""Periodicity detection (``calculate_period``).

Reference semantics (R/calculate_period.R:82-135):
1. consecutive-gap diffs, 2. rolling median (k=3) smoothing,
3. change-point scan: 3 consecutive smoothed gaps differing from the
   running period => a new period starting 2 rows back,
4. forward- then backward-fill the per-row period,
5. serialize as ISO-8601 ``P{d}DT{h}H{m}M{s}S`` (:109-129).

Steps 1-2 and 4-5 are pure window/column expressions (see
lag_diff_period in queries.py for the oracle-checked version); the
change-point scan is sequential and runs per-series in applyInPandas.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def iso8601_period(seconds: Column) -> Column:
    """Seconds -> 'P{d}DT{h}H{m}M{s}S' (R/calculate_period.R:109-129)."""
    s = seconds.cast("long")
    return F.concat(
        F.lit("P"), (s / 86400).cast("long").cast("string"),
        F.lit("DT"), ((s % 86400) / 3600).cast("long").cast("string"),
        F.lit("H"), ((s % 3600) / 60).cast("long").cast("string"),
        F.lit("M"), (s % 60).cast("string"), F.lit("S"),
    )


def detect_period_pd(
    pdf: pd.DataFrame, dt_col: str, min_run: int = 3
) -> pd.DataFrame:
    """Sequential change-point kernel: assign each row its sampling
    period; a new period is adopted after ``min_run`` consecutive
    matching smoothed gaps, backdated 2 rows (R/calculate_period.R:85-107)."""
    pdf = pdf.sort_values(dt_col).reset_index(drop=True)
    gaps = pdf[dt_col].diff().dt.total_seconds()
    smoothed = gaps.rolling(3, center=True, min_periods=1).median()
    period = [None] * len(pdf)
    current = None
    run_val, run_len = None, 0
    for i, g in enumerate(smoothed):
        if pd.isna(g):
            period[i] = current
            continue
        if current is None:
            current = g
        if g == run_val:
            run_len += 1
        else:
            run_val, run_len = g, 1
        if g != current and run_len >= min_run:
            current = g
            for j in range(max(0, i - (min_run - 1) - 2 + 1), i):
                period[j] = current
        period[i] = current
    pdf["period_seconds"] = pd.array(period, dtype="float64")
    # forward then backward fill (R/calculate_period.R:132-135)
    pdf["period_seconds"] = pdf["period_seconds"].ffill().bfill()
    return pdf


def calculate_period(
    df: DataFrame,
    keys: Sequence[str],
    dt_col: str = "datetime",
) -> DataFrame:
    """Per-row sampling period per series + ISO-8601 rendering."""
    from pyspark.sql import types as T

    from ._grouped import grouped_apply

    schema = T.StructType(
        list(df.schema.fields) + [T.StructField("period_seconds", T.DoubleType())]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return detect_period_pd(pdf, dt_col)

    out = grouped_apply(df, keys, fn, schema)
    return out.withColumn("period", iso8601_period(F.col("period_seconds")))
