"""Periodicity detection (``calculate_period``).

Reference semantics (R/calculate_period.R:82-135), matched exactly:

1. consecutive datetime diffs in *hours* (:84);
2. centered rolling median, k=3, NA at both edges (:85);
3. change-point scan (:87-107): a counter increments on every non-NA
   smoothed diff that differs from the last adopted period (initially
   0) and RESETS on any match or NA; at 3 consecutive it adopts the
   third value as the new period, backdated 2 rows, and resets;
4. adopted periods are assigned only at change rows, then forward- and
   backward-filled (:132-135);
5. ISO-8601 rendering from hours (:111-129): ``P{d}DT{h}H{m}M{s}S``
   with days = floor(p/24), rh = p %% 24, minutes =
   floor(frac(rh)*60), seconds from the remainder. The reference uses
   R ``round`` (half-even) for seconds; we use the repo-wide
   deterministic ``floor(x+0.5)`` — they differ only on exact .5
   remainders, which cannot arise from integer-second cadences.

When no change point is found (too few rows / no stable pattern) the
reference falls back to fetching extra DB rows or errors; this engine
leaves the period NULL for such series (documented divergence — the
caller decides).

Steps 1-2 and 4-5 are window/column expressions; the scan is
sequential (the adopted period feeds back into the comparison) and
runs per-series in an Arrow-batched kernel.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def iso8601_period(seconds: Column) -> Column:
    """Integer seconds -> 'P{d}DT{h}H{m}M{s}S'."""
    s = seconds.cast("long")
    return F.concat(
        F.lit("P"), (s / 86400).cast("long").cast("string"),
        F.lit("DT"), ((s % 86400) / 3600).cast("long").cast("string"),
        F.lit("H"), ((s % 3600) / 60).cast("long").cast("string"),
        F.lit("M"), (s % 60).cast("string"), F.lit("S"),
    )


def iso8601_period_hours(p: Column) -> Column:
    """Fractional hours -> ISO-8601 via the reference's exact float
    chain (R/calculate_period.R:111-129); deterministic floor(x+0.5)
    stands in for R round on the seconds term."""
    days = F.floor(p / 24).cast("long")
    rh = p % 24
    hours = F.floor(rh).cast("long")
    frac_min = (rh - F.floor(rh)) * 60
    mins = F.floor(frac_min).cast("long")
    secs = F.floor((frac_min - F.floor(frac_min)) * 60 + F.lit(0.5)).cast("long")
    return F.when(p.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(
            F.lit("P"), days.cast("string"),
            F.lit("DT"), hours.cast("string"),
            F.lit("H"), mins.cast("string"),
            F.lit("M"), secs.cast("string"), F.lit("S"),
        )
    )


def detect_period_pd(pdf: pd.DataFrame, dt_col: str) -> pd.DataFrame:
    """Reference-exact change-point kernel: per-row period in hours.

    Ported 1:1 from R/calculate_period.R:84-107 (diff -> rollmedian ->
    consecutive-difference counter with backdated adoption) and
    :132-135 (ffill+bfill). Golden-case coverage:
    tests/testthat/_snaps/calculate_period.md:8-24.
    """
    pdf = pdf.sort_values(dt_col).reset_index(drop=True)
    n = len(pdf)
    period = np.full(n, np.nan)
    if n >= 2:
        ns = (
            pd.to_datetime(pdf[dt_col]).astype("datetime64[ns]")
            .astype("int64").to_numpy()
        )
        diffs = (ns[1:] - ns[:-1]) / 3.6e12  # hours, one correctly-rounded op
        m = len(diffs)
        count, last = 0, 0.0
        for j in range(m):
            # zoo::rollmedian(k=3, fill=NA, align="center"): edges NA
            sm = np.median(diffs[j - 1:j + 2]) if 0 < j < m - 1 else np.nan
            if not np.isnan(sm) and sm != last:
                count += 1
                if count == 3:
                    last = sm
                    period[max(j - 2, 0)] = last  # backdate 2 rows (:99-104)
                    count = 0
            else:
                count = 0
    s = pd.Series(period).ffill().bfill()
    pdf["period_hours"] = s.to_numpy()
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
        list(df.schema.fields) + [T.StructField("period_hours", T.DoubleType())]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return detect_period_pd(pdf, dt_col)

    out = grouped_apply(df, keys, fn, schema)
    return out.withColumn(
        "period_seconds", F.col("period_hours") * 3600.0
    ).withColumn("period", iso8601_period_hours(F.col("period_hours")))
