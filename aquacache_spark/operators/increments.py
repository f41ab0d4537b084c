"""Cumulative reset-aware increments (precipitation-gauge semantics).

Reference semantics (R/compute_increments.R:82-121): scan each series in
time order keeping a running post-reset maximum:

- a drop of at least ``reset_drop`` below the running max is a *reset*
  (gauge emptied): increment 0, baseline restarts at the new value;
- otherwise increment = value - max(previous value, running max),
  floored at ``min_pos`` (smaller positives are noise -> 0);
- a time gap of more than ``max_gap_seconds`` breaks the chain:
  increment NULL, baseline resets.

This is true sequential state (the running max depends on every prior
decision), not expressible as a fixed-frame window — exactly the case
SURVEY §7.2 assigns to ``applyInPandas``. Scale: one Arrow batch per
series; 100 TB parallelizes across the series key, and each series'
points arrive sorted via the shuffle+sort the grouping performs.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


ScanState = tuple  # (running_max, prev_value, prev_ts) — None-seeded


def scan_increments(
    timestamps,
    values,
    reset_drop: float,
    min_pos: float,
    max_gap_seconds: float | None,
    state: ScanState = (None, None, None),
) -> tuple[list, ScanState]:
    """The sequential scan itself, seedable with carried-over state so
    the streaming variant (streaming/stateful.py) can resume a series
    across micro-batches and produce exactly what a batch recompute
    over the full history would."""
    out = []
    running_max, prev_value, prev_ts = state
    for ts, v in zip(timestamps, values):
        if v is None or pd.isna(v):
            out.append(None)
            continue
        gap_break = (
            max_gap_seconds is not None
            and prev_ts is not None
            and (ts - prev_ts).total_seconds() > max_gap_seconds
        )
        if running_max is None or gap_break:
            out.append(None if gap_break else 0.0)
            running_max = v
        elif v <= running_max - reset_drop:
            out.append(0.0)  # reset: gauge emptied
            running_max = v
        else:
            base = max(prev_value, running_max) if prev_value is not None else running_max
            inc = v - base
            out.append(inc if inc >= min_pos else 0.0)
            running_max = max(running_max, v)
        prev_value = v
        prev_ts = ts
    return out, (running_max, prev_value, prev_ts)


def compute_increments_pd(
    pdf: pd.DataFrame,
    dt_col: str,
    value_col: str,
    reset_drop: float,
    min_pos: float,
    max_gap_seconds: float | None,
) -> pd.DataFrame:
    """Pure-pandas sequential kernel (unit-tested against closed forms)."""
    pdf = pdf.sort_values(dt_col).reset_index(drop=True)
    out, _ = scan_increments(
        pdf[dt_col], pdf[value_col], reset_drop, min_pos, max_gap_seconds
    )
    pdf["increment"] = pd.array(out, dtype="float64")
    return pdf


def compute_increments(
    df: DataFrame,
    keys: Sequence[str],
    dt_col: str = "datetime",
    value_col: str = "value",
    reset_drop: float = 10.0,
    min_pos: float = 0.0,
    max_gap_seconds: float | None = None,
) -> DataFrame:
    """Distributed wrapper: one sequential kernel per series group."""
    from pyspark.sql import types as T

    from ._grouped import grouped_apply

    # build a fresh StructType — StructType.add mutates in place, which
    # would corrupt df's cached schema object
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField("increment", T.DoubleType())]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return compute_increments_pd(
            pdf, dt_col, value_col, reset_drop, min_pos, max_gap_seconds
        )

    return grouped_apply(df, keys, fn, schema)
