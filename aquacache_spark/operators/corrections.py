"""Corrections engine: ordered per-row transform chain.

Reference semantics (inst/patches/patch_55.R:345-455; set-based fold
inst/patches/patch_53.R:1702-1814): for each measurement, every
correction whose ``[start_dt, end_dt)`` contains its datetime is applied
in ``(type priority ASC, correction_id ASC)`` order:

1. ``delete``            -> value := NULL
2. ``trim``              -> NULL if value outside [value1, value2]
3. ``offset_linear``     -> value + value1
4. ``offset_two_point``  -> value + value1 + (value2-value1) *
                            (dt-start)/(end-start)   (time-interpolated)
5. ``scale``             -> value * value1 / 100
6. ``drift_linear``      -> value + value1/timestep_window * (dt-start)
7. ``drift_equation``    -> dynamic safe numeric expression over
                            (value, elapsed_seconds since start)

Spark-first design: the corrections table is tiny (reference fast-path
threshold is 64 corrections, inst/patches/patch_53.R:1905-1916), so
instead of a join we *compile* the ordered correction list into ONE
chained ``when()`` column expression — a fold at plan-build time. One
scan, zero shuffles, whole-stage-codegen'd; the optimizer cannot reorder
the fold because it is a single nested expression tree. At 100 TB the
corrected read stays a map-only stage over the fact table, and the
window predicates prune partitions when the fact is date-partitioned.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.expr_safety import (
    assert_safe_numeric_expression,
    substitute_identifiers,
)

# type -> priority, mirroring the reference's priority-ordered correction
# types (inst/patches/patch_55.R:345-455 dispatch order).
CORRECTION_PRIORITY = {
    "delete": 1,
    "trim": 2,
    "offset_linear": 3,
    "offset_two_point": 4,
    "scale": 5,
    "drift_linear": 6,
    "drift_equation": 7,
}


@dataclass(frozen=True)
class Correction:
    correction_id: int
    timeseries_id: object  # matched against the series key column
    start_dt: str  # inclusive, 'YYYY-MM-DD HH:MM:SS' UTC
    end_dt: str  # exclusive
    correction_type: str
    value1: Optional[float] = None
    value2: Optional[float] = None
    timestep_window_seconds: Optional[float] = None
    equation: Optional[str] = None  # safe expr over `value`, `elapsed_seconds`

    @property
    def priority(self) -> tuple:
        return (CORRECTION_PRIORITY[self.correction_type], self.correction_id)


def _step(value: Column, c: Correction, ts_col: Column, dt_col: Column) -> Column:
    """One correction folded over the accumulated value expression."""
    start = F.lit(c.start_dt).cast("timestamp")
    end = F.lit(c.end_dt).cast("timestamp")
    in_window = (
        (ts_col == F.lit(c.timeseries_id))
        & (dt_col >= start)
        & (dt_col < end)
        & value.isNotNull()
    )
    elapsed = (F.unix_timestamp(dt_col) - F.unix_timestamp(start)).cast("double")
    span = (F.unix_timestamp(end) - F.unix_timestamp(start)).cast("double")

    t = c.correction_type
    if t == "delete":
        corrected = F.lit(None).cast("double")
    elif t == "trim":
        corrected = F.when(
            (value < F.lit(c.value1)) | (value > F.lit(c.value2)), F.lit(None)
        ).otherwise(value)
    elif t == "offset_linear":
        corrected = value + F.lit(c.value1)
    elif t == "offset_two_point":
        corrected = value + F.lit(c.value1) + (
            (F.lit(c.value2) - F.lit(c.value1)) * elapsed / span
        )
    elif t == "scale":
        corrected = value * F.lit(c.value1) / F.lit(100.0)
    elif t == "drift_linear":
        corrected = value + F.lit(c.value1) / F.lit(c.timestep_window_seconds) * elapsed
    else:
        raise ValueError(f"unknown correction type {t!r}")
    return F.when(in_window, corrected).otherwise(value)


def apply_corrections(
    df: DataFrame,
    corrections: Iterable[Correction],
    ts_col: str = "timeseries_id",
    dt_col: str = "datetime",
    value_col: str = "value",
    out_col: str | None = None,
) -> DataFrame:
    """Return ``df`` with the corrected value in ``out_col``.

    Fast-path dispatch mirrors the reference (no corrections -> raw
    scan, inst/patches/patch_53.R:1871-1936): an empty list compiles to
    a no-op projection. Every step materializes the accumulated value
    into a temp column (linear plan size — see the in-loop note);
    ``drift_equation`` additionally needs the named column so the user
    expression (parsed by Catalyst via ``F.expr``, gated by the safety
    validator) can reference it. The chained projections fuse into one
    codegen stage — still a map-only scan, no joins or shuffles.
    """
    out_col = out_col or value_col
    ordered = sorted(corrections, key=lambda c: c.priority)
    ts, dt = F.col(ts_col), F.col(dt_col)

    if not ordered:
        return df if out_col == value_col else df.withColumn(out_col, F.col(value_col))

    value: Column = F.col(value_col).cast("double")
    _tmp_cols: list[str] = []
    for c in ordered:
        if c.correction_type == "drift_equation":
            assert_safe_numeric_expression(
                c.equation, allowed_idents=("value", "elapsed_seconds")
            )
            start = F.lit(c.start_dt).cast("timestamp")
            end = F.lit(c.end_dt).cast("timestamp")
            in_window = (
                (ts == F.lit(c.timeseries_id)) & (dt >= start) & (dt < end)
            )
            df = df.withColumn("__acc__", value).withColumn(
                "__elapsed__",
                (F.unix_timestamp(dt) - F.unix_timestamp(start)).cast("double"),
            )
            eq = substitute_identifiers(
                c.equation,
                {"elapsed_seconds": "`__elapsed__`", "value": "`__acc__`"},
            )
            value = F.when(
                in_window & F.col("__acc__").isNotNull(), F.expr(eq)
            ).otherwise(F.col("__acc__"))
            df = df.withColumn("__acc2__", value).drop("__acc__", "__elapsed__")
            df = df.withColumnRenamed("__acc2__", "__acc__")
            value = F.col("__acc__")
        else:
            # Materialize the accumulated value once per step. _step
            # references it in both branches of its when(); folding the
            # raw expression would duplicate the whole prior tree per
            # correction — the Column-to-expression conversion is then
            # exponential in chain length (a 15-step chain OOMed a 24g
            # driver). A per-step alias keeps conversion linear, stays
            # inside whole-stage codegen (each alias evaluates once per
            # row), and CollapseProject leaves multi-use non-trivial
            # aliases alone. (An expression-level `let` via
            # transform(array(x), ...) also fixes the blowup but costs
            # a per-row array alloc per step and drops out of codegen:
            # 2x slower on the 6M-row scale check.)
            step_col = f"__corr_{len(_tmp_cols)}__"
            df = df.withColumn(step_col, _step(value, c, ts, dt))
            _tmp_cols.append(step_col)
            value = F.col(step_col)

    out = df.withColumn(out_col, value)
    if "__acc__" in out.columns:
        out = out.drop("__acc__")
    if _tmp_cols:
        out = out.drop(*_tmp_cols)
    return out
