"""Gap expansion and forward/backward fill.

Reference semantics:
- gap expansion: insert NA rows at the expected cadence inside gaps
  (R/compute_increments.R:33-67).
- forward then backward fill: ``na.locf`` then ``na.locf(fromLast)``
  (R/calculate_period.R:132-135).

Spark-first: gap expansion is ``sequence(ts, next_ts, period)`` exploded
between consecutive points — one lead() window + one generator, output
proportional to the gap sizes. Fill is ``last(col, ignorenulls=True)``
over an unbounded-preceding window then ``first`` over the following
window — two window passes, no Python, partitioned per series so 100 TB
parallelizes across series.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def expand_gaps(
    df: DataFrame,
    keys: Sequence[str],
    dt_col: str = "datetime",
    period_seconds: int = 900,
) -> DataFrame:
    """Densify each series to its cadence: emit a row at every expected
    tick between observed points; inserted ticks carry NULLs for all
    non-key columns."""
    w = Window.partitionBy(*keys).orderBy(dt_col)
    step = F.expr(f"INTERVAL {period_seconds} SECONDS")
    ticks = (
        df.withColumn("__next", F.lead(dt_col).over(w))
        .where(F.col("__next").isNotNull())
        .select(
            *keys,
            F.explode(
                F.sequence(F.col(dt_col), F.col("__next"), step)
            ).alias(dt_col),
        )
        .where(F.col(dt_col).isNotNull())
        .distinct()
    )
    return ticks.join(df, [*keys, dt_col], "left")


def ffill_bfill(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str | Sequence[str],
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Forward-fill then backward-fill ``value_col`` per series."""
    out_col = out_col or value_col
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    fwd = F.last(value_col, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    bwd = F.first(value_col, ignorenulls=True).over(
        w.rowsBetween(0, Window.unboundedFollowing)
    )
    return df.withColumn(out_col, F.coalesce(F.col(value_col), fwd, bwd))
