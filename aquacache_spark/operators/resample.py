"""Resampling: dense bin spine + per-bin statistics.

Reference semantics (inst/patches/patch_53.R:2024-2085): floor-epoch
binning to ``resample_seconds``; per-bin min / max / mean / exact
median; a **dense** bin axis from ``generate_series`` left-joined so
empty bins appear with NULL stats.

Spark-first: binned aggregation is one shuffle on (keys, bin); the
dense spine is ``sequence(min_bin, max_bin, step)`` exploded per key —
computed from a tiny per-key min/max aggregate, so the spine build is
O(#keys) rows exploded JVM-side, never a driver loop. At 100 TB the
spine explode is proportional to output size (bins), not input rows,
and the final left join is an equi-join on (keys, bin) that AQE
broadcasts when the spine is small.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .daily import exact_mean


def resample(
    df: DataFrame,
    keys: Sequence[str],
    dt_col: str = "datetime",
    value_col: str = "value",
    seconds: int = 3600,
    dense: bool = True,
) -> DataFrame:
    """Per-(keys, bin) stats; with ``dense`` the bin axis has no holes.

    Output: keys..., bin_start (timestamp), n, min, max, mean, median.
    """
    v = F.col(value_col).cast("double")
    bin_start = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(dt_col)) / seconds) * seconds
    )
    binned = (
        df.where(v.isNotNull())
        .groupBy(*keys, bin_start.alias("bin_start"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(v).alias("min"),
            F.max(v).alias("max"),
            exact_mean(v).alias("mean"),
            F.expr(f"percentile({value_col}, 0.5D)").alias("median"),
        )
    )
    if not dense:
        return binned
    spine = (
        binned.groupBy(*keys)
        .agg(F.min("bin_start").alias("__lo"), F.max("bin_start").alias("__hi"))
        .select(
            *keys,
            F.explode(
                F.sequence("__lo", "__hi", F.expr(f"INTERVAL {seconds} SECONDS"))
            ).alias("bin_start"),
        )
    )
    return spine.join(binned, [*keys, "bin_start"], "left")
