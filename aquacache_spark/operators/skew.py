"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join splitting handles join-side skew automatically, but a
single pathologically hot *group key* in an aggregation still lands on
one reducer. Salting splits it: aggregate on (key, salt) first
(map-side combine shrinks each partial), then merge partials per key.
Works for any algebraic aggregate; exposed here for count/sum/min/max
and the engine's exact mean.

Use when one series (a popular station, a boilerplate document
fingerprint) dominates a 100 TB aggregation; for everything else the
plain groupBy is simpler and AQE-coalesced.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .daily import _SCALE


def salted_stats(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Per-key n/min/max/sum/mean via a two-phase salted aggregation.

    Phase 1 shuffles on (keys, salt) — the hot key spreads over
    ``salt_buckets`` reducers; phase 2 merges the tiny partials on the
    key alone. The sum uses the engine's exact-micros accumulation so
    the salted plan is bit-identical to the unsalted one.
    """
    v = F.col(value_col).cast("double")
    salted = df.withColumn(
        "__salt", F.pmod(F.crc32(F.col(value_col).cast("string")), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        F.count(v).alias("__n"),
        F.min(v).alias("__min"),
        F.max(v).alias("__max"),
        F.sum(F.floor(v * _SCALE + F.lit(0.5)).cast("long")).alias("__s"),
    )
    return (
        partial.groupBy(*keys)
        .agg(
            F.sum("__n").alias("n"),
            F.min("__min").alias("min"),
            F.max("__max").alias("max"),
            (F.sum("__s") / float(_SCALE)).alias("sum"),
            (F.sum("__s") / float(_SCALE) / F.sum("__n")).alias("mean"),
        )
    )
