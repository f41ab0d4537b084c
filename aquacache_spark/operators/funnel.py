"""Ordered-funnel analysis over an event stream.

The classic product-analytics operator (ClickHouse windowFunnel /
BigQuery funnel patterns): for an ordered step list [s1..sn], find per
user the FIRST s1, then the first s2 strictly after it within the
conversion window, and so on — each step's timestamp anchored to the
previous step's match (not to any later occurrence that might allow a
longer chain; first-match semantics, the standard greedy funnel).

Spark-first shape: one chained conditional min-aggregation per step —
step k is a filtered scan of the events joined to the per-user
step-(k-1) anchor frame (user-cardinality, pre-aggregated), then a
groupBy(user).min. No per-user sort window, no UDF, no event-list
collection: the shuffles are all keyed on user_id and carry one row
per user per step. At 100 TB the event scan is filtered to the step's
event type BEFORE the join (predicate pushdown to the fact scan).

Reference analog: none (the reference is a hydrometric store); this
is the training-data/event-analytics extension tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_gap_hours: int = 72,
) -> DataFrame:
    """Per-user funnel progression: (user, t1..tn, steps_completed).

    ``t_k`` is NULL when step k was not reached; non-null t_k implies
    non-null t_{k-1} by construction, so ``steps_completed`` is simply
    the count of non-null step timestamps."""
    gap = F.expr(f"INTERVAL {int(max_gap_hours)} HOURS")
    u = F.col(user_col)
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(u.alias("user_id"))
        .agg(F.min(ts_col).alias("t1"))
    )
    for i, s in enumerate(steps[1:], start=2):
        prev = f"t{i - 1}"
        nxt = events.where(F.col(type_col) == s).select(
            u.alias("user_id"), F.col(ts_col).alias("__ts"))
        ti = (
            nxt.join(cur.select("user_id", prev), "user_id")
            .where((F.col("__ts") > F.col(prev))
                   & (F.col("__ts") <= F.col(prev) + gap))
            .groupBy("user_id")
            .agg(F.min("__ts").alias(f"t{i}"))
        )
        cur = cur.join(ti, "user_id", "left")
    completed = sum(
        (F.col(f"t{i}").isNotNull().cast("int")
         for i in range(2, len(steps) + 1)),
        F.lit(1))
    return cur.withColumn("steps_completed", completed.cast("int"))
