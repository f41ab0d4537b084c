"""SparkSession factory tuned for this engine.

Scale notes (100 TB target):
- AQE on: runtime coalesce + skew-join splitting replace hand-tuned
  partition counts on a real cluster.
- shuffle.partitions defaults to the local core count for tests; on a
  cluster this is overridden (AQE coalesces anyway).
- Session timezone pinned to UTC — the reference runs every connection
  with ``SET timezone = 'UTC'`` (reference R/AquaConnect.R:45); all
  datetime semantics here assume it.
- Arrow enabled: every pandas_udf / applyInPandas boundary is
  Arrow-batched, never row-pickled.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "aquacache-spark", cpus: str | int | None = None) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    return configure(
        SparkSession.builder.master(f"local[{cpus}]").appName(app_name)
    ).getOrCreate()


def configure(builder: SparkSession.Builder) -> SparkSession.Builder:
    """Apply engine configs to any builder (shared by tests/bench/driver)."""
    return (
        builder.config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
