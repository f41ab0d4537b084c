"""Driver contract: entry / queries / oracle_sql.

Each ``queries()`` entry is an operator from SURVEY.md §2 re-expressed
Spark-first over the driver's parquet tables; ``oracle_sql()`` holds the
DuckDB-equivalent ANSI SQL. Column names and rounding are aligned on
both sides so the driver's order-insensitive value-hash matches.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aquacache_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: corrected daily means + DOY historical stats (SURVEY §7.1.2)."""
    return Q.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
