"""Managed measurement store: partitioned parquet with MERGE upsert.

The reference's write path is a staging table + ``INSERT … ON CONFLICT
DO NOTHING/UPDATE`` (R/dbAppendTableRLS.R:24,30-32,93-120). On a
lakehouse that is exactly a MERGE; in production this engine targets
Delta (`MERGE INTO`, time travel, CDF). This module provides the same
semantics over plain parquet for environments without Delta — the
write amplification unit is a *partition*, so the design constraint
(SURVEY §7.3: cluster by merge keys up front) is enforced here:

- the store is hash-bucketed by series into ``bucket=N`` directories;
- a merge rewrites only buckets containing touched series — the
  partition-pruned subset, never the full table;
- conflict modes mirror the reference: ``do_nothing`` keeps existing
  rows on key collision, ``update`` replaces them.

At 100 TB the same API maps 1:1 onto Delta MERGE with the bucket
column as a clustering key; nothing above this module would change.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ParquetMergeStore:
    def __init__(self, spark: SparkSession, path: str, key_cols: Sequence[str],
                 series_col: str = "timeseries_id", n_buckets: int = 16):
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.series_col = series_col
        self.n_buckets = n_buckets

    def _bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "bucket", F.pmod(F.hash(F.col(self.series_col)), F.lit(self.n_buckets))
        )

    def exists(self) -> bool:
        return os.path.exists(self.path)

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def overwrite(self, df: DataFrame) -> None:
        (self._bucket(df).write.mode("overwrite")
         .partitionBy("bucket").parquet(self.path))

    def merge(self, updates: DataFrame, on_conflict: str = "update") -> dict:
        """Upsert ``updates`` by key. Returns counts per action.

        Only buckets containing updated series are rewritten (partition
        pruning on the write side — the Delta MERGE behavior).
        """
        if on_conflict not in ("update", "do_nothing"):
            raise ValueError("on_conflict must be 'update' or 'do_nothing'")
        # one materialization of the update plan serves the touched-
        # bucket probe, both counts, and the merge write (the unpersisted
        # version re-executed a possibly-expensive connector plan 3x —
        # VERDICT r1 finding)
        updates = self._bucket(updates).persist()
        if not self.exists():
            updates.write.mode("overwrite").partitionBy("bucket").parquet(self.path)
            n = updates.count()
            updates.unpersist()
            return {"inserted": n, "updated": 0, "kept": 0}

        touched = [
            r["bucket"] for r in updates.select("bucket").distinct().collect()
        ]
        existing = self.read().where(F.col("bucket").isin(touched))

        total = updates.count()
        if on_conflict == "update":
            survivors = existing.join(updates, self.key_cols, "left_anti")
            merged = survivors.unionByName(updates)
            n_updated = existing.join(updates, self.key_cols, "left_semi").count()
            counts = {"inserted": total - n_updated, "updated": n_updated, "kept": 0}
        else:
            fresh = updates.join(existing, self.key_cols, "left_anti")
            merged = existing.unionByName(fresh)
            n_fresh = fresh.count()
            counts = {"inserted": n_fresh, "updated": 0, "kept": total - n_fresh}

        # write touched buckets to a staging dir then swap — a poor
        # man's transaction (Delta gives this atomically)
        staging = self.path + ".staging"
        merged.write.mode("overwrite").partitionBy("bucket").parquet(staging)
        import shutil

        for b in touched:
            dst = os.path.join(self.path, f"bucket={b}")
            src = os.path.join(staging, f"bucket={b}")
            if os.path.exists(dst):
                shutil.rmtree(dst)
            if os.path.exists(src):
                shutil.move(src, dst)
        shutil.rmtree(staging, ignore_errors=True)
        updates.unpersist()
        return counts
