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

Commit protocol (the Delta-log idea reduced to one file): bucket data
lives in immutable versioned directories ``v<k>/bucket=N``; a single
JSON manifest maps each bucket to the version directory holding its
current data. A merge writes the touched buckets under a NEW version
dir, then publishes with one atomic ``os.replace`` of the manifest —
readers resolve through the manifest, so a crash at any point leaves
either the old or the new store, never a mixed one (unreferenced
version dirs are garbage, swept on the next successful commit).

At 100 TB the same API maps 1:1 onto Delta MERGE with the bucket
column as a clustering key; nothing above this module would change.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_MANIFEST.json"


class ParquetMergeStore:
    def __init__(self, spark: SparkSession, path: str, key_cols: Sequence[str],
                 series_col: str = "timeseries_id", n_buckets: int = 16):
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.series_col = series_col
        self.n_buckets = n_buckets

    # -- manifest -----------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.path, _MANIFEST)

    def _load_manifest(self) -> dict:
        with open(self._manifest_path) as f:
            m = json.load(f)
        return {"version": m["version"],
                "buckets": {int(k): int(v) for k, v in m["buckets"].items()}}

    def _commit_manifest(self, manifest: dict) -> None:
        """Publish atomically: tmp file in the same directory, fsync,
        one ``os.replace`` — the commit point."""
        tmp = os.path.join(self.path, f".{_MANIFEST}.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path)

    def _vdir(self, version: int) -> str:
        return os.path.join(self.path, f"v{version}")

    def _written_buckets(self, version: int) -> list[int]:
        vdir = self._vdir(version)
        return sorted(
            int(d.split("=", 1)[1]) for d in os.listdir(vdir)
            if d.startswith("bucket=")
        )

    def _gc(self, manifest: dict) -> None:
        """Best-effort sweep of version dirs no commit references —
        crash-orphans and superseded buckets. Never touches the
        manifest; failure here cannot corrupt the store."""
        live = set(manifest["buckets"].values())
        try:
            for d in os.listdir(self.path):
                if d.startswith("v") and d[1:].isdigit() and int(d[1:]) not in live:
                    shutil.rmtree(os.path.join(self.path, d),
                                  ignore_errors=True)
        except OSError:
            pass

    # -- store API ----------------------------------------------------
    def _bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "bucket", F.pmod(F.hash(F.col(self.series_col)), F.lit(self.n_buckets))
        )

    def exists(self) -> bool:
        return os.path.exists(self._manifest_path)

    def read(self) -> DataFrame:
        """Resolve current bucket dirs through the manifest. One read
        per referenced version (each with ``basePath`` at its version
        dir so the ``bucket=N`` partition column survives and bucket
        pruning still works), unioned."""
        m = self._load_manifest()
        by_version: dict[int, list[int]] = {}
        for b, v in m["buckets"].items():
            by_version.setdefault(v, []).append(b)
        frames = [
            self.spark.read.option("basePath", self._vdir(v)).parquet(
                *[os.path.join(self._vdir(v), f"bucket={b}") for b in sorted(bs)]
            )
            for v, bs in sorted(by_version.items())
        ]
        out = frames[0]
        for fr in frames[1:]:
            out = out.unionByName(fr)
        return out

    def _write_version(self, df: DataFrame, version: int) -> None:
        # overwrite clobbers partial output from a crashed attempt at
        # the same (never-committed) version number
        df.write.mode("overwrite").partitionBy("bucket").parquet(
            self._vdir(version))

    def overwrite(self, df: DataFrame) -> None:
        version = self._load_manifest()["version"] + 1 if self.exists() else 1
        os.makedirs(self.path, exist_ok=True)
        self._write_version(self._bucket(df), version)
        manifest = {
            "version": version,
            "buckets": {b: version for b in self._written_buckets(version)},
        }
        self._commit_manifest(manifest)
        self._gc(manifest)

    def merge(self, updates: DataFrame, on_conflict: str = "update") -> dict:
        """Upsert ``updates`` by key. Returns counts per action.

        Only buckets containing updated series are rewritten (partition
        pruning on the write side — the Delta MERGE behavior), and the
        rewrite becomes visible atomically at the manifest replace.
        """
        if on_conflict not in ("update", "do_nothing"):
            raise ValueError("on_conflict must be 'update' or 'do_nothing'")
        # one materialization of the update plan serves the touched-
        # bucket probe, both counts, and the merge write (the unpersisted
        # version re-executed a possibly-expensive connector plan 3x —
        # VERDICT r1 finding)
        updates = self._bucket(updates).persist()
        if not self.exists():
            os.makedirs(self.path, exist_ok=True)
            self._write_version(updates, 1)
            manifest = {
                "version": 1,
                "buckets": {b: 1 for b in self._written_buckets(1)},
            }
            self._commit_manifest(manifest)
            n = updates.count()
            updates.unpersist()
            return {"inserted": n, "updated": 0, "kept": 0}

        old = self._load_manifest()
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

        version = old["version"] + 1
        self._write_version(merged, version)
        buckets = dict(old["buckets"])
        buckets.update({b: version for b in self._written_buckets(version)})
        manifest = {"version": version, "buckets": buckets}
        self._commit_manifest(manifest)
        self._gc(manifest)
        updates.unpersist()
        return counts
