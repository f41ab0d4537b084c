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

Commit protocol (the Delta-log idea reduced to one file per commit):
bucket data lives in immutable versioned directories ``v<k>/bucket=N``;
a JSON manifest maps each bucket to the version directory holding its
data at that commit. A merge writes the touched buckets under a NEW
version dir, writes ``_MANIFEST.v<k>.json``, then publishes with one
atomic ``os.replace`` of the current-pointer ``_MANIFEST.json`` —
readers resolve through a manifest, so a crash at any point leaves
either the old or the new store, never a mixed one. Because commit
manifests are retained, ``read(version=k)`` is Delta-style TIME
TRAVEL (the audit/as-of emulation's storage analog); ``vacuum``
drops old manifests and sweeps bucket dirs no retained commit
references; ``optimize`` is the Delta-OPTIMIZE analog — a
``dataChange=false`` compaction commit that collapses many-small-
commit fragmentation into one version dir with one file per bucket.

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

    def _version_manifest_path(self, version: int) -> str:
        return os.path.join(self.path, f"_MANIFEST.v{version}.json")

    def _load_manifest(self, version: int | None = None) -> dict:
        path = (self._manifest_path if version is None
                else self._version_manifest_path(version))
        try:
            with open(path) as f:
                m = json.load(f)
        except FileNotFoundError:
            if version is not None:
                raise ValueError(
                    f"version {version} is not available (never committed "
                    "or vacuumed away)") from None
            raise
        buckets = {int(k): int(v) for k, v in m["buckets"].items()}
        # pre-optimize manifests carry no "data" map: every pointer
        # move was a data change then, so the buckets map IS the map
        data = ({int(k): int(v) for k, v in m["data"].items()}
                if "data" in m else dict(buckets))
        out = {"version": m["version"], "buckets": buckets, "data": data}
        if "props" in m:
            out["props"] = dict(m["props"])
        return out

    def _commit_manifest(self, manifest: dict) -> None:
        """Publish atomically: the retained per-commit manifest first,
        then tmp file + fsync + one ``os.replace`` of the current
        pointer — the commit point."""
        with open(self._version_manifest_path(manifest["version"]), "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
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

    def _retained_versions(self) -> list[int]:
        """Committed versions only: a per-commit manifest NEWER than
        the current pointer is a crashed, never-published attempt —
        not readable history (its number is reused on retry)."""
        try:
            current = self._load_manifest()["version"]
        except (FileNotFoundError, json.JSONDecodeError):
            return []
        try:
            return sorted(
                v for f in os.listdir(self.path)
                if f.startswith("_MANIFEST.v") and f.endswith(".json")
                and (v := int(f[len("_MANIFEST.v"):-len(".json")])) <= current
            )
        except OSError:
            return []

    def _gc(self) -> None:
        """Best-effort sweep of version dirs no RETAINED commit
        references — crash-orphans and vacuumed-away history. Never
        touches a manifest; failure here cannot corrupt the store."""
        live: set[int] = set()
        for v in self._retained_versions():
            try:
                live |= set(self._load_manifest(v)["buckets"].values())
            except (ValueError, OSError, json.JSONDecodeError):
                continue
        try:
            for d in os.listdir(self.path):
                if d.startswith("v") and d[1:].isdigit() and int(d[1:]) not in live:
                    shutil.rmtree(os.path.join(self.path, d),
                                  ignore_errors=True)
        except OSError:
            pass

    def vacuum(self, retain_last: int = 1) -> list[int]:
        """Drop all but the newest ``retain_last`` commit manifests,
        then sweep bucket dirs nothing retained references (Delta
        VACUUM). Returns the versions still readable."""
        if retain_last < 1:
            raise ValueError("retain_last must be >= 1")
        versions = self._retained_versions()
        for v in versions[:-retain_last]:
            try:
                os.remove(self._version_manifest_path(v))
            except OSError:
                pass
        self._gc()
        return self._retained_versions()

    # -- store API ----------------------------------------------------
    def _bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "bucket", F.pmod(F.hash(F.col(self.series_col)), F.lit(self.n_buckets))
        )

    def exists(self) -> bool:
        return os.path.exists(self._manifest_path)

    def read(self, version: int | None = None) -> DataFrame:
        """Resolve bucket dirs through a manifest — the current one,
        or commit ``version`` for TIME TRAVEL over retained history.
        One read per referenced version dir (each with ``basePath`` at
        its version dir so the ``bucket=N`` partition column survives
        and bucket pruning still works), unioned."""
        if version is not None and version not in self._retained_versions():
            raise ValueError(
                f"version {version} is not available (never committed "
                "or vacuumed away)")
        m = self._load_manifest(version)
        if not m["buckets"]:
            # empty commits are rejected at write time, so this is a
            # hand-edited/corrupt manifest — loud beats IndexError
            raise ValueError(
                f"manifest for version {m['version']} references no "
                "buckets")
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

    def _read_buckets(self, manifest: dict, buckets: "set[int]") -> DataFrame | None:
        by_version: dict[int, list[int]] = {}
        for b, v in manifest["buckets"].items():
            if b in buckets:
                by_version.setdefault(v, []).append(b)
        frames = [
            self.spark.read.option("basePath", self._vdir(v)).parquet(
                *[os.path.join(self._vdir(v), f"bucket={b}") for b in sorted(bs)]
            )
            for v, bs in sorted(by_version.items())
        ]
        if not frames:
            return None
        out = frames[0]
        for fr in frames[1:]:
            out = out.unionByName(fr)
        return out

    def read_buckets(self, buckets: Sequence[int],
                     version: int | None = None) -> DataFrame | None:
        """Bucket-pruned read: ONLY the listed buckets' files are
        opened (each bucket is a ``bucket=N`` directory — nothing else
        even gets listed). The probe primitive for incremental LSH
        dedup: a daily batch reads just the store buckets its own band
        keys hash into, not the corpus-wide signature store. Returns
        None when no listed bucket exists in the manifest."""
        return self._read_buckets(self._load_manifest(version),
                                  set(int(b) for b in buckets))

    def bucket_of(self, df: DataFrame) -> DataFrame:
        """Expose the store's bucketing function (hash(series) mod N)
        so callers can compute which buckets a batch would touch
        WITHOUT writing — the probe side of read_buckets."""
        return self._bucket(df)

    def changes(self, since_version: int, to_version: int | None = None) -> DataFrame:
        """Change data feed between two committed snapshots (Delta CDF
        shape): rows tagged ``_change_type`` in {'insert', 'delete',
        'update_preimage', 'update_postimage'} plus ``_commit_version``.

        Partition-pruned: only buckets whose DATA version moved
        between the two manifests are read at all — untouched buckets
        cost nothing, the same write-amplification unit as the merge.
        Buckets whose pointer moved only because ``optimize`` rewrote
        them are skipped too (the Delta ``dataChange=false`` CDF
        semantics): a pure compaction commit contributes no changes."""
        retained = self._retained_versions()
        if to_version is None:
            to_version = self._load_manifest()["version"]
        for v in (since_version, to_version):
            if v not in retained:
                raise ValueError(
                    f"version {v} is not available (never committed "
                    "or vacuumed away)")
        m_from = self._load_manifest(since_version)
        m_to = self._load_manifest(to_version)
        changed = {
            b for b in set(m_from["data"]) | set(m_to["data"])
            if m_from["data"].get(b) != m_to["data"].get(b)
        }
        old = self._read_buckets(m_from, changed)
        new = self._read_buckets(m_to, changed)
        ver = F.lit(to_version).alias("_commit_version")

        def project(df: DataFrame, change_type: str,
                    cols: list[str]) -> DataFrame:
            # one schema on EVERY branch: key_cols + data_cols +
            # _change_type + _commit_version, never the bucket
            # partition column (ADVICE r3: the full-outer path dropped
            # it while the one-sided paths kept it)
            return df.select(
                *self.key_cols, *cols,
                F.lit(change_type).alias("_change_type"), ver)

        if old is None and new is None:  # no bucket moved: empty feed
            base = self.read(to_version).limit(0)
            cols = [c for c in base.columns
                    if c not in self.key_cols and c != "bucket"]
            return project(base, "insert", cols)
        data_cols = [c for c in (old if old is not None else new).columns
                     if c not in self.key_cols and c != "bucket"]
        if old is None:
            return project(new, "insert", data_cols)
        if new is None:
            return project(old, "delete", data_cols)
        o = old.select(
            *self.key_cols,
            *[F.col(c).alias(f"__old_{c}") for c in data_cols],
        )
        n = new.select(
            *self.key_cols,
            *[F.col(c).alias(f"__new_{c}") for c in data_cols],
        )
        # side-presence markers: inferring presence from data columns
        # is ambiguous when a present row has all-NULL data
        o = o.withColumn("__old_present", F.lit(True))
        n = n.withColumn("__new_present", F.lit(True))
        j = o.join(n, self.key_cols, "full_outer")
        differs = F.lit(False)
        for c in data_cols:
            differs = differs | ~F.col(f"__old_{c}").eqNullSafe(
                F.col(f"__new_{c}"))
        inserts = j.where(F.col("__old_present").isNull()).select(
            *self.key_cols,
            *[F.col(f"__new_{c}").alias(c) for c in data_cols],
            F.lit("insert").alias("_change_type"), ver,
        )
        deletes = j.where(F.col("__new_present").isNull()).select(
            *self.key_cols,
            *[F.col(f"__old_{c}").alias(c) for c in data_cols],
            F.lit("delete").alias("_change_type"), ver,
        )
        upd = j.where(
            F.col("__old_present").isNotNull()
            & F.col("__new_present").isNotNull() & differs
        )
        pre = upd.select(
            *self.key_cols,
            *[F.col(f"__old_{c}").alias(c) for c in data_cols],
            F.lit("update_preimage").alias("_change_type"), ver,
        )
        post = upd.select(
            *self.key_cols,
            *[F.col(f"__new_{c}").alias(c) for c in data_cols],
            F.lit("update_postimage").alias("_change_type"), ver,
        )
        return inserts.unionByName(deletes).unionByName(pre).unionByName(post)

    def _write_version(self, df: DataFrame, version: int) -> None:
        # overwrite clobbers partial output from a crashed attempt at
        # the same (never-committed) version number.
        # r12 (guide §6 small files): cluster rows by bucket BEFORE
        # the partitionBy write — an un-clustered write emits one file
        # per (write task x bucket), so a 32-partition update frame
        # fragments every touched bucket into ~32 tiny files and the
        # NEXT probe/merge scans them all (measured: a 64-bucket LSH
        # store read planned 64 splits over ~2k files, ~0.9s of the
        # incremental probe's timed cost; one file per bucket reads in
        # 2-3 splits). Same file-layout contract optimize() documents
        # ("a bucket is the clustering unit"); the extra narrow
        # shuffle of the update batch is the standard hash
        # write-distribution trade (Iceberg write.distribution-mode).
        df.repartition("bucket").write.mode("overwrite").partitionBy(
            "bucket").parquet(self._vdir(version))

    def overwrite(self, df: DataFrame, props: dict | None = None) -> None:
        """Replace the store contents. An EMPTY frame is rejected: a
        zero-bucket commit would be unreadable (partitionBy writes no
        bucket= dirs, so no schema survives) — truncation is not a
        store operation the reference has either.

        Existing manifest ``props`` carry forward (overwrite replaces
        rows, not the parameters the state was built under); pass
        ``props`` to restamp when the rebuild changed them.
        """
        old = self._load_manifest() if self.exists() else {}
        version = old.get("version", 0) + 1
        os.makedirs(self.path, exist_ok=True)
        self._write_version(self._bucket(df), version)
        buckets = self._written_buckets(version)
        if not buckets:
            raise ValueError(
                "refusing to commit an empty store (overwrite received "
                "a frame with no rows)")
        manifest = {
            "version": version,
            "buckets": {b: version for b in buckets},
            "data": {b: version for b in buckets},
        }
        carried = {**old.get("props", {}), **(props or {})}
        if carried:
            manifest["props"] = carried
        self._commit_manifest(manifest)
        self._gc()

    def optimize(self, buckets: Sequence[int] | None = None) -> dict:
        """OPTIMIZE analog: rewrite the current snapshot (or just the
        given buckets) into ONE new version dir, coalescing each
        bucket to a single file. A pure compaction — no row changes:

        - collapses the per-version fragmentation merges accumulate
          (a current manifest referencing k version dirs makes
          ``read()`` a k-way union; after optimize it is one scan);
        - the commit is ``dataChange=false``: the manifest's ``data``
          map keeps each bucket's last data-changing version, so
          ``changes()`` across an optimize commit prunes to nothing
          instead of full-outer-joining identical snapshots;
        - time travel within retention is untouched (old manifests
          still reference the old dirs; ``vacuum`` reclaims them).

        Reference analog: R/maintain.R vacuum/analyze housekeeping;
        lakehouse analog: Delta OPTIMIZE (bin-packing compaction).
        Returns {'version', 'buckets_rewritten', 'dirs_before'}.
        """
        old = self._load_manifest()
        target = (set(old["buckets"]) if buckets is None
                  else {b for b in buckets if b in old["buckets"]})
        if not target:
            raise ValueError("no existing buckets to optimize")
        dirs_before = len(set(old["buckets"].values()))
        current = self._read_buckets(old, target)
        version = old["version"] + 1
        # one file per bucket: the small-file rewrite. At 100 TB this
        # maps to Delta OPTIMIZE's bin packing (a bucket is the
        # clustering unit). _write_version now clusters by bucket
        # itself, so no extra repartition here.
        self._write_version(current, version)
        written = set(self._written_buckets(version))
        if written != target:
            raise RuntimeError(
                f"optimize rewrote buckets {sorted(written)} but expected "
                f"{sorted(target)}")
        new_buckets = dict(old["buckets"])
        new_buckets.update({b: version for b in written})
        manifest = {"version": version, "buckets": new_buckets,
                    "data": dict(old["data"])}  # dataChange=false
        if old.get("props"):
            # compaction must not strip the parameter stamp — a
            # props-less manifest makes the next check_props-gated
            # increment hard-fail on a perfectly valid store
            manifest["props"] = dict(old["props"])
        self._commit_manifest(manifest)
        self._gc()
        return {"version": version, "buckets_rewritten": len(written),
                "dirs_before": dirs_before}

    def maybe_optimize(self, max_fragments: int = 16,
                       buckets: Sequence[int] | None = None) -> dict | None:
        """Auto-compaction policy: run ``optimize`` only when the
        current snapshot is spread across more than ``max_fragments``
        version dirs (each merge commit adds one, so read() degrades
        into an ever-wider union as small commits accumulate). Returns
        the optimize stats, or None if below the threshold — callers
        drop this after ingest batches the way the reference schedules
        maintain.R housekeeping after updates."""
        try:
            m = self._load_manifest()
        except FileNotFoundError:
            return None
        if len(set(m["buckets"].values())) <= max_fragments:
            return None
        return self.optimize(buckets)

    def props(self) -> dict:
        """Application properties stamped into the manifest (e.g. the
        minhash hash-family version) — {} for stores never stamped."""
        return dict(self._load_manifest().get("props", {}))

    def check_props(self, expected: dict) -> None:
        """Fail loudly when persisted state was built under different
        application parameters (ADVICE r11: a hash-family change makes
        old signatures silently collision-free, not wrong-looking).
        An UNSTAMPED pre-existing store is treated as incompatible —
        rebuild it, or stamp it explicitly via ``stamp_props`` after
        verifying compatibility out-of-band."""
        if not expected or not self.exists():
            return
        have = self.props()
        missing = [k for k in expected if k not in have]
        if missing:
            raise ValueError(
                f"store at {self.path} has no recorded props for "
                f"{missing} (built before prop stamping?) — expected "
                f"{expected}; rebuild the store or stamp_props() after "
                "verifying it was built with these parameters")
        bad = {k: (have[k], v) for k, v in expected.items()
               if have[k] != v}
        if bad:
            raise ValueError(
                f"store at {self.path} was built under different "
                f"parameters: {bad} (have vs expected) — stale state "
                "would produce silently wrong results; rebuild it")

    def stamp_props(self, props: dict) -> None:
        """Commit a manifest that records ``props`` without touching
        data — the explicit migration path for pre-stamp stores."""
        old = self._load_manifest()
        manifest = dict(old)
        manifest["version"] = old["version"] + 1
        manifest["props"] = {**old.get("props", {}), **props}
        # retained per-commit manifest requires a version dir to exist
        # only for buckets it references; data pointers are unchanged
        self._commit_manifest(manifest)

    def merge(self, updates: DataFrame, on_conflict: str = "update",
              props: dict | None = None) -> dict:
        """Upsert ``updates`` by key. Returns counts per action.

        Only buckets containing updated series are rewritten (partition
        pruning on the write side — the Delta MERGE behavior), and the
        rewrite becomes visible atomically at the manifest replace.

        ``props``: application parameters this state depends on; the
        first merge stamps them into the manifest, every later merge
        (and ``check_props``) verifies them — mixed-parameter
        increments fail loudly instead of silently losing collisions.
        """
        if on_conflict not in ("update", "do_nothing"):
            raise ValueError("on_conflict must be 'update' or 'do_nothing'")
        if props and self.exists():
            self.check_props(props)
        # one materialization of the update plan serves the touched-
        # bucket probe, both counts, and the merge write (the unpersisted
        # version re-executed a possibly-expensive connector plan 3x —
        # VERDICT r1 finding)
        updates = self._bucket(updates).persist()
        if not self.exists():
            os.makedirs(self.path, exist_ok=True)
            self._write_version(updates, 1)
            initial = self._written_buckets(1)
            if not initial:
                updates.unpersist()
                raise ValueError(
                    "refusing to create an empty store (initial merge "
                    "received a frame with no rows)")
            manifest = {
                "version": 1,
                "buckets": {b: 1 for b in initial},
                "data": {b: 1 for b in initial},
            }
            if props:
                manifest["props"] = dict(props)
            self._commit_manifest(manifest)
            n = updates.count()
            updates.unpersist()
            return {"inserted": n, "updated": 0, "kept": 0}

        old = self._load_manifest()
        touched = [
            r["bucket"] for r in updates.select("bucket").distinct().collect()
        ]
        # bucket-pruned read through the manifest (NOT read().where):
        # read() plans one scan node per retained version dir, so on a
        # fragmented store every small merge re-plans a union over the
        # whole version history; _read_buckets references only the
        # touched buckets' dirs — the merge plan stays O(touched), not
        # O(versions), which is what a daily-increment cadence needs
        existing = self._read_buckets(old, set(touched))
        if existing is None:
            # none of the touched buckets exist yet: pure insert
            existing = updates.limit(0)

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
        written = self._written_buckets(version)
        buckets = dict(old["buckets"])
        buckets.update({b: version for b in written})
        data = dict(old["data"])
        data.update({b: version for b in written})
        manifest = {"version": version, "buckets": buckets, "data": data}
        carried = {**old.get("props", {}), **(props or {})}
        if carried:
            manifest["props"] = carried
        self._commit_manifest(manifest)
        self._gc()
        updates.unpersist()
        return counts
