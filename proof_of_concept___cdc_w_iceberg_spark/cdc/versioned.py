"""Snapshot-versioned CDC mirror — Iceberg's at-rest model (snapshot
commits, time travel, incremental read) rebuilt on plain parquet.

The reference's lake is Iceberg: every sink commit is a new table
snapshot, old snapshots stay readable (time travel), and consumers can
scan the changelog BETWEEN two snapshots (incremental read)
(`connect-iceberg-sink.json:15-16,30-33`). The no-Iceberg fallback so
far (`bucketed.py`) keeps only the latest state. This module adds the
snapshot ledger on top of the same bucket layout:

- immutable data: each commit writes ONLY its touched buckets under a
  fresh ``data/commit_{n}/`` directory; files are never mutated;
- manifest per version: ``manifests/v{n}.json`` maps bucket → data
  directory. Untouched buckets point at files written by EARLIER
  commits — the same file-reuse that makes Iceberg snapshots cheap
  (a commit costs O(touched buckets), never O(|mirror|));
- the manifest write is the commit point (Iceberg's metadata-pointer
  swap): readers of version n never observe a half-written commit,
  and old versions remain fully readable because nothing they
  reference is ever rewritten.

At 100 TB: a snapshot costs |touched buckets| file groups; time travel
costs nothing until read; expiring old snapshots = deleting commit
dirs no live manifest references (Iceberg's expire_snapshots).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .apply import apply_changes, compact_latest
from .bucketed import BUCKET_COL, bucket_expr
from .diff import table_changes


class SnapshotMirror:
    """Versioned bucketed mirror: ``init`` → v0, each ``apply`` → a new
    version; ``read(version=k)`` time-travels; ``diff(i, j)`` is the
    incremental read (changelog scan) between two snapshots."""

    def __init__(self, spark: SparkSession, path: str, keys: list[str],
                 n_buckets: int = 16,
                 order_cols: list[str] = ("ts_ms", "off")):
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        self.n_buckets = n_buckets
        self.order_cols = list(order_cols)
        os.makedirs(os.path.join(path, "manifests"), exist_ok=True)

    # --- manifest ledger ---

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.path, "manifests", f"v{version}.json")

    def versions(self) -> list[int]:
        mdir = os.path.join(self.path, "manifests")
        return sorted(
            int(n[1:-5]) for n in os.listdir(mdir)
            if n.startswith("v") and n.endswith(".json")
        )

    def current_version(self) -> int:
        vs = self.versions()
        if not vs:
            raise ValueError(f"mirror at {self.path} has no committed version")
        return vs[-1]

    def _load_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    def _commit(self, buckets: dict[str, str], schema_json: str) -> int:
        """Write the next manifest — the atomic commit point.

        Version allocation is OPTIMISTIC-CONCURRENCY safe (the Iceberg
        commit protocol): the manifest is staged to a tmp file and
        published with ``os.link`` (exclusive create — fails if the
        version already exists, unlike ``os.replace`` which would
        silently destroy a concurrent writer's commit). On collision
        the next version number is retried; the data dirs are keyed by
        the version actually won, never shared, so no concurrent
        branch can adopt another's snapshot."""
        vs = self.versions()
        version = (vs[-1] + 1) if vs else 0
        while True:
            manifest = {"version": version, "schema": schema_json,
                        "buckets": buckets}
            tmp = self._manifest_path(version) + f".tmp{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(manifest, f)
            try:
                os.link(tmp, self._manifest_path(version))
                os.remove(tmp)
                return version
            except FileExistsError:
                os.remove(tmp)
                version += 1

    # --- data IO ---

    def _write_commit_data(self, df: DataFrame, version: int) -> dict[str, str]:
        """Write df's buckets under data/commit_{version}_{uniq};
        return bucket → dir entries for the buckets that produced
        files. The uniquifier makes concurrent writers' data dirs
        disjoint (the manifest carries full paths, so readers and the
        orphan vacuum never depend on the dir NAME matching the
        version the writer eventually wins in ``_commit``)."""
        import uuid

        commit_dir = os.path.join(
            self.path, "data",
            f"commit_{version:05d}_{uuid.uuid4().hex[:8]}")
        (df.withColumn(BUCKET_COL, bucket_expr(self.keys, self.n_buckets))
         .repartition(BUCKET_COL)
         .write.mode("overwrite").partitionBy(BUCKET_COL).parquet(commit_dir))
        out: dict[str, str] = {}
        for name in os.listdir(commit_dir):
            if name.startswith(f"{BUCKET_COL}="):
                out[name.split("=", 1)[1]] = os.path.join(commit_dir, name)
        return out

    def _empty(self, schema_json: str) -> DataFrame:
        from pyspark.sql import types as T

        return self.spark.createDataFrame(
            [], T.StructType.fromJson(json.loads(schema_json)))

    def _read_dirs(self, dirs: list[str], schema_json: str) -> DataFrame:
        if not dirs:
            return self._empty(schema_json)
        return self.spark.read.parquet(*dirs)

    # --- public API ---

    def init(self, snapshot: DataFrame) -> int:
        buckets = self._write_commit_data(snapshot, 0)
        return self._commit(buckets, snapshot.schema.json())

    def read(self, version: int | None = None) -> DataFrame:
        """The mirror as of ``version`` (default: latest) — time travel."""
        m = self._load_manifest(
            self.current_version() if version is None else version)
        return self._read_dirs(sorted(m["buckets"].values()), m["schema"])

    def apply(self, changes: DataFrame, op_col: str = "op",
              base_version: int | None = None) -> int:
        """Merge a change batch as a new snapshot. Reads ONLY the
        touched buckets of the base version (default: latest), writes
        ONLY their replacements; every other bucket entry is carried
        over in the manifest untouched (file reuse). ``base_version``
        lets a BRANCH commit on top of its own head instead of the
        ledger's newest snapshot (cdc/branches.py)."""
        m = self._load_manifest(
            self.current_version() if base_version is None else base_version)
        latest = compact_latest(changes, self.keys, self.order_cols)
        touched = {
            str(r[0]) for r in
            latest.select(bucket_expr(self.keys, self.n_buckets)).distinct()
            .collect()
        }
        if not touched:
            return self._commit(dict(m["buckets"]), m["schema"])
        subset_dirs = [d for b, d in m["buckets"].items() if b in touched]
        subset = self._read_dirs(subset_dirs, m["schema"]).drop(BUCKET_COL)
        merged = apply_changes(subset, latest, self.keys, op_col=op_col,
                               order_cols=self.order_cols)
        next_version = self.current_version() + 1
        written = self._write_commit_data(merged, next_version)
        buckets = {b: d for b, d in m["buckets"].items() if b not in touched}
        buckets.update(written)  # touched-but-now-empty buckets drop out
        return self._commit(buckets, m["schema"])

    def diff(self, v_from: int, v_to: int) -> DataFrame:
        """Incremental read: c/u/d changelog between two snapshots
        (Iceberg's changelog scan)."""
        return table_changes(self.read(v_from), self.read(v_to),
                             keys=self.keys)

    def _protected_versions(self, keep_last: int) -> set[int]:
        """Versions expire() must keep: the recency window here;
        subclasses with refs extend this (BranchedMirror pins every
        ref'd snapshot)."""
        vs = self.versions()
        return set(vs[-keep_last:]) if keep_last > 0 else set()

    def expire(self, keep_last: int = 1) -> list[int]:
        """Drop old manifests and any commit dir no live manifest
        references (Iceberg's expire_snapshots)."""
        import shutil

        protected = self._protected_versions(keep_last)
        dead = [v for v in self.versions() if v not in protected]
        for v in dead:
            os.remove(self._manifest_path(v))
        referenced: set[str] = set()
        for v in self.versions():
            for d in self._load_manifest(v)["buckets"].values():
                referenced.add(os.path.dirname(d))
        data_dir = os.path.join(self.path, "data")
        for name in sorted(os.listdir(data_dir)):
            full = os.path.join(data_dir, name)
            if full not in referenced:
                shutil.rmtree(full)
        return dead
