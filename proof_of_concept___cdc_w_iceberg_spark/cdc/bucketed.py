"""Partition-scoped CDC merge — the scale path for the no-Iceberg fallback.

The plain fallback (`iceberg.py` merge_into, `streaming/pipeline.py`)
rewrites the WHOLE mirror per batch: correct, but at 100 TB with a 10 s
trigger it is a full-table write per commit. The reference never pays
that cost because the Iceberg sink commits equality deletes + new data
files per snapshot (`connect-iceberg-sink.json:30-33`) — only touched
data moves.

This module restores that property without Iceberg: the mirror is laid
out as a parquet table partitioned by a key-hash bucket column, and a
change batch rewrites ONLY the bucket partitions its keys land in,
via Spark's dynamic partition overwrite. Cost per batch becomes
O(touched buckets × bucket size), not O(|mirror|):

- 100 TB mirror, 4096 buckets → ~25 GB/bucket; a batch touching
  1 000 distinct keys rewrites ≤1 000 buckets, and in the common
  skewed-update case far fewer.
- The bucket column is ``pmod(hash(keys), n)`` — deterministic, so
  change rows co-locate with the mirror rows they replace, and the
  per-bucket merge join never sees foreign keys.
- Buckets whose merged result is empty (every row deleted) are
  cleared explicitly — dynamic partition overwrite only replaces
  partitions present in the written data, which would otherwise
  resurrect deleted rows.

At even larger scale the same layout extends to date × bucket
(``TwoLevelMirror``): the outer date level gives retention drops,
time-pruned reads, and batch-date pruning on apply; the inner hash
bucket keeps the merge partition-scoped. ``compact()`` on either
layout is the parquet analogue of Iceberg's ``rewrite_data_files``
small-file maintenance (`connect-iceberg-sink.json:19-29`). On a real
lake this whole module is replaced by the Iceberg MERGE path
(`iceberg.py`); this is the fallback done right, not a competitor.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .apply import compact_latest, upsert_compacted

BUCKET_COL = "__bucket"


def bucket_expr(keys: list[str], n_buckets: int):
    """Deterministic key→bucket assignment: pmod(hash, n) ∈ [0, n)."""
    return F.pmod(F.hash(*[F.col(k) for k in keys]), F.lit(n_buckets))


class BucketedMirror:
    """A parquet mirror partitioned by key-hash bucket with
    partition-scoped CDC apply.

    ``init(snapshot)`` lays the table out; ``apply(changes)`` merges a
    change batch rewriting only touched bucket partitions;
    ``read()`` returns the logical table (bucket column dropped).
    """

    def __init__(self, spark: SparkSession, path: str, keys: list[str],
                 n_buckets: int = 16,
                 order_cols: list[str] = ("ts_ms", "off")):
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        self.n_buckets = n_buckets
        self.order_cols = list(order_cols)

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(BUCKET_COL, bucket_expr(self.keys, self.n_buckets))

    def _schema_path(self) -> str:
        return os.path.join(self.path, "_schema.json")

    def _empty(self) -> DataFrame:
        from pyspark.sql import types as T

        with open(self._schema_path()) as f:
            schema = T.StructType.fromJson(json.load(f))
        return self.spark.createDataFrame([], schema)

    def _has_buckets(self) -> bool:
        return os.path.isdir(self.path) and any(
            n.startswith(f"{BUCKET_COL}=") for n in os.listdir(self.path))

    def init(self, snapshot: DataFrame, writers: int | None = None) -> None:
        """Lay the table out. ``writers=None`` (default) shuffles by the
        bucket column first — one writer set per partition dir, one file
        per bucket. ``writers=N`` skips that clustering shuffle and
        writes with N tasks each holding rows of many buckets — the
        cheap-ingest layout a large snapshot load actually produces
        (hundreds of upstream tasks, ~N files PER bucket dir), the
        fragmentation that ``compact()`` exists to repair.

        r21 (guide §2.5): the writer split hashes a DETERMINISTIC key
        expression instead of round-robin ``repartition(N)`` — the
        keyless form pays a local sort of the whole input
        (sortBeforeRepartition, needed so retried map tasks reproduce
        their row→partition assignment), while xxhash64 of the merge
        keys is retry-stable for free. Same file counts (each writer
        holds rows of many buckets), same content; measured 1.2-1.4 s
        → 0.8-0.9 s on the sf0.1 ingest write."""
        if writers is not None and writers < 1:
            raise ValueError(f"writers must be >= 1, got {writers!r}")
        part = (self._with_bucket(snapshot).repartition(
                    writers, F.xxhash64(*[F.col(k) for k in self.keys]))
                if writers is not None else
                self._with_bucket(snapshot).repartition(BUCKET_COL))
        (part.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(self.path))
        # Schema sidecar: a zero-row partitioned write leaves no data
        # files to infer from, so an empty (or fully-deleted) mirror
        # must still know its row shape. (An Iceberg/catalog table
        # carries this in table metadata.)
        with open(self._schema_path(), "w") as f:
            f.write(snapshot.schema.json())

    def read(self) -> DataFrame:
        if self._has_buckets():
            return self.spark.read.parquet(self.path).drop(BUCKET_COL)
        return self._empty()

    def touched_buckets(self, changes: DataFrame) -> list[int]:
        """Distinct buckets of the batch keys — ≤ n_buckets ints, a
        driver-safe collect regardless of batch size."""
        rows = (changes.select(bucket_expr(self.keys, self.n_buckets)
                               .alias(BUCKET_COL))
                .distinct().collect())
        return sorted(r[0] for r in rows)

    def prepare(self, changes: DataFrame) -> DataFrame:
        """Materialize a batch's compacted latest-wins form AHEAD of
        ``apply`` (r21, guide §2.6): the compaction reads only
        ``changes``, never the mirror, so callers can overlap it with
        the init write (or any independent job) and pass the handle to
        ``apply(prepared=...)``. Single-use; apply unpersists it. A
        handle never passed to apply must be ``unpersist()``-ed by the
        caller. The count() is the materializing action — persist
        alone is lazy, and an un-materialized handle would defeat the
        overlap."""
        latest = compact_latest(changes, self.keys, self.order_cols).persist()
        latest.count()
        return latest

    def apply(self, changes: DataFrame | None = None, op_col: str = "op",
              tag: str = "batch", prepared: DataFrame | None = None
              ) -> list[int]:
        """Merge a change batch, rewriting only touched bucket
        partitions. Returns the list of buckets rewritten.

        Plan shape: compact (1 shuffle on keys) → partition-pruned scan
        of touched buckets only (filter on the partition column — no
        data files outside them are read) → anti-join + union →
        dynamic partition overwrite of those buckets.

        ``prepared``: a handle from ``prepare`` whose compaction job
        already ran (r21, guide §2.6); ``changes`` is then ignored.
        """
        # Computed ONCE and persisted (r20, guide §5): the compaction
        # window/shuffle used to run twice — once under the
        # touched-bucket collect, once inside apply_changes' plan.
        if prepared is None:
            if changes is None:
                raise ValueError("apply needs changes or prepared")
            prepared = compact_latest(
                changes, self.keys, self.order_cols).persist()
        latest = prepared
        try:
            touched = self.touched_buckets(latest)
            if not touched:
                return []
            if self._has_buckets():
                mirror = self.spark.read.parquet(self.path)
                # BUCKET_COL kept: the scan's rows are already
                # bucket-aligned (partition dirs), so the staged write
                # below needs no full-table re-clustering.
                subset = mirror.filter(F.col(BUCKET_COL).isin(touched))
            else:
                subset = self._with_bucket(self._empty())
            # r20 (guide §2.4/§8): survivors never shuffle — the
            # anti-join's batch side broadcasts, and each survivor row
            # is written from the scan task that read it. Only the
            # BATCH leg is routed by bucket (a batch-sized exchange).
            # The old shape re-shuffled the ENTIRE merged relation by
            # the 16-value bucket column — at 100 TB that moves every
            # surviving byte once more and funnels each ~25 GB bucket
            # through a single writer task; skipping it leaves
            # scan-sized (~128 MB) files per bucket instead. The batch
            # also arrives already compacted, so the second compaction
            # window apply_changes used to re-plan is gone
            # (upsert_compacted).
            routed = self._with_bucket(latest).repartition(BUCKET_COL)
            merged = upsert_compacted(subset, self._with_bucket(latest),
                                      self.keys, op_col=op_col,
                                      routed=routed)
            # Stage before overwriting partitions we are also reading
            # from — the parquet-table analogue of Iceberg's snapshot
            # commit.
            staged = f"{self.path}_{tag}_staged"
            (merged.write.mode("overwrite")
             .partitionBy(BUCKET_COL).parquet(staged))
        finally:
            latest.unpersist()
        # Publish = per-partition directory swap of the staged commit
        # (r20, guide §1.2/§6): the old path re-READ the staged table,
        # re-SHUFFLED it by bucket, and re-WROTE every staged byte
        # through dynamic partition overwrite — a full second write job
        # whose only effect a directory rename already has.
        # FILESYSTEM ASSUMPTION (r21, VERDICT item 8): os.rename is an
        # atomic, O(1) metadata move on the POSIX filesystems this
        # local lake emulates. On an object store (the 100 TB
        # deployment surface) directory "rename" is copy+delete and
        # NON-atomic — a production port must publish through the
        # catalog's pointer swap (Iceberg metadata commit) or an
        # atomic-rename-capable layer (HDFS, Azure ADLS Gen2),
        # exactly like the manifest swap in cdc/versioned.py.
        # This is the
        # same swap discipline Iceberg's commit applies at the metadata
        # pointer; content is byte-identical (the staged files ARE the
        # files). The out-bucket set comes from the staged dir listing,
        # not a collect job.
        out_buckets = {
            int(n.split("=", 1)[1]) for n in os.listdir(staged)
            if n.startswith(f"{BUCKET_COL}=")
        }
        for b in out_buckets:
            self._drop_partition(b)
            os.rename(os.path.join(staged, f"{BUCKET_COL}={b}"),
                      os.path.join(self.path, f"{BUCKET_COL}={b}"))
        # A bucket whose rows were all deleted writes nothing to the
        # staged dir and must be cleared explicitly or its old files
        # survive.
        for b in set(touched) - out_buckets:
            self._drop_partition(b)
        shutil.rmtree(staged, ignore_errors=True)
        return touched

    def _drop_partition(self, bucket: int) -> None:
        part_dir = os.path.join(self.path, f"{BUCKET_COL}={bucket}")
        # Local-fs mirror in tests; on HDFS/S3A this is one
        # FileSystem.delete of the partition dir.
        shutil.rmtree(part_dir, ignore_errors=True)

    def partition_files(self) -> dict[int, set[str]]:
        """Parquet file names per bucket dir — test/observability hook
        for asserting which partitions a batch physically rewrote."""
        out: dict[int, set[str]] = {}
        if not os.path.isdir(self.path):
            return out
        for name in os.listdir(self.path):
            if not name.startswith(f"{BUCKET_COL}="):
                continue
            b = int(name.split("=", 1)[1])
            full = os.path.join(self.path, name)
            out[b] = {f for f in os.listdir(full) if f.endswith(".parquet")}
        return out

    def _leaf_partitions(self) -> dict[str, set[str]]:
        """Relative leaf partition dir -> parquet file names, for any
        partition depth (bucket, or date/bucket)."""
        out: dict[str, set[str]] = {}
        for root, _dirs, files in os.walk(self.path):
            pq = {f for f in files if f.endswith(".parquet")}
            if pq and "=" in os.path.basename(root):
                out[os.path.relpath(root, self.path)] = pq
        return out

    def compact(self, max_files: int = 1) -> dict[str, tuple[int, int]]:
        """Small-file maintenance: rewrite every leaf partition holding
        more than ``max_files`` parquet files down to ``max_files`` —
        the parquet analogue of Iceberg ``rewrite_data_files``
        (`connect-iceberg-sink.json:19-29`). Content is untouched
        (``read()`` identical before/after); only the file count per
        fragmented partition drops. Returns {partition: (before,
        after)} for the partitions rewritten.

        Scale shape: each fragmented partition is an independent
        read→coalesce→write of ONE partition dir (a bucket is ~25 GB
        at the 100 TB/4096-bucket layout) — embarrassingly parallel
        across partitions, and a no-op scan-skip for compacted ones.
        """
        frag = {rel: files for rel, files in self._leaf_partitions().items()
                if len(files) > max_files}
        if not frag:
            return {}
        if max_files == 1:
            # r20 (guide §2.6/§1.2): ONE Spark job over every
            # fragmented leaf instead of a read→coalesce→write job PER
            # leaf (the per-job fixed cost dominated — 16 sequential
            # jobs for a freshly-ingested 16-bucket mirror). basePath
            # keeps the partition columns; repartitioning by them gives
            # exactly one file per leaf dir, which then swaps in by
            # rename. Content is untouched either way (read() identical
            # before/after — the law test).
            part_cols = [p.split("=", 1)[0]
                         for p in next(iter(frag)).split(os.sep)]
            staged = os.path.join(
                os.path.dirname(self.path.rstrip(os.sep)),
                os.path.basename(self.path.rstrip(os.sep)) + "__compact_staged")
            (self.spark.read.option("basePath", self.path)
             .parquet(*[os.path.join(self.path, rel) for rel in sorted(frag)])
             .repartition(*part_cols)
             .write.mode("overwrite").partitionBy(*part_cols).parquet(staged))
            done: dict[str, tuple[int, int]] = {}
            for rel, files in sorted(frag.items()):
                src = os.path.join(staged, rel)
                new_files = ([f for f in os.listdir(src)
                              if f.endswith(".parquet")]
                             if os.path.isdir(src) else [])
                full = os.path.join(self.path, rel)
                for f in files:
                    os.remove(os.path.join(full, f))
                for f in new_files:
                    os.rename(os.path.join(src, f), os.path.join(full, f))
                done[rel] = (len(files), len(new_files))
            shutil.rmtree(staged, ignore_errors=True)
            return done
        done = {}
        for rel, files in sorted(frag.items()):
            full = os.path.join(self.path, rel)
            staged = f"{full}__compact_staged"
            # Leaf-dir read: partition values live in the dir name, not
            # the files, so the rewritten files drop straight back in.
            (self.spark.read.parquet(full).coalesce(max_files)
             .write.mode("overwrite").parquet(staged))
            new_files = [f for f in os.listdir(staged) if f.endswith(".parquet")]
            for f in files:
                os.remove(os.path.join(full, f))
            for f in new_files:
                os.rename(os.path.join(staged, f), os.path.join(full, f))
            shutil.rmtree(staged, ignore_errors=True)
            done[rel] = (len(files), len(new_files))
        return done


class TwoLevelMirror(BucketedMirror):
    """Date × bucket mirror: outer ``date_col`` partition (retention /
    time-pruned reads / batch-date pruning), inner key-hash bucket
    (partition-scoped merge). The promised two-level layout of the
    module docstring.

    Placement contract: ``date_col`` is IMMUTABLE per key — it is part
    of the row's physical address, exactly like Iceberg's partition
    spec over a source column. CDC rows must carry it (delete
    envelopes take it from the before-image), and apply prunes on BOTH
    levels: only (batch dates) × (touched buckets) partitions are
    scanned and rewritten.
    """

    def __init__(self, spark: SparkSession, path: str, keys: list[str],
                 date_col: str, n_buckets: int = 16,
                 order_cols: list[str] = ("ts_ms", "off")):
        super().__init__(spark, path, keys, n_buckets, order_cols)
        self.date_col = date_col

    def _has_buckets(self) -> bool:
        if not os.path.isdir(self.path):
            return False
        for name in os.listdir(self.path):
            if name.startswith(f"{self.date_col}="):
                full = os.path.join(self.path, name)
                if any(n.startswith(f"{BUCKET_COL}=") for n in os.listdir(full)):
                    return True
        return False

    def init(self, snapshot: DataFrame, writers: int | None = None) -> None:
        """Two-level layout; ``writers`` has the same cheap-ingest
        fragmentation semantics as BucketedMirror.init (LSP — review
        finding: the override must accept the base signature; r21:
        same deterministic hash split instead of round-robin — see
        the base docstring)."""
        if writers is not None and writers < 1:
            raise ValueError(f"writers must be >= 1, got {writers!r}")
        part = (self._with_bucket(snapshot).repartition(
                    writers, F.xxhash64(*[F.col(k) for k in self.keys]))
                if writers is not None else
                self._with_bucket(snapshot)
                .repartition(self.date_col, BUCKET_COL))
        (part.write.mode("overwrite")
         .partitionBy(self.date_col, BUCKET_COL).parquet(self.path))
        with open(self._schema_path(), "w") as f:
            f.write(snapshot.schema.json())

    def touched_partitions(self, changes: DataFrame) -> list[tuple]:
        """Distinct (date, bucket) pairs of the batch — bounded by
        |batch dates| × n_buckets, a driver-safe collect."""
        rows = (changes.select(
            F.col(self.date_col),
            bucket_expr(self.keys, self.n_buckets).alias(BUCKET_COL))
            .distinct().collect())
        return sorted((r[0], r[1]) for r in rows)

    def apply(self, changes: DataFrame | None = None, op_col: str = "op",
              tag: str = "batch", prepared: DataFrame | None = None
              ) -> list[tuple]:
        """Two-level partition-scoped merge: compact → scan only the
        (batch dates) × (touched buckets) partitions → anti-join +
        union → dynamic overwrite of exactly those partitions, with
        explicit clearing of emptied ones. Returns the touched pairs.
        ``prepared`` as in BucketedMirror.apply (r21, guide §2.6)."""
        # Same r20 shape as BucketedMirror.apply: compaction persisted
        # (one execution instead of two) and the staged commit
        # published by per-partition directory swap instead of a
        # second read+shuffle+write job.
        if prepared is None:
            if changes is None:
                raise ValueError("apply needs changes or prepared")
            prepared = compact_latest(
                changes, self.keys, self.order_cols).persist()
        latest = prepared
        try:
            touched = self.touched_partitions(latest)
            if not touched:
                return []
            dates = sorted({d for d, _ in touched})
            buckets = sorted({b for _, b in touched})
            if self._has_buckets():
                mirror = self.spark.read.parquet(self.path)
                subset = (mirror.filter(F.col(self.date_col).isin(dates)
                                        & F.col(BUCKET_COL).isin(buckets))
                          .drop(BUCKET_COL))
            else:
                subset = self._empty()
            # upsert_compacted (not apply_changes): the batch arrives
            # compacted+persisted, so the merge plans ONE batch window
            # (r20 wave 7). The staged write KEEPS the clustering
            # exchange here, unlike BucketedMirror — measured (r20,
            # interleaved A/B at sf0.1): the survivors-never-shuffle
            # shape on the date x bucket GRID writes through ~3x more
            # tasks with a per-task dynamic-partition sort and 2x the
            # files, landing ~2x SLOWER warm (6.8-8.6 s vs 3.1-4.9 s);
            # the 112-leaf grid gives the clustered write plenty of
            # writer parallelism, so the single-writer-per-leaf concern
            # that motivated the flat mirrors' shape does not bite.
            merged = upsert_compacted(subset, latest, self.keys,
                                      op_col=op_col)
            staged = f"{self.path}_{tag}_staged"
            (self._with_bucket(merged)
             .repartition(self.date_col, BUCKET_COL)
             .write.mode("overwrite")
             .partitionBy(self.date_col, BUCKET_COL).parquet(staged))
        finally:
            latest.unpersist()
        out_parts = set()
        for dname in os.listdir(staged):
            if not dname.startswith(f"{self.date_col}="):
                continue
            d = dname.split("=", 1)[1]
            for bname in os.listdir(os.path.join(staged, dname)):
                if not bname.startswith(f"{BUCKET_COL}="):
                    continue
                out_parts.add((d, int(bname.split("=", 1)[1])))
                target = os.path.join(self.path, dname, bname)
                shutil.rmtree(target, ignore_errors=True)
                os.makedirs(os.path.join(self.path, dname), exist_ok=True)
                os.rename(os.path.join(staged, dname, bname), target)
        # touched_partitions() yields the date values as read back from
        # parquet (native types); the staged dir names are their string
        # forms — compare stringified.
        touched_str = {(str(d), b) for d, b in touched}
        for d, b in touched_str - {(str(d), b) for d, b in out_parts}:
            shutil.rmtree(
                os.path.join(self.path, f"{self.date_col}={d}",
                             f"{BUCKET_COL}={b}"),
                ignore_errors=True)
        shutil.rmtree(staged, ignore_errors=True)
        return touched

    def partition_files(self) -> dict[tuple, set[str]]:  # type: ignore[override]
        """(date, bucket) -> parquet file names."""
        out: dict[tuple, set[str]] = {}
        for rel, files in self._leaf_partitions().items():
            date_part, bucket_part = rel.split(os.sep)
            out[(date_part.split("=", 1)[1],
                 int(bucket_part.split("=", 1)[1]))] = files
        return out
