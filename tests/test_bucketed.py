"""Partition-scoped CDC merge (cdc/bucketed.py): a change batch must
physically rewrite ONLY the key-hash bucket partitions it touches —
the property that makes the no-Iceberg fallback viable per-trigger at
100 TB (the reference gets it from Iceberg equality-delete commits,
`connect-iceberg-sink.json:30-33`).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from proof_of_concept___cdc_w_iceberg_spark.cdc.apply import apply_changes, mirror_diff
from proof_of_concept___cdc_w_iceberg_spark.cdc.bucketed import (
    BUCKET_COL,
    BucketedMirror,
    bucket_expr,
)

N_BUCKETS = 8


def _snapshot(spark):
    return spark.range(100).select(
        F.col("id").alias("k"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
        (F.col("id") * 1.5).alias("bal"),
    )


def _buckets_of(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    rows = df.select("k", bucket_expr(["k"], N_BUCKETS).alias("b")).collect()
    return {r["k"]: r["b"] for r in rows}


def _changes(spark, rows):
    """rows: list of (k, name, bal, op, ts_ms, off)"""
    return spark.createDataFrame(
        rows, "k long, name string, bal double, op string, ts_ms long, off long"
    )


def test_apply_rewrites_only_touched_buckets(spark):
    path = os.path.join(tempfile.mkdtemp(prefix="bucketed_"), "mirror")
    m = BucketedMirror(spark, path, keys=["k"], n_buckets=N_BUCKETS)
    snap = _snapshot(spark)
    m.init(snap)
    before = m.partition_files()
    assert len(before) == N_BUCKETS  # 100 keys cover all 8 buckets

    # one update + one delete, both keys from the SAME bucket
    by_bucket = {}
    for k, b in _buckets_of(spark, range(100)).items():
        by_bucket.setdefault(b, []).append(k)
    target_bucket, keys = next(iter(sorted(by_bucket.items())))
    k_upd, k_del = keys[0], keys[1]
    touched = m.apply(_changes(spark, [
        (k_upd, "updated", 0.0, "u", 10, 1),
        (k_del, None, None, "d", 10, 2),
    ]))
    assert touched == [target_bucket]

    after = m.partition_files()
    for b in range(N_BUCKETS):
        if b == target_bucket:
            assert after[b] != before[b], "touched bucket must be rewritten"
        else:
            assert after[b] == before[b], f"bucket {b} must be untouched"

    # semantics identical to the plain full apply
    expected = apply_changes(
        snap,
        _changes(spark, [(k_upd, "updated", 0.0, "u", 10, 1),
                         (k_del, None, None, "d", 10, 2)]),
        keys=["k"],
    )
    assert mirror_diff(m.read(), expected).count() == 0


def test_apply_clears_fully_deleted_bucket(spark):
    """Dynamic partition overwrite writes nothing for an emptied
    bucket — the module must clear it explicitly or deletes resurrect."""
    path = os.path.join(tempfile.mkdtemp(prefix="bucketed_"), "mirror")
    m = BucketedMirror(spark, path, keys=["k"], n_buckets=N_BUCKETS)
    m.init(_snapshot(spark))

    by_bucket = {}
    for k, b in _buckets_of(spark, range(100)).items():
        by_bucket.setdefault(b, []).append(k)
    target_bucket, keys = next(iter(sorted(by_bucket.items())))
    m.apply(_changes(spark, [
        (k, None, None, "d", 10, i) for i, k in enumerate(keys)
    ]))
    assert target_bucket not in m.partition_files()
    got = m.read()
    assert got.filter(F.col("k").isin(keys)).count() == 0
    assert got.count() == 100 - len(keys)


def test_auto_create_from_empty_mirror(spark):
    """Routing auto-create path: init with a 0-row frame, then apply —
    the schema sidecar carries the row shape."""
    path = os.path.join(tempfile.mkdtemp(prefix="bucketed_"), "mirror")
    m = BucketedMirror(spark, path, keys=["k"], n_buckets=N_BUCKETS)
    snap = _snapshot(spark)
    m.init(snap.limit(0))
    assert m.read().count() == 0
    assert m.read().schema == snap.schema

    m.apply(_changes(spark, [
        (1, "a", 1.0, "c", 10, 1),
        (2, "b", 2.0, "c", 10, 2),
        (1, "a2", 1.5, "u", 20, 3),   # latest-wins within the batch
    ]))
    rows = {r["k"]: (r["name"], r["bal"]) for r in m.read().collect()}
    assert rows == {1: ("a2", 1.5), 2: ("b", 2.0)}


def test_apply_batches_accumulate_and_idempotent_replay(spark):
    path = os.path.join(tempfile.mkdtemp(prefix="bucketed_"), "mirror")
    m = BucketedMirror(spark, path, keys=["k"], n_buckets=N_BUCKETS)
    snap = _snapshot(spark)
    m.init(snap)
    batch = _changes(spark, [
        (3, "x", 9.9, "u", 100, 1),
        (200, "new", 1.0, "c", 100, 2),
        (7, None, None, "d", 100, 3),
    ])
    m.apply(batch, tag="b0")
    m.apply(batch, tag="b0_replay")  # replay: latest-wins makes it a no-op
    expected = apply_changes(snap, batch, keys=["k"])
    assert mirror_diff(m.read(), expected).count() == 0


def test_compaction_halves_files_content_unchanged(spark, tmp_path):
    """Small-file maintenance (the parquet rewrite_data_files): a
    fragmented bucket drops to one file per partition; read() results
    are byte-identical before and after."""
    path = str(tmp_path / "mirror")
    m = BucketedMirror(spark, path, keys=["k"], n_buckets=N_BUCKETS)
    snap = _snapshot(spark)
    # Fragment deliberately: 8 writer tasks × each holding rows of
    # every bucket → ~8 files per partition dir.
    (m._with_bucket(snap).repartition(8)
     .write.partitionBy(BUCKET_COL).parquet(path))
    before_files = m.partition_files()
    frag = {b for b, fs in before_files.items() if len(fs) > 1}
    assert frag, "fixture should produce fragmented partitions"
    before_rows = sorted(map(tuple, m.read().collect()))

    done = m.compact(max_files=1)
    assert set(done) == {f"{BUCKET_COL}={b}" for b in frag}
    after_files = m.partition_files()
    for b in frag:
        assert len(after_files[b]) == 1
        assert len(before_files[b]) >= 2 * len(after_files[b]), (
            "compaction must at least halve files in a fragmented bucket"
        )
    assert sorted(map(tuple, m.read().collect())) == before_rows
    # Idempotent: a second pass finds nothing to do.
    assert m.compact(max_files=1) == {}


def _dated_snapshot(spark):
    return spark.range(100).select(
        F.col("id").alias("k"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
        (F.col("id") * 1.5).alias("bal"),
        (F.lit(2024) + F.col("id") % 3).cast("int").alias("yr"),
    )


def test_two_level_apply_prunes_both_levels(spark, tmp_path):
    """TwoLevelMirror: a batch confined to one (year, bucket) cell
    rewrites exactly that cell; every other (year, bucket) partition's
    files are untouched, and semantics match the plain full apply."""
    from proof_of_concept___cdc_w_iceberg_spark.cdc.bucketed import TwoLevelMirror

    path = str(tmp_path / "mirror")
    m = TwoLevelMirror(spark, path, keys=["k"], date_col="yr",
                       n_buckets=N_BUCKETS)
    snap = _dated_snapshot(spark)
    m.init(snap)
    before = m.partition_files()
    assert len(before) > N_BUCKETS  # multiple years × buckets

    k_upd = 6  # yr = 2024 + 6 % 3 = 2024
    b = _buckets_of(spark, [k_upd])[k_upd]
    batch = spark.createDataFrame(
        [(k_upd, "upd", 0.0, 2024, "u", 10, 1)],
        "k long, name string, bal double, yr int, op string, ts_ms long, off long",
    )
    touched = m.apply(batch)
    assert touched == [(2024, b)]
    after = m.partition_files()
    for part in before:
        if part == ("2024", b):
            assert after[part] != before[part]
        else:
            assert after[part] == before[part], f"{part} must be untouched"

    expected = apply_changes(snap, batch, keys=["k"])
    got = m.read().withColumn("yr", F.col("yr").cast("int")).select(
        "k", "name", "bal", "yr")
    assert mirror_diff(got, expected.select("k", "name", "bal", "yr")).count() == 0


def test_two_level_delete_clears_emptied_cell(spark, tmp_path):
    """Deleting every key of one (year, bucket) cell removes that
    partition dir; the rest of the year survives."""
    from proof_of_concept___cdc_w_iceberg_spark.cdc.bucketed import TwoLevelMirror

    path = str(tmp_path / "mirror")
    m = TwoLevelMirror(spark, path, keys=["k"], date_col="yr",
                       n_buckets=N_BUCKETS)
    m.init(_dated_snapshot(spark))
    # keys of year 2025 (id % 3 == 1) landing in one bucket
    keys_2025 = [k for k in range(100) if k % 3 == 1]
    bmap = _buckets_of(spark, keys_2025)
    b0 = bmap[keys_2025[0]]
    cell_keys = [k for k in keys_2025 if bmap[k] == b0]
    batch = spark.createDataFrame(
        [(k, None, None, 2025, "d", 10, i) for i, k in enumerate(cell_keys)],
        "k long, name string, bal double, yr int, op string, ts_ms long, off long",
    )
    m.apply(batch)
    assert ("2025", b0) not in m.partition_files()
    got = m.read()
    assert got.filter(F.col("k").isin(cell_keys)).count() == 0
    assert got.count() == 100 - len(cell_keys)


def test_snapshot_mirror_reuses_untouched_bucket_files(spark, tmp_path):
    """A commit must write only touched buckets; untouched bucket
    entries in the new manifest must point at the PREVIOUS commit's
    files (Iceberg-style file reuse), and older versions must stay
    readable after later commits (time travel)."""
    from proof_of_concept___cdc_w_iceberg_spark.cdc.versioned import SnapshotMirror

    m = SnapshotMirror(spark, str(tmp_path / "mirror"), keys=["k"], n_buckets=8)
    snap = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(100)], ["k", "name", "bal"])
    m.init(snap)
    # one-key update batch → exactly one touched bucket
    batch = spark.createDataFrame(
        [(7, "n7x", 7.5, "u", 2000, 1)],
        ["k", "name", "bal", "op", "ts_ms", "off"])
    m.apply(batch)
    m0, m1 = m._load_manifest(0), m._load_manifest(1)
    changed = {b for b in m1["buckets"]
               if m1["buckets"].get(b) != m0["buckets"].get(b)}
    assert len(changed) == 1, f"expected 1 rewritten bucket, got {changed}"
    reused = {b for b in m1["buckets"]
              if m1["buckets"][b] == m0["buckets"].get(b)}
    assert reused == set(m0["buckets"]) - changed
    # time travel: v0 unchanged, v1 sees the update
    v0 = {r["k"]: r["name"] for r in m.read(0).collect()}
    v1 = {r["k"]: r["name"] for r in m.read(1).collect()}
    assert v0[7] == "n7" and v1[7] == "n7x"
    assert len(v0) == len(v1) == 100


def test_snapshot_mirror_delete_and_expire(spark, tmp_path):
    """Deletes drop rows in the new version only; expire removes
    commit dirs no live manifest references while the kept version
    still reads correctly."""
    import os

    from proof_of_concept___cdc_w_iceberg_spark.cdc.versioned import SnapshotMirror

    m = SnapshotMirror(spark, str(tmp_path / "mirror"), keys=["k"], n_buckets=4)
    snap = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(20)], ["k", "name", "bal"])
    m.init(snap)
    dele = spark.createDataFrame(
        [(k, None, None, "d", 2000, k) for k in range(20)],
        "k LONG, name STRING, bal DOUBLE, op STRING, ts_ms LONG, off LONG")
    m.apply(dele)
    assert m.read(1).count() == 0      # all rows deleted in v1
    assert m.read(0).count() == 20     # v0 still intact
    dead = m.expire(keep_last=1)
    assert dead == [0]
    assert m.read().count() == 0
    data_dir = os.path.join(m.path, "data")
    # v1 deleted everything and reuses nothing from commit 0 → only
    # dirs the live manifest references may remain
    live_refs = {os.path.basename(os.path.dirname(d))
                 for d in m._load_manifest(1)["buckets"].values()}
    assert set(os.listdir(data_dir)) <= live_refs | set()
