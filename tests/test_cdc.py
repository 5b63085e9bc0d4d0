"""Unit tests for the CDC core: compaction ordering, merge semantics
(incl. NULL images and deletes), schema evolution, mirror verify.
Modeled on the reference's insert-then-reverify flow
(`test_cdc.py:75-92`) but with real assertions.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from proof_of_concept___cdc_w_iceberg_spark.cdc.apply import (
    apply_changes,
    compact_latest,
    merge_upsert,
    mirror_diff,
)
from proof_of_concept___cdc_w_iceberg_spark.cdc.envelope import (
    decode_envelope,
    encode_envelope,
)
from proof_of_concept___cdc_w_iceberg_spark.cdc.evolve import (
    evolve_and_union,
    schema_diff,
)
from proof_of_concept___cdc_w_iceberg_spark.sources.cdc_fixtures import changelog

COLS = "k long, name string, bal double, op string, ts_ms long, off long"


def test_compact_latest_orders_by_ts_then_offset(spark):
    rows = [
        (1, "a", 1.0, "c", 100, 1),
        (1, "b", 2.0, "u", 200, 2),  # newer ts wins
        (1, "c", 3.0, "u", 200, 3),  # same ts, higher offset wins
        (2, "x", 9.0, "c", 100, 4),
    ]
    df = spark.createDataFrame(rows, COLS)
    got = {r["k"]: r["name"] for r in compact_latest(df, ["k"]).collect()}
    assert got == {1: "c", 2: "x"}


def test_merge_upsert_honors_source_nulls(spark):
    target = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], "k long, name string, bal double")
    source = spark.createDataFrame([(2, None, 5.0), (3, "c", 3.0)], "k long, name string, bal double")
    out = {r["k"]: (r["name"], r["bal"]) for r in merge_upsert(target, source, ["k"]).collect()}
    assert out == {1: ("a", 1.0), 2: (None, 5.0), 3: ("c", 3.0)}


def test_apply_changes_insert_update_delete(spark):
    target = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "k long, name string, bal double"
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 20.0, "u", 100, 1),
            (3, None, None, "d", 100, 2),
            (4, "d", 4.0, "c", 100, 3),
            (4, "d2", 40.0, "u", 200, 4),  # later update same batch
        ],
        COLS,
    )
    out = {r["k"]: (r["name"], r["bal"]) for r in apply_changes(target, changes, ["k"]).collect()}
    assert out == {1: ("a", 1.0), 2: ("b2", 20.0), 4: ("d2", 40.0)}


def test_delete_then_reinsert_wins(spark):
    target = spark.createDataFrame([(1, "a", 1.0)], "k long, name string, bal double")
    changes = spark.createDataFrame(
        [(1, None, None, "d", 100, 1), (1, "re", 9.0, "c", 200, 2)], COLS
    )
    out = apply_changes(target, changes, ["k"]).collect()
    assert len(out) == 1 and out[0]["name"] == "re"


def test_envelope_roundtrip(spark, sf_dir):
    ch = changelog(spark, sf_dir)
    decoded = decode_envelope(encode_envelope(ch))
    back = decoded.select(
        F.coalesce(F.col("after.k"), F.col("before.k")).alias("k"),
        F.col("after.name").alias("name"),
        F.col("after.bal").alias("bal"),
        "op",
        "ts_ms",
        "off",
    )
    assert mirror_diff(back, ch).count() == 0


def test_schema_evolution_adds_columns(spark):
    table = spark.createDataFrame([(1, "a")], "k long, name string")
    batch = spark.createDataFrame([(2, "b", "X")], "k long, name string, status string")
    added = schema_diff(table.schema, batch.schema)
    assert [f.name for f in added] == ["status"]
    out = evolve_and_union(table, batch)
    assert out.columns == ["k", "name", "status"]
    rows = {r["k"]: r["status"] for r in out.collect()}
    assert rows == {1: None, 2: "X"}


def test_mirror_verify_catches_drift(spark):
    a = spark.createDataFrame([(1, "a")], "k long, name string")
    b = spark.createDataFrame([(1, "b")], "k long, name string")
    assert mirror_diff(a, a).count() == 0
    assert mirror_diff(a, b).count() == 2


def test_envelope_with_inline_schema_roundtrip(spark, sf_dir):
    """JSON-with-schema transport (connect-standalone.properties:2-5):
    every record carries a valid Connect schema; decode recovers the
    payload AND surfaces the per-record schema for drift detection."""
    from proof_of_concept___cdc_w_iceberg_spark.cdc.envelope import (
        decode_envelope_with_schema,
        encode_envelope_with_schema,
    )

    ch = changelog(spark, sf_dir)
    wired = encode_envelope_with_schema(ch)
    decoded = decode_envelope_with_schema(wired)
    back = decoded.select(
        F.coalesce(F.col("after.k"), F.col("before.k")).alias("k"),
        F.col("after.name").alias("name"),
        F.col("after.bal").alias("bal"),
        "op",
        "ts_ms",
        "off",
    )
    assert mirror_diff(back, ch).count() == 0
    schemas = {r["_record_schema"] for r in decoded.select("_record_schema").distinct().collect()}
    assert len(schemas) == 1
    parsed = json.loads(schemas.pop())
    assert parsed["type"] == "struct"
    assert [f["field"] for f in parsed["fields"]] == ["k", "name", "bal"]
    assert {f["type"] for f in parsed["fields"]} == {"int64", "string", "float64"}
    assert decoded.select("_cdc_target").distinct().collect()[0][0] == "cdc.commerce_account"


def test_strict_decode_fails_fast_on_malformed(spark, sf_dir):
    """errors.tolerance=none parity: a malformed record aborts the
    decode instead of flowing through as nulls."""
    import pytest

    from proof_of_concept___cdc_w_iceberg_spark.cdc.envelope import (
        MalformedEnvelopeError,
    )

    good = encode_envelope(changelog(spark, sf_dir).limit(10))
    bad = spark.createDataFrame([(99, "{not json at all")], "key long, value string")
    mixed = good.unionByName(bad)
    # lenient default: nulls flow through
    assert decode_envelope(mixed).count() == 11
    # strict: abort, naming the offending record
    with pytest.raises(MalformedEnvelopeError, match="not json"):
        decode_envelope(mixed, strict=True).count()
    # strict on clean input: no-op
    assert decode_envelope(good, strict=True).count() == 10


def test_compaction_and_staging_cleanup(spark, sf_dir):
    """Table maintenance: many tiny files -> one size-targeted file
    with identical contents; stale staged swap dirs removed."""
    import os
    import tempfile

    from proof_of_concept___cdc_w_iceberg_spark.cdc.maintenance import (
        cleanup_staging,
        compact_small_files,
        dir_stats,
    )
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load

    work = tempfile.mkdtemp(prefix="maint_")
    mirror = os.path.join(work, "mirror")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    c.repartition(20).write.mode("overwrite").parquet(mirror)  # 20 tiny files
    before = spark.read.parquet(mirror).collect()
    _, n_before = dir_stats(mirror)
    assert n_before == 20

    n_after = compact_small_files(spark, mirror)
    assert n_after == 1  # tiny table -> single target-size file
    after = spark.read.parquet(mirror).collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))

    # staged swap dirs from pipeline batches get expired
    for d in ("mirror_b0", "mirror_b1", "mirror_staged"):
        os.makedirs(os.path.join(work, d), exist_ok=True)
    assert cleanup_staging(mirror) == 3
    assert os.path.isdir(mirror)


def test_diff_apply_round_trip(spark, sf_dir):
    """Round-trip law: apply(diff(old, new), old) == new."""
    from proof_of_concept___cdc_w_iceberg_spark.cdc.diff import table_changes
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load

    c = load(spark, sf_dir, "customer")
    old = c.select(
        F.col("c_custkey").cast("long").alias("k"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
    )
    new = (
        old.filter(F.col("k") % 5 != 0)
        .withColumn("bal", F.col("bal") + 1.0)
        .unionByName(
            old.filter(F.col("k") % 9 == 0).select(
                (F.col("k") + 30_000_000).alias("k"), "name", "bal"
            )
        )
    )
    changes = table_changes(old, new, keys=["k"])
    rebuilt = apply_changes(old, changes, keys=["k"])
    assert mirror_diff(rebuilt, new).count() == 0
    # empty diff for identical tables
    assert table_changes(old, old, keys=["k"]).count() == 0
