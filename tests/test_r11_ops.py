"""Round-11 additions: the mergeable quantile sketch
(q_sketch_quantile, operators/sketches.py) — merge law, plan shape,
and in-band error sanity. Conformance vs the DuckDB oracle is covered
by tests/test_correctness.py like every other registered query.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from proof_of_concept___cdc_w_iceberg_spark import registry
from proof_of_concept___cdc_w_iceberg_spark.operators.sketches import (
    KQ_K,
    KQ_TARGETS,
    kq_sample,
)
from proof_of_concept___cdc_w_iceberg_spark.plans import explain_str
from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load

QS = registry.queries()


def _stream(spark, sf_dir):
    return load(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").cast("double").alias("v"),
        F.md5(
            F.concat(
                F.lit("kq|"),
                F.col("l_orderkey").cast("string"),
                F.lit("|"),
                F.col("l_linenumber").cast("string"),
            )
        ).alias("h"),
    )


def _rows(df):
    return sorted((r["v"], r["h"]) for r in df.collect())


def test_kq_sample_merge_law(spark, sf_dir):
    """bottom-k is a monoid: sketching each shard then merging the
    k-row sketches equals sketching the whole stream — the property
    that lets day-level/table-level sketches combine at 100 TB
    without a re-scan (same contract as HLL register-wise max)."""
    li = load(spark, sf_dir, "lineitem")
    full = _stream(spark, sf_dir)
    shards = [
        _stream(spark, sf_dir).where(
            F.crc32(F.col("h")) % 3 == i
        )
        for i in range(3)
    ]
    merged_parts = shards[0].unionByName(shards[1]).unionByName(shards[2])
    # the shards partition the stream
    assert merged_parts.count() == li.count()
    resketched = kq_sample(
        kq_sample(shards[0])
        .unionByName(kq_sample(shards[1]))
        .unionByName(kq_sample(shards[2]))
    )
    assert _rows(resketched) == _rows(kq_sample(full))


def test_kq_sample_idempotent_and_bounded(spark, sf_dir):
    s = kq_sample(_stream(spark, sf_dir))
    assert s.count() == KQ_K
    assert _rows(kq_sample(s)) == _rows(s)


def test_kq_sample_plans_take_ordered(spark, sf_dir):
    """The sketch build must be the map-combined top-k operator (each
    task keeps a k-row heap), never a global sort + limit."""
    plan = explain_str(kq_sample(_stream(spark, sf_dir)))
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower(), (
        "sketch build plans a global range sort"
    )


def test_sketch_quantile_output_contract(spark, sf_dir):
    rows = {r["q"]: r for r in QS["q_sketch_quantile"](spark, sf_dir).collect()}
    assert set(rows) == set(KQ_TARGETS)
    for q, r in rows.items():
        # uniform k=1024 sample: ~2-3% rank error; value-space error
        # bounded loosely (exact bound depends on local density)
        assert r["rel_err"] < 0.15, (q, r)
        assert r["k_sample"] == KQ_K
        assert r["n_stream"] > r["k_sample"]
        # estimates and exacts are real order statistics of the value
        # column: both positive, est within the stream's range
        assert r["est"] > 0 and r["exact_v"] > 0
    # monotone in q — order statistics of the same sample
    qs = sorted(rows)
    ests = [rows[q]["est"] for q in qs]
    exacts = [rows[q]["exact_v"] for q in qs]
    assert ests == sorted(ests)
    assert exacts == sorted(exacts)
