"""Round-12 advice-fix regression: the theta 4-row contract in the
zero-count regime (disjoint streams must emit est=0, not drop the row).
The iterated NN-Descent and streaming-theta tests the r12 plan promised
live in tests/test_r13_ops.py (r12 verdict: this docstring claimed them
before they existed — corrected)."""

from __future__ import annotations

import math

import duckdb
import pytest

from pyspark.sql import functions as F

from proof_of_concept___cdc_w_iceberg_spark.registry import oracles, queries

QS = queries()
OS = oracles()


def test_theta_disjoint_streams_keep_all_four_rows(spark, tmp_path):
    """r11 advice: with zero qualifying hashes (disjoint streams ->
    empty intersection) the 'intersection' measure row used to vanish
    from BOTH engines instead of reporting est=0. The fixed query and
    the fixed oracle must each emit the full 4-row contract, agreeing
    row for row, in this degenerate regime too — end to end through
    a synthetic orders fixture where the 1995 and 1996 customer sets
    are disjoint."""
    rows = [(k, "1995-06-01") for k in range(1, 31)] + [
        (k, "1996-06-01") for k in range(1001, 1041)
    ]
    orders = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate string"
    ).select("o_custkey", F.col("o_orderdate").cast("date").alias("o_orderdate"))
    orders.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    got = {
        r["measure"]: r
        for r in QS["q_sketch_theta"](spark, str(tmp_path)).collect()
    }
    spark.catalog.clearCache()

    con = duckdb.connect()
    try:
        con.sql(
            "CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{tmp_path}/orders.parquet/*.parquet')"
        )
        want = {r[0]: r for r in con.sql(OS["q_sketch_theta"]).fetchall()}
    finally:
        con.close()

    assert set(got) == set(want) == {
        "distinct_a", "distinct_b", "union", "intersection"
    }
    # zero-count regime: the row exists and reports est=0 / exact 0
    assert got["intersection"]["est"] == 0.0
    assert got["intersection"]["exact_v"] == 0
    # <k distinct on both sides -> exact regime for the other rows
    assert got["distinct_a"]["est"] == 30.0
    assert got["distinct_b"]["est"] == 40.0
    assert got["union"]["est"] == 70.0
    for m, g in got.items():
        w = want[m]
        assert g["est"] == pytest.approx(float(w[1])), m
        assert g["exact_v"] == int(w[2]), m
        ge, we = g["rel_err"], w[3]
        if ge is None or we is None:
            assert ge is None and we is None, m  # 0/0 -> NULL, both engines
        else:
            assert ge == pytest.approx(float(we)), m
