"""SQL endpoint, skew utilities, Iceberg gate, stateful operator."""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import functions as F

from proof_of_concept___cdc_w_iceberg_spark.api import SqlEndpoint
from proof_of_concept___cdc_w_iceberg_spark.cdc.apply import compact_latest, mirror_diff
from proof_of_concept___cdc_w_iceberg_spark.cdc.iceberg import (
    iceberg_available,
    merge_into,
)
from proof_of_concept___cdc_w_iceberg_spark.operators.skew import (
    broadcast_threshold_join,
    hot_keys,
    salted_join,
    union_all,
)
from proof_of_concept___cdc_w_iceberg_spark.sources.cdc_fixtures import changelog
from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load


def test_sql_endpoint_arbitrary_sql_with_pagination(spark, sf_dir):
    """The Trino-parity surface: arbitrary SQL text in, paged rows out
    (`init_for_test.py:66-79`)."""
    ep = SqlEndpoint(spark, sf_dir, page_size=7)
    cols, pages = ep.execute(
        "SELECT n_name, count(*) AS n FROM nation "
        "JOIN customer ON c_nationkey = n_nationkey GROUP BY 1 ORDER BY 1"
    )
    assert cols == ["n_name", "n"]
    page_list = list(pages)
    assert all(len(p) <= 7 for p in page_list)
    rows = [r for p in page_list for r in p]
    assert len(rows) == 25
    assert ep.table_exists("nation") and not ep.table_exists("no_such_table")


def test_sql_endpoint_matches_dataframe_api(spark, sf_dir):
    ep = SqlEndpoint(spark, sf_dir)
    got = {tuple(r) for r in ep.execute_all("SELECT r_regionkey, r_name FROM region")}
    want = {tuple(r) for r in load(spark, sf_dir, "region").collect()}
    assert got == want


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, on=["l_orderkey"])
    salted = salted_join(li, orders, on=["l_orderkey"], salt_buckets=8)
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_hot_keys_detects_planted_skew(spark):
    base = spark.range(1000).select(F.lit(7).alias("k"))  # hot key 7
    tail = spark.range(100).select(F.col("id").alias("k"))  # 100 singleton keys
    hk = hot_keys(base.unionByName(tail), ["k"], threshold_ratio=10.0)
    rows = hk.collect()
    assert [r["k"] for r in rows] == [7]


def test_broadcast_threshold_join_is_broadcast(spark, sf_dir):
    from proof_of_concept___cdc_w_iceberg_spark.plans import plan_report

    li = load(spark, sf_dir, "lineitem")
    nat = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    df = broadcast_threshold_join(
        li.select(F.col("l_suppkey").alias("s_suppkey"), "l_quantity"), nat,
        on=["s_suppkey"])
    assert plan_report(df)["has_broadcast_join"]


def test_union_all_folds(spark, sf_dir):
    r = load(spark, sf_dir, "region")
    assert union_all([r, r, r]).count() == r.count() * 3


def test_iceberg_gate_falls_back_cleanly(spark, sf_dir):
    """No Iceberg runtime in this environment: the gate must detect
    that and run the DataFrame MERGE fallback against a catalog table
    with identical CDC semantics."""
    assert iceberg_available(spark) is False
    ch = changelog(spark, sf_dir)
    snapshot = ch.filter(F.col("op") == "r").select("k", "name", "bal")
    tbl = f"merge_gate_test_{int(time.time())}"
    snapshot.write.mode("overwrite").saveAsTable(tbl)
    merge_into(spark, tbl, ch.filter(F.col("op") != "r"), keys=["k"])
    expected = (
        compact_latest(ch, ["k"]).filter(F.col("op") != "d").select("k", "name", "bal")
    )
    assert mirror_diff(spark.table(tbl), expected).count() == 0
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_stateful_latest_state_matches_compaction(spark, sf_dir):
    """applyInPandasWithState over a real stream == batch latest-wins
    compaction (live keys; deleted keys appear as tombstones)."""
    from proof_of_concept___cdc_w_iceberg_spark.streaming.stateful import (
        latest_state_stream,
    )

    ch = changelog(spark, sf_dir).limit(2000).cache()
    src = tempfile.mkdtemp(prefix="stateful_src_")
    ch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ch.schema).parquet(src)
    out = latest_state_stream(stream)
    qname = f"stateful_test_{int(time.time())}"
    q = (
        out.writeStream.format("memory").queryName(qname)
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = spark.sql(f"SELECT k, name, bal FROM {qname} WHERE NOT deleted")
    expected = (
        compact_latest(ch, ["k"]).filter(F.col("op") != "d").select("k", "name", "bal")
    )
    assert mirror_diff(got, expected).count() == 0


def test_stateful_tws_matches_compaction(spark, sf_dir):
    """transformWithStateInPandas (Spark 4 successor API) over a real
    stream == batch latest-wins compaction — same semantics as the
    applyInPandasWithState path through typed ValueState."""
    import pytest as _pytest

    from proof_of_concept___cdc_w_iceberg_spark.streaming import stateful

    if not stateful.TWS_AVAILABLE:
        _pytest.skip(f"transformWithStateInPandas gate: {stateful.TWS_GATE_REASON}")

    ch = changelog(spark, sf_dir).limit(2000).cache()
    src = tempfile.mkdtemp(prefix="stateful_tws_src_")
    ch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ch.schema).parquet(src)
    out = stateful.latest_state_stream_tws(stream)
    qname = f"stateful_tws_{int(time.time())}"
    q = (
        out.writeStream.format("memory").queryName(qname)
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = spark.sql(f"SELECT k, name, bal FROM {qname} WHERE NOT deleted")
    expected = (
        compact_latest(ch, ["k"]).filter(F.col("op") != "d").select("k", "name", "bal")
    )
    assert mirror_diff(got, expected).count() == 0
