"""§2.6 — sort, limit, top-k.

Reference grounding: ``SELECT * ... ORDER BY pk`` (`test_cdc.py:80`).
Top-k compiles to TakeOrderedAndProject — no full sort at scale.
Every LIMIT is fully ordered with a unique tiebreaker so the returned
*set* is deterministic (the driver hash is order-insensitive).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load


@query(
    "q_sort",
    oracle="SELECT o_orderkey, o_orderdate FROM orders ORDER BY o_orderkey",
)
def q_sort(spark, sf_dir):
    """Total order by key — a range-partitioned exchange + per-partition
    sort at scale, not a single-node sort."""
    return load(spark, sf_dir, "orders").orderBy("o_orderkey").select(
        "o_orderkey", "o_orderdate"
    )


@query(
    "q_sort_multi",
    oracle="""
        SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg
        FROM customer
        ORDER BY seg ASC NULLS LAST, c_acctbal DESC, c_custkey
    """,
)
def q_sort_multi(spark, sf_dir):
    """Multi-key sort with explicit null ordering."""
    df = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
        "c_acctbal",
    )
    return df.orderBy(
        F.col("seg").asc_nulls_last(), F.col("c_acctbal").desc(), F.col("c_custkey")
    ).select("c_custkey", "seg")


@query(
    "q_limit",
    oracle="SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 10",
)
def q_limit(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .orderBy("o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


@query(
    "q_topk",
    oracle="""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def q_topk(spark, sf_dir):
    """ORDER BY + LIMIT — planned as TakeOrderedAndProject (per-partition
    top-k, then k-way merge on the driver; never a global sort)."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(20)
    )
