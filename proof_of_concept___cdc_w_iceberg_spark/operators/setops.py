"""§2.7 — set operations.

UNION ALL mirrors the sink merging N topics into one flow
(`connect-iceberg-sink.json:9` topics.regex); EXCEPT is the
snapshot-vs-mirror diff primitive (`test_cdc.py:77-92`).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load


@query(
    "q_union_all",
    oracle="""
        SELECT o_orderkey, 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT o_orderkey, 'high' AS src FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
)
def q_union_all(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", F.lit("urgent").alias("src")
    )
    high = o.filter(F.col("o_orderpriority") == "2-HIGH").select(
        "o_orderkey", F.lit("high").alias("src")
    )
    return urgent.unionByName(high)


@query(
    "q_union_distinct",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey FROM supplier
    """,
)
def q_union_distinct(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "q_intersect",
    oracle="""
        SELECT c_custkey AS custkey FROM customer
        INTERSECT
        SELECT o_custkey FROM orders
    """,
)
def q_intersect(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.intersect(o)


@query(
    "q_except",
    oracle="""
        SELECT c_custkey AS custkey FROM customer
        EXCEPT
        SELECT o_custkey FROM orders
    """,
)
def q_except(spark, sf_dir):
    """EXCEPT — the diff primitive for snapshot-vs-mirror validation."""
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.subtract(o)
