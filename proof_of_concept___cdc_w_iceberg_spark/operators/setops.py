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


@query(
    "q_union_evolve",
    oracle="""
        SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
               CAST(NULL AS DOUBLE) AS c_acctbal, 'v1' AS src
        FROM customer WHERE c_custkey % 2 = 0
        UNION ALL
        SELECT c_custkey, c_name, c_acctbal, 'v2'
        FROM customer WHERE c_custkey % 2 = 1
    """,
)
def q_union_evolve(spark, sf_dir):
    """Schema-drift union: rows written before a column existed union
    cleanly with rows written after (``unionByName`` with
    allowMissingColumns — missing columns null-fill, names align by
    NAME not position). This is the reader-side half of schema
    evolution: a lake table whose old files lack the new column reads
    as one relation (`connect-iceberg-sink.json:15`
    iceberg.tables.evolve-schema-enabled; the write-side half is
    q_schema_evolve). Positional UNION would silently mis-bind here —
    by-name alignment is the correctness property this query pins."""
    c = load(spark, sf_dir, "customer")
    v1 = c.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        "c_name",
        F.lit("v1").alias("src"),
    )
    v2 = c.filter(F.col("c_custkey") % 2 == 1).select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        "c_name",
        "c_acctbal",
        F.lit("v2").alias("src"),
    )
    return v1.unionByName(v2, allowMissingColumns=True).select(
        "c_custkey", "c_name", "c_acctbal", "src"
    )
