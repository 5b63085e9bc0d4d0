"""§2.2 — projection, filters, predicates.

Part of the general SQL surface the reference exposes via its generic
SQL executors (`init_for_test.py:66-79`, `test_cdc.py:44-53`). All
predicates here are Catalyst-pushable: they appear as PushedFilters on
the parquet scan, so at 100 TB they skip row groups via min/max stats.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load


@query(
    "q_project",
    oracle="SELECT o_orderkey AS order_id, o_totalprice AS price FROM orders",
)
def q_project(spark, sf_dir):
    """Column projection + rename (cf. the sink schema mapping
    `connect-iceberg-sink.json:31,33`)."""
    return load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"), F.col("o_totalprice").alias("price")
    )


@query(
    "q_project_computed",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2))
                          * CAST(1 - l_discount AS DECIMAL(6,2))
                          * CAST(1 + l_tax AS DECIMAL(6,2)), 2) AS DOUBLE) AS charge
        FROM lineitem
    """,
)
def q_project_computed(spark, sf_dir):
    """Computed column. The product runs in exact DECIMAL (the inputs
    have 2-decimal semantics) so the final HALF_UP round is identical
    across engines — double products land on .xx5 boundaries
    constantly and would round differently."""
    charge = (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1.0) - F.col("l_discount")).cast("decimal(6,2)")
        * (F.lit(1.0) + F.col("l_tax")).cast("decimal(6,2)")
    )
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(charge, 2).cast("double").alias("charge"),
    )


@query(
    "q_filter_eq",
    oracle="SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'",
)
def q_filter_eq(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "q_filter_range",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE l_quantity BETWEEN 10 AND 20
          AND l_shipdate >= TIMESTAMP '1995-06-01'
    """,
)
def q_filter_range(spark, sf_dir):
    return (
        load(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_quantity").between(10, 20)
            & (F.col("l_shipdate") >= F.lit("1995-06-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "q_filter_in",
    oracle="""
        SELECT o_orderkey, o_orderpriority FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def q_filter_in(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")
    )


@query(
    "q_filter_like",
    oracle="SELECT c_custkey, c_name FROM customer WHERE c_name LIKE '%0059%'",
)
def q_filter_like(spark, sf_dir):
    """LIKE predicate (cf. `init_for_test.py:82` SHOW TABLES ... LIKE)."""
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_name").like("%0059%"))
        .select("c_custkey", "c_name")
    )


@query(
    "q_filter_null",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               NULLIF(l_returnflag, 'N') AS flag_or_null,
               COALESCE(NULLIF(l_returnflag, 'N'), 'missing') AS flag_filled,
               CASE WHEN NULLIF(l_returnflag, 'N') IS NULL THEN 1 ELSE 0 END AS is_null
        FROM lineitem
    """,
)
def q_filter_null(spark, sf_dir):
    """NULL handling: IS NULL / NULLIF / COALESCE (NOT NULL source
    columns per `sqlserver/init.sql:11,16`; envelope before/after
    nullability)."""
    flag = F.nullif(F.col("l_returnflag"), F.lit("N"))
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        flag.alias("flag_or_null"),
        F.coalesce(flag, F.lit("missing")).alias("flag_filled"),
        F.when(flag.isNull(), 1).otherwise(0).alias("is_null"),
    )


@query(
    "q_filter_compound",
    oracle="""
        SELECT l_orderkey, l_linenumber FROM lineitem
        WHERE (l_returnflag = 'R' AND l_quantity > 30)
           OR (NOT l_linestatus = 'O' AND l_discount < 0.02)
    """,
)
def q_filter_compound(spark, sf_dir):
    return (
        load(spark, sf_dir, "lineitem")
        .filter(
            ((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 30))
            | (~(F.col("l_linestatus") == "O") & (F.col("l_discount") < 0.02))
        )
        .select("l_orderkey", "l_linenumber")
    )
