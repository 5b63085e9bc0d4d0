"""SQL-surface widening — subqueries, lateral joins, recursive CTEs.

The reference exposes *arbitrary SQL text* against the lake through its
generic Trino executor (`init_for_test.py:66-79`), so correlated
subqueries, LATERAL, and recursive CTEs are part of the capability
surface even though no single reference file spells them out. Each
query here runs the SAME SQL text through ``spark.sql`` (over
registered lake views) and the DuckDB oracle — the strongest possible
parity statement for SQL-shaped features.

Scale notes: Catalyst decorrelates EXISTS/IN into left-semi joins and
scalar subqueries into broadcast aggregates; the correlated LATERAL
top-k decorrelates into a ranked window join — none of these fall back
to per-row re-execution. The recursive CTE is driver-iterated with a
bounded depth (36 steps here); each step is a distributed plan, so the
scaffold side stays tiny while the probe side scales with data.
"""

from __future__ import annotations

from ..registry import query
from ._util import rdiv_sql
from ..sources.tables import register_views

# Shared between the Spark side and the DuckDB oracle: both engines
# parse the identical text (this is the point — same-SQL parity).
_EXISTS_SQL = """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000
    )
"""

_IN_SQL = """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_nationkey IN (
        SELECT n_nationkey FROM nation WHERE n_regionkey = 2
    )
"""

# The scalar threshold rounds through the exact integer formula
# (rdiv_sql, r18 fuzzer class) — the SAME string runs on Spark SQL and
# DuckDB, so the fix lands on both engines at once.
_SCALAR_SQL = """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (
        SELECT {mean_expr}
        FROM orders
    )
""".replace("{mean_expr}", rdiv_sql(
    "SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100", "COUNT(*) * 100", 4
))

_LATERAL_SQL = """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) AS t
"""

_RECURSIVE_SQL = """
    WITH RECURSIVE months(m) AS (
        SELECT DATE '1995-01-01'
        UNION ALL
        SELECT CAST(m + INTERVAL '1' MONTH AS DATE)
        FROM months WHERE m < DATE '1997-12-01'
    ),
    big AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
               COUNT(*) AS n
        FROM orders
        WHERE o_totalprice > 495000
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY 1
    )
    SELECT months.m AS month, CAST(COALESCE(big.n, 0) AS BIGINT) AS n_big_orders
    FROM months LEFT JOIN big ON months.m = big.m
"""

_AGG_FILTER_SQL = """
    SELECT o_orderpriority,
           COUNT(*) AS n_all,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS sum_open
    FROM orders
    GROUP BY o_orderpriority
"""


@query("q_exists_subquery", oracle=_EXISTS_SQL)
def q_exists_subquery(spark, sf_dir):
    """Correlated EXISTS — customers holding at least one 450k+ order.
    Catalyst rewrites to a left-semi join (RewritePredicateSubquery);
    at scale this is one shuffle on the correlation key, never a
    per-row probe."""
    register_views(spark, sf_dir)
    return spark.sql(_EXISTS_SQL)


@query("q_in_subquery", oracle=_IN_SQL)
def q_in_subquery(spark, sf_dir):
    """Uncorrelated IN subquery — suppliers in region 2's nations.
    Planned as a broadcast left-semi join against the tiny dim."""
    register_views(spark, sf_dir)
    return spark.sql(_IN_SQL)


@query("q_scalar_subquery", oracle=_SCALAR_SQL)
def q_scalar_subquery(spark, sf_dir):
    """Uncorrelated scalar subquery — orders above the global mean
    price. The subquery runs once (a 1-row broadcast), not per row;
    the mean goes through the decimal-exact sum so both engines
    compute bit-identical thresholds."""
    register_views(spark, sf_dir)
    return spark.sql(_SCALAR_SQL)


@query("q_lateral_join", oracle=_LATERAL_SQL)
def q_lateral_join(spark, sf_dir):
    """Correlated LATERAL top-k — each customer's two priciest orders.
    Catalyst decorrelates the LIMIT-under-LATERAL into a ranked window
    join (DecorrelateInnerQuery), so the 100 TB plan is one shuffle of
    orders by o_custkey + a per-partition window, not |customer|
    subquery executions."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


@query("q_sql_recursive", oracle=_RECURSIVE_SQL)
def q_sql_recursive(spark, sf_dir):
    """Recursive CTE (Spark 4.x) — month scaffold 1995-01..1997-12,
    gap-filled monthly counts of 495k+ orders (3 of the 36 months have
    none; the LEFT JOIN + COALESCE zero-fills them). The recursion is
    36 bounded driver iterations over a 1-row relation; the fact side
    is a normal distributed aggregate."""
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SQL)


@query("q_agg_filter", oracle=_AGG_FILTER_SQL)
def q_agg_filter(spark, sf_dir):
    """Aggregate FILTER clause — per-priority counts/sums over
    different row subsets in ONE pass (one shuffle), the idiomatic
    replacement for N self-joined filtered aggregates."""
    register_views(spark, sf_dir)
    return spark.sql(_AGG_FILTER_SQL)


@query(
    "q_string_agg",
    oracle="""
        SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
        FROM region JOIN nation ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
)
def q_string_agg(spark, sf_dir):
    """Ordered string aggregation — Spark 4's ``listagg WITHIN GROUP``
    vs DuckDB's ``string_agg(... ORDER BY ...)``. The in-group sort
    makes the result order-independent of partitioning."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT r_name,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations
        FROM region JOIN nation ON n_regionkey = r_regionkey
        GROUP BY r_name
    """)
