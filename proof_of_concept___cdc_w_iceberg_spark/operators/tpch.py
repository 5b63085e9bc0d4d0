"""Classic TPC-H-shaped queries — the "arbitrary relational SQL over
the lake" capability the reference delegates to Trino
(`init_for_test.py:66-79` executes any SQL text; capability parity
means our engine answers the standard analytic shapes, not just the
operator micro-queries).

Determinism: double sums go through DECIMAL casts (order-independent
addition), averages round — see registry.py docstring.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load, register_views
from ._util import avg_sql, dec_avg, dec_sum, rdiv, rdiv_sql
from .skew import salted_join


@query(
    "q_tpch_q1",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS sum_disc_price,
               {avg_sql("l_quantity", "COUNT(l_quantity)", 20, 4, 4)} AS avg_qty,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1 pricing summary: the canonical scan→filter→wide-agg
    shape. One shuffle, map-side partials, filter pushed to parquet."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", 20, 4).alias("sum_qty"),
            dec_sum("l_extendedprice", 20, 4).alias("sum_base_price"),
            dec_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 20, 4
            ).alias("sum_disc_price"),
            dec_avg("l_quantity", 20, 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q_tpch_q3",
    oracle="""
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15'
          AND l_shipdate > TIMESTAMP '1995-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q_tpch_q3(spark, sf_dir):
    """TPC-H Q3 shipping priority: selective dim filter → join →
    agg → top-10 (TakeOrdered). Customer side broadcasts."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 20, 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "q_tpch_q18",
    oracle="""
        WITH big AS (
            SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(20,4))) > 300
        )
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM big)
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18 large-volume customers: HAVING-derived semi-join
    filter feeding a 3-way join + re-aggregation."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(20,4)")).alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dec_sum("l_quantity", 20, 4).alias("sum_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
    )


@query(
    "q_sql_text",
    oracle="""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
)
def q_sql_text(spark, sf_dir):
    """The reference's core capability — *arbitrary SQL text* against
    the lake (`init_for_test.py:66-79`) — as a TPC-H Q5 regional
    revenue query through ``spark.sql`` over registered views. Catalyst
    reorders the 6-way join and broadcasts the small dims."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """)


@query(
    "q_join_salted",
    oracle="""
        SELECT o_orderpriority,
               CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
)
def q_join_salted(spark, sf_dir):
    """Skew-safe salted join (operators/skew.py): result must be
    row-identical to the plain equi-join — the oracle IS the plain
    join. At scale this is the tool for a single hot key AQE's skew
    splitting can't fix."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    return (
        salted_join(li, o, on=["l_orderkey"], salt_buckets=8)
        .groupBy("o_orderpriority")
        .agg(dec_sum("l_quantity", 20, 4).alias("sum_qty"), F.count("*").alias("n"))
    )


@query(
    "q_tpch_q4",
    oracle="""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-07-01'
          AND o_orderdate < TIMESTAMP '1995-10-01'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
    """,
)
def q_tpch_q4(spark, sf_dir):
    """TPC-H Q4 shape (order priority checking): EXISTS as a left-semi
    join — here against lineitems shipped >60 days after order date
    (the fixture lineitem has no commit/receipt dates)."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(li, o.o_orderkey == li.l_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    ).select("o_orderkey").distinct()
    return (
        o.join(late, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q_tpch_q12",
    oracle="""
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_linestatus
    """,
)
def q_tpch_q12(spark, sf_dir):
    """TPC-H Q12 shape (shipping priority split): selective fact
    filter, FK join, conditional (CASE) aggregation — grouped by
    l_linestatus (the fixture has no l_shipmode)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q_tpch_q6",
    oracle="""
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(20,4))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6 forecasting revenue change: the pure predicate-pushdown
    benchmark — every filter must reach the parquet scan; a single
    global agg with map-side partials, no groupBy shuffle at all."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(dec_sum(F.col("l_extendedprice") * F.col("l_discount"), 20, 4)
             .alias("revenue"))
    )


@query(
    "q_tpch_q10",
    oracle="""
        SELECT c_custkey, c_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS revenue,
               c_acctbal, n_name
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1995-10-01'
          AND o_orderdate < TIMESTAMP '1996-01-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10 returned-item reporting: fact-side filters cut both
    big tables before the join; nation broadcasts; top-20 is
    TakeOrderedAndProject, never a full sort. (Fixture customer has no
    address/phone/comment — output trimmed; quarter window shifted into
    the fixture's 1995-2001 orderdate range.)"""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 20, 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@query(
    "q_tpch_q14",
    oracle="""
        SELECT ROUND(
            100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                       THEN l_extendedprice * (1 - l_discount) ELSE 0 END
                       AS DECIMAL(20,4))) AS DOUBLE)
                  / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(20,4))) AS DOUBLE), 4) AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1995-09-01'
          AND l_shipdate < TIMESTAMP '1995-10-01'
    """,
)
def q_tpch_q14(spark, sf_dir):
    """TPC-H Q14 promotion effect: month-sliced fact join to a
    broadcast dim, conditional ratio aggregate. Both sums are exact
    decimals, so the one double division is cross-engine stable
    (rounded to 4 for belt-and-braces)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0) * dec_sum(promo, 20, 4) / dec_sum(disc, 20, 4), 4
            ).alias("promo_revenue")
        )
    )


@query(
    "q_tpch_q19",
    oracle="""
        SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#4'  AND p_size BETWEEN 1  AND 15 AND l_quantity BETWEEN 1  AND 11)
           OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#2'  AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19(spark, sf_dir):
    """TPC-H Q19 discounted revenue: the disjunctive-predicate join.
    The equi-key (l_partkey = p_partkey) carries the join; the OR-of-
    conjuncts stays a residual filter on a broadcast hash join — NOT a
    nested-loop join (the trap q_sim_lsh's fix guards against).
    (Fixture has no l_shipmode/l_shipinstruct — disjuncts use
    brand/size/quantity only.)"""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q, sz, b = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((b == "Brand#4") & sz.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#19") & sz.between(10, 30) & q.between(10, 20))
        | ((b == "Brand#2") & sz.between(20, 50) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 20, 4
            ).alias("revenue")
        )
    )


@query(
    "q_tpch_q7",
    oracle="""
        SELECT supp_nation, cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(20,4))) AS DOUBLE) AS revenue
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN (SELECT n_nationkey AS s_nk, n_name AS supp_nation FROM nation) n1
          ON s_nationkey = s_nk
        JOIN (SELECT n_nationkey AS c_nk, n_name AS cust_nation FROM nation) n2
          ON c_nationkey = c_nk
        WHERE ((supp_nation = 'NATION_1' AND cust_nation = 'NATION_2')
            OR (supp_nation = 'NATION_2' AND cust_nation = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark, sf_dir):
    """TPC-H Q7 volume shipping: the nation-PAIR join — the nation dim
    joins the fact chain TWICE under different roles (supplier's vs
    customer's nation), with a symmetric pair predicate. Both nation
    sides broadcast; the only shuffles are the fact-fact joins. The
    pair filter is applied after the cheap broadcast joins, before the
    group-by."""
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 20, 4
            ).alias("revenue")
        )
    )


@query(
    "q_tpch_q8",
    oracle="""
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               ROUND(CAST(SUM(CAST(CASE WHEN nation = 'NATION_3'
                          THEN l_extendedprice * (1 - l_discount) ELSE 0 END
                          AS DECIMAL(20,4))) AS DOUBLE)
                   / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(20,4))) AS DOUBLE), 6) AS mkt_share
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN (SELECT n_nationkey AS s_nk, n_name AS nation FROM nation) n2
          ON s_nationkey = s_nk
        WHERE r_name = 'EUROPE'
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND p_type = 'ECONOMY'
        GROUP BY o_year
    """,
)
def q_tpch_q8(spark, sf_dir):
    """TPC-H Q8 national market share: 8-table join (part, supplier,
    lineitem, orders, customer, nation x2, region) reduced to two fact
    shuffles — every dim broadcasts, and the selective p_type filter
    cuts lineitem via the broadcast-hash part join before the orders
    join. The share is a conditional-over-total ratio of two exact
    decimal sums (one stable double division, rounded)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select(
        "r_regionkey"
    )
    n1 = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("c_nk")
    )
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation"))
    vol = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    nat = F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"), "inner")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(dec_sum(nat, 20, 4) / dec_sum(vol, 20, 4), 6).alias("mkt_share")
        )
    )


@query(
    "q_tpch_q15",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(20,4))) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name,
               CAST(total_revenue AS DOUBLE) AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q_tpch_q15(spark, sf_dir):
    """TPC-H Q15 top supplier: the revenue "view" is computed once and
    consumed twice (its max, and the equality filter). The 1-row max is
    broadcast-crossed back — no driver collect, no single-partition
    window over all suppliers. Revenue stays DECIMAL through the
    equality comparison (exact), final-cast to double only for output."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
                "decimal(20,4)"
            )
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue")
        )
    )


@query(
    "q_tpch_q22",
    oracle="""
        SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode,
               CAST(count(*) AS BIGINT) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE c_nationkey % 5 IN (0, 2, 3)
          AND c_acctbal > (
              SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                     / COUNT(*)
              FROM customer
              WHERE c_acctbal > 0.0 AND c_nationkey % 5 IN (0, 2, 3)
          )
          AND NOT EXISTS (
              SELECT 1 FROM orders WHERE o_custkey = c_custkey
          )
        GROUP BY c_nationkey % 5
    """,
)
def q_tpch_q22(spark, sf_dir):
    """TPC-H Q22 global sales opportunity: uncorrelated scalar subquery
    (average positive balance — one-row broadcast) + NOT EXISTS
    (anti-join against orders) + final aggregate. The fixture customer
    has no c_phone, so the "country code" is nationkey mod 5 (the
    region id) — same shape: code-set filter, above-average balance,
    never-ordered customers. Same SQL text runs on both engines;
    Catalyst plans the NOT EXISTS as a left-anti hash join, the scalar
    as a one-shot subquery reused across the scan."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode,
               CAST(count(*) AS BIGINT) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE c_nationkey % 5 IN (0, 2, 3)
          AND c_acctbal > (
              SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                     / COUNT(*)
              FROM customer
              WHERE c_acctbal > 0.0 AND c_nationkey % 5 IN (0, 2, 3)
          )
          AND NOT EXISTS (
              SELECT 1 FROM orders WHERE o_custkey = c_custkey
          )
        GROUP BY c_nationkey % 5
    """)


@query(
    "q_tpch_q13",
    oracle="""
        WITH c_orders AS (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        SELECT CAST(c_count AS BIGINT) AS c_count,
               CAST(count(*) AS BIGINT) AS custdist
        FROM c_orders GROUP BY c_count
    """,
)
def q_tpch_q13(spark, sf_dir):
    """TPC-H Q13 customer order-count distribution: LEFT JOIN with a
    filter inside the join condition (customers with zero qualifying
    orders must appear with c_count=0), then a distribution aggregate.
    Two shuffles: one on c_custkey, one on the tiny c_count domain."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    joined = c.join(
        o,
        (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
        "left",
    )
    return (
        joined.groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "q_tpch_q17",
    oracle="""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
                   AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (
              SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                            / COUNT(*))
              FROM lineitem l2 WHERE l2.l_partkey = p_partkey
          )
    """,
)
def q_tpch_q17(spark, sf_dir):
    """TPC-H Q17 small-quantity-order revenue: CORRELATED scalar
    subquery (per-part average) against the fact table. Spark runs the
    same SQL text; Catalyst decorrelates the subquery into a per-part
    aggregate joined back — one extra shuffle on l_partkey instead of
    |parts| subquery executions. The per-part mean goes through the
    decimal-exact sum so the 0.2x threshold is bit-identical across
    engines."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
                   AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (
              SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                            / COUNT(*))
              FROM lineitem l2 WHERE l2.l_partkey = p_partkey
          )
    """)


@query(
    "q_tpch_q21",
    oracle="""
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
)
def q_tpch_q21(spark, sf_dir):
    """TPC-H Q21 suppliers-who-kept-orders-waiting, adapted: "late" is
    l_shipdate > o_orderdate + 60 days (fixture lineitem has no
    commitdate/receiptdate — TESTDATA.md). The oracle keeps the
    textbook correlated EXISTS / NOT EXISTS pair; the Spark plan
    replaces BOTH correlated self-joins with ONE order-level aggregate
    (countDistinct suppliers, countDistinct late suppliers) joined
    back — at 100 TB that is a single extra shuffle on l_orderkey
    instead of two more lineitem self-joins. A late row qualifies iff
    its order has >=2 distinct suppliers and exactly 1 late one (then
    necessarily this row's). LIMIT is deterministic: (numwait DESC,
    s_name) is a unique total order.

    Reference grounding: arbitrary-SQL surface via
    init_for_test.py:66-79 (Trino pass-through)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    lo = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "n_late_supps"
        ),
    )
    sole_late = (
        lo.filter(F.col("late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supps") >= 2) & (F.col("n_late_supps") == 1))
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey")
    return (
        sole_late.join(F.broadcast(s), sole_late.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@query(
    "q_tpch_q9",
    oracle="""
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             - 0.6 * p_retailprice * l_quantity
                             AS DECIMAL(20,4))) AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%a%'
        GROUP BY 1, 2
    """,
)
def q_tpch_q9(spark, sf_dir):
    """TPC-H Q9 product-type profit, adapted: the fixture has no
    partsupp, so supply cost is modeled as 0.6 * p_retailprice (the
    shape — revenue minus a part-dependent cost, aggregated by the
    SUPPLIER's nation and order year — is what's exercised). Plan:
    lineitem shuffles once to meet orders on orderkey; part (LIKE
    pre-filtered), supplier, and nation are all broadcast, so the
    5-table join costs exactly one fact shuffle. Profit summed as
    exact decimal for cross-engine determinism."""
    li = load(spark, sf_dir, "lineitem")
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%a%"))
        .select("p_partkey", "p_retailprice")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .withColumn("profit", profit)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dec_sum("profit", 20, 4).alias("sum_profit"))
    )


@query(
    "q_tpch_q11",
    oracle="""
        WITH pv AS (
            SELECT l_partkey AS partkey,
                   SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(20,4))) AS v
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name IN ('NATION_3', 'NATION_7')
            GROUP BY 1
        )
        SELECT partkey, CAST(v AS DOUBLE) AS part_value
        FROM pv
        WHERE v > (SELECT 0.001 * SUM(v) FROM pv)
    """,
)
def q_tpch_q11(spark, sf_dir):
    """TPC-H Q11 important stock, adapted: part value from shipped
    lineitems (no partsupp in the fixture) for two nations' suppliers,
    kept when above 0.1% of the group total — the uncorrelated scalar
    aggregate subquery shape. Spark computes the per-part relation
    ONCE, derives the 1-row total from it, and broadcasts the total
    back (crossJoin of a 1-row side → BroadcastNestedLoopJoin over 1
    row, free) — the q_tpch_q15 no-collect pattern; the per-part
    relation is persisted so the two consumers don't recompute the
    join. Threshold compares the exact DECIMAL sums; only the output
    is surfaced as DOUBLE."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_3", "NATION_7"))
        .select("n_nationkey")
    )
    pv = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_quantity")).cast(
                    "decimal(20,4)"
                )
            ).alias("v")
        )
        .persist()
    )
    total = pv.agg((F.lit(0.001) * F.sum("v")).alias("threshold"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("v") > F.col("threshold"))
        .select("partkey", F.col("v").cast("double").alias("part_value"))
    )


@query(
    "q_tpch_q2",
    oracle="""
        SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_type
        FROM part, supplier, lineitem, nation, region
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND p_size = 10
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND s_acctbal = (
              SELECT max(s2.s_acctbal)
              FROM supplier s2, lineitem l2, nation n2, region r2
              WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
                AND s2.s_nationkey = n2.n_nationkey
                AND n2.n_regionkey = r2.r_regionkey
                AND r2.r_name = 'ASIA')
    """,
)
def q_tpch_q2(spark, sf_dir):
    """TPC-H Q2 minimum-cost supplier, adapted: no partsupp, so "best
    supplier for a part" is the MAX-acctbal supplier among those who
    actually SHIPPED the part (lineitem as the part-supplier relation),
    within one region. The oracle keeps the textbook correlated
    MAX subquery; the Spark plan decorrelates it by hand: the distinct
    (part, supplier) shipped-pairs relation is built ONCE, the
    region-qualified supplier dim is broadcast into it, the per-part
    max is a single aggregate, and the winner join is on
    (partkey, acctbal) — no per-part subquery execution. The pairs
    relation is persisted: it feeds both the max and the winner side."""
    region_suppliers = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    pairs = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .join(
            F.broadcast(region_suppliers),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .persist()
    )
    best = pairs.groupBy(F.col("l_partkey").alias("bp")).agg(
        F.max("s_acctbal").alias("max_bal")
    )
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_size") == 10)
        .select("p_partkey", "p_type")
    )
    return (
        pairs.join(
            best,
            (F.col("l_partkey") == F.col("bp"))
            & (F.col("s_acctbal") == F.col("max_bal")),
        )
        .join(F.broadcast(p), pairs.l_partkey == p.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
        .distinct()
    )


@query(
    "q_tpch_q16",
    oracle="""
        SELECT p_brand, p_type, p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#3' AND p_size IN (1,5,10,15,20,25,30,35)
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
    """,
)
def q_tpch_q16(spark, sf_dir):
    """TPC-H Q16 parts/supplier relationship, adapted: "complaint"
    suppliers are the negative-balance ones (fixture has no s_comment).
    NOT IN becomes a broadcast LEFT ANTI join against the tiny excluded
    set (safe: s_suppkey is the PK, never NULL); part is pre-filtered
    and broadcast, so the only shuffle is the final distinct-count
    aggregate on the (brand, type, size) grouping."""
    excluded = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = (
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#3")
            & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(
            F.broadcast(excluded),
            li.l_suppkey == excluded.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q20",
    oracle="""
        SELECT s_name, s_acctbal
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_name LIKE 'red%'
            GROUP BY l_suppkey, p_partkey
            HAVING SUM(l_quantity) > (
                SELECT 3 * SUM(l2.l_quantity) / COUNT(DISTINCT l2.l_suppkey)
                FROM lineitem l2 WHERE l2.l_partkey = p_partkey))
    """,
)
def q_tpch_q20(spark, sf_dir):
    """TPC-H Q20 potential part promotion, adapted: a supplier
    qualifies if, for some 'red' part, their shipped quantity exceeds
    3x the part's mean per-supplier quantity (no partsupp availqty in
    the fixture). The oracle nests IN -> GROUP BY -> correlated scalar
    HAVING; Spark decorrelates to two aggregates over ONE semi-joined
    lineitem slice (per-(supplier,part) sums and per-part totals, both
    from the persisted red-part lineitems), a join on partkey, and a
    final semi join into supplier. Quantities are small exact integers
    stored as double, so SUM is order-independent without a decimal
    detour; the 3*sum/cnt threshold is evaluated in the same operand
    order in both engines."""
    red = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li_red = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .drop("p_partkey")
        .persist()
    )
    per_sp = li_red.groupBy("l_suppkey", "l_partkey").agg(
        F.sum("l_quantity").alias("sp_qty")
    )
    per_p = li_red.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("l_quantity").alias("p_qty"),
        F.countDistinct("l_suppkey").alias("p_supps"),
    )
    qualified = (
        per_sp.join(per_p, per_sp.l_partkey == per_p.pk)
        .filter(
            F.col("sp_qty") > F.lit(3.0) * F.col("p_qty") / F.col("p_supps")
        )
        .select("l_suppkey")
        .distinct()
    )
    s = load(spark, sf_dir, "supplier")
    return s.join(
        qualified, s.s_suppkey == qualified.l_suppkey, "left_semi"
    ).select("s_name", "s_acctbal")


@query(
    "q_tpch_q5",
    oracle="""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
)
def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5 local supplier volume: the canonical snowflake join —
    fact (lineitem) against four dims plus the c_nationkey=s_nationkey
    *cycle* edge that forces customer to stay joined until supplier
    arrives. Region/nation/supplier/customer all broadcast (each ≤ a
    few MB even at 100 TB fact scale), so the only shuffle is the final
    per-nation aggregate; the o_orderdate range predicate pushes into
    the orders parquet scan. Reference parity: the lake-side analytic
    SQL surface of `init_for_test.py:66-79` (any SQL over the mirror).
    """
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(c),
            (o.o_custkey == c.c_custkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")),
                20,
                4,
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )
