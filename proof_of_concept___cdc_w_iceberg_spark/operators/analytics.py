"""Customer/market analytics composites over the TPC-H-shaped tables.

The reference exposes its lake to arbitrary SQL (`init_for_test.py:66-79`);
these are the canonical BI composites a consumer would run on the mirrored
tables — segmentation (RFM), cohort value curves (LTV), and market
concentration (HHI) — each expressed with the engine's cross-portable
arithmetic rules (decimal sums, full-order tiebreakers) so the DuckDB
oracles hash-match.

Scale notes live per-operator; the common discipline: no global-order
window (ntile/rank always partitioned on a real dimension), monetary
sums always exact decimals, tiny dimension/total relations broadcast.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load

RFM_TILES = 5

RFM_SQL = f"""
    WITH ref AS (SELECT MAX(o_orderdate) AS ref_date FROM orders),
    base AS (
        SELECT c.c_custkey, c.c_nationkey,
               CAST(date_diff('day', MAX(o.o_orderdate), ref.ref_date) AS BIGINT)
                   AS recency_days,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS monetary
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        CROSS JOIN ref
        GROUP BY c.c_custkey, c.c_nationkey, ref.ref_date
    )
    SELECT c_custkey, c_nationkey, recency_days, n_orders, monetary,
           CAST(ntile({RFM_TILES}) OVER (PARTITION BY c_nationkey
                ORDER BY recency_days DESC, c_custkey) AS BIGINT) AS r_score,
           CAST(ntile({RFM_TILES}) OVER (PARTITION BY c_nationkey
                ORDER BY n_orders, c_custkey) AS BIGINT) AS f_score,
           CAST(ntile({RFM_TILES}) OVER (PARTITION BY c_nationkey
                ORDER BY monetary NULLS FIRST, c_custkey) AS BIGINT) AS m_score
    FROM base
"""


@query("q_orders_rfm", oracle=RFM_SQL)
def q_orders_rfm(spark, sf_dir):
    """RFM (recency / frequency / monetary) customer segmentation —
    the classic value-tiering composite run over a mirrored orders
    table. Scores are {RFM_TILES}-tiles WITHIN each nation (per-market
    segmentation), which is also the scale discipline: a GLOBAL ntile
    would be a single-partition window (the plan-sweep gate's
    forbidden shape); partitioning by the market dimension keeps the
    ranking distributed at any customer count.

    One groupBy(custkey) with exact decimal spend, the 1-row
    reference-date relation broadcast via crossJoin, then three
    partitioned ntile windows sharing ONE Exchange on nationkey
    (same partition key, compatible orderings evaluate in one window
    stage group). Full-order tiebreakers (custkey) make tile
    boundaries deterministic cross-engine."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    ref = o.agg(F.max("o_orderdate").alias("ref_date"))
    base = (
        o.join(c, o.o_custkey == c.c_custkey)
        .crossJoin(F.broadcast(ref))
        .groupBy("c_custkey", "c_nationkey", "ref_date")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("monetary"),
        )
        .select(
            "c_custkey",
            "c_nationkey",
            F.datediff("ref_date", "last_order").cast("long").alias("recency_days"),
            "n_orders",
            "monetary",
        )
    )
    wn = Window.partitionBy("c_nationkey")
    return base.select(
        "c_custkey",
        "c_nationkey",
        "recency_days",
        "n_orders",
        "monetary",
        F.ntile(RFM_TILES)
        .over(wn.orderBy(F.col("recency_days").desc(), F.col("c_custkey")))
        .cast("long")
        .alias("r_score"),
        F.ntile(RFM_TILES)
        .over(wn.orderBy(F.col("n_orders"), F.col("c_custkey")))
        .cast("long")
        .alias("f_score"),
        F.ntile(RFM_TILES)
        # NULLS FIRST pinned (r19 'nulls' tier): monetary is NULL for
        # a customer whose observed prices are all missing — lowest
        # value tier, and Spark/DuckDB defaults disagree unpinned.
        .over(wn.orderBy(F.col("monetary").asc_nulls_first(), F.col("c_custkey")))
        .cast("long")
        .alias("m_score"),
    )


LTV_SQL = """
    WITH firsts AS (
        SELECT o_custkey, MIN(date_trunc('month', o_orderdate)) AS cohort
        FROM orders GROUP BY o_custkey
    ),
    monthly AS (
        SELECT f.cohort,
               CAST(date_diff('month', f.cohort,
                              date_trunc('month', o.o_orderdate)) AS BIGINT)
                   AS month_offset,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS spend
        FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
        GROUP BY 1, 2
    )
    SELECT CAST(cohort AS DATE) AS cohort, month_offset, n_orders,
           CAST(spend AS DOUBLE) AS spend,
           CAST(SUM(spend) OVER (PARTITION BY cohort ORDER BY month_offset
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS cum_spend
    FROM monthly
"""


@query("q_cohort_ltv", oracle=LTV_SQL)
def q_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value curves: customers grouped by first-order
    month, spend accumulated by month offset — the monetary complement
    of q_retention's activity counts (the pair every growth dashboard
    is built on).

    The cohort assignment is one groupBy(custkey); cohort membership
    joins back on the same key (co-partitioned shuffle). The monthly
    aggregate is exact-decimal and map-combined to |cohorts × offsets|
    rows — TINY — so the cumulative window over that relation
    partitions by cohort and costs nothing at any fact-table scale.
    Decimal stays decimal through the running sum (order-independent),
    cast to double only for output."""
    o = load(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.min(F.trunc("o_orderdate", "month")).alias("cohort")
    )
    monthly = (
        o.join(firsts, "o_custkey")
        .groupBy(
            "cohort",
            (
                F.months_between(F.trunc("o_orderdate", "month"), F.col("cohort"))
            )
            .cast("long")
            .alias("month_offset"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend"),
        )
    )
    wc = (
        Window.partitionBy("cohort")
        .orderBy("month_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return monthly.select(
        F.col("cohort").cast("date").alias("cohort"),
        "month_offset",
        "n_orders",
        F.col("spend").cast("double").alias("spend"),
        F.sum("spend").over(wc).cast("double").alias("cum_spend"),
    )


HHI_SQL = """
    WITH rev AS (
        SELECT s.s_nationkey, l.l_suppkey,
               SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                        AS DECIMAL(28,6))) AS r
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT s_nationkey, SUM(r) AS rt,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers
        FROM rev GROUP BY 1
    )
    SELECT rev.s_nationkey, tot.n_suppliers,
           ROUND(SUM(CAST(
               (CAST(rev.r AS DOUBLE) / CAST(tot.rt AS DOUBLE))
               * (CAST(rev.r AS DOUBLE) / CAST(tot.rt AS DOUBLE))
               AS DECIMAL(38,18))), 6) AS hhi
    FROM rev JOIN tot ON tot.s_nationkey = rev.s_nationkey
    GROUP BY rev.s_nationkey, tot.n_suppliers
"""


@query("q_herfindahl", oracle=HHI_SQL)
def q_herfindahl(spark, sf_dir):
    """Herfindahl–Hirschman market-concentration index per supplier
    nation: Σ share² of supplier revenue — the concentration /
    dependency risk profile (a 100 TB-scale spend cube rolls this up
    per category × region).

    Revenue per (nation, supplier) is ONE exact-decimal map-combined
    aggregate off the broadcast-dimension join; nation totals
    re-aggregate those partials (monoid reuse — the fact table is
    scanned once); shares and their squares are identical double
    chains both engines, and the final Σshare² routes through
    DECIMAL(38,18) so addition order can't wiggle the 6dp round."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(28,6)"
                )
            ).alias("r")
        )
    )
    tot = rev.groupBy("s_nationkey").agg(
        F.sum("r").alias("rt"), F.count("*").alias("n_suppliers")
    )
    share = F.col("r").cast("double") / F.col("rt").cast("double")
    return (
        rev.join(F.broadcast(tot), "s_nationkey")
        .groupBy("s_nationkey", "n_suppliers")
        .agg(
            F.round(
                F.sum((share * share).cast("decimal(38,18)")), 6
            )
            # Final-cast back to DOUBLE (registry.py convention): DuckDB's
            # ROUND returns DOUBLE while Spark's decimal round stays
            # DECIMAL(27,6) — the r05 driver hash failure was exactly this
            # representation drift (values bit-match).
            .cast("double")
            .alias("hhi")
        )
    )


PARETO_T = 0.8  # revenue-coverage threshold

PARETO_SQL = f"""
    WITH spend AS (
        SELECT c.c_nationkey, o.o_custkey,
               SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS s
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT c_nationkey, o_custkey, s,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY s DESC, o_custkey) AS rn,
               SUM(s) OVER (PARTITION BY c_nationkey
                            ORDER BY s DESC, o_custkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_s,
               SUM(s) OVER (PARTITION BY c_nationkey) AS tot_s,
               COUNT(*) OVER (PARTITION BY c_nationkey) AS n_cust
        FROM spend
    )
    SELECT c_nationkey, CAST(n_cust AS BIGINT) AS n_customers,
           CAST(MIN(rn) AS BIGINT) AS n_top{int(PARETO_T * 100)},
           ROUND(CAST(MIN(rn) AS DOUBLE) / n_cust, 6) AS top_frac
    FROM ranked
    WHERE CAST(cum_s AS DOUBLE) / CAST(tot_s AS DOUBLE) >= {PARETO_T}
    GROUP BY c_nationkey, n_cust
"""


@query("q_orders_pareto", oracle=PARETO_SQL)
def q_orders_pareto(spark, sf_dir):
    """Pareto concentration per market: the smallest number of
    customers whose cumulative spend covers {int(PARETO_T * 100)}% of
    the nation's revenue (the '80/20' profile; q_herfindahl is the
    index form, this is the actionable head-count). MIN(rn) over the
    rows at-or-past the threshold is exactly the first rank reaching
    it — no loop, no quantile.

    Scale shape: exact-decimal spend per (nation, customer), then ONE
    nation-partitioned ordered window pass producing rank + running
    decimal share (order-independent accumulation), and a tiny
    aggregate. All windows share one Exchange on the nation key."""
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"))
    )
    wn = Window.partitionBy("c_nationkey")
    wo = wn.orderBy(F.col("s").desc(), F.col("o_custkey"))
    ranked = spend.select(
        "c_nationkey",
        F.row_number().over(wo).alias("rn"),
        F.sum("s")
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_s"),
        F.sum("s").over(wn).alias("tot_s"),
        F.count("*").over(wn).alias("n_cust"),
    )
    past = ranked.filter(
        F.col("cum_s").cast("double") / F.col("tot_s").cast("double") >= PARETO_T
    )
    return past.groupBy("c_nationkey", "n_cust").agg(
        F.min("rn").alias("top_n"),
        F.round(F.min("rn").cast("double") / F.col("n_cust").cast("double"), 6).alias("top_frac"),
    ).select(
        "c_nationkey",
        F.col("n_cust").cast("long").alias("n_customers"),
        F.col("top_n").cast("long").alias(f"n_top{int(PARETO_T * 100)}"),
        "top_frac",
    )
