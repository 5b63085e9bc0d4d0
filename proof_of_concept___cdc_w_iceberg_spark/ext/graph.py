"""EXT — iterative graph analytics over relational data.

PageRank over the nation-level trade graph (supplier nation → customer
nation, weighted by shipped lineitems). The reference exposes arbitrary
SQL over the lake (`init_for_test.py:66-79`); iterative graph measures
are the canonical workload that SQL alone can't express but a Spark
driver loop composes naturally — each iteration is one join + one
aggregate on the (persisted) edge relation, and the loop unrolls into a
single lazy plan.

Determinism across engines: every per-node mass sum casts its addends
(products of identical IEEE doubles) to DECIMAL(38,18) before SUM, so
accumulation is exact and order-independent; the damping arithmetic is
the same double-op chain in both engines. Node count and teleport mass
flow through 1-row broadcasts — no driver collect.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load

PR_DAMPING = 0.85
PR_ITERS = 3

_PR_PREFIX = """
    WITH edges AS (
        SELECT s_nationkey AS src, c_nationkey AS dst, count(*) AS w
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        GROUP BY 1, 2
    ),
    outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
    p AS (
        SELECT src, dst, CAST(w AS DOUBLE) / ow AS p
        FROM edges JOIN outw USING (src)
    ),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nation),
    r0 AS (
        SELECT n_nationkey AS v, 1.0 / n AS r FROM nation CROSS JOIN nn
    )
"""


def _pr_iter_sql(i: int) -> str:
    return f"""
    r{i} AS (
        SELECT nd.n_nationkey AS v,
               (1 - {PR_DAMPING}) / n
               + {PR_DAMPING} * CAST(coalesce(SUM(
                     CAST(r{i - 1}.r * p.p AS DECIMAL(38,18))), 0)
                 AS DOUBLE) AS r
        FROM nation nd
        CROSS JOIN nn
        LEFT JOIN p ON p.dst = nd.n_nationkey
        LEFT JOIN r{i - 1} ON r{i - 1}.v = p.src
        GROUP BY nd.n_nationkey, n
    )
"""


PAGERANK_ORACLE = (
    _PR_PREFIX
    + ","
    + ",".join(_pr_iter_sql(i) for i in range(1, PR_ITERS + 1))
    + f"""
    SELECT n_nationkey, n_name, ROUND(r{PR_ITERS}.r, 8) AS pagerank
    FROM r{PR_ITERS} JOIN nation ON v = n_nationkey
"""
)


@query("q_graph_pagerank", oracle=PAGERANK_ORACLE)
def q_graph_pagerank(spark, sf_dir):
    """{PR_ITERS}-iteration PageRank (d={PR_DAMPING}) over the
    supplier-nation → customer-nation trade graph. The edge/transition
    relation is derived ONCE from the fact tables (one shuffle) and
    persisted — each iteration is then a broadcast join of the current
    rank vector into the edges plus one exact-decimal aggregate keyed
    on dst; the driver loop only *composes* the plan, no rank value
    ever leaves the executors. At a billion-edge scale the same loop
    holds: edges stay partitioned by src, the rank vector (|nodes|)
    broadcasts, and each iteration costs one map-combined aggregate.

    A LEFT join from the node table keeps rank mass for sink nations
    (no in-edges → pure teleport mass), mirroring the oracle's LEFT
    JOIN; dangling-node redistribution is intentionally omitted on
    both sides (simplified PageRank)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
        .agg(F.count("*").alias("w"))
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    p = (
        edges.join(outw, "src")
        .select("src", "dst", (F.col("w").cast("double") / F.col("ow")).alias("p"))
        .persist()
    )
    nn = nation.agg(F.count("*").cast("double").alias("n"))
    rank = nation.crossJoin(F.broadcast(nn)).select(
        F.col("n_nationkey").alias("v"), (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(PR_ITERS):
        contrib = p.join(
            F.broadcast(rank), p.src == F.col("v")
        ).select("dst", (F.col("r") * F.col("p")).alias("m"))
        inmass = contrib.groupBy("dst").agg(
            F.sum(F.col("m").cast("decimal(38,18)")).alias("mass")
        )
        rank = (
            nation.join(inmass, nation.n_nationkey == inmass.dst, "left")
            .crossJoin(F.broadcast(nn))
            .select(
                F.col("n_nationkey").alias("v"),
                (
                    (1 - PR_DAMPING) / F.col("n")
                    + PR_DAMPING
                    * F.coalesce(
                        F.col("mass").cast("double"), F.lit(0.0)
                    )
                ).alias("r"),
            )
        )
    return rank.join(
        F.broadcast(nation), rank.v == nation.n_nationkey
    ).select("n_nationkey", "n_name", F.round("r", 8).alias("pagerank"))
