"""Storage-layout operators: multi-dimensional clustering (Z-order).

The reference's at-rest model is Iceberg tables whose maintenance
story includes rewrite-with-sort-order compaction
(`connect-iceberg-sink.json:19-29`; Iceberg's ``rewrite_data_files``
with a z-order strategy). Here the operator is re-expressed
Spark-first: quantize two join/filter dimensions, interleave their
bits into a Morton (Z-order) key, and report per-z-bucket min/max
envelopes — exactly the file-level statistics a lake writer would
persist for data skipping. ``repartitionByRange(zorder_key)`` before
the write turns these buckets into physical files; the query returns
the envelope stats so correctness is oracle-checkable.

Why it matters at 100 TB: a linear sort on one column gives perfect
skipping on that column and none on the second; Z-order gives
near-rectangular envelopes on BOTH, so predicates on either dimension
prune most files. The envelope widths this query outputs are the
direct measure of that pruning power.

All arithmetic is engine-portable (floor/div/mod on exact doubles),
shared verbatim between the Spark plan and the DuckDB oracle.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load


def _dpp_fact_path(spark, sf_dir: str) -> str:
    """Month-partitioned lineitem fixture for q_scan_dpp, written once
    per sf_dir into a deterministic temp location (_SUCCESS marks a
    complete write; a torn dir is rewritten)."""
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    path = os.path.join(
        tempfile.gettempdir(), f"dpp_fact_{tag}", "lineitem_by_month"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        li = load(spark, sf_dir, "lineitem").select(
            F.month("l_shipdate").cast("int").alias("ship_month"),
            "l_extendedprice",
            "l_discount",
        )
        li.write.mode("overwrite").partitionBy("ship_month").parquet(path)
    return path

ZBITS = 8       # 8 bits per dimension -> 16-bit Morton key, 0..65535
ZBUCKET_DIV = 1024  # z >> 10: 64 buckets ~ 64 target files


def _morton_sql(x: str, y: str) -> str:
    """Bit-interleave two ZBITS-wide non-negative ints with pure
    integer arithmetic (floor/div/mod) so the SAME string runs in
    Spark SQL and DuckDB — no engine-specific bit operators."""
    terms = []
    for i in range(ZBITS):
        terms.append(f"(CAST(floor({x} / {1 << i}) AS BIGINT) % 2) * {4 ** i}")
        terms.append(f"(CAST(floor({y} / {1 << i}) AS BIGINT) % 2) * {2 * 4 ** i}")
    return "(" + " + ".join(terms) + ")"


# Quantize a value into [0, 2^ZBITS) given min/max columns. The +1 on
# the range keeps the max value inside the top bin. Exact in doubles
# for key ranges up to 2^52 — far beyond any key space here.
def _quant_sql(v: str, vmin: str, vmax: str) -> str:
    return (
        f"CAST(floor(({v} - {vmin}) * {1 << ZBITS}.0 / "
        f"({vmax} - {vmin} + 1)) AS BIGINT)"
    )


_XQ = _quant_sql("l_partkey", "x_min", "x_max")
_YQ = _quant_sql("l_suppkey", "y_min", "y_max")
_Z = _morton_sql("xq", "yq")


@query(
    "q_layout_zorder",
    oracle=f"""
        WITH stats AS (
            SELECT MIN(l_partkey) AS x_min, MAX(l_partkey) AS x_max,
                   MIN(l_suppkey) AS y_min, MAX(l_suppkey) AS y_max
            FROM lineitem
        ),
        quant AS (
            SELECT {_XQ} AS xq, {_YQ} AS yq, l_partkey, l_suppkey
            FROM lineitem, stats
        ),
        keyed AS (
            SELECT CAST(floor({_Z} / {ZBUCKET_DIV}) AS BIGINT) AS zbucket,
                   l_partkey, l_suppkey
            FROM quant
        )
        SELECT zbucket,
               COUNT(*) AS n,
               MIN(l_partkey) AS pk_lo, MAX(l_partkey) AS pk_hi,
               MIN(l_suppkey) AS sk_lo, MAX(l_suppkey) AS sk_hi
        FROM keyed GROUP BY zbucket
    """,
)
def q_layout_zorder(spark, sf_dir):
    """Z-order layout planning over lineitem(l_partkey, l_suppkey):
    per-z-bucket row counts and min/max envelopes on both dimensions —
    the data-skipping statistics a z-ordered rewrite would persist per
    file.

    Scale shape: one tiny global min/max agg (broadcast back as a
    1-row literal relation — no driver round-trip in the plan, the
    crossJoin of a 1-row side is a broadcast), then a single
    map-side-combinable groupBy on the 64 z-buckets. The quantize +
    interleave arithmetic is all JVM whole-stage-codegen; the actual
    physical rewrite at scale is `df.repartitionByRange(64, zkey)
    .sortWithinPartitions(zkey).write` using this exact key."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    stats = li.agg(
        F.min("l_partkey").alias("x_min"),
        F.max("l_partkey").alias("x_max"),
        F.min("l_suppkey").alias("y_min"),
        F.max("l_suppkey").alias("y_max"),
    )
    quant = li.crossJoin(F.broadcast(stats)).select(
        F.expr(_XQ).alias("xq"),
        F.expr(_YQ).alias("yq"),
        "l_partkey",
        "l_suppkey",
    )
    keyed = quant.select(
        F.expr(f"CAST(floor({_Z} / {ZBUCKET_DIV}) AS BIGINT)").alias("zbucket"),
        "l_partkey",
        "l_suppkey",
    )
    return keyed.groupBy("zbucket").agg(
        F.count("*").alias("n"),
        F.min("l_partkey").alias("pk_lo"),
        F.max("l_partkey").alias("pk_hi"),
        F.min("l_suppkey").alias("sk_lo"),
        F.max("l_suppkey").alias("sk_hi"),
    )


@query(
    "q_scan_dpp",
    oracle="""
        WITH fact AS (
            SELECT CAST(month(l_shipdate) AS INT) AS ship_month,
                   l_extendedprice, l_discount
            FROM lineitem
        ),
        months AS (
            SELECT DISTINCT CAST(month(o_orderdate) AS INT) AS ship_month
            FROM orders
            WHERE o_orderpriority = '1-URGENT'
              AND year(o_orderdate) = 1995 AND month(o_orderdate) <= 3
        )
        SELECT f.ship_month,
               CAST(SUM(CAST(f.l_extendedprice * (1 - f.l_discount)
                    AS DECIMAL(20,4))) AS DOUBLE) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM fact f JOIN months USING (ship_month)
        GROUP BY f.ship_month
    """,
)
def q_scan_dpp(spark, sf_dir):
    """Dynamic partition pruning: the fact table is WRITTEN partitioned
    by ship month (the lake layout a 100 TB fact table would use), and
    the month list comes from a runtime-filtered dimension — so
    Catalyst injects a dynamicpruning# subquery into the fact scan and
    only the matching partition directories are read. The static-file
    twin of Iceberg's partition-spec pruning; verified by a plan gate
    in tests (``PartitionFilters: [... dynamicpruning#...]``).

    At 100 TB this is THE dominant cost lever on date-partitioned
    facts: without DPP the scan reads every partition and discards
    rows post-join; with it a 3-month probe touches 3/12 of the data
    regardless of cluster size. The month-partitioned fixture is
    written ONCE per sf_dir (cached by deterministic path + _SUCCESS
    marker) so repeated bench/correctness sweeps measure the pruned
    scan, not the fixture rewrite, and don't leak temp dirs; a lake
    deployment reads the already-partitioned table."""
    fact = spark.read.parquet(_dpp_fact_path(spark, sf_dir))
    months = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.year("o_orderdate") == 1995)
            & (F.month("o_orderdate") <= 3)
        )
        .select(F.month("o_orderdate").cast("int").alias("ship_month"))
        .distinct()
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        fact.join(F.broadcast(months), "ship_month")
        .groupBy("ship_month")
        .agg(
            F.sum(rev.cast("decimal(20,4)")).cast("double").alias("revenue"),
            F.count("*").cast("long").alias("n"),
        )
    )


ZONES = 32  # range-partition count modeled by the zone map


ZONEMAP_SQL = f"""
    WITH li AS (
        SELECT l_shipdate AS d, l_extendedprice AS p FROM lineitem
    ),
    stats AS (SELECT MIN(d) AS d_lo, MAX(d) AS d_hi FROM li),
    zoned AS (
        SELECT LEAST(CAST(FLOOR(date_diff('day', d_lo, d)
                          / ((date_diff('day', d_lo, d_hi) + 1) / {ZONES}.0))
                          AS BIGINT), {ZONES - 1}) AS zone,
               d, p
        FROM li, stats
    ),
    zm AS (
        SELECT zone, CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(d) AS d_min, MAX(d) AS d_max,
               MIN(p) AS p_min, MAX(p) AS p_max
        FROM zoned GROUP BY zone
    )
    SELECT zone, n_rows, d_min, d_max, p_min, p_max,
           (d_min <= DATE '1995-12-31' AND d_max >= DATE '1995-01-01')
               AS scan_date_pred,
           (p_max >= 90000.0) AS scan_price_pred
    FROM zm
"""


@query("q_zonemap_prune", oracle=ZONEMAP_SQL)
def q_zonemap_prune(spark, sf_dir):
    """Zone-map (file-statistics) pruning report for a range-clustered
    layout — the data-skipping half of the Iceberg maintenance story
    (`connect-iceberg-sink.json:19-29`; Iceberg manifests carry
    exactly these per-file min/max envelopes).

    The table is zoned by equal date ranges — the zones a
    ``repartitionByRange(l_shipdate)`` write would produce as files —
    and for each zone the query emits its min/max envelope on BOTH the
    cluster dimension (shipdate) and an uncorrelated one (price), plus
    the may-contain verdict for two predicates. The output IS the
    pruning analysis: the 1995 date predicate keeps only the zones
    whose envelope overlaps the year (a ~1/7 read at these fixtures),
    while the price predicate keeps nearly every zone — the measured
    argument for clustering on the dimension you filter by (and for
    Z-order when you filter on both, q_layout_zorder).

    One 1-row min/max broadcast + one map-combinable groupBy(zone):
    the shuffle carries ≤{ZONES} zone partials per task at any scale.
    """
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_shipdate").alias("d"), F.col("l_extendedprice").alias("p")
    )
    stats = li.agg(F.min("d").alias("d_lo"), F.max("d").alias("d_hi"))
    zoned = li.crossJoin(F.broadcast(stats)).select(
        F.least(
            F.floor(
                F.datediff(F.col("d"), F.col("d_lo"))
                / ((F.datediff(F.col("d_hi"), F.col("d_lo")) + 1) / float(ZONES))
            ).cast("long"),
            F.lit(ZONES - 1).cast("long"),
        ).alias("zone"),
        "d",
        "p",
    )
    zm = zoned.groupBy("zone").agg(
        F.count("*").alias("n_rows"),
        F.min("d").alias("d_min"),
        F.max("d").alias("d_max"),
        F.min("p").alias("p_min"),
        F.max("p").alias("p_max"),
    )
    return zm.select(
        "zone",
        "n_rows",
        "d_min",
        "d_max",
        "p_min",
        "p_max",
        (
            (F.col("d_min") <= F.lit("1995-12-31").cast("date"))
            & (F.col("d_max") >= F.lit("1995-01-01").cast("date"))
        ).alias("scan_date_pred"),
        (F.col("p_max") >= 90000.0).alias("scan_price_pred"),
    )
