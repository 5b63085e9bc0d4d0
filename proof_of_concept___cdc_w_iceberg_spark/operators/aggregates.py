"""§2.4 — aggregation.

General SQL surface (SURVEY.md §2.4). Spark plans every groupBy as
partial (map-side) + final aggregation automatically — at 100 TB the
shuffle carries only per-partition partial states, not rows.

Double sums are routed through DECIMAL casts so results are
order-independent and bit-equal to the DuckDB oracle (see _util.py).
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load
from ._util import avg_sql, d2dec_sql, dec2d_sql, dec_avg, dec_sum, rdiv, rdiv_sql


@query(
    "q_agg_count",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(l_orderkey) AS BIGINT) AS n_keys
        FROM lineitem
    """,
)
def q_agg_count(spark, sf_dir):
    """COUNT(*) / COUNT(col) (cf. existence count `init_for_test.py:84`)."""
    return load(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("n_rows"), F.count("l_orderkey").alias("n_keys")
    )


@query(
    "q_agg_groupby",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
               {avg_sql("l_quantity", "COUNT(l_quantity)", 18, 2, 4)} AS avg_qty,
               MIN(l_extendedprice) AS min_price,
               MAX(l_extendedprice) AS max_price,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_groupby(spark, sf_dir):
    """Hash group-by with sum/avg/min/max (TPC-H Q1 shape) — the
    headline pricing-summary aggregation."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_price"),
            dec_avg("l_quantity").alias("avg_qty"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "q_agg_distinct",
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps
        FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_distinct(spark, sf_dir):
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
    )


@query(
    "q_agg_approx_distinct",
    oracle="""
        SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
               1 AS approx_within_5pct
        FROM lineitem
    """,
)
def q_agg_approx_distinct(spark, sf_dir):
    """HLL++ approximate count-distinct (EXT scale mandate). Engines'
    sketches differ, so the hash-checked output is the *contract*:
    exact count + a flag that the approximation landed within 5%."""
    df = load(spark, sf_dir, "lineitem").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
    )
    return df.select(
        "exact_parts",
        F.when(
            (F.abs(F.col("approx_parts") - F.col("exact_parts"))
             / F.col("exact_parts")) < 0.05,
            1,
        )
        .otherwise(0)
        .alias("approx_within_5pct"),
    )


@query(
    "q_agg_having",
    oracle="""
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_custkey
        HAVING COUNT(*) >= 12
    """,
)
def q_agg_having(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 12)
    )


@query(
    "q_agg_rollup",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark, sf_dir):
    return (
        load(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dec_sum("l_quantity").alias("sum_qty"), F.count("*").alias("n_rows"))
    )


@query(
    "q_agg_cube",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_agg_cube(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(dec_sum("o_totalprice").alias("sum_price"), F.count("*").alias("n_orders"))
    )


@query(
    "q_agg_grouping_sets",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_agg_grouping_sets(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "q_agg_collect",
    oracle="""
        SELECT l_returnflag,
               array_to_string(list_sort(list_distinct(list(l_linestatus))), ',')
                   AS statuses,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_collect(spark, sf_dir):
    """collect_set canonicalized (sorted + joined) so the multiset hash
    is order-insensitive across engines."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.array_join(F.sort_array(F.collect_set("l_linestatus")), ",").alias(
                "statuses"
            ),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "q_agg_approx_quantile",
    oracle="""
        SELECT CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE) AS exact_p50,
               CAST(quantile_cont(l_extendedprice, 0.95) AS DOUBLE) AS exact_p95,
               1 AS approx_within_2pct
        FROM lineitem
    """,
)
def q_agg_approx_quantile(spark, sf_dir):
    """Approximate percentiles (the distribution sketch a training
    pipeline runs over doc lengths / scores at 100 TB). Sketches differ
    across engines, so the hash-checked contract is: exact quantiles +
    a flag that the approximation landed within 2% relative error
    (accuracy parameter 10000 => eps 1e-4, generous margin)."""
    li = load(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("exact_p95"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("a50"),
        F.expr("approx_percentile(l_extendedprice, 0.95, 10000)").alias("a95"),
    )
    ok = (
        (F.abs(F.col("a50") - F.col("exact_p50")) / F.col("exact_p50") < 0.02)
        & (F.abs(F.col("a95") - F.col("exact_p95")) / F.col("exact_p95") < 0.02)
    )
    return exact.select(
        "exact_p50", "exact_p95",
        F.when(ok, 1).otherwise(0).alias("approx_within_2pct"),
    )


@query(
    "q_sample_stratified",
    oracle="""
        WITH strata AS (
            SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_total
            FROM orders GROUP BY 1
        )
        SELECT o_orderpriority, n_total, 1 AS sample_ok
        FROM strata
    """,
)
def q_sample_stratified(spark, sf_dir):
    """Stratified sampling (seeded sampleBy) — the class-balanced
    subset draw of a training pipeline. The RNG is engine-specific, so
    the contract is per-stratum: population count (exact) + a flag that
    the seeded 10% sample landed within a BINOMIAL bound of
    expectation — |n_sampled − 0.1·n| ≤ 4.5·√(0.1·0.9·n) + 1. The
    r16-era ±50% band was a fixed-fraction bound that a legitimate
    Bin(40, 0.1) draw violates ~19% of the time (caught by the r18
    forced-size fuzz tier at 40-row strata); the σ-scaled bound keeps
    the false-alarm rate ~1e-5 at EVERY stratum size. Determinism of
    the seed itself is covered by the driver running the query twice."""
    o = load(spark, sf_dir, "orders")
    fracs = {r[0]: 0.1 for r in o.select("o_orderpriority").distinct().collect()}
    sample = o.sampleBy("o_orderpriority", fractions=fracs, seed=42)
    got = sample.groupBy("o_orderpriority").agg(F.count("*").alias("n_sampled"))
    totals = o.groupBy("o_orderpriority").agg(F.count("*").alias("n_total"))
    joined = totals.join(got, "o_orderpriority", "left").fillna(0, ["n_sampled"])
    tol = F.lit(4.5) * F.sqrt(F.col("n_total") * F.lit(0.09)) + F.lit(1.0)
    ok = F.abs(F.col("n_sampled") - F.col("n_total") * F.lit(0.1)) <= tol
    return joined.select(
        "o_orderpriority", "n_total", F.when(ok, 1).otherwise(0).alias("sample_ok")
    )


@query(
    "q_agg_median",
    oracle="""
        SELECT l_returnflag,
               ROUND(CAST(median(l_extendedprice) AS DOUBLE), 4) AS median_price,
               ROUND(CAST(quantile_cont(l_extendedprice, 0.9) AS DOUBLE), 4) AS p90_price
        FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_median(spark, sf_dir):
    """Exact median + continuous p90 per group. Sort-based exact
    percentiles — deterministic on both engines (interpolated at even
    counts), unlike the sketch path q_agg_approx_quantile covers."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4)
            .alias("median_price"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4)
            .alias("p90_price"),
        )
    )


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@query(
    "q_pivot",
    oracle="""
        SELECT o_orderstatus,
               CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS "1-URGENT",
               CAST(COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS BIGINT) AS "2-HIGH",
               CAST(COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS BIGINT) AS "3-MEDIUM",
               CAST(COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS "4-NOT SPECIFIED",
               CAST(COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS "5-LOW"
        FROM orders GROUP BY o_orderstatus
    """,
)
def q_pivot(spark, sf_dir):
    """PIVOT: long-to-wide reshaping (status x priority counts). The
    value list is explicit — Spark then pivots in ONE aggregation pass
    without the extra distinct-values job, and the output schema is
    stable for the oracle. Missing combos coalesce to 0 (Spark pivots
    them to NULL, DuckDB's FILTER counts 0)."""
    piv = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderstatus",
        *[F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(p) for p in _PRIORITIES],
    )


@query(
    "q_unpivot",
    oracle="""
        WITH wide AS (
            SELECT l_returnflag,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
                   CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
        UNION ALL
        SELECT l_returnflag, 'sum_price' AS measure, sum_price AS value FROM wide
        UNION ALL
        SELECT l_returnflag, 'sum_disc' AS measure, sum_disc AS value FROM wide
    """,
)
def q_unpivot(spark, sf_dir):
    """UNPIVOT/melt: wide-to-long reshaping, the inverse of q_pivot.
    Spark's native ``unpivot`` emits all measures per input row in one
    pass — no self-union of N scans (the oracle's UNION ALL form reads
    the 6-row aggregate thrice; at lake scale the single-pass shape is
    the one that matters)."""
    wide = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_price"),
            dec_sum("l_discount").alias("sum_disc"),
        )
    )
    return wide.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "sum_disc"],
        "measure", "value",
    )


@query(
    "q_sample_reservoir",
    oracle="""
        WITH ranked AS (
            SELECT doc_id, source,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rn
            FROM documents
        )
        SELECT doc_id, source FROM ranked WHERE rn <= 2
    """,
)
def q_sample_reservoir(spark, sf_dir):
    """Deterministic per-group 'reservoir' sample: k=2 docs per source,
    selected by md5(doc_id) order — a seedable, engine-independent
    stand-in for random sampling that is reproducible across reruns
    and engines (the property a curation pipeline needs for audits).
    One hash + one per-group top-k window; at scale the window's
    per-partition top-k avoids a global sort."""
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("doc_id", "source")
    )


@query(
    "q_agg_stats",
    oracle="""
        WITH s AS (
            SELECT l_returnflag,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,8)))
                        AS DOUBLE) AS sxx,
                   CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,8)))
                        AS DOUBLE) AS syy,
                   CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(30,8)))
                        AS DOUBLE) AS sxy
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag,
               ROUND((sxy - sx * sy / n) / (n - 1), 4) AS covar_qty_price,
               ROUND((sxy - sx * sy / n)
                     / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6)
                   AS corr_qty_price,
               ROUND(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_qty
        FROM s
    """,
)
def q_agg_stats(spark, sf_dir):
    """Statistical aggregates (covariance / correlation / stddev) per
    group. Built from decimal-EXACT co-moment sums (Σx, Σy, Σxy, Σx²,
    Σy²) + closed-form arithmetic — order-independent and so
    cross-engine hash-stable, unlike the engines' native covar/corr
    accumulators whose float summation order differs. Same single
    shuffle + map-side partials as any groupBy."""
    li = load(spark, sf_dir, "lineitem")
    qd = F.col("l_quantity")
    pd_ = F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(qd.cast("decimal(24,6)")).cast("double").alias("sx"),
        F.sum(pd_.cast("decimal(24,6)")).cast("double").alias("sy"),
        F.sum((qd * qd).cast("decimal(30,8)")).cast("double").alias("sxx"),
        F.sum((pd_ * pd_).cast("decimal(30,8)")).cast("double").alias("syy"),
        F.sum((qd * pd_).cast("decimal(30,8)")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return s.select(
        "l_returnflag",
        F.round((sxy - sx * sy / n) / (n - F.lit(1.0)), 4)
        .alias("covar_qty_price"),
        F.round(
            (sxy - sx * sy / n)
            / F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6
        ).alias("corr_qty_price"),
        F.round(F.sqrt((sxx - sx * sx / n) / (n - F.lit(1.0))), 6)
        .alias("stddev_qty"),
    )


# --- q_profile: column-profile metadata scan ------------------------
# (column, kind) drives both the Spark aggregate and the oracle text.
# Formatting rule per kind keeps min/max strings canonical across
# engines: ints/strings cast directly, doubles via DECIMAL(18,2)
# (fixed-scale rendering), timestamps via an explicit strftime format.
_PROFILE_COLS = [
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "dbl"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def _profile_oracle() -> str:
    aggs, rows = [], []
    for c, kind in _PROFILE_COLS:
        if kind == "dbl":
            fmt = "CAST(CAST({f}({c}) AS DECIMAL(18,2)) AS VARCHAR)"
        elif kind == "ts":
            fmt = "strftime({f}({c}), '%Y-%m-%d %H:%M:%S')"
        else:
            fmt = "CAST({f}({c}) AS VARCHAR)"
        aggs.append(
            f"count(*) - count({c}) AS {c}_nu, "
            f"count(distinct {c}) AS {c}_nd, "
            + fmt.format(f="min", c=c) + f" AS {c}_mn, "
            + fmt.format(f="max", c=c) + f" AS {c}_mx"
        )
        rows.append(
            f"SELECT '{c}' AS col_name, CAST({c}_nu AS BIGINT) AS n_null, "
            f"CAST({c}_nd AS BIGINT) AS n_distinct, "
            f"{c}_mn AS min_val, {c}_mx AS max_val FROM a"
        )
    return (
        "WITH a AS (SELECT " + ", ".join(aggs) + " FROM orders) "
        + " UNION ALL ".join(rows)
    )


@query("q_profile", oracle=_profile_oracle())
def q_profile(spark, sf_dir):
    """Table profiling (data-quality scan): per-column null count,
    exact distinct count, and canonically-formatted min/max — the
    metadata pass a pipeline runs before trusting a new feed.

    ONE scan computes all 24 aggregates (Catalyst plans the multi-
    DISTINCT via a single Expand — 6x row multiplication, still one
    pass over storage and map-side partials); the 1-row result is then
    unpivoted driver-free with ``stack``. At 100 TB the exact distincts
    swap to approx_count_distinct — kept exact here because the oracle
    compares values."""
    o = load(spark, sf_dir, "orders")
    aggs = []
    for c, kind in _PROFILE_COLS:
        if kind == "dbl":
            fmt = lambda f, c=c: f(c).cast("decimal(18,2)").cast("string")
        elif kind == "ts":
            fmt = lambda f, c=c: F.date_format(f(c), "yyyy-MM-dd HH:mm:ss")
        else:
            fmt = lambda f, c=c: f(c).cast("string")
        aggs += [
            (F.count("*") - F.count(c)).alias(f"{c}_nu"),
            F.count_distinct(F.col(c)).alias(f"{c}_nd"),
            fmt(F.min).alias(f"{c}_mn"),
            fmt(F.max).alias(f"{c}_mx"),
        ]
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}_nu, {c}_nd, {c}_mn, {c}_mx" for c, _ in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) "
        "AS (col_name, n_null, n_distinct, min_val, max_val)"
    )


HIST_BINS = 32

# Portable fixed-width binning (no width_bucket: DuckDB and Spark
# disagree on its edge semantics; plain arithmetic is identical in
# both). Values at the max clamp into the top bin.
_HIST_BUCKET = (
    f"CAST(least(floor((l_extendedprice - lo) * {HIST_BINS} / (hi - lo + 1e-9)),"
    f" {HIST_BINS - 1}) AS BIGINT)"
)


@query(
    "q_histogram",
    oracle=f"""
        WITH stats AS (
            SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
            FROM lineitem
        )
        SELECT {_HIST_BUCKET} AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(MIN(l_extendedprice), 2) AS bin_min,
               ROUND(MAX(l_extendedprice), 2) AS bin_max
        FROM lineitem, stats
        GROUP BY 1
    """,
)
def q_histogram(spark, sf_dir):
    """Equi-width histogram of l_extendedprice ({HIST_BINS} bins): the
    data-profiling primitive behind NDV/skew dashboards and bin-packed
    length bucketing in training pipelines.

    Scale shape: one tiny global min/max agg broadcast back (1-row
    crossJoin — no driver round-trip), then a map-side-combinable
    groupBy on at most {HIST_BINS} keys: the shuffle carries 32 partial
    states per task regardless of input size. The per-bin min/max
    output doubles as the correctness witness for the bin edges."""
    li = load(spark, sf_dir, "lineitem").select("l_extendedprice")
    stats = li.agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    )
    return (
        li.crossJoin(F.broadcast(stats))
        .select(F.expr(_HIST_BUCKET).alias("bucket"), "l_extendedprice")
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.min("l_extendedprice"), 2).alias("bin_min"),
            F.round(F.max("l_extendedprice"), 2).alias("bin_max"),
        )
    )


@query(
    "q_agg_mode",
    oracle="""
        WITH counts AS (
            SELECT c_mktsegment, c_nationkey, CAST(COUNT(*) AS BIGINT) AS n
            FROM customer GROUP BY 1, 2
        ),
        ranked AS (
            SELECT c_mktsegment, c_nationkey, n,
                   row_number() OVER (PARTITION BY c_mktsegment
                                      ORDER BY n DESC, c_nationkey) AS rn
            FROM counts
        )
        SELECT c_mktsegment, c_nationkey AS mode_nation, n AS mode_n
        FROM ranked WHERE rn = 1
    """,
)
def q_agg_mode(spark, sf_dir):
    """Per-group mode (most frequent value) with a deterministic
    smallest-value tie-break — built-in ``mode()`` is tie-arbitrary,
    so it is re-expressed as count + row_number for a stable,
    oracle-checkable answer.

    Scale shape: the count groupBy pre-shrinks each segment to its
    distinct values BEFORE the window, so the row_number runs over
    |distinct values| rows, not |input| — at 100 TB the window input
    is ~25 nations x 5 segments, trivially small, and the heavy lift
    stays in the map-side-combinable count."""
    counts = (
        load(spark, sf_dir, "customer")
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(F.count("*").cast("long").alias("n"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("n"), "c_nationkey")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("c_nationkey").alias("mode_nation"),
            F.col("n").alias("mode_n"),
        )
    )


@query(
    "q_agg_bool",
    oracle="""
        SELECT o_orderpriority,
               bool_and(o_totalprice > 1000) AS all_over_1k,
               bool_or(o_orderstatus = 'F') AS any_finished,
               CAST(count_if(o_custkey % 2 = 0) AS BIGINT) AS n_even_cust,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_bool(spark, sf_dir):
    """Boolean/conditional aggregates: every() / any_value-style
    bool_and/bool_or plus count_if — the assertion aggregates data
    quality gates are written in (\"ALL rows satisfy X\", \"at least
    one Y\"). Map-side combinable like any other aggregate; at 100 TB
    a quality gate over a full table shuffles |groups| booleans."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.every(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            F.some(F.col("o_orderstatus") == "F").alias("any_finished"),
            F.count_if(F.col("o_custkey") % 2 == 0).cast("long").alias("n_even_cust"),
            F.count("*").cast("long").alias("n"),
        )
    )


N_SALTS = 8  # distinct-agg salt fan-out


@query(
    "q_distinct_salted",
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
        FROM lineitem GROUP BY l_returnflag
    """,
)
def q_distinct_salted(spark, sf_dir):
    """Two-stage salted exact-distinct for hot groups: stage 1
    deduplicates (key, salt, value) partitions — the heavy shuffle is
    spread over N_SALTS sub-keys per hot group instead of one reducer
    — stage 2 sums the per-salt distinct counts (correct because the
    salt is derived from the VALUE, so each distinct value lands in
    exactly one salt partition and the counts are disjoint).

    This is the scale pattern for COUNT(DISTINCT) over skewed keys
    (3 return-flag groups over 600 k rows here; at 100 TB a handful of
    mega-groups): Spark's single-stage distinct puts each group's
    whole value set through one reducer, the salted form bounds every
    task at |group|/N_SALTS. Oracle = the plain distinct count,
    proving the rewrite is exact."""
    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_partkey")
    salted = li.withColumn("salt", F.pmod(F.hash("l_partkey"), F.lit(N_SALTS)))
    stage1 = (
        salted.groupBy("l_returnflag", "salt")
        .agg(F.countDistinct("l_partkey").alias("n_d"))
    )
    return (
        stage1.groupBy("l_returnflag")
        .agg(F.sum("n_d").cast("long").alias("n_parts"))
    )


@query(
    "q_benford",
    oracle="""
        WITH digits AS (
            SELECT CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT)
                               AS VARCHAR), 1, 1) AS INT) AS d
            FROM lineitem WHERE l_extendedprice >= 1
        ),
        counts AS (
            SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY d
        ),
        tot AS (SELECT SUM(n) AS t FROM counts)
        SELECT d, n,
               ROUND(n / CAST(t AS DOUBLE), 6) AS observed,
               ROUND(log10(1.0 + 1.0 / d), 6) AS benford
        FROM counts, tot
    """,
)
def q_benford(spark, sf_dir):
    """First-digit (Benford) distribution of l_extendedprice — the
    data-forensics screen for fabricated or truncated numeric columns
    (natural multi-scale amounts follow log10(1+1/d); a synthetic or
    clipped column visibly deviates, as this fixture's bounded price
    generator does). Output pairs the observed frequency with the
    Benford expectation per digit so the deviation is read directly.

    Scale: narrow digit extraction + a 9-key map-combinable count,
    1-row total broadcast back — profiling cost independent of width."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") >= 1)
    digits = li.select(
        F.substring(
            F.floor("l_extendedprice").cast("long").cast("string"), 1, 1
        ).cast("int").alias("d")
    )
    counts = digits.groupBy("d").agg(F.count("*").cast("long").alias("n"))
    tot = counts.agg(F.sum("n").alias("t"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "d",
        "n",
        F.round(F.col("n") / F.col("t").cast("double"), 6).alias("observed"),
        F.round(F.log10(1.0 + 1.0 / F.col("d")), 6).alias("benford"),
    )


@query(
    "q_agg_argmax",
    oracle="""
        WITH ranked AS (
            SELECT c_mktsegment, c_name, c_acctbal, c_custkey,
                   row_number() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY c_acctbal DESC, c_custkey DESC
                   ) AS rn_max,
                   row_number() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY c_acctbal, c_custkey
                   ) AS rn_min
            FROM customer WHERE c_acctbal IS NOT NULL
        )
        SELECT m.c_mktsegment,
               m.c_name AS richest, m.c_acctbal AS max_bal,
               n.c_name AS poorest, n.c_acctbal AS min_bal
        FROM (SELECT * FROM ranked WHERE rn_max = 1) m
        JOIN (SELECT * FROM ranked WHERE rn_min = 1) n
          ON m.c_mktsegment IS NOT DISTINCT FROM n.c_mktsegment
    """,
)
def q_agg_argmax(spark, sf_dir):
    """Arg-max / arg-min aggregates: the value of ONE column at
    another's extreme (max_by/min_by) — fetched in a single hash
    aggregate instead of the self-join-on-max anti-pattern. Tiebreak
    is explicit ((bal, custkey) struct ordering), so the answer is
    deterministic where bare max_by would be tie-arbitrary.

    Scale: one map-side-combinable aggregate per segment; each partial
    carries a single (bal, custkey, name) candidate — constant state
    per group per task, vs the window formulation's full sort.

    Extremes are over OBSERVED balances: NULL c_acctbal rows are
    excluded on both sides (r19 'nulls' fuzz tier — a NULL measure
    inside max_by's ordering struct vs the oracle's rank window sorts
    differently per engine), and a NULL SEGMENT is a real group (the
    oracle joins null-safely; plain JOIN USING would drop it)."""
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal").isNotNull())
        .groupBy("c_mktsegment")
        .agg(
            F.max_by("c_name", F.struct("c_acctbal", "c_custkey")).alias("richest"),
            F.max("c_acctbal").alias("max_bal"),
            F.min_by("c_name", F.struct("c_acctbal", "c_custkey")).alias("poorest"),
            F.min("c_acctbal").alias("min_bal"),
        )
    )


ROLLUP_INC_SQL = """
    WITH daily AS (
        SELECT event_type, date_trunc('day', CAST(ts AS DATE)) AS day,
               COUNT(*) AS n,
               SUM(CAST(value AS DECIMAL(18,4))) AS sv
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, date_trunc('month', day) AS month,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(SUM(sv) AS DOUBLE) AS sum_value
    FROM daily GROUP BY 1, 2
"""


@query("q_rollup_incremental", oracle=ROLLUP_INC_SQL)
def q_rollup_incremental(spark, sf_dir):
    """Hierarchical rollup maintenance (continuous-aggregate shape):
    the monthly aggregate is computed FROM the daily partials — sum
    of counts, sum of decimal sums — never from raw events. This is
    the maintenance law that makes incremental rollups valid: count
    and decimal-sum are commutative monoids, so re-aggregating
    partials is exactly the direct aggregate (the oracle IS the
    two-level plan; tests/test_r04b_ops.py asserts equality with the
    single-level monthly aggregate too).

    At 100 TB the daily relation is what materializes (hypertable
    continuous aggregate / Iceberg rollup table): each new day
    appends one partial per group, and month re-derivation touches
    |days-in-month| × |groups| rows instead of the raw fact. The two
    groupBys share a partitioning prefix (event_type), so AQE plans
    the second exchange as a near-no-op."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.trunc(F.col("ts").cast("date"), "month").alias("month"),
        F.col("ts").cast("date").alias("day"),
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("sv"),
    )
    return daily.groupBy("event_type", "month").agg(
        F.sum("n").cast("long").alias("n_events"),
        F.sum("sv").cast("double").alias("sum_value"),
    )


PCT_TARGETS = (0.5, 0.9, 0.99)
PCT_BUCKETS = 64

PCT_EXACT_SQL = f"""
    WITH s AS (SELECT l_extendedprice AS x FROM lineitem),
    n AS (SELECT COUNT(*) AS n FROM s),
    r AS (SELECT x, row_number() OVER (ORDER BY x) AS rn FROM s)
    {' UNION ALL '.join(
        f"SELECT {p} AS p, x AS value FROM r, n "
        f"WHERE rn = CAST(CEIL({p} * n) AS BIGINT)"
        for p in PCT_TARGETS
    )}
"""


@query("q_percentile_exact_dist", oracle=PCT_EXACT_SQL)
def q_percentile_exact_dist(spark, sf_dir):
    """EXACT distributed percentiles (p50/p90/p99) without a global
    sort — the two-phase bucket-count algorithm:

    phase 1: one scan builds a 64-bucket equi-width histogram
    (map-combinable; the shuffle carries ≤64 partials per task);
    the driver folds the ≤64 cumulative counts and locates, for each
    target rank k = ceil(p·n), the bucket holding the k-th order
    statistic and the residual offset within it;
    phase 2: a range-pruned re-scan of ONLY that bucket (a pushed-down
    min/max filter — at 100 TB with zone maps this reads a tiny
    fraction), where orderBy+limit(offset) plans as
    TakeOrderedAndProject and max() of that set is the exact k-th
    value. No stage ever sorts more than one bucket's rows; a skewed
    bucket recurses (not needed at these SFs — asserted in tests).

    The oracle takes the same k-th order statistic from a global
    row_number — value-identical because rank-at-value is tie-stable.
    Driver state: 1 stats row + 64 bucket counts (bounded collects).
    """
    li = load(spark, sf_dir, "lineitem").select(F.col("l_extendedprice").alias("x"))
    lo, hi, n = li.agg(F.min("x"), F.max("x"), F.count("x")).first()
    width = (hi - lo) / PCT_BUCKETS
    bucket = F.least(
        F.floor((F.col("x") - F.lit(lo)) / F.lit(width)).cast("long"),
        F.lit(PCT_BUCKETS - 1).cast("long"),
    )
    counts = dict(
        (r["b"], r["cnt"])
        for r in li.groupBy(bucket.alias("b")).agg(F.count("*").alias("cnt")).collect()
    )
    out = None
    for p in PCT_TARGETS:
        k = int(math.ceil(p * n))
        cum = 0
        for b in range(PCT_BUCKETS):
            c = counts.get(b, 0)
            if cum + c >= k:
                break
            cum += c
        offset = k - cum  # 1-indexed rank within bucket b
        # Membership reuses the EXACT histogram bucket expression (no
        # float boundary drift); the widened range predicate is the
        # pushdown guard that lets zone maps prune the re-scan.
        b_lo = lo + (b - 1) * width
        b_hi = hi if b >= PCT_BUCKETS - 2 else lo + (b + 2) * width
        in_bucket = li.filter(
            (F.col("x") >= F.lit(b_lo)) & (F.col("x") <= F.lit(b_hi)) & (bucket == b)
        )
        kth = in_bucket.orderBy("x").limit(offset).agg(
            F.lit(p).alias("p"), F.max("x").alias("value")
        )
        out = kth if out is None else out.unionByName(kth)
    return out


MOMENTS_SQL = f"""
    WITH m AS (
        -- every decimal→double goes through dec2d_sql (VARCHAR-
        -- mediated): the unscaled power sums exceed 2^53 already at
        -- fixture scale, where DuckDB's native cast double-rounds an
        -- ulp below Spark's Decimal.toDouble (r19 nulls seed 4)
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               {dec2d_sql("SUM(CAST(o_totalprice AS DECIMAL(18,2)))")} AS s1,
               -- p² / p³ go through d2dec_sql (r20 'magnitude' tier):
               -- beyond 2^52·10^-scale the native double→DECIMAL cast
               -- rounds binary-expansion noise that Spark's shortest-
               -- repr cast never sees
               {dec2d_sql(f"SUM({d2dec_sql('o_totalprice * o_totalprice', 28, 4)})")} AS s2,
               {dec2d_sql(f'''SUM({d2dec_sql("o_totalprice * o_totalprice * o_totalprice",
                             38, 6)})''')} AS s3,
               {dec2d_sql("SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100")} AS u1,
               {dec2d_sql(f'''SUM({d2dec_sql("o_totalprice * o_totalprice", 28, 4)})
                    * 10000''')} AS u2
        FROM orders WHERE o_totalprice IS NOT NULL GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n,
           {rdiv_sql("u1", "n * 100", 4)} AS mean,
           {rdiv_sql("u2 * n - u1 * u1", "10000.0 * n * n", 4)} AS var_pop,
           CASE WHEN (s2 - s1 * s1 / n) = 0 THEN NULL ELSE
           ROUND((s3 - 3.0 * (s1 / n) * s2 + 2.0 * n * (s1 / n) * (s1 / n) * (s1 / n))
                 / (n * ((s2 - s1 * s1 / n) / n)
                      * sqrt((s2 - s1 * s1 / n) / n)), 4) END AS skew
    FROM m
"""


@query("q_agg_moments", oracle=MOMENTS_SQL)
def q_agg_moments(spark, sf_dir):
    """Higher-moment profile (mean / population variance / skewness)
    from RAW POWER SUMS — the numerically portable formulation: the
    three power sums are exact decimal aggregates (order-independent,
    map-combinable, constant per-group state), and the moments are
    derived arithmetic on those exact sums, so results hash-match
    across engines where built-in skewness() (engine-specific update
    formulas, fp accumulation order) never would. This is also the
    distributed-merge-friendly form: power sums from two partitions
    ADD — the same monoid law the sketches rely on."""
    # moments of the OBSERVED distribution: NULL prices excluded on
    # both sides (r19 'nulls' fuzz tier — unfiltered, n = COUNT(*)
    # diverges from the decimal sums that skip NULLs)
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice").isNotNull())
    p = F.col("o_totalprice")
    m = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(p.cast("decimal(18,2)")).cast("double").alias("s1"),
        F.sum((p * p).cast("decimal(28,4)")).cast("double").alias("s2"),
        F.sum((p * p * p).cast("decimal(38,6)")).cast("double").alias("s3"),
        # integer units (cents / cents²) for the exact-rounded moments
        (F.sum(p.cast("decimal(18,2)")) * 100).cast("double").alias("u1"),
        (F.sum((p * p).cast("decimal(28,4)")) * 10000).cast("double").alias("u2"),
    )
    n, s1, s2, s3 = F.col("n"), F.col("s1"), F.col("s2"), F.col("s3")
    u1, u2 = F.col("u1"), F.col("u2")
    mean = s1 / n
    var_pop = (s2 - s1 * s1 / n) / n
    # v^1.5 as v*sqrt(v), NOT pow(v, 1.5): sqrt is correctly rounded
    # (IEEE754-required) on both engines, while Java Math.pow vs libm
    # pow can differ by ulps right at a 4dp rounding boundary.
    skew = (s3 - 3.0 * mean * s2 + 2.0 * n * mean * mean * mean) / (
        n * var_pop * F.sqrt(var_pop)
    )
    # zero-variance guard (r19 'nulls' tier: a constant group makes
    # skew 0/0 — Spark ANSI raises DIVIDE_BY_ZERO, DuckDB yields NULL;
    # declare NULL on both sides). The var_pop==0 test is the same
    # exact IEEE chain in both engines, so the branch agrees.
    skew = F.when(var_pop != 0, F.round(skew, 4))
    # mean/var_pop round through the integer-units formula (rdiv): the
    # r18 'ties' fuzz tier proved ROUND(s1/n, 4) diverges cross-engine
    # when the group size makes the quotient terminate at the tie
    # (mean = cents/(100·n); var = (u2·n - u1²)/(10⁴·n²)). var_pop's
    # numerator u2·n - u1² exceeds 2^53 already at fixture scale
    # (u2 ~ 7e17), so it runs in rdiv's DEGRADED regime (exact=False,
    # r18 advice): cross-engine deterministic — identical IEEE chains
    # both sides, which is what the hash-check needs — but not true
    # half-away rounding of the exact rational. The skew's sqrt keeps
    # it off the decimal grid — double-round is safe.
    return m.select(
        "o_orderpriority",
        "n",
        rdiv(u1, n * 100, 4).alias("mean"),
        rdiv(u2 * n - u1 * u1, F.lit(10000.0) * n * n, 4, exact=False)
        .alias("var_pop"),
        skew.alias("skew"),
    )


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_CORR_PAIRS = [
    (a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1 :]
]


def _corr_sums_sql() -> str:
    # r20 'magnitude' hardening: the product casts go through d2dec_sql
    # (per-row double→DECIMAL(38,8) diverges cross-engine once x·y
    # exceeds 2^52·10^-8 ≈ 4.5e7 — the q_agg_moments seed-2 class) and
    # the power-sum read-backs through dec2d_sql (unscaled sums pass
    # 2^53 — the r19 class). The first-moment sums stay on native
    # casts: per-row values are scale-2-quantized far below 2^52·10^-2
    # and their unscaled sums stay inside 2^53 at every tested density.
    sums = ["CAST(COUNT(*) AS DOUBLE) AS n"]
    for c in _CORR_COLS:
        sums.append(f"CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) AS s_{c}")
        sq = dec2d_sql("SUM(" + d2dec_sql(f"{c} * {c}", 38, 8) + ")")
        sums.append(f"{sq} AS ss_{c}")
    for a, b in _CORR_PAIRS:
        sp = dec2d_sql("SUM(" + d2dec_sql(f"{a} * {b}", 38, 8) + ")")
        sums.append(f"{sp} AS sp_{a}_{b}")
    return ", ".join(sums)


CORR_SQL = (
    f"WITH m AS (SELECT {_corr_sums_sql()} FROM lineitem)\n"
    + "\nUNION ALL\n".join(
        f"""
    SELECT '{a}' AS col_a, '{b}' AS col_b,
           ROUND((n * sp_{a}_{b} - s_{a} * s_{b})
                 / sqrt((n * ss_{a} - s_{a} * s_{a})
                        * (n * ss_{b} - s_{b} * s_{b})), 6) AS corr
    FROM m"""
        for a, b in _CORR_PAIRS
    )
)


@query("q_stats_corr", oracle=CORR_SQL)
def q_stats_corr(spark, sf_dir):
    """Pearson correlation matrix over the lineitem measures from RAW
    POWER SUMS — the feature-screening profile (which measures are
    redundant / leaking) computed the distributed-merge-friendly way:
    ONE map-combined aggregation pass collects n, Σx, Σx², Σxy as
    EXACT decimal sums (order-independent addition, constant state:
    15 accumulators for 4 columns — the same monoid law as
    q_agg_moments), and the 6 pairwise correlations are derived
    arithmetic on that single row. Built-in corr() would cost one
    pass per pair with engine-specific fp accumulation; this is one
    pass total and hash-matches DuckDB bit-for-bit.

    At 100 TB this is the only viable shape: the scan dominates, so
    all-pairs statistics must amortize into a single pass with
    combiner-friendly state. The small-fixture single-file input is
    round-robin spread first (sources.tables.parallel) so the
    constant-state partials use every core; a real many-partition
    fact skips that exchange."""
    from ..sources.tables import parallel

    li = parallel(load(spark, sf_dir, "lineitem"))
    aggs = [F.count("*").cast("double").alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(F.col(c).cast("decimal(18,2)")).cast("double").alias(f"s_{c}"))
        aggs.append(
            F.sum((F.col(c) * F.col(c)).cast("decimal(38,8)"))
            .cast("double")
            .alias(f"ss_{c}")
        )
    for a, b in _CORR_PAIRS:
        aggs.append(
            F.sum((F.col(a) * F.col(b)).cast("decimal(38,8)"))
            .cast("double")
            .alias(f"sp_{a}_{b}")
        )
    m = li.agg(*aggs)
    n = F.col("n")

    def corr(a: str, b: str):
        return F.round(
            (n * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}"))
            / F.sqrt(
                (n * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}"))
                * (n * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}"))
            ),
            6,
        )

    rows = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
                corr(a, b).alias("corr"),
            )
            for a, b in _CORR_PAIRS
        ]
    )
    return m.select(F.explode(rows).alias("r")).select("r.col_a", "r.col_b", "r.corr")


TRIM_DIV = 20  # trim n//20 rows (5%) from each tail

TRIMMED_SQL = f"""
    WITH ranked AS (
        SELECT o_orderpriority, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice, o_orderkey) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders WHERE o_totalprice IS NOT NULL
    )
    SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           {avg_sql("o_totalprice", "COUNT(*)", 18, 2, 4)} AS trimmed_mean
    FROM ranked
    WHERE rn > n // {TRIM_DIV} AND rn <= n - n // {TRIM_DIV}
    GROUP BY o_orderpriority, n
"""


@query("q_agg_trimmed", oracle=TRIMMED_SQL)
def q_agg_trimmed(spark, sf_dir):
    """5%-trimmed mean per group — the robust location estimate that
    survives the fat tails a plain mean is hostage to (metric
    pipelines report this next to p50). Trim counts use INTEGER
    division (n // {TRIM_DIV}), never n*0.05 — float multiples of a
    non-binary fraction can floor differently at exact boundaries.

    Rank window partitioned on the group key (distributed — each
    group sorts its own slice), tail filter, then the same
    exact-decimal mean as everywhere else. One Exchange total: the
    follow-up aggregate reuses the window's hash keys."""
    # observed distribution only: NULL measures excluded on both
    # sides (r19 'nulls' fuzz tier; see SCALING.md r19 addendum)
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice").isNotNull())
    w = Window.partitionBy("o_orderpriority")
    ranked = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number()
        .over(w.orderBy("o_totalprice", "o_orderkey"))
        .alias("rn"),
        F.count("*").over(w).alias("n"),
    )
    lo = F.floor(F.col("n") / TRIM_DIV)
    kept = ranked.filter((F.col("rn") > lo) & (F.col("rn") <= F.col("n") - lo))
    return kept.groupBy("o_orderpriority", "n").agg(
        F.count("*").alias("n_kept"),
        # exact-integer rounded mean (rdiv): the kept-count can be
        # 2-adically tie-eligible, where ROUND(double/n, 4) diverges
        # cross-engine (r18 'ties' fuzz tier)
        rdiv(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100,
            F.count("*") * 100,
            4,
        ).alias("trimmed_mean"),
    ).select(
        "o_orderpriority", F.col("n").cast("long").alias("n"), "n_kept", "trimmed_mean"
    )


GINI_SQL = """
    WITH ranked AS (
        SELECT o_orderpriority, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice, o_orderkey) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders WHERE o_totalprice IS NOT NULL
    )
    SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
           ROUND(2.0 * CAST(SUM(CAST(rn * o_totalprice AS DECIMAL(38,8)))
                            AS DOUBLE)
                 / (n * CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                             AS DOUBLE))
                 - CAST(n + 1 AS DOUBLE) / n, 6) AS gini
    FROM ranked
    GROUP BY o_orderpriority, n
"""


@query("q_agg_gini", oracle=GINI_SQL)
def q_agg_gini(spark, sf_dir):
    """Gini coefficient of order value per priority class — the
    inequality/concentration profile (how skewed is spend across
    orders), computed by the rank formulation
    G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over ascending ranks.

    Both Σ terms are EXACT decimals (integer rank × 2dp price stays
    rational), so the double arithmetic at the end is an identical
    chain cross-engine. Same distributed shape as q_agg_trimmed: a
    group-partitioned rank window feeding a map-combined aggregate —
    the rank window is the only ordered pass, and it orders each
    group's slice, never the table."""
    # observed distribution only: NULL measures excluded on both
    # sides (r19 'nulls' fuzz tier; see SCALING.md r19 addendum)
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice").isNotNull())
    w = Window.partitionBy("o_orderpriority")
    ranked = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number()
        .over(w.orderBy("o_totalprice", "o_orderkey"))
        .alias("rn"),
        F.count("*").over(w).alias("n"),
    )
    swx = F.sum((F.col("rn") * F.col("o_totalprice")).cast("decimal(38,8)")).cast(
        "double"
    )
    sx = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
    n = F.col("n")
    return ranked.groupBy("o_orderpriority", "n").agg(
        F.round(
            F.lit(2.0) * swx / (n * sx) - (n + 1).cast("double") / n, 6
        ).alias("gini")
    ).select("o_orderpriority", F.col("n").cast("long").alias("n"), "gini")


MAD_SQL = """
    WITH ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events WHERE value IS NOT NULL
    ),
    med AS (
        SELECT event_type, n, SUM(value) / COUNT(*) AS median
        FROM ranked
        WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
        GROUP BY event_type, n
    ),
    devs AS (
        SELECT r.event_type, m.n, m.median, ABS(r.value - m.median) AS dev,
               row_number() OVER (PARTITION BY r.event_type
                                  ORDER BY ABS(r.value - m.median), r.event_id)
                   AS drn
        FROM (SELECT event_type, value, event_id FROM events
              WHERE value IS NOT NULL) r
        JOIN med m ON m.event_type = r.event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n, median,
           SUM(dev) / COUNT(*) AS mad
    FROM devs
    WHERE drn IN ((n + 1) // 2, (n + 2) // 2)
    GROUP BY event_type, n, median
"""


@query("q_agg_mad", oracle=MAD_SQL)
def q_agg_mad(spark, sf_dir):
    """Median absolute deviation per event type — the robust scale
    estimate behind outlier gates (|x − med| > k·MAD survives the fat
    tails that wreck z-scores; the quality-filter counterpart of
    q_agg_trimmed's robust location). Two discrete-rank passes, no
    engine median()/percentile() built-ins (their interpolation fp
    differs across engines): the one-or-two middle rows are picked by
    integer rank, and averaging ≤2 doubles is commutative, so every
    emitted value is an exact IEEE chain both engines replay —
    |x − med| is a single exact subtraction.

    Scale shape: both rank windows partition on the GROUP key (each
    group sorts its own slice — never a global sort), the median
    relation re-joining the fact is tiny (|groups| rows, broadcast),
    and the final aggregate reuses the window's hash keys. A single
    giant group would switch to the two-pass histogram prune of
    q_percentile_exact_dist."""
    # observed distribution only: NULL measures excluded on both
    # sides (r19 'nulls' fuzz tier; see SCALING.md r19 addendum)
    ev = (
        load(spark, sf_dir, "events")
        .select("event_type", "event_id", "value")
        .filter(F.col("value").isNotNull())
    )
    w = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w.orderBy("value", "event_id")).alias("rn"),
        F.count("*").over(w).alias("n"),
    )
    # TRUE integer division (Spark `div`, not FLOOR(double/2)): exact
    # at any group size, matching DuckDB's BIGINT `//` bit-for-bit.
    mid = (F.col("rn") == F.expr("(n + 1) div 2")) | (
        F.col("rn") == F.expr("(n + 2) div 2")
    )
    med = (
        ranked.filter(mid)
        .groupBy("event_type", "n")
        .agg((F.sum("value") / F.count("*")).alias("median"))
    )
    devs = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "n",
        "median",
        F.abs(F.col("value") - F.col("median")).alias("dev"),
        "event_id",
    )
    dranked = devs.select(
        "event_type",
        "n",
        "median",
        "dev",
        F.row_number().over(w.orderBy("dev", "event_id")).alias("drn"),
    )
    dmid = (F.col("drn") == F.expr("(n + 1) div 2")) | (
        F.col("drn") == F.expr("(n + 2) div 2")
    )
    return (
        dranked.filter(dmid)
        .groupBy("event_type", "n", "median")
        .agg((F.sum("dev") / F.count("*")).alias("mad"))
        .select(
            "event_type", F.col("n").cast("long").alias("n"), "median", "mad"
        )
    )


WINSOR_LO_DIV = 20  # p05 = rank ceil(n/20); p95 = rank ceil(19n/20)

WINSOR_SQL = f"""
    WITH ranked AS (
        SELECT o_orderpriority, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice, o_orderkey) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders WHERE o_totalprice IS NOT NULL
    ),
    bounds AS (
        SELECT o_orderpriority, n,
               MAX(CASE WHEN rn = (n + {WINSOR_LO_DIV - 1}) // {WINSOR_LO_DIV}
                        THEN o_totalprice END) AS p05,
               MAX(CASE WHEN rn = ({WINSOR_LO_DIV - 1} * n + {WINSOR_LO_DIV - 1})
                                      // {WINSOR_LO_DIV}
                        THEN o_totalprice END) AS p95
        FROM ranked GROUP BY o_orderpriority, n
    )
    SELECT o.o_orderpriority, CAST(b.n AS BIGINT) AS n, b.p05, b.p95,
           {avg_sql("LEAST(GREATEST(o.o_totalprice, b.p05), b.p95)", "COUNT(*)", 18, 2, 4)} AS mean_winsorized
    FROM orders o JOIN bounds b ON b.o_orderpriority = o.o_orderpriority
    WHERE o.o_totalprice IS NOT NULL
    GROUP BY o.o_orderpriority, b.n, b.p05, b.p95
"""


@query("q_agg_winsorized", oracle=WINSOR_SQL)
def q_agg_winsorized(spark, sf_dir):
    """Winsorized mean per priority class: clip to the discrete
    [p05, p95] order statistics, then the usual exact-decimal mean —
    the outlier-capped aggregate a metrics/training-mix pipeline
    reports when trimming (q_agg_trimmed) throws away too much tail
    mass. Percentile ranks are INTEGER arithmetic (ceil(n/20),
    ceil(19n/20) via integer division) — never n*0.05, whose float
    rounding can pick a different row right at a boundary; the clip
    itself is pure comparison, so the summed values are 2dp prices
    and the decimal sum is exact.

    Scale shape: one group-partitioned rank window (distributed per
    group), a |groups|-row bounds relation broadcast back onto the
    fact scan, and a map-combined final aggregate — the same
    single-Exchange template as q_agg_trimmed/q_agg_gini."""
    # observed distribution only: NULL measures excluded on both
    # sides (r19 'nulls' fuzz tier; see SCALING.md r19 addendum)
    o = (
        load(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .filter(F.col("o_totalprice").isNotNull())
    )
    w = Window.partitionBy("o_orderpriority")
    ranked = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w.orderBy("o_totalprice", "o_orderkey")).alias("rn"),
        F.count("*").over(w).alias("n"),
    )
    # TRUE integer division (Spark `div`): exact at any group size.
    k_lo = F.expr(f"(n + {WINSOR_LO_DIV - 1}) div {WINSOR_LO_DIV}")
    k_hi = F.expr(
        f"({WINSOR_LO_DIV - 1} * n + {WINSOR_LO_DIV - 1}) div {WINSOR_LO_DIV}"
    )
    bounds = ranked.groupBy("o_orderpriority", "n").agg(
        F.max(F.when(F.col("rn") == k_lo, F.col("o_totalprice"))).alias("p05"),
        F.max(F.when(F.col("rn") == k_hi, F.col("o_totalprice"))).alias("p95"),
    )
    clipped = o.join(F.broadcast(bounds), "o_orderpriority").select(
        "o_orderpriority",
        "n",
        "p05",
        "p95",
        F.least(F.greatest(F.col("o_totalprice"), F.col("p05")), F.col("p95")).alias(
            "cl"
        ),
    )
    return (
        clipped.groupBy("o_orderpriority", "n", "p05", "p95")
        .agg(
            # exact-integer rounded mean (rdiv) — see q_agg_trimmed
            rdiv(
                F.sum(F.col("cl").cast("decimal(18,2)")) * 100,
                F.count("*") * 100,
                4,
            ).alias("mean_winsorized")
        )
        .select(
            "o_orderpriority",
            F.col("n").cast("long").alias("n"),
            "p05",
            "p95",
            "mean_winsorized",
        )
    )


# --- discrete IQR (staged r6, registered r7).
IQR_SQL = """
    WITH ranked AS (
        SELECT o_orderpriority, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice, o_orderkey) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders WHERE o_totalprice IS NOT NULL
    )
    SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
           MAX(CASE WHEN rn = (n + 3) // 4 THEN o_totalprice END) AS p25,
           MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN o_totalprice END) AS p75,
           MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN o_totalprice END)
             - MAX(CASE WHEN rn = (n + 3) // 4 THEN o_totalprice END) AS iqr
    FROM ranked
    GROUP BY o_orderpriority, n
"""


@query("q_agg_iqr", oracle=IQR_SQL)
def q_agg_iqr(spark, sf_dir):
    """Interquartile range per group from DISCRETE order statistics
    (p25/p75 at integer ranks ceil(n/4), ceil(3n/4) — true integer
    division, no interpolation): the robust spread that pairs with
    q_agg_mad's robust scale and feeds Tukey-fence outlier clipping.
    IQR = p75 − p25 is one exact IEEE subtraction of two actual data
    values, so results are bit-identical across engines.

    One group-partitioned rank window feeding a map-combined
    conditional aggregate — the q_agg_trimmed/q_agg_winsorized
    single-Exchange template."""
    # observed distribution only: NULL measures excluded on both
    # sides (r19 'nulls' fuzz tier; see SCALING.md r19 addendum)
    o = (
        load(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .filter(F.col("o_totalprice").isNotNull())
    )
    w = Window.partitionBy("o_orderpriority")
    ranked = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w.orderBy("o_totalprice", "o_orderkey")).alias("rn"),
        F.count("*").over(w).alias("n"),
    )
    p25 = F.max(F.when(F.col("rn") == F.expr("(n + 3) div 4"), F.col("o_totalprice")))
    p75 = F.max(
        F.when(F.col("rn") == F.expr("(3 * n + 3) div 4"), F.col("o_totalprice"))
    )
    return ranked.groupBy("o_orderpriority", "n").agg(
        p25.alias("p25"), p75.alias("p75"), (p75 - p25).alias("iqr")
    ).select(
        "o_orderpriority", F.col("n").cast("long").alias("n"), "p25", "p75", "iqr"
    )


# --- Theil T inequality index (staged r6, registered r7).
THEIL_SQL = """
    WITH mu AS (
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*) AS mu
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority, m.n,
           ROUND(CAST(SUM(CAST(ROUND(
                     (o.o_totalprice / m.mu) * ln(o.o_totalprice / m.mu), 10)
                 AS DECIMAL(30,10))) AS DOUBLE) / m.n, 6) AS theil_t
    FROM orders o JOIN mu m ON m.o_orderpriority = o.o_orderpriority
    GROUP BY o.o_orderpriority, m.n
"""


@query("q_agg_theil", oracle=THEIL_SQL)
def q_agg_theil(spark, sf_dir):
    """Theil T inequality index per priority class — the decomposable
    entropy-based concentration measure (complements q_agg_gini's rank
    form; Theil additionally splits into within/between-group terms, so
    a spend cube can attribute inequality to segments).
    T = (1/n)·Σ (x/μ)·ln(x/μ) with μ the exact-decimal mean.

    Cross-engine determinism follows the q_text_entropy/lm_score
    pattern: each log term is rounded to 10 dp (absorbing any last-ulp
    libm difference) and summed through DECIMAL(30,10) so addition is
    order-independent; μ is an exact decimal mean, so x/μ is an
    identical double chain. One map-combined mean aggregate, a
    |groups|-row broadcast back onto the fact scan, one map-combined
    term sum — the q_agg_gini single-Exchange template."""
    o = load(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    mu = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("mu"),
    )
    r = F.col("o_totalprice") / F.col("mu")
    term = F.round(r * F.log(r), 10).cast("decimal(30,10)")
    return (
        o.join(F.broadcast(mu), "o_orderpriority")
        .groupBy("o_orderpriority", "n")
        .agg(
            F.round(F.sum(term).cast("double") / F.col("n"), 6).alias("theil_t")
        )
        .select("o_orderpriority", F.col("n").cast("long").alias("n"), "theil_t")
    )


# --- exact weighted median (staged r6, registered r7).
WMEDIAN_SQL = """
    WITH ranked AS (
        SELECT l_returnflag, l_extendedprice,
               CAST(l_quantity AS DECIMAL(18,2)) AS w,
               SUM(CAST(l_quantity AS DECIMAL(18,2)))
                   OVER (PARTITION BY l_returnflag
                         ORDER BY l_extendedprice, l_orderkey, l_linenumber
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_w,
               SUM(CAST(l_quantity AS DECIMAL(18,2)))
                   OVER (PARTITION BY l_returnflag) AS tot_w
        FROM lineitem
    )
    SELECT l_returnflag,
           CAST(tot_w AS DOUBLE) AS total_weight,
           MIN(l_extendedprice) AS weighted_median
    FROM ranked
    WHERE 2 * cum_w >= tot_w
    GROUP BY l_returnflag, tot_w
"""


@query("q_agg_weighted_median", oracle=WMEDIAN_SQL)
def q_agg_weighted_median(spark, sf_dir):
    """Exact weight-weighted median: the smallest value whose running
    weight reaches half the group's total — the quantity-weighted
    median price here, and at 100 TB the token-weighted length/quality
    median a corpus report wants (doc-count medians over-represent
    short docs).

    The threshold test is PURE DECIMAL: running and total weights are
    exact decimal window sums and the half-point compare is
    ``2·cum_w >= tot_w`` — integer-scaled decimal arithmetic, no
    division anywhere, so there is no rounding boundary for engines to
    disagree on. One group-partitioned ordered window pass (each group
    sorts its own slice) + a MIN aggregate on the same keys — the
    q_win_median template with weights."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity", "l_orderkey", "l_linenumber"
    )
    w = Window.partitionBy("l_returnflag")
    wo = w.orderBy("l_extendedprice", "l_orderkey", "l_linenumber").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wd = F.col("l_quantity").cast("decimal(18,2)")
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum(wd).over(wo).alias("cum_w"),
        F.sum(wd).over(w).alias("tot_w"),
    )
    return (
        ranked.filter(F.lit(2) * F.col("cum_w") >= F.col("tot_w"))
        .groupBy("l_returnflag", "tot_w")
        .agg(F.min("l_extendedprice").alias("weighted_median"))
        .select(
            "l_returnflag",
            F.col("tot_w").cast("double").alias("total_weight"),
            "weighted_median",
        )
    )
