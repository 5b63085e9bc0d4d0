"""Data-quality validation and distribution-diagnostics operators.

The reference verifies its mirror tables by hand-written re-queries
(`test_cdc.py:75-92`); production lakehouse tables carry *declared*
constraints (Delta CHECK constraints, dbt tests, Iceberg validation
jobs) evaluated as batch scans. q_quality_checks is that evaluator:
one rule set in, one violation report out. q_skew_diagnose is the
planning-side complement — the per-key distribution profile you run
BEFORE choosing a join/agg strategy on a 100 TB fact (decides salting
factor, AQE skew thresholds, broadcast eligibility).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ._util import rdiv, rdiv_sql
from ..sources.tables import load

QUALITY_SQL = """
    SELECT 'customer_name_not_null' AS rule,
           CAST(COUNT(*) FILTER (WHERE c_name IS NULL) AS BIGINT) AS n_violations,
           CAST(COUNT(*) AS BIGINT) AS n_checked
    FROM customer
    UNION ALL
    SELECT 'customer_key_unique',
           (SELECT CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT)
            FROM (SELECT COUNT(*) AS cnt FROM customer GROUP BY c_custkey)
            WHERE cnt > 1),
           (SELECT COUNT(*) FROM customer)
    UNION ALL
    SELECT 'orders_custkey_exists',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
            WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
           (SELECT COUNT(*) FROM orders)
    UNION ALL
    SELECT 'lineitem_discount_range',
           CAST(COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 1) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_quantity_positive',
           CAST(COUNT(*) FILTER (WHERE l_quantity <= 0) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem
"""


@query("q_quality_checks", oracle=QUALITY_SQL)
def q_quality_checks(spark, sf_dir):
    """Declarative constraint validation over lake tables: NOT NULL,
    key uniqueness, referential integrity, and range CHECKs evaluated
    in one report (rule, n_violations, n_checked).

    Scale shape: the two lineitem range rules and the customer
    null-check are MAP-SIDE ONLY (conditional-count aggregates, one
    partial per partition, no per-rule scan — Spark collapses the two
    lineitem rules into one scan via shared relation). Uniqueness is
    one groupBy on the key; referential integrity is a left-anti join
    with the customer KEY COLUMN broadcast. No rule materializes
    violating ROWS (count-only), so the report stays O(rules) bytes
    regardless of table size; a debugging variant would add LIMITed
    exemplars per rule."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")

    def report(rule, viol, checked):
        return viol.select(
            F.lit(rule).alias("rule"),
            F.col("v").cast("long").alias("n_violations"),
            checked.cast("long").alias("n_checked"),
        )

    name_null = c.agg(
        F.count_if(F.col("c_name").isNull()).alias("v"), F.count("*").alias("n")
    )
    r1 = report("customer_name_not_null", name_null, F.col("n"))

    dup = (
        c.groupBy("c_custkey").agg(F.count("*").alias("cnt"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("cnt") > 1, F.col("cnt") - 1)), F.lit(0)
            ).alias("v"),
            F.sum("cnt").alias("n"),
        )
    )
    r2 = report("customer_key_unique", dup, F.col("n"))

    orphans = (
        o.join(
            F.broadcast(c.select("c_custkey")),
            o.o_custkey == F.col("c_custkey"),
            "left_anti",
        ).agg(F.count("*").alias("v"))
    )
    n_orders = o.count()
    r3 = report("orders_custkey_exists", orphans, F.lit(n_orders))

    li_rules = li.agg(
        F.count_if((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).alias("v_disc"),
        F.count_if(F.col("l_quantity") <= 0).alias("v_qty"),
        F.count("*").alias("n"),
    )
    r4 = li_rules.select(
        F.lit("lineitem_discount_range").alias("rule"),
        F.col("v_disc").cast("long").alias("n_violations"),
        F.col("n").cast("long").alias("n_checked"),
    )
    r5 = li_rules.select(
        F.lit("lineitem_quantity_positive").alias("rule"),
        F.col("v_qty").cast("long").alias("n_violations"),
        F.col("n").cast("long").alias("n_checked"),
    )
    out = r1
    for r in (r2, r3, r4, r5):
        out = out.unionByName(r)
    return out


SKEW_SQL = """
    WITH per_key AS (
        SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
    ), stats AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(MAX(cnt) AS BIGINT) AS max_key_rows,
               CAST(MIN(cnt) AS BIGINT) AS min_key_rows
        FROM per_key
    )
    SELECT n_rows, n_keys, max_key_rows, min_key_rows,
           {avg_expr} AS avg_key_rows,
           {skew_expr} AS skew_factor,
           {share_expr} AS top_key_share
    FROM stats
""".replace("{avg_expr}", rdiv_sql("n_rows", "n_keys", 4)).replace(
    "{skew_expr}", rdiv_sql("max_key_rows * n_keys", "n_rows", 4)
).replace("{share_expr}", rdiv_sql("max_key_rows", "n_rows", 6))


@query("q_skew_diagnose", oracle=SKEW_SQL)
def q_skew_diagnose(spark, sf_dir):
    """Key-distribution profile for shuffle planning: per-key counts
    reduced to (n_rows, n_keys, max/min/avg key size, skew factor =
    hottest key vs mean, hottest key's share of the table). This is the
    one-pass diagnostic that decides whether a downstream join on this
    key needs salting (operators/skew.py), a higher AQE skew threshold,
    or nothing.

    Scale: one map-combined groupBy on the key (the same shuffle the
    real join would pay, minus the payload), then a SINGLE-ROW global
    aggregate — partial-aggregated, so the driver sees one row. No
    collect of the per-key relation; at 100 TB this runs at scan speed.
    """
    per_key = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
    )
    stats = per_key.agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_keys"),
        F.max("cnt").cast("long").alias("max_key_rows"),
        F.min("cnt").cast("long").alias("min_key_rows"),
    )
    # all three ratios are integer/integer — rounded via the exact
    # rdiv formula (r18 fuzzer class: int ratios with 2-adic
    # denominators sit ON the decimal tie, where double-ROUND
    # diverges cross-engine); skew_factor = max/(n_rows/n_keys)
    # multiplied out to max·n_keys/n_rows so no intermediate division
    return stats.select(
        "n_rows",
        "n_keys",
        "max_key_rows",
        "min_key_rows",
        rdiv(F.col("n_rows"), F.col("n_keys"), 4).alias("avg_key_rows"),
        rdiv(
            F.col("max_key_rows") * F.col("n_keys"), F.col("n_rows"), 4
        ).alias("skew_factor"),
        rdiv(F.col("max_key_rows"), F.col("n_rows"), 6).alias("top_key_share"),
    )


K_ANON = 5  # minimum equivalence-class size

KANON_SQL = f"""
    WITH classes AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS bal_band,
               CAST(COUNT(*) AS BIGINT) AS class_size
        FROM customer
        GROUP BY 1, 2, 3
    )
    SELECT c_nationkey, c_mktsegment, bal_band, class_size,
           CAST(CASE WHEN class_size < {K_ANON} THEN 1 ELSE 0 END AS BIGINT)
               AS below_k
    FROM classes
"""


@query("q_anon_kanonymity", oracle=KANON_SQL)
def q_anon_kanonymity(spark, sf_dir):
    """k-anonymity audit over quasi-identifiers — the privacy gate a
    training-data pipeline runs before releasing user-derived tables:
    every (nation, market segment, balance band) equivalence class
    must contain at least {K_ANON} individuals, or its rows are
    re-identifiable by linkage. Emits every class with its size and a
    below-k flag (the rows a release job would suppress or
    generalize).

    One map-combined groupBy on the quasi-identifier tuple — state is
    |classes| (bounded by the QI domain, not the row count), exactly
    the aggregate shape that scales to a 100 TB user table. The
    balance banding (width 2000) is the generalization step of the
    Samarati/Sweeney model: coarser bands -> bigger classes -> fewer
    suppressions."""
    c = load(spark, sf_dir, "customer")
    classes = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 2000.0).cast("long").alias("bal_band"),
    ).agg(F.count("*").alias("class_size"))
    return classes.select(
        "c_nationkey",
        "c_mktsegment",
        "bal_band",
        "class_size",
        F.when(F.col("class_size") < K_ANON, 1).otherwise(0).cast("long").alias("below_k"),
    )


# --- MAD-based robust outlier gate (staged r6, registered r7).
# Median+MAD come from q_agg_mad / MAD_SQL verbatim — one definition,
# two consumers, so a tie-break fix there changes both in lockstep.
MZ_K = 0.6745  # normal-consistency constant for the modified z-score
MZ_T = 3.5     # Iglewicz-Hoaglin outlier threshold


def _outliers_sql() -> str:
    from .aggregates import MAD_SQL

    return f"""
    WITH mad AS ({MAD_SQL})
    SELECT e.event_type, m.n, m.median, m.mad,
           CAST(SUM(CASE
                WHEN m.mad = 0 THEN CASE WHEN e.value <> m.median THEN 1 ELSE 0 END
                WHEN ABS({MZ_K} * (e.value - m.median) / m.mad) > {MZ_T} THEN 1
                ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN mad m ON m.event_type = e.event_type
    WHERE e.value IS NOT NULL
    GROUP BY e.event_type, m.n, m.median, m.mad
"""


OUTLIERS_SQL = _outliers_sql()


@query("q_quality_outliers", oracle=OUTLIERS_SQL)
def q_quality_outliers(spark, sf_dir):
    """Modified z-score outlier gate (Iglewicz-Hoaglin): flag events
    whose |{MZ_K}·(x − med)/MAD| exceeds {MZ_T} — the robust quality
    filter that survives the fat tails wrecking mean/σ z-scores (the
    train-data cleaning counterpart of q_win_zscore's rolling gate).
    Degenerate MAD = 0 (over half the group identical) falls back to
    "any value off the median", keeping constant-plus-spike groups
    detectable.

    The (event_type, n, median, mad) relation IS q_agg_mad's output —
    composed, not re-derived — broadcast onto one more events scan
    feeding a map-combined conditional count; the scoring comparison
    is a short exact IEEE chain, deterministic across engines. Scale
    state: O(1) per group."""
    from .aggregates import q_agg_mad

    mad = q_agg_mad(spark, sf_dir)
    # observed values only, matching the fixed q_agg_mad relation
    # (r19 'nulls' fuzz tier)
    ev = (
        load(spark, sf_dir, "events")
        .select("event_type", "value")
        .filter(F.col("value").isNotNull())
    )
    is_out = F.when(
        F.col("mad") == 0.0, (F.col("value") != F.col("median")).cast("int")
    ).otherwise(
        (
            F.abs(MZ_K * (F.col("value") - F.col("median")) / F.col("mad")) > MZ_T
        ).cast("int")
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "n", "median", "mad")
        .agg(F.sum(is_out).cast("long").alias("n_outliers"))
        .select("event_type", "n", "median", "mad", "n_outliers")
    )
