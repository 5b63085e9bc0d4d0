"""§2.5 — window functions.

``q_win_rownumber`` is the core CDC compaction primitive (latest change
wins per key, `connect-iceberg-sink.json:30-33` + Debezium LSN order);
the rest are the general SQL window surface.

Every ORDER BY inside a window carries a unique tiebreaker so results
are deterministic across engines. Running sums go through DECIMAL so
the fold order doesn't matter.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load


@query(
    "q_win_rownumber",
    oracle="""
        WITH ranked AS (
            SELECT o_custkey, o_orderkey, o_orderdate,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC
                   ) AS rn
            FROM orders
        )
        SELECT o_custkey, o_orderkey AS latest_orderkey
        FROM ranked WHERE rn = 1
    """,
)
def q_win_rownumber(spark, sf_dir):
    """Latest row per key — the CDC latest-wins pattern."""
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        load(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", F.col("o_orderkey").alias("latest_orderkey"))
    )


@query(
    "q_win_rank",
    oracle="""
        WITH ranked AS (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   rank() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC) AS rnk,
                   dense_rank() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice DESC) AS drnk
            FROM orders
        )
        SELECT o_orderpriority, o_orderkey, rnk, drnk
        FROM ranked WHERE rnk <= 5
    """,
)
def q_win_rank(spark, sf_dir):
    w = W.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    return (
        load(spark, sf_dir, "orders")
        .withColumn("rnk", F.rank().over(w))
        .withColumn("drnk", F.dense_rank().over(w))
        .filter(F.col("rnk") <= 5)
        .select("o_orderpriority", "o_orderkey", "rnk", "drnk")
    )


@query(
    "q_win_lag_lead",
    oracle="""
        SELECT o_custkey, o_orderkey,
               lag(o_totalprice) OVER w AS prev_price,
               lead(o_orderkey) OVER w AS next_orderkey
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_win_lag_lead(spark, sf_dir):
    """lag/lead — the row-level before/after images the Debezium
    envelope carries (`before`/`after`, SURVEY.md §1.2)."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@query(
    "q_win_running",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
                   PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_quantity, l_extendedprice,
                            l_partkey, l_suppkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_qty
        FROM lineitem
    """,
)
def q_win_running(spark, sf_dir):
    # (l_orderkey, l_linenumber) is NOT unique in the fixtures — the
    # ROWS frame needs a total order or accumulation is ambiguous
    w = (
        W.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_quantity", "l_extendedprice", "l_partkey", "l_suppkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).over(w)
        .cast("double")
        .alias("running_qty"),
    )


@query(
    "q_win_range_frame",
    oracle="""
        SELECT o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_orderpriority ORDER BY o_totalprice
                   RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS near_total
        FROM orders
    """,
)
def q_win_range_frame(spark, sf_dir):
    """Value-based RANGE frame — set-defined, so deterministic even
    with ties in the ordering column."""
    w = (
        W.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, W.currentRow)
    )
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w)
        .cast("double")
        .alias("near_total"),
    )


@query(
    "q_win_ntile",
    oracle="""
        SELECT o_orderkey,
               ntile(4) OVER (ORDER BY o_totalprice NULLS FIRST,
                              o_orderkey) AS quartile
        FROM orders
    """,
)
def q_win_ntile(spark, sf_dir):
    # NULLS FIRST pinned on both sides (r19 'nulls' fuzz tier)
    w = W.orderBy(F.col("o_totalprice").asc_nulls_first(), "o_orderkey")
    return load(spark, sf_dir, "orders").select(
        "o_orderkey", F.ntile(4).over(w).alias("quartile")
    )


@query(
    "q_win_percentile",
    oracle="""
        SELECT c_custkey,
               ROUND(percent_rank() OVER w, 6) AS pct_rank,
               ROUND(cume_dist() OVER w, 6) AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal NULLS FIRST, c_custkey)
    """,
)
def q_win_percentile(spark, sf_dir):
    """percent_rank + cume_dist per segment — the distributional
    window pair (used for per-group score normalization in curation
    pipelines). Total order (acctbal, custkey) makes both functions
    tie-free and cross-engine exact."""
    # NULLS FIRST pinned on both sides (r19 'nulls' fuzz tier)
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc_nulls_first(), "c_custkey"
    )
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "q_win_first_last",
    oracle="""
        SELECT o_custkey, o_orderkey,
               first_value(o_orderkey) OVER w AS first_ok,
               last_value(o_orderkey) OVER w AS last_ok,
               nth_value(o_orderkey, 2) OVER w AS second_ok
        FROM orders
        WINDOW w AS (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        )
    """,
)
def q_win_first_last(spark, sf_dir):
    """first_value / last_value / nth_value over the FULL frame —
    note last_value needs the explicit unbounded-following frame (the
    default frame ends at CURRENT ROW, a classic silent-wrong-answer);
    (o_orderdate, o_orderkey) is a total order so all three are
    deterministic. Single-customer history in one window pass — the
    'first/last touch attribution' shape."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.last("o_orderkey").over(w).alias("last_ok"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_ok"),
    )


@query(
    "q_win_time_range",
    oracle="""
        SELECT user_id, ts, event_id,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
                   AS sum_1h
        FROM events
        WINDOW w AS (
            PARTITION BY user_id ORDER BY epoch_us(ts)
            RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def q_win_time_range(spark, sf_dir):
    """Time-based sliding frame: per user, rolling 1-hour event count
    and value sum ending at each event (RANGE frame over event-time —
    the rate-limiter / rolling-exposure primitive). Spark's
    rangeBetween is numeric, so the frame runs over epoch
    MICROSECONDS (unix_micros — exact integers on both engines). The
    r18 fuzzer (seed 5) proved the previous second-granularity frame
    diverged: Spark's unix_timestamp TRUNCATES to seconds while
    DuckDB's epoch() keeps the µs fraction, so an event 3600.02 s back
    fell inside Spark's frame and outside DuckDB's — a real
    semantics gap on any fractional-second stream, not a rounding
    nit. µs keys also kill truncation peers (same-second followers
    sharing a frame). Decimal-cast sum keeps the rolling total
    order-independent.

    Scale shape: one shuffle on user_id, per-key local sort — the same
    single-Exchange shape as every window in this module; RANGE frames
    add no extra pass over ROWS frames in Spark's window operator."""
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.count("*").over(w).cast("long").alias("n_1h"),
        F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double").alias("sum_1h"),
    )


@query(
    "q_win_distinct",
    oracle="""
        WITH flagged AS (
            SELECT o_orderkey, o_custkey, o_orderpriority, o_orderdate,
                   CASE WHEN row_number() OVER (
                            PARTITION BY o_custkey, o_orderpriority
                            ORDER BY o_orderdate, o_orderkey) = 1
                        THEN 1 ELSE 0 END AS first_seen
            FROM orders
        )
        SELECT o_orderkey, o_custkey,
               CAST(SUM(first_seen) OVER (PARTITION BY o_custkey) AS BIGINT)
                   AS n_prio_part,
               CAST(SUM(first_seen) OVER (
                        PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey) AS BIGINT)
                   AS n_prio_run
        FROM flagged
    """,
)
def q_win_distinct(spark, sf_dir):
    """COUNT(DISTINCT) OVER — the window aggregate Spark does not
    support natively — via the first-occurrence rewrite: flag the
    first (partition, value) appearance with one row_number pass,
    then the partition-wide distinct count is a plain SUM(flag) over
    the partition and the RUNNING distinct count is the running
    SUM(flag). Both windows and the flag pass share ONE Exchange on
    o_custkey; per-row state is constant (vs size(collect_set) over a
    growing frame, which holds the whole value set per row). The
    oracle uses the identical engine-neutral rewrite.
    """
    first_w = W.partitionBy("o_custkey", "o_orderpriority").orderBy(
        "o_orderdate", "o_orderkey"
    )
    part_w = W.partitionBy("o_custkey")
    run_w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    flagged = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.when(F.row_number().over(first_w) == 1, 1).otherwise(0).alias("first_seen"),
    )
    return flagged.select(
        "o_orderkey",
        "o_custkey",
        F.sum("first_seen").over(part_w).cast("long").alias("n_prio_part"),
        F.sum("first_seen").over(run_w).cast("long").alias("n_prio_run"),
    )


REG_FRAME = 10  # rolling OLS over the last N events per user

REGRESSION_SQL = f"""
    WITH seq AS (
        SELECT user_id, event_id, value,
               CAST(row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS BIGINT) AS x
        FROM events
    ),
    sums AS (
        SELECT user_id, event_id, x,
               CAST(COUNT(*) OVER w AS BIGINT) AS n,
               CAST(SUM(x) OVER w AS BIGINT) AS sx,
               CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sy,
               CAST(SUM(CAST(x * value AS DECIMAL(28,10))) OVER w AS DOUBLE)
                   AS sxy
        FROM seq
        WINDOW w AS (PARTITION BY user_id ORDER BY x
                     ROWS BETWEEN {REG_FRAME - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id,
           ROUND((n * sxy - sx * sy)
                 / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0.0), 6) AS slope
    FROM sums
"""


@query("q_win_regression", oracle=REGRESSION_SQL)
def q_win_regression(spark, sf_dir):
    """Rolling OLS slope (trend detector): per user, the least-squares
    slope of value against event index over the trailing {REG_FRAME}
    events — the windowed-regression primitive monitoring and feature
    pipelines run (is this metric trending up, and how fast?).

    All four co-moments (n, Σx, Σx², Σxy, Σy) are windowed aggregates
    over ONE frame on the user_id partitioning — the index pass and
    the sum pass share the Exchange, per-row state is five numbers
    (never the frame's rows). Determinism: x is the integer event
    index, so the denominator is exact int64 arithmetic; y-sums go
    through decimal casts (order-independent), and the final division
    is one IEEE op on identical inputs. First-row frames (n=1)
    surface as NULL via the zero denominator — no fake zero trend."""
    ev = load(spark, sf_dir, "events")
    ws = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        "value",
        F.row_number().over(ws).cast("long").alias("x"),
    )
    wf = (
        W.partitionBy("user_id")
        .orderBy("x")
        .rowsBetween(-(REG_FRAME - 1), W.currentRow)
    )
    sums = seq.select(
        "user_id",
        "event_id",
        F.count("*").over(wf).cast("long").alias("n"),
        F.sum("x").over(wf).cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).over(wf).cast("long").alias("sxx"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(wf).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("value")).cast("decimal(28,10)"))
        .over(wf)
        .cast("double")
        .alias("sxy"),
    )
    denom = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return sums.select(
        "user_id",
        "event_id",
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.when(denom != 0.0, denom),
            6,
        ).alias("slope"),
    )


ZS_FRAME = 20  # baseline frame: the ZS_FRAME-1 = 19 trailing events

ZSCORE_SQL = f"""
    WITH sums AS (
        SELECT user_id, event_id, value,
               CAST(COUNT(*) OVER w AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s1,
               CAST(SUM(CAST(value * value AS DECIMAL(28,10))) OVER w
                    AS DOUBLE) AS s2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN {ZS_FRAME - 1} PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id,
           ROUND((value - s1 / n)
                 / NULLIF(sqrt((s2 - s1 * s1 / n) / (n - 1)), 0.0), 4) AS z
    FROM sums WHERE n >= 3
"""


@query("q_win_zscore", oracle=ZSCORE_SQL)
def q_win_zscore(spark, sf_dir):
    """Rolling z-score anomaly detector: each event scored against the
    mean/std of its user's trailing {ZS_FRAME - 1}-event baseline
    (ROWS BETWEEN {ZS_FRAME - 1} PRECEDING AND 1 PRECEDING — the frame
    ends at 1 PRECEDING so the current value never contaminates its
    own baseline, the leakage mistake that mutes exactly the outliers
    being hunted). Complements q_anomaly (global per-user stats) with
    the streaming-shaped trailing baseline.

    Same single-Exchange co-moment shape as q_win_regression: n, Σx,
    Σx² as windowed decimal aggregates, constant per-row state; rows
    with fewer than 3 baseline events are excluded rather than scored
    against noise, and a zero-variance baseline yields NULL."""
    ev = load(spark, sf_dir, "events")
    wf = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(ZS_FRAME - 1), -1)
    )
    sums = ev.select(
        "user_id",
        "event_id",
        "value",
        F.count("*").over(wf).cast("long").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(wf).cast("double").alias("s1"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(28,10)"))
        .over(wf)
        .cast("double")
        .alias("s2"),
    )
    sd = F.sqrt((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1))
    return sums.filter(F.col("n") >= 3).select(
        "user_id",
        "event_id",
        F.round(
            (F.col("value") - F.col("s1") / F.col("n")) / F.when(sd != 0.0, sd), 4
        ).alias("z"),
    )


MEDIAN_SQL = """
    WITH ranked AS (
        SELECT l_returnflag, l_linestatus, l_extendedprice,
               row_number() OVER (PARTITION BY l_returnflag, l_linestatus
                                  ORDER BY l_extendedprice, l_orderkey,
                                           l_linenumber) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag, l_linestatus) AS n
        FROM lineitem
    )
    SELECT l_returnflag, l_linestatus, CAST(n AS BIGINT) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS median_price
    FROM ranked
    WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
    GROUP BY l_returnflag, l_linestatus, n
"""


@query("q_win_median", oracle=MEDIAN_SQL)
def q_win_median(spark, sf_dir):
    """EXACT group median without engine median()/percentile()
    built-ins (whose interpolation fp differs across engines): rank
    within the group, keep the one or two middle rows, average them
    through an exact decimal sum — even/odd group sizes both fall out
    of the rn IN ((n+1)/2, (n+2)/2) selection.

    The window partitions on the GROUP keys, so ranking is fully
    distributed (each group sorts its own partition slice — never a
    global sort); the follow-up aggregate reuses the same hash keys.
    At 100 TB, exact medians of high-cardinality groups are exactly
    this shape; a single giant group would switch to the two-pass
    bucket prune of q_percentile_exact_dist."""
    li = load(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_returnflag", "l_linestatus")
    ranked = li.select(
        "l_returnflag",
        "l_linestatus",
        "l_extendedprice",
        F.row_number()
        .over(w.orderBy("l_extendedprice", "l_orderkey", "l_linenumber"))
        .alias("rn"),
        F.count("*").over(w).alias("n"),
    )
    mid = ranked.filter(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
    )
    return mid.groupBy("l_returnflag", "l_linestatus", "n").agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("median_price")
    ).select("l_returnflag", "l_linestatus", F.col("n").cast("long").alias("n"), "median_price")


RATIO_SQL = """
    WITH t AS (
        SELECT o_orderkey, o_orderpriority, o_totalprice,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_orderpriority) AS DOUBLE) AS grp_total
        FROM orders
    )
    SELECT o_orderkey, o_orderpriority,
           ROUND(o_totalprice / grp_total, 8) AS share
    FROM t
"""


@query("q_win_ratio_to_report", oracle=RATIO_SQL)
def q_win_ratio_to_report(spark, sf_dir):
    """Ratio-to-report: each order's share of its priority class's
    total — the denominator is a whole-partition window SUM through an
    exact decimal (order-independent), so every row's share is
    bit-stable however the partition is scanned. One Exchange on the
    partition key; the class totals never leave the executors (no
    collect, no second scan) — the windowed form of the
    aggregate-then-rejoin idiom, one shuffle cheaper."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority")
    total = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") / total, 8).alias("share"),
    )


# --- percent_rank / cume_dist (staged r6, registered r7).
PCTRANK_SQL = """
    SELECT user_id, event_id,
           ROUND(percent_rank() OVER w, 8) AS pct_rank,
           ROUND(cume_dist() OVER w, 8) AS cume
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY value NULLS FIRST, event_id)
"""


@query("q_win_percent_rank", oracle=PCTRANK_SQL)
def q_win_percent_rank(spark, sf_dir):
    """Relative standing of every event within its user's value
    distribution: percent_rank = (rank−1)/(n−1) and cume_dist =
    |rows ≤ current|/n — the per-entity percentile features a
    training-data pipeline derives before global normalization.

    Both built-ins are rank arithmetic over one user-partitioned
    ordered pass (a single Exchange on user_id; each partition sorts
    its own slice): the divisions are single exact IEEE ops on
    integers, identical across engines, and the unique (value,
    event_id) ordering pins tie behavior. 8dp rounds only shorten the
    printed repr — the quotients are already deterministic."""
    ev = load(spark, sf_dir, "events")
    # NULL ordering pinned explicitly (r19 'nulls' fuzz tier): Spark
    # ASC defaults to NULLS FIRST, DuckDB to NULLS LAST — unpinned,
    # every rank past a NULL shifts and the hash diverges. Missing
    # values rank lowest (the conventional missing-first feature).
    w = W.partitionBy("user_id").orderBy(
        F.col("value").asc_nulls_first(), "event_id"
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.percent_rank().over(w), 8).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 8).alias("cume"),
    )
