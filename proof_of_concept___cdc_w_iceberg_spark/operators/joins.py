"""§2.3 — joins.

General SQL surface (`init_for_test.py:66-79` executes arbitrary joins
via Trino); the anti/full variants are also the MERGE-fallback
primitives for CDC upsert (`connect-iceberg-sink.json:30-33`).

Scale notes: dimension sides (region/nation/part/supplier) are
explicitly ``broadcast()`` — at 100 TB the fact side never shuffles
for those. Fact-fact joins (orders⋈lineitem) shuffle on the join key;
with bucketed tables they'd co-locate. AQE handles skew splits.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load
from ._util import dec_sum


@query(
    "q_join_inner",
    oracle="""
        SELECT o.o_orderkey, c.c_name, o.o_totalprice
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_join_inner(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", "o_totalprice"
    )


@query(
    "q_join_broadcast",
    oracle="""
        SELECT p.p_brand, CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
    """,
)
def q_join_broadcast(spark, sf_dir):
    """Broadcast hash join: part is a small dim — ship it to every
    executor, zero shuffle on the 100 TB fact side."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(dec_sum("l_quantity").alias("sum_qty"), F.count("*").alias("n_items"))
    )


@query(
    "q_join_left",
    oracle="""
        SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    """,
)
def q_join_left(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "q_join_right",
    oracle="""
        SELECT c.c_custkey, o.o_orderkey
        FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_join_right(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "c_custkey", "o_orderkey"
    )


@query(
    "q_join_full",
    oracle="""
        WITH spend AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
            FROM orders GROUP BY o_custkey
        ),
        big AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000)
        SELECT COALESCE(s.o_custkey, b.c_custkey) AS custkey,
               s.total_spend, b.c_acctbal
        FROM spend s FULL JOIN big b ON s.o_custkey = b.c_custkey
    """,
)
def q_join_full(spark, sf_dir):
    """Full outer join — also the MERGE-fallback primitive
    (cdc/apply.py merge_upsert)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    spend = o.groupBy("o_custkey").agg(dec_sum("o_totalprice").alias("total_spend"))
    big = c.filter(F.col("c_acctbal") > 5000).select("c_custkey", "c_acctbal")
    return spend.join(big, spend.o_custkey == big.c_custkey, "full").select(
        F.coalesce("o_custkey", "c_custkey").alias("custkey"),
        "total_spend",
        "c_acctbal",
    )


@query(
    "q_join_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_semi(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_anti",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_anti(spark, sf_dir):
    """NOT EXISTS — the new-key detection primitive in CDC apply."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_cross",
    oracle="SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n",
)
def q_join_cross(spark, sf_dir):
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "q_join_theta",
    oracle="""
        SELECT a.n_name AS n1, b.n_name AS n2
        FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    """,
)
def q_join_theta(spark, sf_dir):
    """Non-equi (theta) join — broadcast nested loop on a bounded side."""
    a = load(spark, sf_dir, "nation").alias("a")
    b = load(spark, sf_dir, "nation").alias("b")
    return a.join(b, F.col("a.n_nationkey") < F.col("b.n_nationkey")).select(
        F.col("a.n_name").alias("n1"), F.col("b.n_name").alias("n2")
    )


@query(
    "q_join_multiway",
    oracle="""
        SELECT r.r_name,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        FROM region r
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        GROUP BY r.r_name
    """,
)
def q_join_multiway(spark, sf_dir):
    """3-table star join; both dims broadcast, fact side never shuffles
    until the final (tiny) aggregation."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"), dec_sum("c_acctbal").alias("sum_bal"))
    )


@query(
    "q_join_asof",
    oracle="""
        WITH ranked AS (
            SELECT e.event_id, o.o_orderkey, o.o_orderdate,
                   row_number() OVER (
                       PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
                   ) AS rn
            FROM events e
            JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        )
        SELECT event_id, o_orderkey AS asof_orderkey, o_orderdate AS asof_orderdate
        FROM ranked WHERE rn = 1
    """,
)
def q_join_asof(spark, sf_dir):
    """As-of join: each event enriched with the most recent order of the
    same user at event time — CDC mirror tables are exactly 'latest
    state as of now' (`connect-iceberg-sink.json:30-33`).

    Implemented as range join + per-event ``max_by`` (hash aggregation
    with map-side partials — measured 3x faster than the row_number
    window, which must shuffle-sort every candidate row). At 100 TB
    the scale path buckets both sides by user and sorts within buckets
    (a sort-merge interval join); for small dimension sides, broadcast
    + aggregate is enough.
    """
    e = load(spark, sf_dir, "events").alias("e")
    o = load(spark, sf_dir, "orders").alias("o")
    joined = e.join(
        o,
        (F.col("o.o_custkey") == F.col("e.user_id"))
        & (F.col("o.o_orderdate") <= F.col("e.ts")),
    )
    # lexicographic max over (o_orderdate, o_orderkey) == the rn=1 row
    # of the desc/desc window in the oracle
    return (
        joined.groupBy("event_id")
        .agg(
            F.max_by(
                F.struct("o_orderkey", "o_orderdate"),
                F.struct("o_orderdate", "o_orderkey"),
            ).alias("m")
        )
        .select(
            "event_id",
            F.col("m.o_orderkey").alias("asof_orderkey"),
            F.col("m.o_orderdate").alias("asof_orderdate"),
        )
    )


_BAND_MS = 300_000      # |error.ts - click.ts| <= 5 minutes
_BUCKET_MS = 600_000    # bucket width 10 min (>= band width, so a
#                         match's partner lies in bucket b-1, b, or b+1)


@query(
    "q_join_range_bucketed",
    oracle=f"""
        SELECT e.event_id AS eid, CAST(count(*) AS BIGINT) AS n_nearby_clicks
        FROM events e JOIN events c
          ON c.event_type = 'click'
         AND abs(epoch_ms(e.ts) - epoch_ms(c.ts)) <= {_BAND_MS}
        WHERE e.event_type = 'error'
        GROUP BY e.event_id
    """,
)
def q_join_range_bucketed(spark, sf_dir):
    """Band (interval) join WITHOUT an equi-key — nearby-in-time click
    count per error event — made scalable by time-bucket blocking.

    A naive ``|t1 - t2| <= w`` theta join has no equi-key and plans as
    a nested-loop join: O(|errors| x |clicks|). Blocking fixes it: with
    bucket width >= band width, a matching partner can only live in the
    probe row's bucket or its two neighbors, so exploding the probe
    side to 3 candidate buckets turns the theta join into an EQUI-join
    on the bucket (3x probe-side duplication buys a hash join), with
    the exact band predicate left as a residual filter. Each qualifying
    pair matches in exactly one bucket — no dedup pass needed. The
    oracle runs the plain theta join (fine at oracle scale).

    Timestamps compare in epoch MILLIS on both engines (Spark
    ``unix_millis`` == DuckDB ``epoch_ms``) — second-truncation would
    disagree at the band edge.
    """
    ev = load(spark, sf_dir, "events")
    clk = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.unix_millis("ts").alias("c_ms"),
            (F.unix_millis("ts") / _BUCKET_MS).cast("long").alias("bucket"),
        )
    )
    err = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("eid"),
            F.unix_millis("ts").alias("e_ms"),
            (F.unix_millis("ts") / _BUCKET_MS).cast("long").alias("b"),
        )
        .withColumn("bucket", F.explode(F.expr("array(b - 1L, b, b + 1L)")))
    )
    return (
        err.join(clk, "bucket")
        .filter(F.abs(F.col("e_ms") - F.col("c_ms")) <= _BAND_MS)
        .groupBy("eid")
        .agg(F.count("*").alias("n_nearby_clicks"))
    )


@query(
    "q_join_asof_forward",
    oracle="""
        WITH cand AS (
            SELECT e.event_id, o.o_orderkey, o.o_orderdate,
                   row_number() OVER (
                       PARTITION BY e.event_id
                       ORDER BY o.o_orderdate, o.o_orderkey
                   ) AS rn
            FROM events e JOIN orders o
              ON o.o_custkey = e.user_id AND o.o_orderdate > e.ts
        )
        SELECT event_id, o_orderkey AS next_orderkey,
               o_orderdate AS next_orderdate
        FROM cand WHERE rn = 1
    """,
)
def q_join_asof_forward(spark, sf_dir):
    """FORWARD as-of join: each event matched to the EARLIEST strictly
    subsequent order of the same user — the label-attachment direction
    ("what happened next") used for outcome labeling in training-data
    prep, where the backward as-of (q_join_asof) is the feature
    direction ("state as of then"). min_by over the candidate range —
    same single-aggregation shape as the backward variant, map-side
    combinable, no window sort over candidates."""
    e = load(spark, sf_dir, "events").alias("e")
    o = load(spark, sf_dir, "orders").alias("o")
    joined = e.join(
        o,
        (F.col("o.o_custkey") == F.col("e.user_id"))
        & (F.col("o.o_orderdate") > F.col("e.ts")),
    )
    return (
        joined.groupBy("event_id")
        .agg(
            F.min_by(
                F.struct("o_orderkey", "o_orderdate"),
                F.struct("o_orderdate", "o_orderkey"),
            ).alias("m")
        )
        .select(
            "event_id",
            F.col("m.o_orderkey").alias("next_orderkey"),
            F.col("m.o_orderdate").alias("next_orderdate"),
        )
    )


INTERVAL_JOIN_SQL = """
    WITH user_iv AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               epoch_ms(MIN(ts)) AS u_start, epoch_ms(MAX(ts)) AS u_end
        FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    type_iv AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               epoch_ms(MIN(ts)) AS t_start, epoch_ms(MAX(ts)) AS t_end
        FROM events WHERE event_type IN ('error', 'purchase')
        GROUP BY event_type, CAST(ts AS DATE)
    )
    SELECT u.user_id, t.event_type, u.day,
           CAST(least(u.u_end, t.t_end) - greatest(u.u_start, t.t_start)
                AS BIGINT) AS overlap_ms
    FROM user_iv u JOIN type_iv t
      ON u.day = t.day
     AND u.u_start <= t.t_end AND t.t_start <= u.u_end
"""


@query("q_join_interval", oracle=INTERVAL_JOIN_SQL)
def q_join_interval(spark, sf_dir):
    """Interval-OVERLAP join (SQL:2011 temporal-join shape): per-user
    daily activity intervals x per-type daily incident windows, matched
    when the intervals intersect, emitting the overlap duration. The
    range-bucketed complement to q_join_range_bucketed's point-in-band
    join: BOTH sides are intervals.

    Scale shape: the overlap predicate alone has no equi-key (nested
    loop); blocking on the containing time bucket (here the day — both
    interval relations are day-grained, so each interval lives in
    exactly one bucket and the join is a pure EQUI-join with the
    overlap as residual). For intervals spanning buckets, the general
    pattern is q_join_range_bucketed's: explode each interval to its
    covered buckets, equi-join, dedup on the interval pair. Both input
    relations come from ONE events scan each, map-combined; the join
    key (day) spreads uniformly, the incident side is |types x days|
    — broadcastable."""
    ev = load(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    user_iv = ev.groupBy("user_id", day.alias("day")).agg(
        F.unix_millis(F.min("ts")).alias("u_start"),
        F.unix_millis(F.max("ts")).alias("u_end"),
    )
    type_iv = (
        ev.filter(F.col("event_type").isin("error", "purchase"))
        .groupBy("event_type", day.alias("day"))
        .agg(
            F.unix_millis(F.min("ts")).alias("t_start"),
            F.unix_millis(F.max("ts")).alias("t_end"),
        )
    )
    return (
        user_iv.join(F.broadcast(type_iv), "day")
        .filter(
            (F.col("u_start") <= F.col("t_end"))
            & (F.col("t_start") <= F.col("u_end"))
        )
        .select(
            "user_id",
            "event_type",
            "day",
            (
                F.least("u_end", "t_end") - F.greatest("u_start", "t_start")
            ).cast("long").alias("overlap_ms"),
        )
    )


TEMPORAL_PROBES = (1500, 2500, 3500, 4500, 5500)

TEMPORAL_JOIN_SQL = f"""
    WITH changes AS (
        SELECT CAST(c_custkey AS BIGINT) AS k, c_name AS name, c_acctbal AS bal,
               'r' AS op, CAST(1000 AS BIGINT) AS ts_ms,
               CAST(c_custkey AS BIGINT) AS off
        FROM customer
        UNION ALL
        SELECT c_custkey, c_name, c_acctbal + 100.0, 'u', 2000, 1000000 + c_custkey
        FROM customer WHERE c_custkey % 10 = 0
        UNION ALL
        SELECT c_custkey, c_name, c_acctbal + 200.0, 'u', 3000, 2000000 + c_custkey
        FROM customer WHERE c_custkey % 20 = 0
        UNION ALL
        SELECT c_custkey, NULL, NULL, 'd', 4000, 3000000 + c_custkey
        FROM customer WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT c_custkey, 're_' || c_name, c_acctbal + 1.0, 'c', 5000, 5000000 + c_custkey
        FROM customer WHERE c_custkey % 21 = 0
    ),
    dim AS (
        SELECT k, name, bal, op, ts_ms AS valid_from,
               COALESCE(lead(ts_ms) OVER (PARTITION BY k ORDER BY ts_ms, off),
                        9223372036854775807) AS valid_to
        FROM changes
    ),
    probes AS (
        SELECT k, t FROM (SELECT DISTINCT k FROM changes),
             (SELECT UNNEST(ARRAY[{', '.join(str(t) for t in TEMPORAL_PROBES)}]) AS t)
        WHERE k % 5 = 0
    )
    SELECT p.k, CAST(p.t AS BIGINT) AS t, d.name, d.bal
    FROM probes p JOIN dim d
      ON d.k = p.k AND d.valid_from <= p.t AND p.t < d.valid_to
    WHERE d.op <> 'd'
"""


@query("q_join_temporal", oracle=TEMPORAL_JOIN_SQL)
def q_join_temporal(spark, sf_dir):
    """Temporal (point-in-time / SCD2) dimension join — Flink's
    temporal table join and SQL:2011 `FOR SYSTEM_TIME AS OF`: each
    probe (key, t) retrieves the dimension version valid AT t, i.e.
    valid_from <= t < valid_to, skipping intervals opened by a delete.

    The version relation is q_cdc_scd2's one-window build (validity =
    [event ts, next event ts)); the probe side here is a generated
    (key × 5 timestamps) grid standing in for a fact table's
    (fk, event_time) pairs. The join is EQUI on k with the validity
    range as a residual — one shuffle on the key, never a range cross
    join; per-key version counts are bounded by change frequency, so
    the residual scan is a handful of rows per probe at any scale.
    Reference parity: the reinsert-after-delete keys
    (`cdc_fixtures.py` §A.3 mix) prove gap semantics — probes inside
    a deleted interval return no row, probes after the reinsert see
    the new version."""
    from ..sources.cdc_fixtures import changelog

    # Exclude the ts=2500 insert branch (new keys) so the probe grid
    # stays aligned with the oracle's inline changelog above.
    ch = changelog(spark, sf_dir).filter(F.col("k") < 10_000_000)
    w = Window.partitionBy("k").orderBy("ts_ms", "off")
    dim = ch.select(
        "k",
        "name",
        "bal",
        "op",
        F.col("ts_ms").alias("valid_from"),
        F.coalesce(F.lead("ts_ms").over(w), F.lit(2**63 - 1)).alias("valid_to"),
    )
    probes = (
        ch.select(F.col("k").alias("pk"))
        .distinct()
        .filter(F.col("pk") % 5 == 0)
        .crossJoin(
            F.broadcast(
                load(spark, sf_dir, "region")
                .limit(1)
                .select(F.explode(F.array(*[F.lit(t) for t in TEMPORAL_PROBES])).alias("t"))
            )
        )
    )
    return (
        probes.join(
            dim,
            (F.col("pk") == F.col("k"))
            & (F.col("valid_from") <= F.col("t"))
            & (F.col("t") < F.col("valid_to")),
        )
        .filter(F.col("op") != "d")
        .select(F.col("pk").alias("k"), F.col("t").cast("long").alias("t"), "name", "bal")
    )


NULLSAFE_JOIN_SQL = """
    WITH l AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 = 0 THEN NULL
                    ELSE o_orderpriority END AS grp
        FROM orders WHERE o_orderkey % 2 = 0
    ),
    r AS (
        SELECT CASE WHEN n % 3 = 0 THEN NULL ELSE pr END AS grp,
               CAST(n AS BIGINT) AS grp_rank
        FROM (
            SELECT DISTINCT o_orderpriority AS pr,
                   CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS n
            FROM orders
        )
    )
    SELECT l.o_orderkey, r.grp_rank,
           COALESCE(l.grp, '<null>') AS grp
    FROM l JOIN r ON l.grp IS NOT DISTINCT FROM r.grp
"""


@query("q_join_nullsafe", oracle=NULLSAFE_JOIN_SQL)
def q_join_nullsafe(spark, sf_dir):
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    MATCH each other — the semantics CDC merge comparisons and
    dimension lookups with unknown-bucket rows need (a plain `=` join
    silently drops every NULL-keyed row). Spark plans `<=>` as a real
    HASH join key (NULL becomes an ordinary key value), so this stays
    a broadcast/shuffle hash join — no nested-loop penalty for the
    null-safe semantics; the dim side here is tiny and broadcasts."""
    o = load(spark, sf_dir, "orders")
    left = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(None))
        .otherwise(F.col("o_orderpriority"))
        .alias("grp"),
    )
    dim = (
        o.select(F.col("o_orderpriority").alias("pr")).distinct()
        .select(
            "pr", F.substring("pr", 1, 1).cast("long").alias("n")
        )
        .select(
            F.when(F.col("n") % 3 == 0, F.lit(None)).otherwise(F.col("pr")).alias("r_grp"),
            F.col("n").alias("grp_rank"),
        )
    )
    return (
        left.join(F.broadcast(dim), F.col("grp").eqNullSafe(F.col("r_grp")))
        .select(
            "o_orderkey",
            "grp_rank",
            F.coalesce(F.col("grp"), F.lit("<null>")).alias("grp"),
        )
    )


ASOF_NEAREST_SQL = """
    WITH clicks AS (
        SELECT event_id AS click_id, user_id, ts AS c_ts
        FROM events WHERE event_type = 'click'
    ),
    views AS (
        SELECT event_id AS view_id, user_id AS v_user, ts AS v_ts
        FROM events WHERE event_type = 'view'
    ),
    cand AS (
        SELECT c.click_id, c.user_id, v.view_id,
               ABS(date_diff('second', v.v_ts, c.c_ts)) AS gap_s
        FROM clicks c JOIN views v
          ON v.v_user = c.user_id
         AND v.v_ts BETWEEN c.c_ts - INTERVAL 30 MINUTE
                        AND c.c_ts + INTERVAL 30 MINUTE
    ),
    ranked AS (
        SELECT click_id, user_id, view_id, CAST(gap_s AS BIGINT) AS gap_s,
               row_number() OVER (PARTITION BY click_id
                                  ORDER BY gap_s, view_id) AS rn
        FROM cand
    )
    SELECT click_id, user_id, view_id, gap_s FROM ranked WHERE rn = 1
"""


@query("q_join_asof_nearest", oracle=ASOF_NEAREST_SQL)
def q_join_asof_nearest(spark, sf_dir):
    """NEAREST-match as-of join: each click pairs with the view
    closest in event time (either direction, ±30 min tolerance) — the
    third member of the as-of family (q_join_asof = backward,
    q_join_asof_forward = forward), the matching mode sensor-fusion
    and attribution pipelines want when causality can run either way.

    Same scale shape as its siblings: equi-join on the entity key
    with a bounded time-range predicate (the tolerance bounds
    candidate fan-out), then one rank window on the join's own
    partitioning picks the minimum |gap| with a deterministic
    tiebreak (gap, view_id). Integer-second gaps keep the ordering
    cross-engine exact."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    cand = clicks.join(
        views,
        (F.col("v_user") == F.col("user_id"))
        & (F.col("v_ts") >= F.col("c_ts") - F.expr("INTERVAL 30 MINUTE"))
        & (F.col("v_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTE")),
    ).select(
        "click_id",
        "user_id",
        "view_id",
        F.abs(
            F.unix_timestamp("c_ts") - F.unix_timestamp("v_ts")
        ).cast("long").alias("gap_s"),
    )
    w = Window.partitionBy("click_id").orderBy("gap_s", "view_id")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("click_id", "user_id", "view_id", "gap_s")
    )
