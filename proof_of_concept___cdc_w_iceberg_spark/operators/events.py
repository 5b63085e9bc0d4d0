"""Event-stream batch analytics — funnel + cohort retention.

The reference's lake tables are queried with arbitrary SQL through
Trino (`init_for_test.py:66-79`); funnels and retention cohorts are
the canonical event-table queries a product pipeline runs over the
CDC-mirrored `events` stream. Both are expressed as ordinary joins +
aggregates so Catalyst plans them distributed (no per-user iteration).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load, register_views
from ._util import (
    dec2d_sql,
    drain_tracked_persists,
    rdiv,
    rdiv_sql,
    track_persist,
)

# funnel step windows: click within 1h of first view, purchase within
# 24h of first qualifying click
_FUNNEL_SQL = """
    WITH v AS (
        SELECT user_id, min(ts) AS v_ts FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS c_ts
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click'
          AND e.ts > v.v_ts AND e.ts <= v.v_ts + INTERVAL '1' HOUR
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS p_ts
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase'
          AND e.ts > c.c_ts AND e.ts <= c.c_ts + INTERVAL '24' HOUR
        GROUP BY e.user_id
    )
    SELECT 1 AS stage, 'view' AS step, CAST((SELECT count(*) FROM v) AS BIGINT) AS n_users
    UNION ALL
    SELECT 2, 'click', CAST((SELECT count(*) FROM c) AS BIGINT)
    UNION ALL
    SELECT 3, 'purchase', CAST((SELECT count(*) FROM p) AS BIGINT)
"""


@query("q_funnel", oracle=_FUNNEL_SQL)
def q_funnel(spark, sf_dir):
    """Conversion funnel view -> click(<=1h) -> purchase(<=24h): users
    surviving each step-with-deadline. Each stage is a per-user min
    aggregate + an equi-join on user_id — at 100 TB all three stages
    co-partition on user_id, so after the first shuffle the rest are
    local (AQE reuses the partitioning), and nothing iterates
    per-user."""
    ev = load(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("v_ts"))
            & (F.col("ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id").agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("c_ts"))
            & (F.col("ts") <= F.col("c_ts") + F.expr("INTERVAL 24 HOUR"))
        )
        .groupBy("user_id").agg(F.min("ts").alias("p_ts"))
    )
    stage = [(1, "view", v), (2, "click", c), (3, "purchase", p)]
    out = None
    for num, name, df in stage:
        row = df.agg(F.count("*").alias("n_users")).select(
            F.lit(num).alias("stage"), F.lit(name).alias("step"), "n_users"
        )
        out = row if out is None else out.unionByName(row)
    return out


_RETENTION_SQL = """
    WITH first_seen AS (
        SELECT user_id, CAST(min(ts) AS DATE) AS cohort_date
        FROM events GROUP BY user_id
    )
    SELECT f.cohort_date,
           CAST(date_diff('day', f.cohort_date, CAST(e.ts AS DATE)) AS INT)
               AS day_offset,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    WHERE date_diff('day', f.cohort_date, CAST(e.ts AS DATE)) <= 7
    GROUP BY 1, 2
"""


@query("q_retention", oracle=_RETENTION_SQL)
def q_retention(spark, sf_dir):
    """Cohort retention: users grouped by first-seen date, activity
    counted at day offsets 0..7. One per-user min (shuffle on
    user_id), one join back co-partitioned on user_id, one final
    aggregate whose key space is |cohorts| x 8 — tiny at any scale.
    Spark's datediff(end, start) == DuckDB date_diff('day', start,
    end): argument order differs, semantics match."""
    ev = load(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort_date")
    )
    offset = F.datediff(F.col("ts").cast("date"), F.col("cohort_date"))
    return (
        ev.join(first_seen, "user_id")
        .withColumn("day_offset", offset)
        .filter(F.col("day_offset") <= 7)
        .groupBy("cohort_date", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


_EWMA_ALPHA = 0.25  # exactly representable in binary — the fold is a
#                     chain of exactly-rounded IEEE ops on both engines


@query(
    "q_ts_ewma",
    oracle=f"""
        SELECT user_id,
               ROUND(list_reduce(list(value ORDER BY ts, event_id),
                     (acc, x) -> {_EWMA_ALPHA} * x + {1 - _EWMA_ALPHA} * acc), 6)
                   AS ewma,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY user_id
    """,
)
def q_ts_ewma(spark, sf_dir):
    """Per-user exponentially-weighted moving average of event value —
    the canonical inherently-SEQUENTIAL time-series operator. Expressed
    as one shuffle on user_id + an array-side left fold:
    sort_array(collect_list(struct)) orders each user's events by
    (ts, event_id), then ``aggregate`` folds s = a*x + (1-a)*s, seeded
    with the first value (DuckDB ``list_reduce`` has identical
    first-element-seed semantics, so the IEEE op chains are
    bit-identical — see registry.py determinism rules). Per-user state
    is that user's event list; at 100 TB this keys on user_id
    (millions of groups), never a global sort."""
    ev = load(spark, sf_dir, "events")
    arr = F.sort_array(F.collect_list(F.struct("ts", "event_id", "value")))
    vals = F.transform(arr, lambda a: a["value"])
    ewma = F.aggregate(
        F.slice(vals, F.lit(2), F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(_EWMA_ALPHA) * x + F.lit(1 - _EWMA_ALPHA) * acc,
    )
    return ev.groupBy("user_id").agg(
        F.round(ewma, 6).alias("ewma"), F.count("*").alias("n_events")
    )


@query(
    "q_ts_resample",
    oracle="""
        WITH ranked AS (
            SELECT user_id, CAST(ts AS DATE) AS day, value,
                   row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ),
        daily AS (SELECT user_id, day, value FROM ranked WHERE rn = 1),
        spine AS (
            SELECT user_id,
                   CAST(unnest(generate_series(min(day), max(day),
                                               INTERVAL 1 DAY)) AS DATE) AS day
            FROM daily GROUP BY user_id
        )
        SELECT s.user_id, s.day,
               last_value(d.value IGNORE NULLS) OVER (
                   PARTITION BY s.user_id ORDER BY s.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS value_filled,
               CAST(d.value IS NOT NULL AS BIGINT) AS is_observed
        FROM spine s LEFT JOIN daily d
          ON s.user_id = d.user_id AND s.day = d.day
    """,
)
def q_ts_resample(spark, sf_dir):
    """Time-series resampling to a daily grid with LOCF gap-fill (the
    feature-engineering step before any fixed-frequency model): per
    (user, day) the LAST observation wins (max_by over the (ts,
    event_id) total order — no row_number window pass), each user's
    date spine is generated with sequence()+explode (no cross join
    against a global calendar), and gaps forward-fill with
    last(ignorenulls) over the per-user day order. Everything
    partitions on user_id — the spine explode is a narrow transform of
    the per-user (min, max) row, so no stage touches more than
    |users| x |days| rows and no global sort exists."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.select(
            "user_id",
            F.col("ts").cast("date").alias("day"),
            "ts",
            "event_id",
            "value",
        )
        .groupBy("user_id", "day")
        .agg(F.max_by("value", F.struct("ts", "event_id")).alias("obs"))
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1")).alias("day"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.last("obs", ignorenulls=True).over(w).alias("value_filled"),
            F.col("obs").isNotNull().cast("long").alias("is_observed"),
        )
    )


@query(
    "q_sessionize",
    oracle="""
        WITH gaps AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
            SELECT user_id, ts, event_id,
                   SUM(new_session) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS session_seq
            FROM gaps
        )
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               CAST(count(*) AS BIGINT) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end
        FROM sessions GROUP BY user_id, session_seq
    """,
)
def q_sessionize(spark, sf_dir):
    """Gap-based sessionization (the batch twin of session windows,
    and the form analytics warehouses actually run): a session breaks
    after 30 minutes of inactivity. lag() marks boundaries, a running
    sum numbers sessions, one aggregate summarizes them — all three
    windows partition on user_id, so the whole operator is a single
    shuffle and scales with the number of users, never a global sort.
    Deterministic tie-break: (ts, event_id) total order."""
    gap = F.expr("INTERVAL 30 MINUTES")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev = load(spark, sf_dir, "events")
    marked = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") > F.lag("ts").over(w) + gap),
            1,
        ).otherwise(0),
    ).withColumn("session_seq", F.sum("new_session").over(run))
    return marked.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "q_anomaly",
    oracle="""
        WITH stats AS (
            SELECT user_id,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(value * value AS DECIMAL(30,8))) AS DOUBLE)
                       AS sxx
            FROM events GROUP BY user_id
        )
        SELECT e.event_id, e.user_id, e.value,
               ROUND((e.value - sx / n)
                     / sqrt((sxx - sx * sx / n) / (n - 1)), 4) AS z
        FROM events e JOIN stats s ON e.user_id = s.user_id
        WHERE n >= 5 AND (sxx - sx * sx / n) / (n - 1) > 0
          AND abs((e.value - sx / n)
                  / sqrt((sxx - sx * sx / n) / (n - 1))) > 2
    """,
)
def q_anomaly(spark, sf_dir):
    """Per-user z-score outlier detection (data-quality gate for
    training pipelines): per-user mean/std from decimal-exact
    co-moments (the q_agg_stats discipline — order-independent, so
    cross-engine identical), joined back co-partitioned on user_id,
    flagging |z| > 2. Two shuffles total (aggregate + join), both on
    user_id; the stats side is |users| rows, broadcastable when the
    user count allows."""
    ev = load(spark, sf_dir, "events")
    v = F.col("value")
    stats = ev.groupBy("user_id").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(v.cast("decimal(24,6)")).cast("double").alias("sx"),
        F.sum((v * v).cast("decimal(30,8)")).cast("double").alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    var = (sxx - sx * sx / n) / (n - F.lit(1.0))
    z = (v - sx / n) / F.sqrt(var)
    return (
        ev.join(stats, "user_id")
        .filter((n >= 5) & (var > 0) & (F.abs(z) > 2))
        .select("event_id", "user_id", "value", F.round(z, 4).alias("z"))
    )


@query(
    "q_time_bucket",
    oracle="""
        WITH b AS (
            SELECT value,
                   (epoch_ms(ts) // 1000 // 3600) * 3600 AS b1h,
                   (epoch_ms(ts) // 1000 // 21600) * 21600 AS b6h,
                   (epoch_ms(ts) // 1000 // 86400) * 86400 AS b1d
            FROM events
        )
        SELECT CASE WHEN grouping(b1h) = 0 THEN '1h'
                    WHEN grouping(b6h) = 0 THEN '6h'
                    ELSE '1d' END AS gran,
               CAST(coalesce(b1h, b6h, b1d) AS BIGINT) AS bucket_start,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS sum_value
        FROM b
        GROUP BY GROUPING SETS ((b1h), (b6h), (b1d))
    """,
)
def q_time_bucket(spark, sf_dir):
    """Hypertable-style continuous-aggregate rollup: the event stream
    bucketed at 1h / 6h / 1d granularities in ONE scan — GROUPING SETS
    compiles to a single Expand (3 rows per input) + one map-combined
    aggregate, instead of three scans or a union of three groupBys.
    Buckets are epoch-second arithmetic ((unix // g) * g), identical
    integer math in both engines — no timestamp-truncation/timezone
    semantics in the hash. The aggregate keyspace is
    |hours|+|6h|+|days|, tiny at any scale."""
    register_views(spark, sf_dir)
    return spark.sql("""
        WITH b AS (
            SELECT value,
                   (unix_timestamp(ts) div 3600) * 3600 AS b1h,
                   (unix_timestamp(ts) div 21600) * 21600 AS b6h,
                   (unix_timestamp(ts) div 86400) * 86400 AS b1d
            FROM events
        )
        SELECT CASE WHEN grouping(b1h) = 0 THEN '1h'
                    WHEN grouping(b6h) = 0 THEN '6h'
                    ELSE '1d' END AS gran,
               CAST(coalesce(b1h, b6h, b1d) AS BIGINT) AS bucket_start,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS sum_value
        FROM b
        GROUP BY GROUPING SETS ((b1h), (b6h), (b1d))
    """)


_ISLANDS_SQL = """
    WITH seq AS (
        SELECT user_id, event_type, ts, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn_all,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn_type
        FROM events
    )
    SELECT user_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS run_len,
           MIN(ts) AS run_start, MAX(ts) AS run_end
    FROM seq
    GROUP BY user_id, event_type, rn_all - rn_type
"""


@query("q_islands", oracle=_ISLANDS_SQL)
def q_islands(spark, sf_dir):
    """Gaps-and-islands: maximal runs of consecutive same-type events
    per user (the classic rn_all - rn_type grouping). The primitive
    behind streak analytics ("N failed payments in a row"), error-burst
    detection, and repeated-crawl collapse.

    Scale shape: both window specs partition by user_id with the same
    ordering, so Catalyst plans ONE Exchange on user_id reused by both
    row_numbers and the final groupBy is map-side-combinable on top of
    the same partitioning. No join, no second shuffle; survives 100 TB
    of events as a single pass per key."""
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            "ts",
            "event_id",
            (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("grp"),
        )
        .groupBy("user_id", "event_type", "grp")
        .agg(
            F.count("*").cast("long").alias("run_len"),
            F.min("ts").alias("run_start"),
            F.max("ts").alias("run_end"),
        )
        .drop("grp")
    )


_FEATURE_PIT_SQL = """
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type, value,
               last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
                   OVER w AS last_view_ts,
               last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
                   OVER w AS last_click_ts,
               CAST(coalesce(SUM(CASE WHEN event_type = 'view' THEN 1 END)
                   OVER w, 0) AS BIGINT) AS n_prior_views,
               CAST(coalesce(SUM(CASE WHEN event_type = 'click' THEN 1 END)
                   OVER w, 0) AS BIGINT) AS n_prior_clicks
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, ts AS label_ts, value AS label_value,
           last_view_ts, last_click_ts, n_prior_views, n_prior_clicks
    FROM seq WHERE event_type = 'purchase'
"""


@query("q_feature_pit", oracle=_FEATURE_PIT_SQL)
def q_feature_pit(spark, sf_dir):
    """Point-in-time-correct feature join (the feature-store
    primitive): for every label event (purchase), attach the latest
    STRICTLY-PRIOR observation from each feature stream (last view ts,
    last click ts, prior view/click counts) — the
    unbounded-to-1-preceding frame is what makes it leakage-free (the
    label row's own time never feeds its features).

    Expressed as ONE pass over the unioned event log instead of N
    per-feature as-of joins: every feature column is a conditional
    window aggregate over the same (user_id, ts) frame, so the plan is
    a single shuffle on user_id — at 100 TB, N feature streams cost
    the same one Exchange as one stream, vs N merge-joins for the
    textbook formulation."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    return (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            "value",
            F.last(view_ts, ignorenulls=True).over(w).alias("last_view_ts"),
            F.last(click_ts, ignorenulls=True).over(w).alias("last_click_ts"),
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "view", 1)).over(w), F.lit(0)
            ).cast("long").alias("n_prior_views"),
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "click", 1)).over(w), F.lit(0)
            ).cast("long").alias("n_prior_clicks"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("label_ts"),
            F.col("value").alias("label_value"),
            "last_view_ts",
            "last_click_ts",
            "n_prior_views",
            "n_prior_clicks",
        )
    )


_INTERP_SQL = """
    WITH ranked AS (
        SELECT user_id, CAST(ts AS DATE) AS day, value,
               row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ),
    daily AS (SELECT user_id, day, value AS obs FROM ranked WHERE rn = 1),
    spine AS (
        SELECT user_id,
               CAST(unnest(generate_series(min(day), max(day),
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM daily GROUP BY user_id
    ),
    joined AS (
        SELECT s.user_id, s.day, d.obs,
               last_value(d.obs IGNORE NULLS) OVER wp AS prev_val,
               last_value(CASE WHEN d.obs IS NOT NULL THEN s.day END
                          IGNORE NULLS) OVER wp AS prev_day,
               first_value(d.obs IGNORE NULLS) OVER wn AS next_val,
               first_value(CASE WHEN d.obs IS NOT NULL THEN s.day END
                           IGNORE NULLS) OVER wn AS next_day
        FROM spine s LEFT JOIN daily d
          ON s.user_id = d.user_id AND s.day = d.day
        WINDOW wp AS (PARTITION BY s.user_id ORDER BY s.day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY s.user_id ORDER BY s.day
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, day,
           ROUND(CASE WHEN obs IS NOT NULL THEN obs
                      ELSE prev_val + (next_val - prev_val)
                           * date_diff('day', prev_day, day)
                           / date_diff('day', prev_day, next_day)
                 END, 6) AS value_interp,
           CAST(obs IS NOT NULL AS BIGINT) AS is_observed
    FROM joined
"""


@query("q_ts_interpolate", oracle=_INTERP_SQL)
def q_ts_interpolate(spark, sf_dir):
    """Daily-grid resample with LINEAR interpolation across gaps (the
    numeric complement to q_ts_resample's LOCF): a missing day gets
    prev + (next-prev)·Δt_frac between its surrounding observations.
    Interior gaps always have both endpoints because each user's spine
    spans exactly their observed [min_day, max_day].

    Scale shape identical to q_ts_resample: one shuffle on user_id
    feeds the daily compaction, the spine explode, and BOTH
    direction-opposed windows (same partitioning, opposite frames);
    the interpolation arithmetic is identical IEEE754 in both engines
    on identical inputs, rounded at 6 dp."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.select("user_id", F.col("ts").cast("date").alias("day"), "ts",
                  "event_id", "value")
        .groupBy("user_id", "day")
        .agg(F.max_by("value", F.struct("ts", "event_id")).alias("obs"))
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    wp = (Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wn = (Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    obs_day = F.when(F.col("obs").isNotNull(), F.col("day"))
    joined = (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id", "day", "obs",
            F.last("obs", ignorenulls=True).over(wp).alias("prev_val"),
            F.last(obs_day, ignorenulls=True).over(wp).alias("prev_day"),
            F.first("obs", ignorenulls=True).over(wn).alias("next_val"),
            F.first(obs_day, ignorenulls=True).over(wn).alias("next_day"),
        )
    )
    frac = (
        F.datediff(F.col("day"), F.col("prev_day")).cast("double")
        / F.datediff(F.col("next_day"), F.col("prev_day"))
    )
    interp = F.when(F.col("obs").isNotNull(), F.col("obs")).otherwise(
        F.col("prev_val") + (F.col("next_val") - F.col("prev_val")) * frac
    )
    return joined.select(
        "user_id",
        "day",
        F.round(interp, 6).alias("value_interp"),
        F.col("obs").isNotNull().cast("long").alias("is_observed"),
    )


_AUTOCORR_SQL = """
    WITH seq AS (
        SELECT user_id, value,
               lag(value) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS prev
        FROM events
    ),
    pairs AS (SELECT user_id, value AS x, prev AS y FROM seq
              WHERE prev IS NOT NULL),
    moments AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(x AS DECIMAL(20,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(20,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x * y AS DECIMAL(24,8))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(x * x AS DECIMAL(24,8))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y * y AS DECIMAL(24,8))) AS DOUBLE) AS syy
        FROM pairs GROUP BY user_id
    )
    SELECT user_id, n,
           ROUND((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
               AS autocorr
    FROM moments
    WHERE n >= 3 AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
"""


@query("q_ts_autocorr", oracle=_AUTOCORR_SQL)
def q_ts_autocorr(spark, sf_dir):
    """Per-user lag-1 autocorrelation of event values — the
    self-similarity diagnostic behind seasonality detection and
    anomaly-model selection (a series with high |r| needs a temporal
    model; near-zero means i.i.d. treatment is fine). Pearson r of
    (x_t, x_{t-1}) from DECIMAL-exact co-moments (the same
    order-independent accumulation as q_agg_stats), one lag window +
    one aggregate on a single user_id partitioning."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        load(spark, sf_dir, "events")
        .select("user_id", F.col("value").alias("x"), F.lag("value").over(w).alias("y"))
        .filter(F.col("y").isNotNull())
    )
    m = pairs.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("x").cast("decimal(20,6)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(20,6)")).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(24,8)")).cast("double").alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(24,8)")).cast("double").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(24,8)")).cast("double").alias("syy"),
    )
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    r = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(var_x * var_y)
    return (
        m.filter((F.col("n") >= 3) & (var_x > 0) & (var_y > 0))
        .select("user_id", "n", F.round(r, 6).alias("autocorr"))
    )


_TWAP_SQL = """
    WITH seq AS (
        SELECT user_id, value, ts,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS next_ts
        FROM events
    ),
    held AS (
        SELECT user_id, value,
               CAST(date_diff('second', ts, next_ts) AS BIGINT) AS held_s
        FROM seq WHERE next_ts IS NOT NULL
    )
    SELECT user_id,
           CAST(SUM(held_s) AS BIGINT) AS total_s,
           ROUND(CAST(SUM(CAST(value * held_s AS DECIMAL(28,8))) AS DOUBLE)
                 / SUM(held_s), 6) AS twap
    FROM held
    WHERE held_s > 0
    GROUP BY user_id
    HAVING SUM(held_s) > 0
"""


@query("q_ts_twap", oracle=_TWAP_SQL)
def q_ts_twap(spark, sf_dir):
    """Time-weighted average value per user (TWAP): each observation
    holds until the next one, weighted by its holding duration —
    the correct average for irregularly-sampled state (billing meters,
    position marks, sensor states), where the plain mean over-weights
    bursts. One lead window + one aggregate on the same user_id
    partitioning; the value x duration products go through DECIMAL so
    the weighted sum is order-independent and hash-exact."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    held = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            "value",
            "ts",
            F.lead("ts").over(w).alias("next_ts"),
        )
        .filter(F.col("next_ts").isNotNull())
        .select(
            "user_id",
            "value",
            (F.unix_timestamp("next_ts") - F.unix_timestamp("ts")).alias("held_s"),
        )
        .filter(F.col("held_s") > 0)
    )
    return (
        held.groupBy("user_id")
        .agg(
            F.sum("held_s").cast("long").alias("total_s"),
            F.round(
                F.sum((F.col("value") * F.col("held_s")).cast("decimal(28,8)"))
                .cast("double") / F.sum("held_s"),
                6,
            ).alias("twap"),
        )
        .filter(F.col("total_s") > 0)
    )


@query(
    "q_pattern_match",
    oracle="""
        WITH journeys AS (
            SELECT user_id,
                   string_agg(substr(event_type, 1, 1), ''
                              ORDER BY ts, event_id) AS journey,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY user_id
        )
        SELECT user_id, n_events,
               substr(journey, 1, 12) AS journey_head,
               regexp_matches(journey, 'v.*c.*p') AS funnel_hit,
               regexp_matches(journey, 'ee')      AS error_burst
        FROM journeys
    """,
)
def q_pattern_match(spark, sf_dir):
    """MATCH_RECOGNIZE-lite sequence pattern detection (Flink/Trino
    `MATCH_RECOGNIZE` parity): each user's event history collapses to
    a canonical symbol string (one char per event, (ts, event_id)
    total order), and row-pattern predicates become regexes over it —
    `v.*c.*p` is the view→click→purchase funnel, `ee` a back-to-back
    error burst.

    Scale shape: ONE shuffle on user_id; per-user state is the
    bounded per-key history (the same bound any MATCH_RECOGNIZE
    engine needs), evaluated JVM-side (array_sort + transform +
    rlike — no Python). For unbounded histories the streaming
    sessionizer (streaming/queries.py) windows the symbol string
    first. Reference parity: `init_for_test.py:66-79` arbitrary SQL
    surface; Trino ships MATCH_RECOGNIZE on the same tables.
    """
    ev = load(spark, sf_dir, "events")
    j = (
        ev.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("h"),
            F.count("*").alias("n_events"),
        )
        .select(
            "user_id",
            "n_events",
            F.array_join(
                F.transform(F.col("h"), lambda s: F.substring(s["event_type"], 1, 1)),
                "",
            ).alias("journey"),
        )
    )
    return j.select(
        "user_id",
        "n_events",
        F.substring("journey", 1, 12).alias("journey_head"),
        F.col("journey").rlike("v.*c.*p").alias("funnel_hit"),
        F.col("journey").rlike("ee").alias("error_burst"),
    )


ATTR_WINDOW_H = 24  # purchase looks back this many hours for touches

ATTRIBUTION_SQL = f"""
    WITH p AS (
        SELECT user_id, ts AS p_ts, event_id AS p_id FROM events
        WHERE event_type = 'purchase'
    ),
    t AS (
        SELECT user_id, ts, event_type, event_id FROM events
        WHERE event_type IN ('view', 'click')
    ),
    pairs AS (
        SELECT p.p_id, t.event_type
        FROM p JOIN t ON t.user_id = p.user_id
         AND t.ts <= p.p_ts
         AND t.ts > p.p_ts - INTERVAL '{ATTR_WINDOW_H}' HOUR
    ),
    sized AS (
        SELECT p_id, COUNT(*) OVER (PARTITION BY p_id) AS n, event_type
        FROM pairs
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(COUNT(DISTINCT p_id) AS BIGINT) AS n_purchases,
           CAST(ROUND(SUM(CAST({rdiv_sql("1", "n", 8)} AS DECIMAL(18,8))), 4)
                AS DOUBLE) AS credit
    FROM sized GROUP BY event_type
"""


@query("q_attribution", oracle=ATTRIBUTION_SQL)
def q_attribution(spark, sf_dir):
    """Multi-touch (linear) marketing attribution: every purchase
    splits one unit of credit equally across the user's view/click
    touches in the prior 24 h; report per-touch-type totals.

    Scale shape: the touch↔purchase pairing is an EQUI-join on
    user_id with the time window as a residual predicate — one
    shuffle, never a time-range cross join (for corpus-scale windows
    the day-bucket blocking of q_join_range_bucketed applies
    unchanged). Credit weights are per-purchase windowed counts on
    the join's own p_id grouping; rounded weights + decimal summation
    keep the totals cross-engine exact."""
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", "ts", "event_type"
    )
    pairs = t.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("ts") <= F.col("p_ts"))
        & (F.col("ts") > F.col("p_ts") - F.expr(f"INTERVAL {ATTR_WINDOW_H} HOURS")),
    ).select("p_id", "event_type")
    sized = pairs.withColumn(
        "n", F.count("*").over(Window.partitionBy("p_id"))
    )
    return sized.groupBy("event_type").agg(
        F.count("*").alias("n_touches"),
        F.countDistinct("p_id").alias("n_purchases"),
        # inner share 1/n rounded via exact integers (1/2^a is a pure
        # dyadic that sits ON the 8dp tie); outer rounding happens in
        # DECIMAL — identical half-away ties on both engines
        F.round(
            F.sum(rdiv(F.lit(1), F.col("n"), 8).cast("decimal(18,8)")), 4
        ).cast("double").alias("credit"),
    )


ACTIVITY_BITMAP_SQL = """
    WITH days AS (
        SELECT DISTINCT user_id,
               date_trunc('month', CAST(ts AS DATE)) AS month,
               CAST(day(CAST(ts AS DATE)) AS BIGINT) AS dom
        FROM events
    )
    SELECT user_id, month,
           CAST(SUM(CAST(POWER(2, dom - 1) AS BIGINT)) AS BIGINT) AS mask,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(MIN(dom) AS BIGINT) AS first_day,
           CAST(MAX(dom) AS BIGINT) AS last_day
    FROM days GROUP BY user_id, month
"""


@query("q_activity_bitmap", oracle=ACTIVITY_BITMAP_SQL)
def q_activity_bitmap(spark, sf_dir):
    """Per-(user, month) activity as a day-of-month BITMAP — the
    roaring-bitmap representation retention/engagement systems keep
    instead of raw event rows: one 64-bit word encodes a month of
    presence, set-intersection (AND of masks) answers "active in both
    months", popcount answers "days active".

    Scale shape: distinct (user, month, day) first — the dedup shrink
    happens map-side before the bitmap aggregate, and both groupBys
    share the user_id-prefixed partitioning, so AQE coalesces the
    second exchange. Per-group state is ONE long regardless of event
    volume (2^(day-1) terms are distinct powers, so the sum IS the
    bitwise OR — exact in int64 for dom ≤ 31). POWER()-based shifts
    keep the arithmetic engine-portable."""
    ev = load(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.trunc(F.col("ts").cast("date"), "month").alias("month"),
        F.dayofmonth(F.col("ts").cast("date")).cast("long").alias("dom"),
    ).distinct()
    return days.groupBy("user_id", "month").agg(
        F.sum(F.pow(F.lit(2.0), F.col("dom") - 1).cast("long")).cast("long").alias("mask"),
        F.count("*").alias("n_active"),
        F.min("dom").alias("first_day"),
        F.max("dom").alias("last_day"),
    )


MARKOV_SQL = """
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    trans AS (
        SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
           ROUND(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY prev_type), 6) AS p
    FROM trans
"""


@query("q_markov_transitions", oracle=MARKOV_SQL)
def q_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences — the process-mining / next-action-model primitive
    (which state follows which, with what probability).

    One lag window on the user_id partitioning (the module's shared
    single-Exchange shape), then a |types|² count aggregate —
    map-combinable, so the second shuffle carries at most |types|²
    partials per task at any scale. Row probabilities normalize via a
    window over the tiny transition relation itself."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            "user_id",
            F.col("event_type").alias("next_type"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("n"))
    )
    wp = Window.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wp), 6).alias("p"),
    )


COOCCUR_SQL = """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    totals AS (SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n_users FROM events),
    rates AS (
        SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n_t FROM ut GROUP BY event_type
    ),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS n_both
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT p.type_a, p.type_b, CAST(p.n_both AS BIGINT) AS n_both,
           ROUND((p.n_both / t.n_users)
                 / ((ra.n_t / t.n_users) * (rb.n_t / t.n_users)), 6) AS lift
    FROM pairs p
    JOIN rates ra ON ra.event_type = p.type_a
    JOIN rates rb ON rb.event_type = p.type_b, totals t
"""


@query("q_event_cooccur", oracle=COOCCUR_SQL)
def q_event_cooccur(spark, sf_dir):
    """Event-type co-occurrence with lift — market-basket association
    over user behavior (lift > 1: the two actions attract; < 1: they
    repel). The distinct (user, type) shrink happens map-side first,
    the per-user type self-join is bounded by |types| per user (≤5
    here — never an unblocked self-join), and the base-rate relation
    (|types| rows) broadcasts back into the lift expression."""
    ev = load(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    n_users = ev.agg(
        F.countDistinct("user_id").cast("double").alias("n_users")
    )
    rates = ut.groupBy("event_type").agg(F.count("*").cast("double").alias("n_t"))
    b = ut.select(F.col("user_id").alias("b_user"), F.col("event_type").alias("type_b"))
    pairs = (
        ut.join(
            b,
            (F.col("user_id") == F.col("b_user"))
            & (F.col("event_type") < F.col("type_b")),
        )
        .groupBy(F.col("event_type").alias("type_a"), "type_b")
        .agg(F.count("*").alias("n_both"))
    )
    ra = rates.select(F.col("event_type").alias("type_a"), F.col("n_t").alias("n_a"))
    rb = rates.select(F.col("event_type").alias("type_b"), F.col("n_t").alias("n_b"))
    return (
        pairs.join(F.broadcast(ra), "type_a")
        .join(F.broadcast(rb), "type_b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            F.col("n_both").cast("long").alias("n_both"),
            F.round(
                (F.col("n_both") / F.col("n_users"))
                / ((F.col("n_a") / F.col("n_users")) * (F.col("n_b") / F.col("n_users"))),
                6,
            ).alias("lift"),
        )
    )


OHLC_SQL = """
    WITH ranked AS (
        SELECT user_id, date_trunc('hour', ts) AS bar, value,
               row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                  ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn_z,
               COUNT(*) OVER (PARTITION BY user_id, date_trunc('hour', ts))
                   AS n
        FROM events
    )
    SELECT user_id, bar,
           CAST(MAX(CASE WHEN rn_a = 1 THEN value END) AS DOUBLE) AS open,
           CAST(MAX(value) AS DOUBLE) AS high,
           CAST(MIN(value) AS DOUBLE) AS low,
           CAST(MAX(CASE WHEN rn_z = 1 THEN value END) AS DOUBLE) AS close,
           CAST(MAX(n) AS BIGINT) AS n_events
    FROM ranked GROUP BY user_id, bar
"""


@query("q_ts_ohlc", oracle=OHLC_SQL)
def q_ts_ohlc(spark, sf_dir):
    """Per-(user, hour) OHLC bars — the hypertable candlestick rollup
    (open/high/low/close + volume): the state every monitoring or
    market pipeline materializes per time bucket.

    First/last within the bar resolve through the (ts, event_id)
    TOTAL order (same-timestamp events are deterministic), via two
    rank passes that share ONE Exchange on (user_id, bar) with the
    final aggregate — the whole query is a single shuffle. The
    conditional-MAX extraction of the rank-1 rows keeps the aggregate
    map-combinable (constant per-group state), where a collect+sort
    rendering would hold the bar's full event list."""
    ev = load(spark, sf_dir, "events")
    bar = F.date_trunc("hour", F.col("ts"))
    wa = Window.partitionBy("user_id", bar).orderBy("ts", "event_id")
    wz = Window.partitionBy("user_id", bar).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = ev.select(
        "user_id",
        bar.alias("bar"),
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wz).alias("rn_z"),
    )
    return ranked.groupBy("user_id", "bar").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).cast("double").alias("open"),
        F.max("value").cast("double").alias("high"),
        F.min("value").cast("double").alias("low"),
        F.max(F.when(F.col("rn_z") == 1, F.col("value"))).cast("double").alias("close"),
        F.count("*").alias("n_events"),
    )


CP_MIN_SEG = 5  # changepoint: at least this many events on each side

CHANGEPOINT_SQL = f"""
    WITH ordered AS (
        SELECT user_id, event_id, value,
               row_number() OVER w AS i,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS s_i,
               CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
                   PARTITION BY user_id) AS DOUBLE) AS s_n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    scored AS (
        SELECT user_id, event_id, i, n,
               s_i / i AS mean_left,
               (s_n - s_i) / (n - i) AS mean_right
        FROM ordered
        WHERE i >= {CP_MIN_SEG} AND i <= n - {CP_MIN_SEG}
    ),
    best AS (
        SELECT user_id, event_id, i, n, mean_left, mean_right,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ABS(mean_left - mean_right) DESC, i)
                   AS rn
        FROM scored
    )
    SELECT user_id, event_id AS split_event_id, CAST(i AS BIGINT) AS split_idx, n,
           ROUND(mean_left, 6) AS mean_left,
           ROUND(mean_right, 6) AS mean_right,
           ROUND(ABS(mean_left - mean_right), 6) AS shift
    FROM best WHERE rn = 1
"""


@query("q_ts_changepoint", oracle=CHANGEPOINT_SQL)
def q_ts_changepoint(spark, sf_dir):
    """Single-changepoint detection per user series (binary
    segmentation step 1): the split maximizing the mean shift
    |mean(left) - mean(right)| over all admissible split points with
    at least {CP_MIN_SEG} events per side — the drift/level-break
    detector a metrics pipeline runs per entity.

    O(n) per series, not O(n²): prefix sums via ONE ordered window
    over the user partition give every split's two means from
    constant per-row state (exact decimal accumulation), then one
    argmax window picks the winner — two window passes over the same
    partitioning, a single shuffle on user_id. Scales to millions of
    users; a 100 TB variant changes nothing but the partition count.
    Ties break on the earlier split index; both engines compute
    identical IEEE chains so the ordering hash-matches."""
    ev = load(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wp = Window.partitionBy("user_id")
    ordered = ev.select(
        "user_id",
        "event_id",
        F.row_number().over(wo).alias("i"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("s_i"),
        F.count("*").over(wp).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(wp).cast("double").alias("s_n"),
    )
    scored = ordered.filter(
        (F.col("i") >= CP_MIN_SEG) & (F.col("i") <= F.col("n") - CP_MIN_SEG)
    ).select(
        "user_id",
        "event_id",
        "i",
        "n",
        (F.col("s_i") / F.col("i")).alias("mean_left"),
        ((F.col("s_n") - F.col("s_i")) / (F.col("n") - F.col("i"))).alias("mean_right"),
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.abs(F.col("mean_left") - F.col("mean_right")).desc(), F.col("i")
    )
    return (
        scored.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("split_event_id"),
            F.col("i").cast("long").alias("split_idx"),
            "n",
            F.round("mean_left", 6).alias("mean_left"),
            F.round("mean_right", 6).alias("mean_right"),
            F.round(F.abs(F.col("mean_left") - F.col("mean_right")), 6).alias("shift"),
        )
    )


SEASONAL_SQL = """
    WITH hourly AS (
        SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INT) AS hr,
               SUM(CAST(value AS DECIMAL(18,6))) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, SUM(s) AS s_all,
               CAST(SUM(n) AS BIGINT) AS n_all
        FROM hourly GROUP BY event_type
    )
    SELECT h.event_type, h.hr, h.n,
           {mean_expr} AS hourly_mean,
           {dev_expr} AS seasonal_dev
    FROM hourly h JOIN tot t ON t.event_type = h.event_type
""".replace("{mean_expr}", rdiv_sql(
    # dec2d_sql (r19): the decimal's unscaled value passes 2^53 at
    # sf0.01 density, where DuckDB's native decimal→double cast lands
    # an ulp below Spark's — which drops an rdiv floor exactly at the
    # constructed half-ties this query exists to pin.
    dec2d_sql("h.s * 1000000"), "h.n * 1000000.0", 6
)).replace("{dev_expr}", rdiv_sql(
    dec2d_sql("h.s * 1000000") + " * t.n_all"
    " - " + dec2d_sql("t.s_all * 1000000") + " * h.n",
    "1000000.0 * h.n * t.n_all", 6
))


@query("q_ts_seasonal", oracle=SEASONAL_SQL)
def q_ts_seasonal(spark, sf_dir):
    """Hour-of-day seasonal profile per event type: hourly mean value
    and its deviation from the type's overall mean — the seasonal
    component of a classical decomposition (the residual feeds
    anomaly scoring; q_win_zscore is the trailing-window complement).

    One map-combined groupBy on (type, hour) — at most types×24
    groups of constant state regardless of corpus size — then the
    per-type totals are RE-AGGREGATED FROM THE HOURLY PARTIALS (exact
    decimal sums add associatively: the same monoid reuse as
    q_rollup_incremental), so the raw table is scanned exactly once.
    The totals relation (|types| rows) broadcasts back onto the
    hourly rows."""
    drain_tracked_persists()  # release the PREVIOUS invocation's cache
    ev = load(spark, sf_dir, "events")
    hourly = track_persist(  # feeds both the totals agg and the final join
        ev.groupBy("event_type", F.hour("ts").cast("int").alias("hr")).agg(
            F.sum(F.col("value").cast("decimal(18,6)")).alias("s"),
            F.count("*").alias("n"),
        )
    )
    tot = hourly.groupBy("event_type").agg(
        F.sum("s").alias("s_all"), F.sum("n").alias("n_all")
    )
    # exact-integer rounded mean/deviation (rdiv, units of 1e-6): the
    # r18 'ties' fuzz tier proved ROUND(s/n, 6) diverges cross-engine
    # at 2-adically tie-eligible hourly group sizes.
    # exact=False (r20): both sites run in rdiv's documented DEGRADED
    # regime — seasonal_dev's numerator (s·1e6·n_all ~ 1e12+) crossed
    # the 2·|num|·10^6 < 2^53 bound at every tested density, and the
    # hourly_mean crosses it whenever boundary-clustered timestamps
    # concentrate a (type, hour) group (the armed RDIV_DEBUG guard
    # fired on the r20 'timeedge' fixture's hour-0 pileup). The SQL
    # twin's dec2d_sql cast keeps the degraded chains bit-identical
    # cross-engine, which is exactly the property the magnitude tier
    # sweeps.
    u_h = (F.col("s") * 1000000).cast("double")
    u_t = (F.col("s_all") * 1000000).cast("double")
    return hourly.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "hr",
        "n",
        rdiv(u_h, F.col("n") * F.lit(1000000.0), 6, exact=False).alias(
            "hourly_mean"
        ),
        rdiv(
            u_h * F.col("n_all") - u_t * F.col("n"),
            F.lit(1000000.0) * F.col("n") * F.col("n_all"),
            6,
            exact=False,
        ).alias("seasonal_dev"),
    )


OOO_SQL = """
    WITH arrivals AS (
        SELECT user_id, ts,
               MAX(ts) OVER (PARTITION BY user_id ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS prev_max
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(CASE WHEN ts < prev_max THEN 1 END) AS BIGINT) AS n_late,
           CAST(COALESCE(MAX(CASE WHEN ts < prev_max
                    THEN date_diff('second', ts, prev_max) END), 0) AS BIGINT)
               AS max_delay_s,
           {frac_expr} AS late_frac
    FROM arrivals GROUP BY user_id
""".replace("{frac_expr}", rdiv_sql(
    "COUNT(CASE WHEN ts < prev_max THEN 1 END)", "COUNT(*)", 4
))


@query("q_ts_out_of_order", oracle=OOO_SQL)
def q_ts_out_of_order(spark, sf_dir):
    """Out-of-order arrival audit: per user, how many events arrived
    with an event-time EARLIER than something already seen (arrival
    order = event_id, the ingestion sequence), and the worst disorder
    in seconds. This measurement IS how a streaming deployment chooses
    its watermark delay (q_stream_watermark): the watermark must cover
    the observed max_delay_s tail or late events silently drop.

    One running-MAX window over the arrival order (constant per-row
    state, frame ends at 1 PRECEDING so an event never compares to
    itself) feeding one map-combined groupBy — a single shuffle on
    user_id at any scale. Second-granularity delays keep the
    cross-engine arithmetic integral."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    arr = ev.select(
        "user_id",
        "ts",
        F.max("ts").over(w).alias("prev_max"),
    )
    late = F.when(F.col("ts") < F.col("prev_max"), 1)
    delay = F.when(
        F.col("ts") < F.col("prev_max"),
        F.unix_timestamp("prev_max") - F.unix_timestamp("ts"),
    )
    return arr.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.count(late).alias("n_late"),
        F.coalesce(F.max(delay), F.lit(0)).cast("long").alias("max_delay_s"),
        # rdiv: late/n is a PURE dyadic when n is a power of two (the
        # exact double sits ON the 4dp tie), where Spark's HALF_UP and
        # DuckDB's nearbyint disagree half the time (r18 fuzzer class)
        rdiv(F.count(late), F.count("*"), 4).alias("late_frac"),
    )


FUNNEL_LAT_SQL = """
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS v_ts
        FROM events GROUP BY user_id
    ),
    conv AS (
        SELECT f.user_id, f.v_ts, MIN(e.ts) AS c_ts
        FROM firsts f
        JOIN events e ON e.user_id = f.user_id
            AND e.event_type = 'click' AND e.ts >= f.v_ts
        GROUP BY f.user_id, f.v_ts
    )
    SELECT CAST((SELECT COUNT(*) FROM firsts WHERE v_ts IS NOT NULL) AS BIGINT)
               AS n_viewers,
           CAST(COUNT(*) AS BIGINT) AS n_converted,
           {avg_expr} AS avg_delay_s,
           CAST(MAX(date_diff('second', v_ts, c_ts)) AS BIGINT) AS max_delay_s
    FROM conv
""".replace("{avg_expr}", rdiv_sql(
    "SUM(CAST(date_diff('second', v_ts, c_ts) AS DECIMAL(18,0)))", "COUNT(*)", 4
))


@query("q_funnel_latency", oracle=FUNNEL_LAT_SQL)
def q_funnel_latency(spark, sf_dir):
    """Time-to-convert between funnel steps: first 'view' per user to
    the first 'click' at-or-after it — the latency distribution behind
    q_funnel's step counts (how LONG conversion takes, not just
    whether it happens).

    Two co-partitioned aggregations on user_id (first-view, then
    first-qualifying-click on the join's own partitioning) and a
    single-row summary with an exact integer-second decimal sum —
    the event-time arithmetic stays integral so both engines agree
    bit-for-bit. At 100 TB the user_id shuffle is the only wide op."""
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("v_ts")
    )
    viewers = firsts.filter(F.col("v_ts").isNotNull())
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts_raw")
    )
    conv = (
        viewers.join(clicks, "user_id")
        .filter(F.col("c_ts_raw") >= F.col("v_ts"))
        .groupBy("user_id", "v_ts")
        .agg(F.min("c_ts_raw").alias("c_ts"))
    )
    delay = F.unix_timestamp("c_ts") - F.unix_timestamp("v_ts")
    # Viewer count stays relational (broadcast 1-row aggregate) so the
    # query is fully lazy like every other registered plan — an eager
    # .count() here would run a Spark job at plan-construction time and
    # freeze the count into the plan as a literal.
    nv = viewers.agg(F.count("*").cast("long").alias("n_viewers"))
    return (
        conv.agg(
            F.count("*").alias("n_converted"),
            # rdiv: integer-seconds mean — same exact-rounding class
            rdiv(
                F.sum(delay.cast("decimal(18,0)")), F.count("*"), 4
            ).alias("avg_delay_s"),
            F.max(delay).cast("long").alias("max_delay_s"),
        )
        .crossJoin(F.broadcast(nv))
        .select("n_viewers", "n_converted", "avg_delay_s", "max_delay_s")
    )


CUSUM_SQL = """
    WITH series AS (
        SELECT user_id,
               list(value ORDER BY ts, event_id) AS vals,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
                   AS mu,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY user_id
    )
    SELECT user_id, n_events,
           ROUND(list_reduce(list_prepend(0.0, vals),
                 (acc, x) -> GREATEST(0.0, acc + (x - mu))), 6) AS cusum_pos,
           ROUND(list_reduce(list_prepend(0.0, vals),
                 (acc, x) -> GREATEST(0.0, acc + (mu - x))), 6) AS cusum_neg
    FROM series
"""


@query("q_ts_cusum", oracle=CUSUM_SQL)
def q_ts_cusum(spark, sf_dir):
    """CUSUM drift detector per user series: S⁺ = max(0, S⁺ + (x-μ))
    and S⁻ = max(0, S⁻ + (μ-x)) folded over the time order — the
    ONLINE complement of q_ts_changepoint's offline split search
    (end-of-window S values far from 0 mean unacknowledged drift; a
    monitoring deployment alarms when S crosses h·σ).

    The recursion is nonlinear (the max clamp), so no window frame
    expresses it — this is the array-fold shape of q_ts_ewma: ONE
    shuffle on user_id collects each series, μ comes from an exact
    decimal sum in the SAME aggregation (no second pass), and both
    folds are identical IEEE chains in Spark ``aggregate`` and DuckDB
    ``list_reduce`` (zero-seeded via list_prepend), so results
    hash-match. Per-group state = that user's event list."""
    ev = load(spark, sf_dir, "events")
    arr = F.sort_array(F.collect_list(F.struct("ts", "event_id", "value")))
    series = ev.groupBy("user_id").agg(
        F.transform(arr, lambda a: a["value"]).alias("vals"),
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("mu"),
        F.count("*").alias("n_events"),
    )
    mu = F.col("mu")

    def fold(sign: int):
        return F.aggregate(
            F.col("vals"),
            F.lit(0.0),
            lambda acc, x: F.greatest(
                F.lit(0.0), acc + (x - mu) * F.lit(float(sign))
            ),
        )

    # (x - mu)*1 and (x - mu)*-1 must match the oracle's (x - mu) and
    # (mu - x) bit-for-bit: IEEE negation is exact, multiplication by
    # ±1.0 is an identity on finite doubles.
    return series.select(
        "user_id",
        "n_events",
        F.round(fold(1), 6).alias("cusum_pos"),
        F.round(fold(-1), 6).alias("cusum_neg"),
    )


DAU_WAU_SQL = """
    WITH userday AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    dau AS (
        SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM userday GROUP BY day
    ),
    contrib AS (
        SELECT user_id, day + CAST(o.o AS INT) AS tday
        FROM userday, (SELECT unnest(range(0, 7)) AS o) o
    ),
    wau AS (
        SELECT tday AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
        FROM contrib GROUP BY tday
    )
    SELECT d.day, d.dau, w.wau,
           ROUND(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
    FROM dau d JOIN wau w ON w.day = d.day
"""


@query("q_events_dau_wau", oracle=DAU_WAU_SQL)
def q_events_dau_wau(spark, sf_dir):
    """DAU / trailing-7-day WAU / stickiness per day — the engagement
    triple. EXACT windowed distinct users without a distinct-over-
    window (which Spark refuses) and without an O(days × corpus)
    self-join: the (user, day) relation each contributes itself to
    the 7 future days it keeps a user 'weekly-active' for (a 7-row
    generator explode), and WAU is then a plain COUNT(DISTINCT) per
    target day. Cost is 7×|user-days| rows into one distinct
    aggregate — linear, map-combined, the standard scale shape for
    exact sliding distincts (HLL register-merge, q_sketch_hll, is the
    approximate alternative when 7× is too much).

    Only days with actual activity are reported (inner join DAU∩WAU),
    so the relation stays |active days| long."""
    ev = load(spark, sf_dir, "events")
    userday = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    dau = userday.groupBy("day").agg(F.count("*").alias("dau"))
    contrib = userday.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"),
        "day",
    ).select("user_id", F.date_add("day", F.col("o")).alias("day"))
    wau = contrib.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias("stickiness"),
        )
    )
