"""Scale-design proofs: bucketed co-located joins eliminate exchanges;
CDC apply semantics hold for arbitrary event sequences (property test).
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from proof_of_concept___cdc_w_iceberg_spark.cdc.apply import apply_changes
from proof_of_concept___cdc_w_iceberg_spark.plans.explain import (
    count_exchanges,
    explain_str,
)
from proof_of_concept___cdc_w_iceberg_spark.sources.bucketed import (
    bucketed_join_ready,
    write_bucketed,
)
from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Both sides bucketed by the join key -> join plans with ZERO
    exchanges (the shuffle was paid once at write). The same query on
    unbucketed reads needs 2."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, "li_bucketed", "l_orderkey", buckets=8)
    write_bucketed(o, "o_bucketed", "l_orderkey", buckets=8)
    assert bucketed_join_ready(spark, "li_bucketed", "o_bucketed")

    joined = spark.table("li_bucketed").join(spark.table("o_bucketed"), "l_orderkey")
    plan = explain_str(joined)
    assert count_exchanges(plan) == 0, plan
    # and the result is identical to the plain join
    plain = li.join(o, "l_orderkey")
    assert joined.count() == plain.count()

    # aggregation on the bucket key also reuses the layout: no exchange
    agg = spark.table("li_bucketed").groupBy("l_orderkey").agg(F.sum("l_quantity"))
    assert count_exchanges(explain_str(agg)) == 0

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


# --- property test: CDC apply == pandas reference implementation ---

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=8),          # key
        st.sampled_from(["c", "u", "d"]),               # op
        st.integers(min_value=1, max_value=5),           # ts_ms
        st.floats(min_value=-100, max_value=100,
                  allow_nan=False, allow_infinity=False),  # payload
    ),
    min_size=0,
    max_size=30,
)


def pandas_apply(target: pd.DataFrame, events: list[tuple]) -> set[tuple]:
    """Reference semantics in plain python: latest (ts, off) wins per
    key; latest op 'd' removes the key."""
    latest: dict[int, tuple] = {}
    for off, (k, op, ts, val) in enumerate(events):
        if k not in latest or (ts, off) > (latest[k][0], latest[k][1]):
            latest[k] = (ts, off, op, val)
    rows = {(int(r.k), float(r.bal)) for r in target.itertuples(index=False)
            if r.k not in latest}
    for k, (ts, off, op, val) in latest.items():
        if op != "d":
            rows.add((int(k), float(val)))
    return rows


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(events=events_strategy)
def test_cdc_apply_matches_reference_semantics(spark, events):
    """apply_changes == the dictionary-semantics reference for ANY
    event sequence (random mixes of c/u/d, ts collisions resolved by
    offset, repeated keys, deletes of absent keys)."""
    target_pdf = pd.DataFrame({"k": [1, 2, 3], "bal": [10.0, 20.0, 30.0]})
    target = spark.createDataFrame(target_pdf)
    if events:
        ch = spark.createDataFrame(
            [(k, op, ts, v, off) for off, (k, op, ts, v) in enumerate(events)],
            schema="k LONG, op STRING, ts_ms LONG, bal DOUBLE, off LONG",
        )
    else:
        ch = spark.createDataFrame([], schema="k LONG, op STRING, ts_ms LONG, bal DOUBLE, off LONG")
    applied = apply_changes(target, ch, keys=["k"])
    got = {(int(r["k"]), float(r["bal"])) for r in applied.collect()}
    want = pandas_apply(target_pdf, events)
    assert got == want


def test_partitioned_layout_prunes_partitions(spark, sf_dir):
    """Date-partitioned lake layout: a day-filtered query must read
    only that day's partition (PartitionFilters in the scan, not a
    full-table filter) — the layout that makes time-range queries at
    100 TB touch 1/Nth of the data."""
    import tempfile

    events = load(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    path = tempfile.mkdtemp(prefix="part_events_")
    events.write.mode("overwrite").partitionBy("day").parquet(path)

    some_day = events.select("day").first()["day"]
    q = spark.read.parquet(path).filter(F.col("day") == F.lit(some_day))
    plan = explain_str(q)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "day" in pf[0], plan
    # correctness: partition-pruned read == in-memory filter
    assert q.count() == events.filter(F.col("day") == F.lit(some_day)).count()

    # dynamic partition overwrite: rewriting ONE day leaves others intact
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    one_day = events.filter(F.col("day") == F.lit(some_day)).limit(5)
    one_day.write.mode("overwrite").partitionBy("day").parquet(path)
    spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    total = spark.read.parquet(path).count()
    others = events.filter(F.col("day") != F.lit(some_day)).count()
    assert total == others + 5


scd2_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),          # key
        st.sampled_from(["c", "u", "d"]),               # op
        st.integers(min_value=0, max_value=50),         # ts
    ),
    min_size=0,
    max_size=25,
)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(events=scd2_events)
def test_scd2_window_law_on_random_changelogs(spark, events):
    """For ANY changelog: SCD2 versions per key never overlap, at most
    one is open, and the open versions equal latest-wins compaction of
    the non-deleted keys — the law q_cdc_scd2 instantiates, checked
    here on random event mixes rather than the fixture."""
    from pyspark.sql import Window

    if not events:
        return
    ch = spark.createDataFrame(
        [(k, op, ts, off) for off, (k, op, ts) in enumerate(events)],
        schema="k LONG, op STRING, ts_ms LONG, off LONG",
    )
    w = Window.partitionBy("k").orderBy("ts_ms", "off")
    scd2 = (
        ch.withColumn("valid_to", F.lead("ts_ms").over(w))
        .filter(F.col("op") != "d")
        .select("k", "op", F.col("ts_ms").alias("valid_from"), "valid_to")
    )
    rows = scd2.collect()
    # per-key: intervals ordered by valid_from must not overlap
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r["k"], []).append((r["valid_from"], r["valid_to"]))
    n_open_total = 0
    for k, ivs in by_key.items():
        ivs.sort(key=lambda x: (x[0], x[1] is None, x[1]))
        opens = [iv for iv in ivs if iv[1] is None]
        assert len(opens) <= 1, f"key {k}: multiple open versions"
        n_open_total += len(opens)
        for (f1, t1), (f2, _t2) in zip(ivs, ivs[1:]):
            assert t1 is not None and f2 >= t1, f"key {k}: overlap {ivs}"
    # open versions == keys whose LAST event (ts, off order) is not 'd'
    latest: dict = {}
    for off, (k, op, ts) in enumerate(events):
        if k not in latest or (ts, off) > latest[k][:2]:
            latest[k] = (ts, off, op)
    want_open = {k for k, (_, _, op) in latest.items() if op != "d"}
    got_open = {r["k"] for r in rows if r["valid_to"] is None}
    assert got_open == want_open


salted_values = st.lists(
    st.tuples(
        st.sampled_from(["A", "B"]),                    # group
        st.integers(min_value=-100, max_value=100),     # value
    ),
    min_size=0,
    max_size=40,
)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(rows=salted_values)
def test_salted_distinct_is_exact_on_random_data(spark, rows):
    """Two-stage salted COUNT(DISTINCT) == plain COUNT(DISTINCT) for
    ANY input (the disjointness argument: a value-derived salt puts
    each distinct value in exactly one salt cell)."""
    if not rows:
        return
    df = spark.createDataFrame(rows, schema="g STRING, v LONG")
    plain = {
        (r["g"], r["n"]) for r in
        df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    salted = (
        df.withColumn("salt", F.pmod(F.hash("v"), F.lit(4)))
        .groupBy("g", "salt").agg(F.countDistinct("v").alias("nd"))
        .groupBy("g").agg(F.sum("nd").alias("n"))
    )
    got = {(r["g"], r["n"]) for r in salted.collect()}
    assert got == plain
