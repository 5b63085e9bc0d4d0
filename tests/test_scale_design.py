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
