"""Invariant tests for the round-5 operators — the laws the DuckDB
hash-oracles can't express: bounds, conservation, monotonicity, and
minimality properties that must hold on ANY input, not just match on
this one.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from proof_of_concept___cdc_w_iceberg_spark import registry
from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load

QS = registry.queries()


def test_gini_bounds_and_zero_on_constant(spark, sf_dir):
    rows = QS["q_agg_gini"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["gini"] < 1.0, r


def test_trimmed_mean_within_group_range_and_count(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    ranges = {
        r["o_orderpriority"]: (r["lo"], r["hi"])
        for r in o.groupBy("o_orderpriority")
        .agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
        .collect()
    }
    for r in QS["q_agg_trimmed"](spark, sf_dir).collect():
        lo, hi = ranges[r["o_orderpriority"]]
        assert lo <= r["trimmed_mean"] <= hi, r
        assert r["n_kept"] == r["n"] - 2 * (r["n"] // 20), r


def test_corr_bounds_and_agree_with_numpy(spark, sf_dir):
    import numpy as np

    rows = QS["q_stats_corr"](spark, sf_dir).collect()
    assert len(rows) == 6
    for r in rows:
        assert -1.0 <= r["corr"] <= 1.0, r
    li = load(spark, sf_dir, "lineitem").select("l_quantity", "l_extendedprice").collect()
    q = np.array([x["l_quantity"] for x in li])
    p = np.array([x["l_extendedprice"] for x in li])
    want = float(np.corrcoef(q, p)[0, 1])
    got = next(
        r["corr"] for r in rows
        if r["col_a"] == "l_quantity" and r["col_b"] == "l_extendedprice"
    )
    assert abs(got - want) < 1e-5, (got, want)


def test_kanonymity_classes_partition_the_table(spark, sf_dir):
    rows = QS["q_anon_kanonymity"](spark, sf_dir).collect()
    total = load(spark, sf_dir, "customer").count()
    assert sum(r["class_size"] for r in rows) == total
    for r in rows:
        assert r["below_k"] == (1 if r["class_size"] < 5 else 0), r


def test_changepoint_split_is_admissible(spark, sf_dir):
    from proof_of_concept___cdc_w_iceberg_spark.operators.events import CP_MIN_SEG

    for r in QS["q_ts_changepoint"](spark, sf_dir).collect():
        assert CP_MIN_SEG <= r["split_idx"] <= r["n"] - CP_MIN_SEG, r
        assert r["shift"] >= 0.0, r


def test_seasonal_devs_are_centered(spark, sf_dir):
    """Σ n_h · (mean_h − overall) = 0 per type by construction."""
    by_type: dict[str, float] = {}
    counts: dict[str, int] = {}
    for r in QS["q_ts_seasonal"](spark, sf_dir).collect():
        by_type[r["event_type"]] = by_type.get(r["event_type"], 0.0) + (
            r["n"] * r["seasonal_dev"]
        )
        counts[r["event_type"]] = counts.get(r["event_type"], 0) + r["n"]
    total_events = load(spark, sf_dir, "events").count()
    assert sum(counts.values()) == total_events
    for t, s in by_type.items():
        assert abs(s) / counts[t] < 1e-4, (t, s)


def test_hashing_trick_weights_normalize(spark, sf_dir):
    from proof_of_concept___cdc_w_iceberg_spark.ext.text import HASH_DIM

    per_doc: dict[int, float] = {}
    for r in QS["q_text_hashing_trick"](spark, sf_dir).collect():
        assert 0 <= r["feat"] < HASH_DIM, r
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0.0) + r["w"]
    assert per_doc
    for doc, s in per_doc.items():
        assert abs(s - 1.0) < 1e-3, (doc, s)  # 6dp rounds accumulate


def test_rfm_scores_bounded_and_cover_all_customers(spark, sf_dir):
    rows = QS["q_orders_rfm"](spark, sf_dir).collect()
    n_with_orders = (
        load(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert len(rows) == n_with_orders
    for r in rows:
        for c in ("r_score", "f_score", "m_score"):
            assert 1 <= r[c] <= 5, r


def test_cohort_ltv_cumulative_is_monotone(spark, sf_dir):
    seen: dict = {}
    for r in QS["q_cohort_ltv"](spark, sf_dir).collect():
        seen.setdefault(r["cohort"], []).append((r["month_offset"], r["cum_spend"]))
    for cohort, pts in seen.items():
        pts.sort()
        for (o1, c1), (o2, c2) in zip(pts, pts[1:]):
            assert c2 >= c1, (cohort, o1, o2)
        assert pts[0][0] == 0, cohort  # first order month is offset 0


def test_pareto_head_is_minimal_and_bounded(spark, sf_dir):
    rows = QS["q_orders_pareto"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_top80"] <= r["n_customers"], r
        assert 0.0 < r["top_frac"] <= 1.0, r


def test_herfindahl_bounds(spark, sf_dir):
    for r in QS["q_herfindahl"](spark, sf_dir).collect():
        assert 0.0 < float(r["hhi"]) <= 1.0, r
        # HHI of n equal shares is 1/n — the lower bound
        assert float(r["hhi"]) >= 1.0 / r["n_suppliers"] - 1e-9, r


def test_cusum_nonnegative(spark, sf_dir):
    for r in QS["q_ts_cusum"](spark, sf_dir).collect():
        assert r["cusum_pos"] >= 0.0 and r["cusum_neg"] >= 0.0, r


def test_out_of_order_fractions(spark, sf_dir):
    rows = QS["q_ts_out_of_order"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_late"] <= r["n_events"], r
        assert 0.0 <= r["late_frac"] <= 1.0, r
        assert (r["max_delay_s"] > 0) == (r["n_late"] > 0) or r["max_delay_s"] == 0


def test_dau_never_exceeds_wau(spark, sf_dir):
    rows = QS["q_events_dau_wau"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["dau"] <= r["wau"], r
        assert 0.0 < r["stickiness"] <= 1.0, r


def test_asof_nearest_within_tolerance_and_unique(spark, sf_dir):
    rows = QS["q_join_asof_nearest"](spark, sf_dir).collect()
    clicks = {r["click_id"] for r in rows}
    assert len(clicks) == len(rows)  # one match per click
    for r in rows:
        assert 0 <= r["gap_s"] <= 1800, r


def test_basket_pairs_support_floor(spark, sf_dir):
    for r in QS["q_basket_pairs"](spark, sf_dir).collect():
        assert r["n_ab"] >= 3, r
        assert r["lift"] > 0.0, r
        assert r["part_a"] < r["part_b"], r


def test_triangles_positive_and_ordered(spark, sf_dir):
    rows = QS["q_graph_triangles"](spark, sf_dir).collect()
    assert rows
    counts = [r["n_triangles"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(c >= 1 for c in counts)


def test_checksum_row_count_matches_mirror(spark, sf_dir):
    from proof_of_concept___cdc_w_iceberg_spark.cdc.apply import compact_latest
    from proof_of_concept___cdc_w_iceberg_spark.sources.cdc_fixtures import changelog

    row = QS["q_cdc_checksum"](spark, sf_dir).collect()[0]
    n = (
        compact_latest(changelog(spark, sf_dir), ["k"])
        .filter(F.col("op") != "d")
        .count()
    )
    assert row["n_rows"] == n
    assert row["checksum_sum"] > 0


def test_checksum_detects_single_row_change(spark, sf_dir):
    """The point of the fingerprint: one changed value changes it."""
    from proof_of_concept___cdc_w_iceberg_spark.cdc.apply import compact_latest
    from proof_of_concept___cdc_w_iceberg_spark.sources.cdc_fixtures import changelog

    def fp(mirror):
        h = F.md5(
            F.concat_ws(
                "|",
                F.col("k").cast("string"),
                F.coalesce(F.col("name"), F.lit("<null>")),
                F.coalesce(
                    F.col("bal").cast("decimal(18,2)").cast("string"), F.lit("<null>")
                ),
            )
        )
        hv = F.conv(F.substring(h, 1, 6), 16, 10).cast("long")
        r = mirror.select(hv.alias("hv")).agg(
            F.sum("hv").alias("s"), F.expr("bit_xor(hv)").alias("x")
        ).collect()[0]
        return (r["s"], r["x"])

    mirror = (
        compact_latest(changelog(spark, sf_dir), ["k"])
        .filter(F.col("op") != "d")
        .select("k", "name", "bal")
    )
    base = fp(mirror)
    perturbed = mirror.withColumn(
        "bal", F.when(F.col("k") == mirror.agg(F.min("k")).collect()[0][0],
                      F.col("bal") + 0.01).otherwise(F.col("bal"))
    )
    assert fp(perturbed) != base


def test_template_dedup_finds_planted_instances(spark, sf_dir):
    rows = QS["q_dedup_template"](spark, sf_dir).collect()
    assert rows, "planted template replays must collapse"
    for r in rows:
        assert r["n_instances"] >= 2, r
    # planted replays appear under shifted ids; keepers must include
    # min-id semantics (keeper <= every planted id range start)
    assert all(r["keep_id"] < 40_000_000 for r in rows)


def test_funnel_latency_sanity(spark, sf_dir):
    row = QS["q_funnel_latency"](spark, sf_dir).collect()[0]
    assert 0 < row["n_converted"] <= row["n_viewers"]
    assert row["avg_delay_s"] >= 0.0
    assert row["max_delay_s"] >= math.ceil(row["avg_delay_s"]) - 1


def test_stream_topk_arity(spark, sf_dir):
    rows = QS["q_stream_topk"](spark, sf_dir).collect()
    per_type: dict[str, list[int]] = {}
    for r in rows:
        per_type.setdefault(r["event_type"], []).append(r["rn"])
    for t, rns in per_type.items():
        assert sorted(rns) == [1, 2, 3], (t, rns)


def test_win_median_between_extremes(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    ranges = {
        (r["l_returnflag"], r["l_linestatus"]): (r["lo"], r["hi"])
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi"))
        .collect()
    }
    for r in QS["q_win_median"](spark, sf_dir).collect():
        lo, hi = ranges[(r["l_returnflag"], r["l_linestatus"])]
        assert lo <= r["median_price"] <= hi, r


def test_ratio_to_report_sums_to_one(spark, sf_dir):
    sums: dict[str, float] = {}
    for r in QS["q_win_ratio_to_report"](spark, sf_dir).collect():
        sums[r["o_orderpriority"]] = sums.get(r["o_orderpriority"], 0.0) + r["share"]
    for p, s in sums.items():
        assert abs(s - 1.0) < 1e-4, (p, s)  # 8dp rounds accumulate


def test_incremental_topk_pruning_is_precise(spark):
    """The affected-group predicate must include every group whose
    top-k CAN change (touched member, threshold-crossing upsert,
    under-filled group) and exclude the provably-safe ones (non-member
    updates below threshold, non-member deletes)."""
    from pyspark.sql import Window as W

    from proof_of_concept___cdc_w_iceberg_spark.cdc.incremental import (
        TOPK_K,
        topk_affected_groups,
    )

    base = spark.createDataFrame(
        [
            # g0: full, thr=80        # g1: under-filled (2 members)
            (10, 100.0), (20, 90.0), (30, 80.0), (40, 10.0),
            (11, 60.0), (21, 55.0),
            # g2: full, thr=30        # g3: full, thr=7
            (12, 50.0), (22, 40.0), (32, 30.0), (42, 20.0),
            (13, 9.0), (23, 8.0), (33, 7.0), (43, 6.0),
            # g4: full, thr=3
            (14, 5.0), (24, 4.0), (34, 3.0), (44, 2.0),
        ],
        "k long, bal double",
    )
    grp_of = F.col("k") % 10
    wg = W.partitionBy("grp").orderBy(F.col("bal").desc(), F.col("k"))
    base_topk = (
        base.select(grp_of.alias("grp"), "k", "bal")
        .withColumn("rnk", F.row_number().over(wg))
        .filter(F.col("rnk") <= TOPK_K)
    )
    thresholds = base_topk.groupBy("grp").agg(
        F.min("bal").alias("thr"), F.count("*").alias("n_topk")
    )
    latest = spark.createDataFrame(
        [
            (40, 50.0, "u"),   # g0 non-member raised but still < thr -> safe
            (51, 1.0, "c"),    # g1 under-filled -> any insert affects
            (42, 35.0, "u"),   # g2 non-member crosses thr -> affects
            (43, None, "d"),   # g3 non-member delete -> safe
            (14, None, "d"),   # g4 member delete -> affects
        ],
        "k long, bal double, op string",
    )
    got = {
        r["grp"]
        for r in topk_affected_groups(base_topk, thresholds, latest, grp_of).collect()
    }
    assert got == {1, 2, 4}, got
