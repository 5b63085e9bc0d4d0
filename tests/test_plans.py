"""Physical-plan quality gates — the 100 TB design checks.

A query that passes correctness but plans badly (no pushdown, missed
broadcast, full sort instead of top-k) fails here.
"""

from __future__ import annotations

from proof_of_concept___cdc_w_iceberg_spark import registry
from proof_of_concept___cdc_w_iceberg_spark.plans import explain_str, plan_report

QS = registry.queries()


def test_scan_pushes_filter_and_prunes_columns(spark, sf_dir):
    df = QS["q_scan_parquet"](spark, sf_dir)
    plan = explain_str(df)
    assert "PushedFilters: [" in plan and "IsNotNull(l_shipdate)" in plan
    # projection pruning: only the 4 referenced columns reach the scan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_extendedprice" in read_schema and "l_quantity" not in read_schema


def test_dim_joins_are_broadcast(spark, sf_dir):
    for name in ["q_join_broadcast", "q_join_multiway"]:
        rep = plan_report(QS[name](spark, sf_dir))
        assert rep["has_broadcast_join"], f"{name} lost its broadcast"
        assert not rep["has_sort_merge_join"], f"{name} shuffles a dim join"


def test_topk_is_take_ordered_not_full_sort(spark, sf_dir):
    rep = plan_report(QS["q_topk"](spark, sf_dir))
    assert rep["has_take_ordered"]


def test_agg_has_mapside_partial_aggregation(spark, sf_dir):
    """The shuffle must carry partial states, not rows (AQE wraps the
    plan pre-execution, so check partial_* functions rather than the
    WholeStageCodegen annotation)."""
    from proof_of_concept___cdc_w_iceberg_spark.plans.explain import count_exchanges

    plan = explain_str(QS["q_agg_groupby"](spark, sf_dir))
    assert "partial_sum" in plan and "partial_count" in plan
    assert count_exchanges(plan) == 1


def test_tpch_plans_broadcast_and_push(spark, sf_dir):
    """TPC-H shapes: every join broadcasts the dim side, every scan has
    pushed filters, Q3's top-10 is TakeOrdered, all aggs are partial."""
    import re

    for name, n_joins in [("q_tpch_q3", 2), ("q_tpch_q18", 3), ("q_sql_text", 5)]:
        plan = explain_str(QS[name](spark, sf_dir))
        joins = re.findall(r"^\(\d+\) (\w*Join\w*)", plan, flags=re.M)
        assert len(joins) == n_joins and set(joins) == {"BroadcastHashJoin"}, (
            f"{name}: {joins}"
        )
        assert "partial_" in plan, f"{name} lost map-side partial agg"
    assert "TakeOrderedAndProject" in explain_str(QS["q_tpch_q3"](spark, sf_dir))


def test_cdc_compaction_single_shuffle(spark, sf_dir):
    """Latest-wins compaction = exactly one exchange on the key."""
    from proof_of_concept___cdc_w_iceberg_spark.cdc.apply import compact_latest
    from proof_of_concept___cdc_w_iceberg_spark.sources.cdc_fixtures import changelog

    df = compact_latest(changelog(spark, sf_dir), ["k"])
    assert plan_report(df)["n_exchanges"] <= 2  # hashpartition + AQE read


def test_lsh_bucketing_is_equi_join_not_nested_loop(spark, sf_dir):
    """LSH/SimHash band blocking must plan as per-band equi-joins; an
    OR-of-equalities condition gives Catalyst no equi-key and silently
    degenerates to a BroadcastNestedLoopJoin over the whole corpus —
    the exact O(corpus x queries) scan the bucketing exists to avoid."""
    for name in ["q_sim_lsh", "q_dedup_simhash"]:
        plan = explain_str(QS[name](spark, sf_dir))
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} degenerated to a nested-loop join"
        )
        assert "BroadcastHashJoin" in plan, f"{name} lost its hash join"


def test_q19_disjunctive_join_stays_hash_join(spark, sf_dir):
    """Q19's OR-of-conjuncts must ride the p_partkey equi-key as a
    residual filter on a BroadcastHashJoin — not degrade to a
    nested-loop join."""
    plan = explain_str(QS["q_tpch_q19"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "partial_sum" in plan


def test_embed_centroid_partial_aggregates(spark, sf_dir):
    """The posexplode -> groupBy(label, dim) shape must map-combine to
    |labels| x |dims| partial states before its single shuffle."""
    from proof_of_concept___cdc_w_iceberg_spark.plans.explain import count_exchanges

    plan = explain_str(QS["q_embed_centroid"](spark, sf_dir))
    assert "partial_sum" in plan and "partial_count" in plan
    assert count_exchanges(plan) == 1


def test_pivot_plans_without_distinct_values_job(spark, sf_dir):
    """Explicit pivot values => no distinct-values collect job; Spark
    plans count-then-pivotfirst (2 exchanges, both map-combined — the
    first agg collapses to |status| x |priority| rows, so the second
    shuffle is trivial at any scale)."""
    from proof_of_concept___cdc_w_iceberg_spark.plans.explain import count_exchanges

    plan = explain_str(QS["q_pivot"](spark, sf_dir))
    assert "partial_pivotfirst" in plan and "partial_count" in plan
    assert count_exchanges(plan) <= 2


def test_reservoir_sample_no_global_sort(spark, sf_dir):
    """Per-group top-k via window: one hash-partition exchange on the
    group key, a per-partition sort — never a global range sort."""
    plan = explain_str(QS["q_sample_reservoir"](spark, sf_dir))
    assert "rangepartitioning" not in plan.lower().replace(" ", "")


def test_subqueries_decorrelate_to_joins(spark, sf_dir):
    """Catalyst must rewrite EXISTS/IN to semi joins and the
    LIMIT-under-LATERAL to a ranked window join — never per-row
    re-execution or a nested-loop join."""
    for name in ["q_exists_subquery", "q_in_subquery"]:
        plan = explain_str(QS[name](spark, sf_dir))
        assert "LeftSemi" in plan, f"{name} lost its semi-join rewrite"
        assert "BroadcastNestedLoopJoin" not in plan
    lateral = explain_str(QS["q_lateral_join"](spark, sf_dir))
    assert "WindowGroupLimit" in lateral, "LATERAL LIMIT not decorrelated"
    assert "BroadcastNestedLoopJoin" not in lateral


def test_scalar_subquery_runs_once(spark, sf_dir):
    """The uncorrelated scalar subquery must appear as a (reused)
    subquery node feeding a filter — one aggregate execution, not a
    join of orders against itself."""
    plan = explain_str(QS["q_scalar_subquery"](spark, sf_dir))
    assert "Subquery" in plan
    assert "partial_sum" in plan  # the mean is a map-combined aggregate


def test_agg_filter_single_pass(spark, sf_dir):
    """FILTER-clause aggregates: all three subset aggregates in ONE
    shuffle with map-side partials (the shape that replaces N
    self-joined filtered aggregates)."""
    from proof_of_concept___cdc_w_iceberg_spark.plans.explain import count_exchanges

    plan = explain_str(QS["q_agg_filter"](spark, sf_dir))
    assert "partial_count" in plan and "partial_sum" in plan
    assert count_exchanges(plan) == 1


def test_unpivot_is_expand_not_self_union(spark, sf_dir):
    """Native unpivot plans as a single Expand over one scan — not N
    unioned re-reads of the input."""
    import re

    plan = explain_str(QS["q_unpivot"](spark, sf_dir))
    assert "Expand" in plan
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.M)) == 1


def test_contamination_broadcasts_eval_side(spark, sf_dir):
    """Decontamination at 100 TB: eval set is benchmark-sized, so the
    corpus joins against BROADCAST eval/stop relations — no corpus-wide
    shuffle join, and never a nested loop."""
    plan = explain_str(QS["q_contamination"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_corpus_windows_hash_partition_not_range(spark, sf_dir):
    """Line-dedup and domain-mix windows partition by hash of their
    keys — a global range sort would serialize the corpus."""
    for name in ["q_dedup_lines", "q_domain_mix"]:
        plan = explain_str(QS[name](spark, sf_dir))
        assert "rangepartitioning" not in plan.lower().replace(" ", ""), name


def test_token_histogram_single_exchange(spark, sf_dir):
    from proof_of_concept___cdc_w_iceberg_spark.plans.explain import count_exchanges

    plan = explain_str(QS["q_token_histogram"](spark, sf_dir))
    assert "partial_count" in plan and "partial_sum" in plan
    assert count_exchanges(plan) == 1


def test_q17_correlated_subquery_decorrelates(spark, sf_dir):
    """The per-part average must become a per-part aggregate joined
    back (one extra shuffle), never |parts| subquery executions, and
    the brand filter must reach the part scan."""
    plan = explain_str(QS["q_tpch_q17"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_sum" in plan
    assert "Brand#1" in plan  # predicate pushed to the scan side


def test_band_join_is_bucketed_equi_join(spark, sf_dir):
    """The no-equi-key interval join must block on time buckets and
    plan as a hash equi-join — the naive theta form nested-loops over
    |errors| x |clicks|."""
    plan = explain_str(QS["q_join_range_bucketed"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_incremental_agg_probes_not_rescans(spark, sf_dir):
    """IVM merge: the batch probes base for old images via an
    equi-join; the delta merge is a full-outer join of two tiny
    aggregates — no nested loop anywhere."""
    plan = explain_str(QS["q_cdc_incremental_agg"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_sum" in plan


def test_q7_q8_all_dims_broadcast(spark, sf_dir):
    """The nation-pair (Q7) and market-share (Q8) multiway joins must
    broadcast every dim side — no sort-merge join and no nested loop at
    fixture scale, so only the fact-fact joins can ever shuffle."""
    for q in ("q_tpch_q7", "q_tpch_q8"):
        plan = explain_str(QS[q](spark, sf_dir))
        assert "BroadcastNestedLoopJoin" not in plan, q
        assert "BroadcastHashJoin" in plan, q


def test_q15_max_is_broadcast_not_collected(spark, sf_dir):
    """Q15's scalar max must reach the filter via a broadcast join —
    a plan artifact, not a driver collect (no .collect in the query
    function) — and the revenue view feeds it without a nested loop
    over suppliers."""
    plan = explain_str(QS["q_tpch_q15"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_phash_band_join_is_equi(spark, sf_dir):
    """The pHash candidate step must be two band equi-joins + distinct
    (the q_dedup_simhash pattern) — an OR of band equalities would plan
    as a nested-loop join over all signature pairs."""
    plan = explain_str(QS["q_multimodal_phash"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_event_analytics_push_type_filters(spark, sf_dir):
    """Funnel stage scans must push the event_type filter into parquet
    (each stage reads only its event slice)."""
    plan = explain_str(QS["q_funnel"](spark, sf_dir))
    assert "EqualTo(event_type,view)" in plan.replace('"', "")
    assert "EqualTo(event_type,purchase)" in plan.replace('"', "")


def test_q21_decorrelated_single_fact_selfagg(spark, sf_dir):
    """Q21 must NOT plan the textbook correlated EXISTS/NOT-EXISTS as
    nested loops: the Spark form is one order-level aggregate joined
    back, so the only sort-merge join is lineitem-orders; everything
    else broadcasts."""
    plan = explain_str(QS["q_tpch_q21"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q9_dims_broadcast(spark, sf_dir):
    """Q9's 5-table join must broadcast part/supplier/nation (and let
    AQE pick the orders side) — at most one shuffle join touches the
    fact table."""
    plan = explain_str(QS["q_tpch_q9"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") <= 1


def test_q11_threshold_broadcast_not_collected(spark, sf_dir):
    """Q11's group-total threshold must flow back as a 1-row broadcast
    (BroadcastNestedLoopJoin over one row), never via driver collect;
    the per-part relation is persisted so the total doesn't re-join."""
    df = QS["q_tpch_q11"](spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert plan.count("InMemoryTableScan") >= 1


def test_q2_decorrelated_max_no_subquery_loop(spark, sf_dir):
    """Q2's correlated MAX must run as one aggregate over the persisted
    shipped-pairs relation joined back on (partkey, acctbal) — never a
    nested-loop re-execution per part."""
    plan = explain_str(QS["q_tpch_q2"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("InMemoryTableScan") >= 2


def test_q16_anti_join_broadcast(spark, sf_dir):
    """Q16's NOT IN must plan as a broadcast anti join (tiny excluded
    set), not a shuffled one."""
    plan = explain_str(QS["q_tpch_q16"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_q20_single_slice_two_aggregates(spark, sf_dir):
    """Q20's nested correlated HAVING must decorrelate into two
    aggregates over ONE persisted semi-joined lineitem slice."""
    plan = explain_str(QS["q_tpch_q20"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("InMemoryTableScan") >= 2


def test_incremental_join_delta_is_broadcast(spark, sf_dir):
    """The join-IVM delta legs must broadcast the batch side: the
    retraction is a broadcast ANTI join on the view, the addition a
    broadcast hash join into the fact table — no shuffle of either
    per batch."""
    plan = explain_str(QS["q_cdc_incremental_join"](spark, sf_dir))
    assert "LeftAnti, BuildRight" in plan.replace("  ", " ") or (
        "LeftAnti" in plan and "BroadcastHashJoin" in plan
    )
    assert "CartesianProduct" not in plan


def test_pack_sequences_window_is_partitioned(spark, sf_dir):
    """The corpus-wide running token sum must run as a bucket-partitioned
    window (parallel prefix-sum), not a global orderBy window in one
    task; only the 16-row bucket-totals cumsum may be single-partition."""
    plan = explain_str(QS["q_pack_sequences"](spark, sf_dir))
    assert "hashpartitioning(bucket" in plan


def test_pagerank_edges_persisted_rank_broadcast(spark, sf_dir):
    """Each PageRank iteration must reuse the persisted transition
    relation (InMemoryTableScan per iteration) and broadcast the rank
    vector — no per-iteration re-derivation of the edge pipeline and no
    shuffle of the edges."""
    plan = explain_str(QS["q_graph_pagerank"](spark, sf_dir))
    assert plan.count("InMemoryTableScan") >= 3
    assert "CartesianProduct" not in plan
    # r8: the normalization join (|nodes|-row out-weights) and each
    # iteration's in-mass left join (|nodes|-row rank vector) carry
    # explicit broadcast hints — no node-scale relation may plan a
    # sort-merge join (aggregate stats are unknown pre-AQE, and AQE
    # was observed not converting these).
    assert "SortMergeJoin" not in plan


def test_dpp_prunes_fact_partitions(spark, sf_dir):
    """q_scan_dpp's fact scan must carry a dynamic pruning subquery on
    the partition column — the plan property that makes a 3-month probe
    read 3/12 of a date-partitioned 100 TB fact."""
    plan = QS["q_scan_dpp"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, "fact scan lost dynamic partition pruning"


def test_sketch_cms_partial_agg_and_topn(spark, sf_dir):
    """The sketch build must carry partial counts (constant-state
    shuffle) and the heavy-hitter cut must be TakeOrdered, not a
    global sort."""
    plan = explain_str(QS["q_sketch_cms"](spark, sf_dir))
    assert "partial_count" in plan
    rep = plan_report(QS["q_sketch_cms"](spark, sf_dir))
    assert rep["has_take_ordered"]
    # One-pass build (round-4 verdict task 4): the whole plan reads
    # lineitem exactly twice — once for the posexploded sketch build,
    # once for the exact-count probe side; the old per-depth-row loop
    # read it five times.
    assert plan.count("lineitem.parquet") <= 2, plan


def test_bloom_reduction_joins_are_broadcast_semi(spark, sf_dir):
    plan = explain_str(QS["q_join_bloom"](spark, sf_dir))
    assert plan.count("LeftSemi") >= 3, "three Bloom-position semi-joins"
    assert "SortMergeJoin" not in plan, "reduction side must broadcast"


def test_percentile_phase2_is_take_ordered(spark, sf_dir):
    rep = plan_report(QS["q_percentile_exact_dist"](spark, sf_dir))
    assert rep["has_take_ordered"], "kth-in-bucket must plan TakeOrderedAndProject"
    assert not rep["has_sort_merge_join"]


def test_merge_on_read_anti_join_is_broadcast(spark, sf_dir):
    plan = explain_str(QS["q_cdc_merge_on_read"](spark, sf_dir))
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan, (
        "equality-delete merge must broadcast the delete-key file"
    )
    assert "SortMergeJoin" not in plan


def test_temporal_join_is_keyed_not_nested_loop(spark, sf_dir):
    plan = explain_str(QS["q_join_temporal"](spark, sf_dir))
    # version lookup must be an equi hash join on k with the validity
    # range as residual condition, never a nested-loop over versions
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)


def test_mmr_result_is_bounded_local_relation(spark, sf_dir):
    """Stage 2 (the greedy) runs on the driver over the collected
    pool, so the RETURNED relation must be a bounded LocalTableScan —
    k rows, no distributed work left in the plan. (Stage 1's pool cut
    runs inside the query call; its TakeOrdered shape is shared with
    q_sim_topk / q_topk, gated above.)"""
    plan = explain_str(QS["q_mmr_diversify"](spark, sf_dir))
    assert ("LocalTableScan" in plan) or ("Scan ExistingRDD" in plan)
    assert "Exchange" not in plan


def test_stats_corr_is_one_scan_with_partials(spark, sf_dir):
    """All 15 power sums must come from a SINGLE lineitem pass with
    map-side partial aggregation — the one-pass claim in the
    docstring; a per-pair corr() would scan once per pair."""
    plan = explain_str(QS["q_stats_corr"](spark, sf_dir))
    assert plan.count("lineitem.parquet") == 1, plan
    assert "partial_" in plan


def test_triangles_bounded_scans_and_take_ordered(spark, sf_dir):
    """Edge derivation reads lineitem at most twice (self-join sides);
    the three triangle-join references reuse the persisted edge
    relation, and the top-N cut is TakeOrdered, not a global sort."""
    spark.catalog.clearCache()
    df = QS["q_graph_triangles"](spark, sf_dir)
    plan = explain_str(df)
    assert plan.count("lineitem.parquet") <= 2, plan
    rep = plan_report(df)
    assert rep["has_take_ordered"]
    spark.catalog.clearCache()


def test_source_connectors_read_declared_schema_only(spark, sf_dir):
    """The CSV/JSON reads must carry the EXPLICIT 4/5-column schema
    into the FileScan (no inferred extra columns, no inference pass in
    the plan)."""
    csv_plan = explain_str(QS["q_source_csv"](spark, sf_dir))
    assert "csv" in csv_plan.lower()
    assert "o_orderdate" in csv_plan and "o_totalprice" in csv_plan
    json_plan = explain_str(QS["q_source_json"](spark, sf_dir))
    assert "json" in json_plan.lower()
    assert "event_type" in json_plan and "ts" in json_plan


def test_hashing_trick_has_map_side_combine(spark, sf_dir):
    plan = explain_str(QS["q_text_hashing_trick"](spark, sf_dir))
    assert "partial_count" in plan, "tf groupBy must combine map-side"


def test_dedup_trio_shares_one_materialized_stage(spark, sf_dir):
    """ngram and containment must read the SAME capped-stage files —
    the shared-derivation-as-a-table rule (SCALING.md r05 addendum)."""
    spark.catalog.clearCache()
    f1 = {f for f in QS["q_dedup_ngram"](spark, sf_dir).inputFiles()
          if "dedup_capped_" in f}
    f2 = {f for f in QS["q_dedup_containment"](spark, sf_dir).inputFiles()
          if "dedup_capped_" in f}
    assert f1 and f1 == f2


def test_robust_stats_windows_are_partitioned_and_broadcast_back(spark, sf_dir):
    """q_agg_mad / q_agg_winsorized: the rank windows must partition on
    the group key (never a single-partition global sort) and the tiny
    derived relation (medians / clip bounds) must come back via a
    broadcast join, not a shuffle."""
    for name in ("q_agg_mad", "q_agg_winsorized"):
        plan = explain_str(QS[name](spark, sf_dir))
        assert "Window" in plan, name
        assert "SinglePartition" not in plan, (
            f"{name}: a window collapsed to a single partition"
        )
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, (
            f"{name}: per-group stats relation not broadcast back"
        )
        assert "SortMergeJoin" not in plan, (
            f"{name}: tiny stats relation is shuffling the fact side"
        )
