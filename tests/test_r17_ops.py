"""Round-17 additions.

1. ``q_sim_ivf_pq`` — the registered IVFADC serving rung (the r16
   staged library's one-decorator registration, verdict item 2).
   Cross-engine oracle equality for the underlying composition is
   already law-tested (test_r16_ops.py: ivf_pq / ivf_pq_rerank); here
   we pin the REGISTERED query's output contract — the exact column
   set, types, per-query row bound, and identity with the library
   composition at the registered defaults — so a future refactor of
   either side cannot silently fork them.
2. bench.py end-loadavg contamination guard (verdict item 4) is
   covered in tests/test_bench_contract.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from proof_of_concept___cdc_w_iceberg_spark import registry
from proof_of_concept___cdc_w_iceberg_spark.ext import ann
from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load


def test_q_sim_ivf_pq_registered_contract(spark, sf_dir):
    qs = registry.queries()
    df = qs["q_sim_ivf_pq"](spark, sf_dir)
    assert set(df.columns) == {"query_id", "cand_id", "dot", "rn"}
    types = dict(df.dtypes)
    assert types["rn"] == "bigint"
    assert types["dot"] == "double"
    rows = df.collect()
    assert len(rows) > 0
    per_q = {}
    for r in rows:
        assert 1 <= r.rn <= 5
        assert r.query_id % 100 == 0
        assert r.cand_id != r.query_id
        per_q.setdefault(r.query_id, []).append(r.rn)
    for q, rns in per_q.items():
        assert sorted(rns) == list(range(1, len(rns) + 1)), q


def test_q_sim_ivf_pq_equals_library_composition(spark, sf_dir):
    """The registered fn IS ivf_pq_build -> ivf_pq_rerank_topk at the
    library defaults — no registered-only drift."""
    qs = registry.queries()
    got = sorted(map(tuple, qs["q_sim_ivf_pq"](spark, sf_dir).collect()))
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    cent, cb, codes = ann.ivf_pq_build(e)
    want = sorted(
        map(
            tuple,
            ann.ivf_pq_rerank_topk(
                e, cent, cb, codes, k=5,
                shortlist=ann.IVF_PQ_RERANK_SHORTLIST,
            )
            .select(
                "query_id", "cand_id",
                F.round("dot", 6).alias("dot"),
                F.col("rn").cast("long").alias("rn"),
            )
            .collect(),
        )
    )
    assert got == want and len(got) > 0


def test_q_sim_ivf_pq_in_driver_window(sf_dir):
    """The r17 window spends its ONE free slot on this rung and keeps
    the entire 48-row r10-stale block plus the promoted no-oracle
    rotation (q_ddl_create) inside the first 50 — the r16 verdict's
    exact window-budget arithmetic."""
    names = list(registry.queries())
    window = names[:50]
    assert window[0] == "q_sim_ivf_pq"
    assert window[1] == "q_ddl_create"
    r10_block = {
        "q_agg_argmax", "q_agg_bool", "q_agg_mode", "q_agg_moments",
        "q_anomaly", "q_attribution", "q_cdc_apply_evolve",
        "q_cdc_apply_partitioned", "q_cdc_compact_log",
        "q_cdc_dead_letter", "q_cdc_drift_psi", "q_cdc_expire_snapshots",
        "q_cdc_fanout", "q_cdc_incremental_agg", "q_cdc_incremental_join",
        "q_cdc_lag", "q_cdc_merge_on_read", "q_cdc_offset_gaps",
        "q_cdc_partial_update", "q_cdc_scd2", "q_cdc_snapshot_log",
        "q_cdc_vacuum_orphans", "q_cdc_wap", "q_dedup_containment",
        "q_dedup_eval", "q_dedup_fuzzy", "q_dedup_incremental",
        "q_dedup_normalized", "q_dedup_semantic",
        "q_dedup_substr_incremental", "q_dedup_substr_rewrite",
        "q_join_asof_forward", "q_join_interval", "q_join_nullsafe",
        "q_join_range_bucketed", "q_join_temporal", "q_stream_compact",
        "q_stream_partial_update", "q_stream_stream_join", "q_tpch_q11",
        "q_tpch_q15", "q_udf_pandas", "q_udf_python", "q_udtf_explode",
        "q_udtf_python", "q_unpivot", "q_win_first_last",
        "q_win_percentile",
    }
    assert r10_block <= set(window), sorted(r10_block - set(window))
