"""Central query registry.

Every operator from SURVEY.md §2 registers here as a named query
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB
oracle SQL string. ``__spark_entry__.py`` re-exports these to the
driver, which hash-compares Spark vs DuckDB at sf=0.01.

Cross-engine determinism rules used throughout (see tests):
- sums over doubles go through DECIMAL(18,2)/(20,8) casts (exact,
  order-independent addition), final-cast back to DOUBLE;
- float vector math uses *sequential left folds* (Spark ``aggregate``
  / DuckDB ``list_reduce``), which are bit-identical IEEE754 chains;
- every LIMIT/top-k is fully ordered with a unique tiebreaker;
- collected lists are sorted+joined to a canonical string.
"""

from __future__ import annotations

import functools
import os
import tempfile
import zipfile

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

_pkg_zip: str | None = None
_shipped_contexts: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on Spark workers regardless of the
    driver process's cwd/sys.path.

    Module-level UDF kernels (e.g. ``ext.multimodal.decode_batches``)
    are cloudpickled *by reference*, so Python workers must be able to
    ``import proof_of_concept___cdc_w_iceberg_spark`` themselves. Zip the package once
    per process and ``addPyFile`` it once per SparkContext — a no-op
    for consumers that already run from the repo root."""
    global _pkg_zip
    sc = spark.sparkContext
    if id(sc) in _shipped_contexts:
        return
    # Session prep beyond shipping code: pin UTC so wall-clock date
    # results agree with the tz-naive DuckDB oracle even when the
    # consuming session was built without our factory (runtime-settable
    # conf, unlike most session options).
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # Unannotated fixture stamps must load as TIMESTAMP, not
        # TIMESTAMP_NTZ (epoch functions reject NTZ); runtime-settable.
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass
    if _pkg_zip is None:
        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        pkg_name = os.path.basename(pkg_dir)
        fd, path = tempfile.mkstemp(prefix=f"{pkg_name}_", suffix=".zip")
        with os.fdopen(fd, "wb") as f, zipfile.ZipFile(f, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fname in files:
                    if not fname.endswith(".py"):
                        continue
                    full = os.path.join(root, fname)
                    rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
        _pkg_zip = path
    sc.addPyFile(_pkg_zip)
    _shipped_contexts.add(id(sc))


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as query ``name`` with optional DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            return fn(spark, sf_dir)

        _QUERIES[name] = wrapped
        if oracle is not None:
            _ORACLES[name] = oracle
        wrapped.query_name = name  # type: ignore[attr-defined]
        fn.query_name = name  # type: ignore[attr-defined]
        return wrapped

    return deco


_loaded = False

# Driver-verification ordering. The external driver hash-checks only the
# first 50 entries of ``queries()`` per round, so ordering is coverage
# policy: queries that have never received a driver CORRECTNESS row go
# first. Rounds 1+2 together produced green rows for 100 queries (all
# pass); those sit at the BACK, regression-guarded locally by
# tests/test_correctness.py, which runs the identical oracle gate over
# ALL queries.
#
# Rotation protocol (applied r03): once CORRECTNESS_r{N} lands, move
# newly-green names to the back and pull never-checked names into the
# front window until every query has accumulated at least one green
# driver row. The two no-oracle ANN queries (q_sim_ivf / q_sim_lsh,
# approximate by design) sit right after the oracle-backed unchecked
# block: they can only ever earn a rows-only row, so they must not
# displace hash-checkable queries from the window
# (test_front_window_all_have_oracles keeps them out of the front 50).
_CHECK_PRIORITY = [
    "q_multimodal_resize",
    "q_multimodal_framesample",
    "q_udf_python",
    "q_udf_pandas",
    "q_udaf_grouped",
    "q_udtf_explode",
    "q_udtf_python",
    "q_tpch_q4",
    "q_tpch_q12",
    "q_tpch_q18",
    "q_sql_text",
    "q_join_salted",
    "q_sink_avro",
    "q_tpch_q6",
    "q_tpch_q10",
    "q_tpch_q14",
    "q_tpch_q19",
    "q_dedup_cluster",
    "q_embed_centroid",
    "q_embed_normalize",
    "q_text_vocab",
    "q_text_pii_scrub",
    "q_agg_median",
    "q_pivot",
    "q_sample_reservoir",
    "q_win_percentile",
    "q_cdc_time_travel",
    "q_cdc_incremental_read",
    "q_agg_stats",
    "q_stream_join",
    "q_pipeline_curate",
    "q_sink_json",
    "q_sink_csv",
    "q_exists_subquery",
    "q_in_subquery",
    "q_scalar_subquery",
    "q_lateral_join",
    "q_sql_recursive",
    "q_agg_filter",
    "q_string_agg",
    "q_unpivot",
    "q_win_first_last",
    "q_dedup_lines",
    "q_contamination",
    "q_token_histogram",
    "q_domain_mix",
    "q_funnel",
    "q_retention",
    "q_tpch_q13",
    "q_tpch_q17",
    "q_cdc_incremental_agg",
    "q_join_range_bucketed",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q15",
    "q_tpch_q22",
    "q_text_gopher",
    "q_doc_chunk",
    "q_text_tfidf",
    "q_ts_ewma",
    "q_profile",
    "q_multimodal_phash",
    "q_stream_stream_join",
    "q_tpch_q21",
    "q_tpch_q9",
    "q_tpch_q11",
    "q_tpch_q2",
    "q_tpch_q16",
    "q_tpch_q20",
    "q_cdc_incremental_join",
    "q_pack_sequences",
    "q_embed_quantize",
    "q_ts_resample",
    "q_udf_cogrouped",
    "q_sessionize",
    "q_anomaly",
    "q_bm25",
    "q_time_bucket",
    "q_graph_pagerank",
    "q_dedup_incremental",
    "q_layout_zorder",
    "q_corpus_balance",
    # r03 operator widening (never driver-checked; oracle-backed)
    "q_cdc_scd2",
    "q_islands",
    "q_histogram",
    "q_agg_mode",
    "q_dedup_normalized",
    "q_shuffle_shards",
    "q_weighted_sample",
    "q_text_entropy",
    "q_feature_pit",
    "q_dedup_containment",
    "q_stratified_split",
    "q_json_roundtrip",
    "q_cdc_dead_letter",
    "q_scan_dpp",
    "q_model_score",
    "q_embed_gram",
    "q_null_semantics",
    "q_explode_outer",
    "q_struct_ops",
    "q_ts_interpolate",
    "q_dedup_fuzzy",
    "q_win_time_range",
    "q_cdc_offset_gaps",
    "q_agg_bool",
    "q_distinct_salted",
    "q_join_asof_forward",
    "q_union_evolve",
    "q_cdc_snapshot_log",
    "q_rerank",
    "q_centroid_incremental",
    "q_benford",
    "q_dup_ratio_report",
    "q_ts_autocorr",
    "q_text_pmi",
    "q_agg_argmax",
    "q_ts_twap",
    "q_text_lm_score",
    "q_sim_ivf",
    "q_sim_lsh",
    "q_cdc_apply",
    "q_cdc_apply_scale",
    "q_cdc_apply_bucketed",
    "q_cdc_diff",
    "q_cdc_snapshot_then_stream",
    "q_cdc_mirror_verify",
    "q_cdc_soft_delete_log",
    "q_source_changelog",
    "q_envelope_decode",
    "q_sink_upsert",
    "q_win_rownumber",
    "q_win_rank",
    "q_win_lag_lead",
    "q_win_running",
    "q_win_range_frame",
    "q_win_ntile",
    "q_str_funcs",
    "q_str_regex",
    "q_date_funcs",
    "q_math_funcs",
    "q_cast",
    "q_case_when",
    "q_json_funcs",
    "q_array_funcs",
    "q_map_funcs",
    "q_stream_microbatch",
    "q_stream_upsert",
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_session",
    "q_stream_watermark",
    "q_stream_heartbeat",
    "q_stream_dedup",
    "q_dedup_exact",
    "q_dedup_near",
    "q_dedup_minhash",
    "q_dedup_ngram",
    "q_dedup_simhash",
    "q_dedup_embed",
    "q_sim_topk",
    "q_sim_pairwise",
    "q_text_stats",
    "q_text_langid",
    "q_text_quality",
    "q_text_tokens",
    "q_text_ngram",
    "q_text_fingerprint",
    "q_multimodal_cols",
    "q_multimodal_decode",
    "q_multimodal_features",
    "q_agg_count",
    "q_agg_groupby",
    "q_agg_distinct",
    "q_agg_approx_distinct",
    "q_agg_having",
    "q_agg_rollup",
    "q_agg_cube",
    "q_agg_grouping_sets",
    "q_agg_collect",
    "q_agg_approx_quantile",
    "q_sample_stratified",
    "q_project",
    "q_project_computed",
    "q_filter_eq",
    "q_filter_range",
    "q_filter_in",
    "q_filter_like",
    "q_filter_null",
    "q_filter_compound",
    "q_join_inner",
    "q_join_broadcast",
    "q_join_left",
    "q_join_right",
    "q_join_full",
    "q_join_semi",
    "q_join_anti",
    "q_join_cross",
    "q_join_theta",
    "q_join_multiway",
    "q_join_asof",
    "q_scan_full",
    "q_scan_parquet",
    "q_source_jdbc_snapshot",
    "q_sink_append",
    "q_sink_route",
    "q_sink_orc",
    "q_schema_evolve",
    "q_insert_values",
    "q_ddl_create",
    "q_catalog_list",
    "q_union_all",
    "q_union_distinct",
    "q_intersect",
    "q_except",
    "q_sort",
    "q_sort_multi",
    "q_limit",
    "q_topk",
    "q_tpch_q1",
    "q_tpch_q3",
]


def _load() -> None:
    """Import every module that registers queries (idempotent)."""
    global _loaded
    if _loaded:
        return
    _loaded = True
    from .operators import aggregates, events, filters, joins, layout, scans, setops, sorts, subqueries, tpch, windows  # noqa: F401
    from .functions import scalar  # noqa: F401
    from .cdc import incremental as _cdc_ivm  # noqa: F401
    from .cdc import queries as _cdc  # noqa: F401
    from .streaming import queries as _streaming  # noqa: F401
    from .ext import corpus, dedup, embeddings, graph, inference, multimodal, pipeline, similarity, text, udfs  # noqa: F401


def queries() -> dict[str, QueryFn]:
    _load()
    ordered: dict[str, QueryFn] = {}
    for name in _CHECK_PRIORITY:
        if name in _QUERIES:
            ordered[name] = _QUERIES[name]
    for name, fn in _QUERIES.items():  # new queries not yet in the list
        if name not in ordered:
            ordered[name] = fn
    return ordered


def oracles() -> dict[str, str]:
    _load()
    return dict(_ORACLES)
