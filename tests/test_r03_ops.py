"""Semantic invariants for the r03 operator batch — properties the
DuckDB hash-compare can't state directly (cross-operator consistency,
partition/totality laws, determinism under re-evaluation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from proof_of_concept___cdc_w_iceberg_spark import registry
from proof_of_concept___cdc_w_iceberg_spark.ext.corpus import BALANCE_FRAC
from proof_of_concept___cdc_w_iceberg_spark.ext.inference import PPL_KEEP, PPL_MIN
from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load

QS = registry.queries()


def test_scd2_current_versions_equal_cdc_mirror(spark, sf_dir):
    """The open (is_current) SCD2 versions must be exactly the
    latest-wins mirror q_cdc_apply produces — same keys, same values.
    History and snapshot are two renderings of one changelog."""
    scd2 = QS["q_cdc_scd2"](spark, sf_dir)
    current = scd2.filter("is_current = 1").select("k", "name", "bal")
    mirror = QS["q_cdc_apply"](spark, sf_dir).select("k", "name", "bal")
    assert current.exceptAll(mirror).count() == 0
    assert mirror.exceptAll(current).count() == 0


def test_scd2_versions_tile_without_overlap(spark, sf_dir):
    """Within a key, version intervals are disjoint and ordered:
    each valid_from >= the previous version's valid_to (gaps allowed —
    deletes create them), and exactly one open version per live key."""
    from pyspark.sql import Window

    scd2 = QS["q_cdc_scd2"](spark, sf_dir)
    w = Window.partitionBy("k").orderBy("valid_from")
    overlaps = (
        scd2.withColumn("prev_to", F.lag("valid_to").over(w))
        .filter(F.col("prev_to").isNotNull() & (F.col("valid_from") < F.col("prev_to")))
        .count()
    )
    assert overlaps == 0
    multi_open = (
        scd2.filter("is_current = 1").groupBy("k").count().filter("count > 1").count()
    )
    assert multi_open == 0


def test_islands_partition_the_event_log(spark, sf_dir):
    """Runs tile the per-user event sequence: run lengths sum to the
    total event count and every run is non-empty."""
    runs = QS["q_islands"](spark, sf_dir)
    total = runs.agg(F.sum("run_len")).collect()[0][0]
    n_events = load(spark, sf_dir, "events").count()
    assert total == n_events
    assert runs.filter("run_len < 1").count() == 0
    assert runs.filter("run_start > run_end").count() == 0


def test_histogram_counts_total_and_edges_ordered(spark, sf_dir):
    hist = QS["q_histogram"](spark, sf_dir)
    rows = hist.collect()
    assert sum(r["n"] for r in rows) == load(spark, sf_dir, "lineitem").count()
    for r in rows:
        assert r["bin_min"] <= r["bin_max"]
    # buckets are distinct and within [0, 32)
    buckets = [r["bucket"] for r in rows]
    assert len(set(buckets)) == len(buckets)
    assert all(0 <= b < 32 for b in buckets)


def test_stratified_split_partitions_and_rates(spark, sf_dir):
    split = QS["q_stratified_split"](spark, sf_dir)
    rows = split.collect()
    n_total = sum(r["n_docs"] for r in rows)
    assert n_total == load(spark, sf_dir, "documents").count()
    by_split = {}
    for r in rows:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    assert set(by_split) <= {"train", "val", "test"}
    # 90/5/5 within generous tolerance at fixture size
    assert by_split["train"] / n_total > 0.8


def test_weighted_sample_is_deterministic_and_honors_predicate(spark, sf_dir):
    s1 = QS["q_weighted_sample"](spark, sf_dir)
    a = {r["doc_id"] for r in s1.collect()}
    b = {r["doc_id"] for r in QS["q_weighted_sample"](spark, sf_dir).collect()}
    assert a == b  # pure function of doc_id — identical on re-evaluation
    assert s1.filter(~(F.col("u") < F.col("n_toks") / 120.0)).count() == 0


def test_shuffle_shards_cover_corpus_with_dense_positions(spark, sf_dir):
    sh = QS["q_shuffle_shards"](spark, sf_dir)
    n_docs = load(spark, sf_dir, "documents").count()
    assert sh.count() == n_docs
    assert sh.select("doc_id").distinct().count() == n_docs
    # positions within a shard are 1..n (dense ranking, no gaps)
    bad = (
        sh.groupBy("shard")
        .agg(F.count("*").alias("n"), F.max("pos_in_shard").alias("mx"),
             F.min("pos_in_shard").alias("mn"))
        .filter((F.col("mx") != F.col("n")) | (F.col("mn") != 1))
        .count()
    )
    assert bad == 0


def test_corpus_balance_respects_budget(spark, sf_dir):
    bal = QS["q_corpus_balance"](spark, sf_dir)
    assert bal.filter(F.col("cum_toks") > F.col("budget")).count() == 0
    # kept token mass per lang is at most the declared fraction
    kept = bal.groupBy("lang").agg(F.max("cum_toks").alias("kept"),
                                   F.max("budget").alias("budget")).collect()
    for r in kept:
        assert r["kept"] <= r["budget"]
    assert 0 < BALANCE_FRAC < 1


def test_model_score_range_and_threshold(spark, sf_dir):
    scored = QS["q_model_score"](spark, sf_dir)
    assert scored.filter((F.col("ppl") < PPL_MIN) | (F.col("ppl") >= PPL_KEEP)).count() == 0


def test_embed_gram_diagonal_positive_and_counts_constant(spark, sf_dir):
    gram = QS["q_embed_gram"](spark, sf_dir)
    n_vecs = load(spark, sf_dir, "embeddings").count()
    assert gram.filter(F.col("n") != n_vecs).count() == 0
    # diagonal of a Gram matrix is a sum of squares — strictly >= 0
    assert gram.filter((F.col("i") == F.col("j")) & (F.col("gram") < 0)).count() == 0
    d = 64
    assert gram.count() == d * (d + 1) // 2


def test_containment_dominates_jaccard_on_shared_pairs(spark, sf_dir):
    """For any pair both queries report, max-containment >= Jaccard
    (set algebra: |A∩B|/min ≥ |A∩B|/|A∪B|)."""
    jac = QS["q_dedup_ngram"](spark, sf_dir).select("id_a", "id_b", "jaccard")
    con = QS["q_dedup_containment"](spark, sf_dir).select(
        "id_a", "id_b",
        F.greatest("contain_a_in_b", "contain_b_in_a").alias("cmax"),
    )
    joined = jac.join(con, ["id_a", "id_b"])
    assert joined.filter(F.col("cmax") < F.col("jaccard") - 1e-9).count() == 0
