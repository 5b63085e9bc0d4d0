"""Semantic invariants for the corpus-curation ops (ext/corpus.py)
and the SQL-surface widening (operators/subqueries.py) beyond the
generic oracle hash check."""

from __future__ import annotations

from pyspark.sql import functions as F

from proof_of_concept___cdc_w_iceberg_spark import registry
from proof_of_concept___cdc_w_iceberg_spark.ext.corpus import SEG_W
from proof_of_concept___cdc_w_iceberg_spark.ext.shingles import tokens
from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load

QS = registry.queries()


def test_dedup_lines_each_line_survives_exactly_once(spark, sf_dir):
    """Global invariant: sum of kept lines == number of DISTINCT lines
    in the corpus (every duplicate line keeps exactly one copy)."""
    out = QS["q_dedup_lines"](spark, sf_dir)
    kept_total = out.agg(F.sum("n_kept")).first()[0]

    d = load(spark, sf_dir, "documents").select(
        tokens(F.col("text")).alias("toks")
    ).filter(F.size("toks") >= 1)
    nseg = F.ceil(F.size("toks") / F.lit(SEG_W)).cast("int")
    lines = d.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), nseg),
                lambda i: F.array_join(
                    F.slice(F.col("toks"), (i - F.lit(1)) * SEG_W + 1, SEG_W), " "
                ),
            )
        ).alias("line")
    )
    n_distinct = lines.distinct().count()
    assert kept_total == n_distinct

    # and no doc gains lines
    assert out.filter(F.col("n_kept") > F.col("n_lines")).count() == 0


def test_dedup_lines_rebuilt_text_matches_kept_count(spark, sf_dir):
    """new_text must contain exactly n_kept * SEG_W tokens (except the
    corpus-final partial segment)."""
    out = QS["q_dedup_lines"](spark, sf_dir).filter(F.col("n_kept") > 0)
    toks = F.size(F.split(F.trim("new_text"), r"\s+"))
    bad = out.filter(
        (toks > F.col("n_kept") * SEG_W)
        | (toks <= (F.col("n_kept") - 1) * SEG_W)
    )
    assert bad.count() == 0


def test_contamination_rows_meet_threshold_and_exclude_eval_docs(spark, sf_dir):
    from proof_of_concept___cdc_w_iceberg_spark.ext.corpus import (
        CONTAM_MIN_SHARED,
        EVAL_MOD,
    )

    out = QS["q_contamination"](spark, sf_dir)
    rows = out.collect()
    for r in rows:
        assert r["n_shared"] >= CONTAM_MIN_SHARED
        assert r["doc_id"] % EVAL_MOD != 0      # train side only
        assert r["eval_id"] % EVAL_MOD == 0     # eval side only
        assert 0.0 < r["contam_frac"] <= 1.0


def test_domain_mix_respects_quotas(spark, sf_dir):
    out = QS["q_domain_mix"](spark, sf_dir)
    per_source = out.groupBy("source", "quota").agg(F.count("*").alias("n"))
    assert per_source.filter(F.col("n") > F.col("quota")).count() == 0
    # deterministic: two runs pick the identical sample
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in QS["q_domain_mix"](spark, sf_dir).collect())
    assert a == b


def test_token_histogram_partitions_corpus(spark, sf_dir):
    """Histogram covers every doc exactly once: n_docs sums to the
    corpus size, and each bucket_lo is a power of two <= its tokens."""
    out = QS["q_token_histogram"](spark, sf_dir).collect()
    n_docs_total = sum(r["n_docs"] for r in out)
    corpus = load(spark, sf_dir, "documents").count()
    assert n_docs_total == corpus
    for r in out:
        assert r["bucket_lo"] & (r["bucket_lo"] - 1) == 0  # power of two
        assert r["total_tokens"] >= r["n_docs"] * r["bucket_lo"]
        assert r["total_tokens"] < r["n_docs"] * r["bucket_lo"] * 2


def test_recursive_cte_zero_fills_gap_months(spark, sf_dir):
    """The month scaffold must emit all 36 months, including those
    with zero qualifying orders."""
    rows = QS["q_sql_recursive"](spark, sf_dir).collect()
    assert len(rows) == 36
    months = {r["month"].isoformat() for r in rows}
    assert "1995-01-01" in months and "1997-12-01" in months
    assert all(r["n_big_orders"] >= 0 for r in rows)


def test_incremental_agg_equals_recompute(spark, sf_dir):
    """The IVM law: maintain(base_agg, batch) == recompute(apply(base,
    batch)) — checked entirely inside Spark (the driver oracle checks
    the same law against DuckDB)."""
    from proof_of_concept___cdc_w_iceberg_spark.cdc.apply import apply_changes
    from proof_of_concept___cdc_w_iceberg_spark.cdc.incremental import (
        maintain_sum_count,
    )
    from proof_of_concept___cdc_w_iceberg_spark.sources.cdc_fixtures import (
        changelog,
    )

    ch = changelog(spark, sf_dir)
    base = ch.filter(F.col("op") == "r").select("k", "bal")
    batch = ch.filter(F.col("op") != "r")
    inc = {
        r["grp"]: (float(r["dsum"]), r["n"])
        for r in maintain_sum_count(base, batch, ["k"], F.col("k") % 10, "bal")
        .collect()
    }
    mirror = apply_changes(
        base.withColumn("op", F.lit("r"))
        .withColumn("ts_ms", F.lit(0))
        .withColumn("off", F.lit(0)),
        batch.select("k", "bal", "op", "ts_ms", "off"),
        ["k"],
    )
    full = {
        r["grp"]: (float(r["s"]), r["n"])
        for r in mirror.groupBy((F.col("k") % 10).alias("grp"))
        .agg(
            F.sum(F.col("bal").cast("decimal(18,2)")).alias("s"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert inc == full


def test_band_join_matches_each_pair_once(spark, sf_dir):
    """Bucket blocking must not double-count a pair that straddles
    bucket candidates: total matched pairs == the theta-join count."""
    from proof_of_concept___cdc_w_iceberg_spark.operators.joins import _BAND_MS

    ev = load(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("eid"), F.unix_millis("ts").alias("e_ms")
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.unix_millis("ts").alias("c_ms")
    )
    naive = (
        err.crossJoin(clk)
        .filter(F.abs(F.col("e_ms") - F.col("c_ms")) <= _BAND_MS)
        .count()
    )
    bucketed = (
        QS["q_join_range_bucketed"](spark, sf_dir)
        .agg(F.sum("n_nearby_clicks"))
        .first()[0]
    )
    assert bucketed == naive


def test_lateral_join_topk_per_customer(spark, sf_dir):
    """At most 2 orders per customer, and they are that customer's
    priciest ones."""
    out = QS["q_lateral_join"](spark, sf_dir)
    per_cust = out.groupBy("c_custkey").count()
    assert per_cust.filter(F.col("count") > 2).count() == 0
    # spot-check one customer with >2 orders
    orders = load(spark, sf_dir, "orders")
    cust = (
        orders.groupBy("o_custkey").count().filter(F.col("count") >= 3)
        .first()
    )
    if cust:
        k = cust["o_custkey"]
        expect = [
            r["o_orderkey"]
            for r in orders.filter(F.col("o_custkey") == k)
            .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
            .limit(2)
            .collect()
        ]
        got = [
            r["o_orderkey"]
            for r in out.filter(F.col("c_custkey") == k)
            .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
            .collect()
        ]
        assert got == expect
