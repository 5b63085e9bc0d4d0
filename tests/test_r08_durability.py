"""Durable-state round-trips for the dedup IVM paths (round-8).

The round-7 advice noted that ``capped_stage_apply`` and
``connected_components_apply`` cut lineage with
``localCheckpoint(eager=True)`` — executor-local blocks, gone on
executor loss. The documented resident-deployment answer is to write
the maintained relations to their index TABLES between batches (both
functions take and return plain DataFrames precisely so callers own
persistence). These tests execute that path instead of just
documenting it: every maintained relation is written to parquet and
re-read between applies — a storage-backed lineage cut equivalent to a
process restart — and the apply==rebuild contract must survive it.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _roundtrip(df, path: str):
    """Write a maintained relation to its 'index table' and read it
    back — fresh lineage, state recoverable after executor loss."""
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def test_capped_stage_apply_survives_table_roundtrip(spark, sf_dir, tmp_path):
    from proof_of_concept___cdc_w_iceberg_spark.ext.dedup import (
        MAX_DOCS_PER_SHINGLE,
        capped_stage_apply,
    )
    from proof_of_concept___cdc_w_iceberg_spark.ext.shingles import doc_shingles
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 3 == 0)
    batch1 = docs.filter(F.col("doc_id") % 3 == 1)
    batch2 = docs.filter(F.col("doc_id") % 3 == 2)

    def build(d):
        sh = doc_shingles(d)
        hist = sh.groupBy("sh").agg(F.count("*").alias("df"))
        capped = sh.join(
            hist.filter(F.col("df") <= MAX_DOCS_PER_SHINGLE).select("sh"), "sh"
        )
        sizes = capped.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
        return capped, sizes, hist

    sh_c, sizes, hist = build(corpus)
    for i, batch in enumerate((batch1, batch2)):
        # Persist ALL maintained state to storage before each apply —
        # the resident pipeline's batch boundary.
        sh_c = _roundtrip(sh_c, str(tmp_path / f"sh_c_{i}"))
        sizes = _roundtrip(sizes, str(tmp_path / f"sizes_{i}"))
        hist = _roundtrip(hist, str(tmp_path / f"hist_{i}"))
        sh_c, sizes, hist = capped_stage_apply(
            sh_c, sizes, hist, doc_shingles(batch)
        )

    want_sh, want_sizes, want_hist = build(docs)
    for got, want, what in (
        (sh_c, want_sh, "capped shingles"),
        (sizes, want_sizes, "sizes"),
        (hist, want_hist, "df histogram"),
    ):
        assert got.exceptAll(want).count() == 0, f"{what}: extra rows"
        assert want.exceptAll(got).count() == 0, f"{what}: missing rows"
    spark.catalog.clearCache()


def test_components_apply_survives_table_roundtrip(spark, tmp_path):
    from proof_of_concept___cdc_w_iceberg_spark.ext.dedup import (
        connected_components,
        connected_components_apply,
    )

    nodes = spark.range(12).select(F.col("id").alias("node"))
    labels = nodes.select("node", F.col("node").alias("comp"))
    b1 = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6), (8, 9)], "id_a long, id_b long"
    )
    # Cross-batch merges + a brand-new node, as in the r06 test — but
    # with the labeling persisted to its table between applies.
    b2 = spark.createDataFrame(
        [(2, 3), (6, 8), (9, 20)], "id_a long, id_b long"
    )
    for i, batch in enumerate((b1, b2)):
        labels = _roundtrip(labels, str(tmp_path / f"labels_{i}"))
        labels = connected_components_apply(labels, batch)

    all_nodes = nodes.unionByName(spark.createDataFrame([(20,)], "node long"))
    want = connected_components(all_nodes, b1.unionByName(b2))
    got = {r["node"]: r["comp"] for r in labels.collect()}
    exp = {r["node"]: r["comp"] for r in want.collect()}
    assert got == exp
    spark.catalog.clearCache()
