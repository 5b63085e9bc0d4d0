"""Durable-state round-trips for the dedup IVM paths (round-8/round-10).

The round-7 advice noted that ``capped_stage_apply`` and
``connected_components_apply`` cut lineage with
``localCheckpoint(eager=True)`` — executor-local blocks, gone on
executor loss. The round-9 answer is the epoch-committed state API in
ext/dedup.py (``save_state`` / ``load_state`` / ``cycle_state`` /
``prune_state``); these tests drive the apply==rebuild contract
THROUGH that API (the resident pipeline's batch boundary), and the
crash-recovery tests exercise its commit semantics directly:
uncommitted epochs are invisible, a crashed save's debris can never
leak into a later committed epoch, and pruning keeps a rollback
target while sweeping stale debris.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from proof_of_concept___cdc_w_iceberg_spark.ext.dedup import (
    cycle_state,
    load_state,
    prune_state,
    save_state,
    state_epochs,
)


def test_capped_stage_apply_survives_state_cycle(spark, sf_dir, tmp_path):
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

    base = str(tmp_path / "capped_state")
    sh_c, sizes, hist = build(corpus)
    for batch in (batch1, batch2):
        # Durably cycle ALL maintained state through an epoch commit
        # before each apply — the resident pipeline's batch boundary.
        st = cycle_state(base, {"sh_c": sh_c, "sizes": sizes, "hist": hist})
        sh_c, sizes, hist = st["sh_c"], st["sizes"], st["hist"]
        sh_c, sizes, hist = capped_stage_apply(
            sh_c, sizes, hist, doc_shingles(batch)
        )

    assert state_epochs(base) == [0, 1]
    want_sh, want_sizes, want_hist = build(docs)
    for got, want, what in (
        (sh_c, want_sh, "capped shingles"),
        (sizes, want_sizes, "sizes"),
        (hist, want_hist, "df histogram"),
    ):
        assert got.exceptAll(want).count() == 0, f"{what}: extra rows"
        assert want.exceptAll(got).count() == 0, f"{what}: missing rows"
    spark.catalog.clearCache()


def test_components_apply_survives_state_cycle(spark, tmp_path):
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
    # with the labeling epoch-committed between applies.
    b2 = spark.createDataFrame(
        [(2, 3), (6, 8), (9, 20)], "id_a long, id_b long"
    )
    base = str(tmp_path / "cc_state")
    for batch in (b1, b2):
        labels = cycle_state(base, {"labels": labels})["labels"]
        labels = connected_components_apply(labels, batch)

    all_nodes = nodes.unionByName(spark.createDataFrame([(20,)], "node long"))
    want = connected_components(all_nodes, b1.unionByName(b2))
    got = {r["node"]: r["comp"] for r in labels.collect()}
    exp = {r["node"]: r["comp"] for r in want.collect()}
    assert got == exp

    # The committed epochs ARE the restart path: load the latest one
    # after a simulated process loss and it must be the same labeling.
    recovered = load_state(spark, base, ["labels"])["labels"]
    relabeled = connected_components_apply(recovered, b2)
    got2 = {r["node"]: r["comp"] for r in relabeled.collect()}
    assert got2 == exp
    spark.catalog.clearCache()


def test_uncommitted_epoch_is_invisible(spark, tmp_path):
    base = str(tmp_path / "state")
    df = spark.range(5).select(F.col("id").alias("node"))
    assert save_state(base, {"nodes": df}) == 0

    # Simulate a crash mid-save: epoch=1 exists on disk (a relation
    # was written) but the _STATE_SUCCESS marker never landed.
    df.write.mode("overwrite").parquet(os.path.join(base, "epoch=1", "nodes"))
    assert state_epochs(base) == [0]
    got = load_state(spark, base, ["nodes"])["nodes"]
    assert got.count() == 5  # recovered from epoch 0, not the debris

    import pytest

    with pytest.raises(FileNotFoundError):
        load_state(spark, str(tmp_path / "empty"), ["nodes"])


def test_crashed_save_debris_never_leaks_into_next_commit(spark, tmp_path):
    base = str(tmp_path / "state")
    df = spark.range(5).select(F.col("id").alias("node"))
    save_state(base, {"nodes": df})

    # Crashed save at epoch=1 left a relation ("ghost") that the next
    # save does NOT write. Without the pre-write clear, ghost/ would
    # become visible the moment the next save's marker lands (round-9
    # advice: 'stale parquet dirs from the aborted save become visible
    # as part of the newly committed epoch').
    ghost = os.path.join(base, "epoch=1", "ghost")
    df.write.mode("overwrite").parquet(ghost)
    n = save_state(base, {"nodes": df.filter(F.col("node") < 3)})
    assert n == 1
    assert not os.path.exists(ghost), "crashed-save debris leaked into commit"
    assert state_epochs(base) == [0, 1]
    assert load_state(spark, base, ["nodes"])["nodes"].count() == 3


def test_prune_keeps_rollback_target_and_sweeps_debris(spark, tmp_path):
    base = str(tmp_path / "state")
    df = spark.range(3).select(F.col("id").alias("node"))
    for _ in range(4):  # epochs 0..3 committed
        save_state(base, {"nodes": df})
    # Marker-less debris below the kept floor (swept) and above it
    # (left alone — could be a save in flight).
    os.makedirs(os.path.join(base, "epoch=0", "stale"), exist_ok=True)
    os.rename(
        os.path.join(base, "epoch=0", "_STATE_SUCCESS"),
        os.path.join(base, "epoch=0", "_gone"),
    )
    os.makedirs(os.path.join(base, "epoch=9"))

    prune_state(base, keep=2)
    assert state_epochs(base) == [2, 3]
    names = sorted(n for n in os.listdir(base) if n.startswith("epoch="))
    assert names == ["epoch=2", "epoch=3", "epoch=9"]

    # keep > n_committed: no-op; nothing-committed-yet: no-op.
    prune_state(base, keep=10)
    assert state_epochs(base) == [2, 3]
    empty = str(tmp_path / "inflight")
    os.makedirs(os.path.join(empty, "epoch=0"))
    prune_state(empty, keep=2)
    assert os.path.exists(os.path.join(empty, "epoch=0"))
