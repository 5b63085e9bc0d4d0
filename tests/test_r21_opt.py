"""r21 optimization-round equivalence pins (OPTIMIZATION_r21.md).

Same contract as tests/test_r20_opt.py: every optimization here
restructured an operator's internals while the registered results must
stay bit-identical; each test pins the restructured primitive against
the reference shape it replaced.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from proof_of_concept___cdc_w_iceberg_spark.ext import ann
from proof_of_concept___cdc_w_iceberg_spark.ext.similarity import _sqnorm
from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return load(spark, SF, "embeddings").select(
        "vec_id", "label", "embedding",
        _sqnorm(F.col("embedding")).alias("sq"),
    )


def _rows(df):
    return sorted(
        (r["src"], r["dst"], repr(r["cosine"]), r["rn"])
        for r in df.collect()
    )


def test_knn_graph_state_kernel_matches_fold(spark):
    """knn_graph_state's cell_pair_scores kernel build must equal the
    join+fold reference bit-for-bit (unrounded cosines included — the
    state carries full precision)."""
    e = _emb(spark)
    new = ann.knn_graph_state(e)
    old = ann._knn_topk(ann._knn_scored(e, e))
    assert _rows(new) == _rows(old)


def test_knn_delete_apply_cogroup_rerank_matches_fold(spark):
    """knn_graph_delete_apply's cogroup-kernel rerank must equal the
    join+fold reference on the registered delete shape (every 11th
    vector removed)."""
    e = _emb(spark).localCheckpoint(eager=True)
    state = ann.knn_graph_state(e).localCheckpoint(eager=True)
    dels = e.filter(F.col("vec_id") % 11 == 3).select("vec_id")
    surv = e.filter(F.col("vec_id") % 11 != 3)

    new = ann.knn_graph_delete_apply(state, surv, dels)

    # Reference: the pre-r21 shape (join + interpreted fold rerank).
    dels_b = F.broadcast(dels.select(F.col("vec_id").alias("del_id")))
    alive = state.join(dels_b, F.col("src") == F.col("del_id"), "left_anti")
    broken = (
        alive.join(dels_b, F.col("dst") == F.col("del_id"), "left_semi")
        .select("src")
        .distinct()
    )
    keep = alive.join(broken, "src", "left_anti")
    e_broken = surv.join(broken.withColumnRenamed("src", "vec_id"), "vec_id")
    old = keep.unionByName(
        ann._knn_topk(ann._knn_scored(e_broken, surv))
    )
    assert _rows(new) == _rows(old)


def test_substr_state_build_materialize_hook_row_preserving(spark):
    """substr_state_build(materialize=localCheckpoint) must return the
    same three relations as the unhooked build (the hook only cuts
    lineage — q_dedup_substr_incremental's r21 restructure)."""
    from proof_of_concept___cdc_w_iceberg_spark.ext.dedup import (
        substr_state_build,
    )

    docs = load(spark, SF, "documents").select("doc_id", "text")
    g0, h0, r0 = substr_state_build(docs, w=3)
    g1, h1, r1 = substr_state_build(
        docs, w=3, materialize=lambda df: df.localCheckpoint(eager=True)
    )
    assert sorted(map(tuple, g0.collect())) == sorted(map(tuple, g1.collect()))
    assert sorted(map(tuple, h0.collect())) == sorted(map(tuple, h1.collect()))
    assert sorted(map(tuple, r0.collect())) == sorted(map(tuple, r1.collect()))


def test_concurrent_commits_same_process_allocate_distinct_versions(spark, tmp_path):
    """r21 fix: _commit's staging tmp name was pid-only, so two driver
    THREADS committing concurrently (the wap_race / overlapped
    wap_publish shape) staged the same file — the winner's
    link-and-unlink made the loser's os.link die with
    FileNotFoundError instead of the FileExistsError the allocation
    loop retries on. With the writer-unique tmp name, N concurrent
    commits must serialize to N distinct versions with no error."""
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from proof_of_concept___cdc_w_iceberg_spark.cdc.versioned import (
        SnapshotMirror,
    )

    m = SnapshotMirror(spark, str(tmp_path / "mirror"), keys=["k"])
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    m.init(df)

    barrier = threading.Barrier(8)

    def commit(i):
        barrier.wait()
        return m._commit({}, df.schema.json(), parent=0, linear=False)

    with ThreadPoolExecutor(max_workers=8) as pool:
        versions = list(pool.map(commit, range(8)))
    assert sorted(versions) == list(range(1, 9))


def test_prepare_then_apply_matches_plain_apply(spark, tmp_path):
    """r21 prepare/apply(prepared=) split: applying a pre-materialized
    batch handle must commit exactly what the one-call apply commits,
    and the branch path must accept handles the same way."""
    from proof_of_concept___cdc_w_iceberg_spark.cdc.branches import (
        BranchedMirror,
    )

    base = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(30)],
        "k long, name string, bal double",
    )
    changes = spark.createDataFrame(
        [(3, "x", 9.9, "u", 100, 1), (200, "new", 1.0, "c", 100, 2),
         (7, None, None, "d", 100, 3)],
        "k long, name string, bal double, op string, ts_ms long, off long",
    )

    m1 = BranchedMirror(spark, str(tmp_path / "plain"), keys=["k"])
    m1.init(base)
    m1.apply(changes)
    plain = sorted(map(tuple, m1.read_ref("main").drop("__bucket").collect()))

    m2 = BranchedMirror(spark, str(tmp_path / "prepped"), keys=["k"])
    m2.init(base)
    m2.apply(prepared=m2.prepare(changes))
    prepped = sorted(
        map(tuple, m2.read_ref("main").drop("__bucket").collect()))
    assert plain == prepped

    m3 = BranchedMirror(spark, str(tmp_path / "branch"), keys=["k"])
    m3.init(base)
    m3.branch_create("audit")
    m3.apply_to_branch("audit", prepared=m3.prepare(changes))
    branched = sorted(
        map(tuple, m3.read_ref("audit").drop("__bucket").collect()))
    assert plain == branched

    # apply without either argument must refuse loudly
    try:
        m3.apply()
        raise AssertionError("apply() with no batch must raise")
    except ValueError:
        pass
