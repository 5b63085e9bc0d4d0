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
