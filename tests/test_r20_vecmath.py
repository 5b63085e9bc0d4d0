"""r20 optimization: the NumPy exact-chain vector kernels
(ext/vecmath.py) and their Spark-facing scorers (ext/vecexec.py) must
be BIT-identical to the sequential-left-fold expressions they replace
(similarity.py::_dot / _sqnorm) — the determinism contract that lets
every similarity-family oracle hash stand unchanged.

Three layers:
- kernel vs a pure-Python left fold on hostile doubles (signed zeros,
  subnormals, huge magnitudes, float32-sourced values);
- Spark scorer vs the fold expression on the sf0.001 fixture, compared
  via struct.pack bit patterns (catches a -0.0/0.0 or ulp drift that
  == would hide);
- the cell/cogroup scorers reproduce the JOIN's null-cell and
  id-inequality semantics exactly (nulls-tier labels pair with
  nothing).
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from pyspark.sql import functions as F

from proof_of_concept___cdc_w_iceberg_spark.ext import vecmath, vecexec
from proof_of_concept___cdc_w_iceberg_spark.ext.similarity import _dot, _sqnorm


def _fold_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def _fold_sqnorm(a):
    acc = 0.0
    for x in a:
        acc = acc + float(x) * float(x)
    return acc


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


HOSTILE = [
    [0.0, -0.0, 1e-308, -1e-308, 5e-324, 1.0, -1.0, 0.1],
    [1e155, -1e155, 1e-155, 3.14159, -2.71828, 0.0, -0.0, 1e10],
    [0.1, 0.2, 0.3, 0.7, -0.7, 1e-40, 2.0**52, -(2.0**52)],
    [float(np.float32(0.1)), float(np.float32(1e30)), -0.0, 0.0,
     float(np.float32(1e-30)), 7.0, -7.0, 1.5],
]


def test_kernels_bit_equal_pure_fold():
    A = np.array(HOSTILE, dtype=np.float64)
    B = np.array(HOSTILE[::-1], dtype=np.float64)
    sq = vecmath.seq_sqnorm(A)
    dp = vecmath.seq_dot_pairs(A, B)
    dm = vecmath.seq_dot_matrix(A, B)
    sd = vecmath.seq_sqdist_matrix(A, B)
    for i in range(len(HOSTILE)):
        assert _bits(sq[i]) == _bits(_fold_sqnorm(A[i]))
        assert _bits(dp[i]) == _bits(_fold_dot(A[i], B[i]))
        for j in range(len(HOSTILE)):
            assert _bits(dm[i, j]) == _bits(_fold_dot(A[i], B[j]))
            diff = [
                (float(x) - float(y)) * (float(x) - float(y))
                for x, y in zip(A[i], B[j])
            ]
            acc = 0.0
            for v in diff:
                acc = acc + v
            assert _bits(sd[i, j]) == _bits(acc)


def test_float32_cast_matches_fold_cast():
    # float32 storage -> float64 kernel == the fold's x.cast("double").
    a32 = np.array([0.1, 1e30, -1e-30, 3.3333], dtype=np.float32)
    M = vecexec._mat(__import__("pandas").Series([a32]))
    assert M.dtype == np.float64
    assert _bits(vecmath.seq_sqnorm(M)[0]) == _bits(
        _fold_sqnorm([float(x) for x in a32])
    )


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load

    return load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding", _sqnorm(F.col("embedding")).alias("sq")
    )


def _pair_rows(df):
    return {
        (r["src"], r["dst"]): _bits(r["cosine"]) for r in df.collect()
    }


def test_cell_pair_scores_bit_equal_join_fold(spark, emb):
    b = emb.select(
        F.col("label").alias("b_label"),
        F.col("vec_id").alias("dst"),
        F.col("embedding").alias("b_emb"),
        F.col("sq").alias("b_sq"),
    )
    fold = (
        emb.join(
            b,
            (F.col("label") == F.col("b_label"))
            & (F.col("vec_id") != F.col("dst")),
        )
        .select(
            F.col("vec_id").alias("src"),
            "dst",
            (
                _dot(F.col("embedding"), F.col("b_emb"))
                / F.sqrt(F.col("sq") * F.col("b_sq"))
            ).alias("cosine"),
        )
    )
    want = _pair_rows(fold)
    got = _pair_rows(vecexec.cell_pair_scores(emb))
    assert got == want and len(got) > 0


def test_cogroup_pair_scores_bit_equal(spark, emb):
    left = emb.filter(F.col("vec_id") % 3 == 0)
    right = emb.filter(F.col("vec_id") % 2 == 0)
    b = right.select(
        F.col("label").alias("b_label"),
        F.col("vec_id").alias("dst"),
        F.col("embedding").alias("b_emb"),
        F.col("sq").alias("b_sq"),
    )
    fold = (
        left.join(
            b,
            (F.col("label") == F.col("b_label"))
            & (F.col("vec_id") != F.col("dst")),
        )
        .select(
            F.col("vec_id").alias("src"),
            "dst",
            (
                _dot(F.col("embedding"), F.col("b_emb"))
                / F.sqrt(F.col("sq") * F.col("b_sq"))
            ).alias("cosine"),
        )
    )
    want = _pair_rows(fold)
    got = _pair_rows(vecexec.cogroup_pair_scores(left, right))
    assert got == want and len(got) > 0


def test_null_cell_pairs_with_nothing(spark, emb):
    # Nulls-tier semantics: a NULL label row joins nothing; the
    # groupBy scorer must not emit pairs for the NULL cell either.
    e = emb.withColumn(
        "label",
        F.when(F.col("vec_id") % 4 == 0, F.lit(None)).otherwise(
            F.col("label")
        ),
    )
    got = vecexec.cell_pair_scores(e)
    null_ids = {
        r["vec_id"]
        for r in e.filter(F.col("label").isNull()).select("vec_id").collect()
    }
    seen = {
        v
        for r in got.select("src", "dst").collect()
        for v in (r["src"], r["dst"])
    }
    assert not (null_ids & seen)


def test_pair_cosine_udf_bit_equal(spark, emb):
    q = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("sq").alias("q_sq"),
    )
    joined = emb.join(
        F.broadcast(q), F.col("query_id") != F.col("vec_id")
    )
    fold = joined.select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        (
            _dot(F.col("q_emb"), F.col("embedding"))
            / F.sqrt(F.col("q_sq") * F.col("sq"))
        ).alias("cosine"),
    )
    fast = joined.select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        vecexec.pair_cosine(
            F.col("q_emb"), F.col("embedding"), F.col("q_sq"), F.col("sq")
        ).alias("cosine"),
    )
    want = {
        (r["query_id"], r["cand_id"]): _bits(r["cosine"])
        for r in fold.collect()
    }
    got = {
        (r["query_id"], r["cand_id"]): _bits(r["cosine"])
        for r in fast.collect()
    }
    assert got == want and len(got) > 0


def test_null_embedding_raises():
    import pandas as pd

    with pytest.raises(ValueError, match="density contract"):
        vecexec._mat(pd.Series([np.zeros(4, dtype=np.float32), None]))


def test_block_boundary_exact():
    # The src-blocking must not change a single bit: force multiple
    # blocks through a tiny _BLOCK and compare against one big block.
    rng = np.random.default_rng(7)
    A = rng.normal(0, 0.125, size=(37, 16)).astype(np.float32).astype(np.float64)
    ids = np.arange(37, dtype=np.int64)
    old = vecexec._BLOCK
    try:
        big = vecexec._block_pairs(ids, A, ids, A)
        vecexec._BLOCK = 8
        small = vecexec._block_pairs(ids, A, ids, A)
    finally:
        vecexec._BLOCK = old
    key = lambda df: sorted(
        zip(df["src"], df["dst"], (_bits(c) for c in df["cosine"]))
    )
    assert key(big) == key(small) and len(big) == 37 * 36


def test_pq_assign_udf_bit_equal_join_min_struct(spark, sf_dir):
    """The NumPy pq_assign kernel must reproduce the r17 shape —
    broadcast-join explosion + interpreted sqdist fold + MIN(struct
    (d2, cid, subvec)) — row for row on the real fixture codebook
    (including any (d2, cid) ties the Lloyd seed produces)."""
    from proof_of_concept___cdc_w_iceberg_spark.ext import ann
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    subs = ann.pq_subvectors(e)
    cb = ann._pq_group_means(
        subs.withColumn("g", F.col("vec_id") % ann.PQ_KS), "g"
    ).localCheckpoint(eager=True)

    # The pre-r20 expression shape, inlined verbatim.
    scored = subs.join(F.broadcast(cb), "sub").select(
        "vec_id", "sub",
        F.struct(
            ann._pq_sqdist().alias("d2"), F.col("cid"), F.col("subvec")
        ).alias("sc"),
    )
    old = (
        scored.groupBy("vec_id", "sub")
        .agg(F.min("sc").alias("m"))
        .select("vec_id", "sub", F.col("m.cid").alias("cid"))
    )
    want = {(r["vec_id"], r["sub"]): r["cid"] for r in old.collect()}
    got = {
        (r["vec_id"], r["sub"]): r["cid"]
        for r in ann._pq_assign(subs, cb).collect()
    }
    assert got == want and len(got) > 0


def test_probe_cell_udf_bit_equal_join_window(spark, sf_dir):
    """The NumPy probe kernel must reproduce the old shape — non-equi
    broadcast join + interpreted cosine fold + (c_cos DESC, cell ASC)
    rank window — probe for probe on the real fixture."""
    from pyspark.sql import Window
    from proof_of_concept___cdc_w_iceberg_spark.ext import similarity as sim
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding",
        _sqnorm(F.col("embedding")).alias("sq"),
    )
    dims = e.select("label", F.posexplode("embedding").alias("pos", "v"))
    cent = (
        dims.groupBy("label", "pos")
        .agg((F.sum(F.col("v").cast("double").cast("decimal(28,12)"))
              .cast("double") / F.count("*")).alias("cv"))
        .groupBy("label")
        .agg(F.array_agg(F.struct("pos", "cv")).alias("pcs"))
        .select(F.col("label").alias("c_label"),
                F.array_sort("pcs").cv.alias("centroid"))
    )
    cent = cent.select(
        "c_label", "centroid", _sqnorm(F.col("centroid")).alias("c_sq"))

    # Pre-r20 expression shape, inlined verbatim (n_probe=2).
    other = e.join(F.broadcast(cent), F.col("label") != F.col("c_label")).select(
        "vec_id", F.col("c_label").alias("cell"),
        (_dot(F.col("embedding"), F.col("centroid"))
         / F.sqrt(F.col("sq") * F.col("c_sq"))).alias("c_cos"),
    )
    wv = Window.partitionBy("vec_id").orderBy(
        F.col("c_cos").desc(), F.col("cell"))
    old = (other.withColumn("rn", F.row_number().over(wv))
           .filter(F.col("rn") <= 1).select("vec_id", "cell"))
    want = {(r["vec_id"], r["cell"]) for r in old.collect()}

    probe = vecexec.probe_cell_udf(cent.collect())
    new = (e.select("vec_id", probe("label", "embedding", "sq").alias("cell"))
           .filter(F.col("cell").isNotNull()))
    got = {(r["vec_id"], r["cell"]) for r in new.collect()}
    assert got == want and len(got) > 0
