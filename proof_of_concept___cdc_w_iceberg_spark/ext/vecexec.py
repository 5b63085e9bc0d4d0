"""Spark-facing exact-chain vector scorers (r20 optimization).

Guide §4.2: batch math belongs in vectorized native code. Every
similarity-family query scores pairs with the sequential-left-fold
cosine (similarity.py::_dot / _sqnorm) — a Catalyst
HigherOrderFunction evaluated interpreted, per element, per row
(measured r20: ~6-15 µs per 64-dim dot, which makes every pair pass
CPU-bound on fold evaluation). The helpers here move that math into
the NumPy kernels of ext/vecmath.py, which replay the IDENTICAL
IEEE754 chain column-by-column — scores are bit-for-bit the fold's,
so every oracle hash stands unchanged (pinned by
tests/test_r20_vecmath.py).

Two integration shapes:

- ``cell_pair_scores`` / ``cogroup_pair_scores``: the cell-blocked
  self-join (q_knn_graph family) becomes one
  ``groupBy(cell).applyInPandas`` task per cell — members cross the
  Python boundary once (m rows), the m² pair explosion happens
  in-task in NumPy, and only (src, dst, cosine) triples come back.
  The exchange moves m embedding payloads per cell instead of the
  join's 2·m² (one per pair side); the pair bound stays Σ|cell|²,
  skew stays bounded by the largest cell, exactly as before. Src rows
  are processed in blocks of ``_BLOCK`` so in-task memory is
  O(_BLOCK·|cell|), not |cell|² — the piece that keeps the shape
  honest when a 100 TB corpus has multi-thousand-member cells.
- ``pair_cosine`` / ``pair_dot``: Arrow-vectorized drop-ins for
  already-bounded pair relations (reranks, probe assignments) — the
  same plan skeleton with the fold expression swapped for one
  ArrowEvalPython batch per task.

Cell-null contract: a NULL cell key pairs with nothing under the
equi-join these helpers replace, so both scorers filter NULL cells
before grouping (groupBy would otherwise create a NULL *group* and
emit pairs the oracle does not have — nulls-tier semantics).

Density contract: embeddings are dense and non-null in every fixture
and fuzz tier (only cell labels carry nulls). The scorers raise
loudly on a NULL embedding rather than silently diverging from the
fold's null-propagation semantics, which no oracle-checked corpus
exercises.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType

from . import vecmath

__all__ = [
    "cell_pair_scores",
    "cogroup_pair_scores",
    "pair_cosine",
    "pair_dot",
    "pair_qdot",
    "pq_assign_udf",
]

_PAIR_SCHEMA = "src bigint, dst bigint, cosine double"

# Src-block size for the in-task pair explosion: bounds kernel memory
# at _BLOCK x |cell| doubles per intermediate instead of |cell|^2.
_BLOCK = 1024


def _mat(series: pd.Series) -> np.ndarray:
    """Embedding Series -> (n, d) float64 matrix. float32 -> float64
    is exact, reproducing the fold's x.cast("double") element cast."""
    if series.isna().any():
        raise ValueError("vecexec: NULL embedding (density contract)")
    if len(series) == 0:
        return np.zeros((0, 0), dtype=np.float64)
    return np.stack(series.to_numpy()).astype(np.float64, copy=False)


def _empty_pairs() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "src": np.array([], dtype=np.int64),
            "dst": np.array([], dtype=np.int64),
            "cosine": np.array([], dtype=np.float64),
        }
    )


def _block_pairs(
    ida: np.ndarray, A: np.ndarray, idb: np.ndarray, B: np.ndarray
) -> pd.DataFrame:
    """All (src, dst) pairs with src-id != dst-id and the exact-chain
    cosine: dot/(sqrt(sq_a*sq_b)) — each step one IEEE754 double op in
    the fold's order (vecmath module docstring)."""
    sqa = vecmath.seq_sqnorm(A)
    sqb = vecmath.seq_sqnorm(B)
    frames = []
    for lo in range(0, len(ida), _BLOCK):
        hi = min(lo + _BLOCK, len(ida))
        dots = vecmath.seq_dot_matrix(A[lo:hi], B)
        den = np.sqrt(sqa[lo:hi, None] * sqb[None, :])
        cos = dots / den
        mask = ida[lo:hi, None] != idb[None, :]
        si, di = np.nonzero(mask)
        frames.append(
            pd.DataFrame(
                {"src": ida[lo:hi][si], "dst": idb[di], "cosine": cos[si, di]}
            )
        )
    if not frames:
        return _empty_pairs()
    return pd.concat(frames, ignore_index=True)


def cell_pair_scores(e, cell_col: str = "label"):
    """(src, dst, cosine) for every ordered intra-cell pair with
    src != dst — the exact relation q_knn_graph's cell-blocked
    self-join + fold produced, computed per cell in NumPy.

    ``e`` must carry (vec_id, ``cell_col``, embedding); sq is
    recomputed in-kernel via the identical fold chain, so callers may
    drop their _sqnorm projection."""

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        M = _mat(pdf["embedding"])
        return _block_pairs(ids, M, ids, M)

    return (
        e.filter(F.col(cell_col).isNotNull())
        .select("vec_id", cell_col, "embedding")
        .groupBy(cell_col)
        .applyInPandas(score, _PAIR_SCHEMA)
    )


def cogroup_pair_scores(e_src, e_dst, cell_col: str = "label"):
    """(src, dst, cosine) for every src-side x dst-side pair sharing a
    cell, src-id != dst-id — the exact relation ann.py::_knn_scored's
    equi-join + fold produced, computed per cell in NumPy.

    The dst side's columns are renamed before grouping: both sides
    routinely derive from the SAME base relation (the incremental
    rungs cogroup a corpus with its own filtered batch), and shared
    attribute ids would otherwise trip the ambiguous-self-join
    analyzer check."""

    def score(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return _empty_pairs()
        return _block_pairs(
            left["vec_id"].to_numpy(),
            _mat(left["embedding"]),
            right["b_vec_id"].to_numpy(),
            _mat(right["b_embedding"]),
        )

    return (
        e_src.filter(F.col(cell_col).isNotNull())
        .select("vec_id", cell_col, "embedding")
        .groupBy(cell_col)
        .cogroup(
            e_dst.filter(F.col(cell_col).isNotNull())
            .select(
                F.col("vec_id").alias("b_vec_id"),
                F.col(cell_col).alias("b_cell"),
                F.col("embedding").alias("b_embedding"),
            )
            .groupBy("b_cell")
        )
        .applyInPandas(lambda left, right: score(left, right), _PAIR_SCHEMA)
    )


@F.pandas_udf(DoubleType())
def pair_cosine(
    a_emb: pd.Series, b_emb: pd.Series, a_sq: pd.Series, b_sq: pd.Series
) -> pd.Series:
    """Drop-in for ``_dot(a, b) / sqrt(a_sq * b_sq)`` on a pair
    relation — one Arrow batch per task instead of one interpreted
    fold per row; bit-identical by the vecmath chain argument."""
    if len(a_emb) == 0:
        return pd.Series(np.array([], dtype=np.float64))
    dots = vecmath.seq_dot_pairs(_mat(a_emb), _mat(b_emb))
    den = np.sqrt(
        a_sq.to_numpy(dtype=np.float64) * b_sq.to_numpy(dtype=np.float64)
    )
    return pd.Series(dots / den)


def lsh_code_udf(planes):
    """Factory: a pandas_udf computing the random-hyperplane sign code
    for q_sim_lsh — all plane-dot folds of a batch in NumPy, each
    plane's dot the identical IEEE754 chain (acc + x*plane[i] in index
    order over the same double literals), so every sign bit matches
    the fold expression it replaces."""
    P = np.array(planes, dtype=np.float64)  # (n_planes, dim)

    @F.pandas_udf(LongType())
    def lsh_code(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series(np.array([], dtype=np.int64))
        M = _mat(emb)
        code = np.zeros(len(emb), dtype=np.int64)
        for j in range(P.shape[0]):
            acc = np.zeros(len(emb), dtype=np.float64)
            for i in range(M.shape[1]):
                acc = acc + M[:, i] * P[j, i]
            code = code + np.where(acc > 0, np.int64(1 << j), np.int64(0))
        return pd.Series(code)

    return lsh_code


def probe_cell_udf(cent_rows):
    """Factory: a pandas_udf computing each vector's best OTHER-cell
    probe for similarity.py::multiprobe_assign — the exact-chain NumPy
    replacement for the |corpus| x |cells| non-equi broadcast join +
    interpreted cosine folds + per-vector rank window (guide §4.2).

    ``cent_rows`` is the COLLECTED (c_label, centroid, c_sq) relation
    (≤ |cells| rows — the same bounded relation the old plan
    broadcast). Per batch: the cosine matrix vs every centroid is the
    identical IEEE754 chain (seq_dot_matrix / seq_sqnorm products,
    np.sqrt == Math.sqrt correctly rounded), the own cell is masked
    to -inf, and argmax returns the FIRST (= lowest-label, labels
    sorted ascending) occurrence of the maximum — exactly the old
    ``row_number() OVER (ORDER BY c_cos DESC, cell)`` rn=1 pick."""
    rows = sorted(
        ((int(r["c_label"]), r["centroid"], float(r["c_sq"]))
         for r in cent_rows if r["c_label"] is not None),
        key=lambda t: t[0],
    )
    labels = np.array([t[0] for t in rows], dtype=np.int64)
    C = np.array([t[1] for t in rows], dtype=np.float64)
    c_sq = np.array([t[2] for t in rows], dtype=np.float64)

    @F.pandas_udf(LongType())
    def probe(own_label: pd.Series, emb: pd.Series, sq: pd.Series) -> pd.Series:
        n = len(emb)
        if n == 0:
            return pd.Series(np.array([], dtype=np.int64))
        M = _mat(emb)
        dots = vecmath.seq_dot_matrix(M, C)
        # key = the DESC sort key: Spark sorts NaN LARGEST, so NaN
        # cosines map to +inf; the own cell never joins (label !=
        # c_label) so it maps to -inf.
        key = dots / np.sqrt(
            sq.to_numpy(dtype=np.float64)[:, None] * c_sq[None, :]
        )
        key = np.where(np.isnan(key), np.inf, key)
        own = own_label.to_numpy()
        own_null = pd.isna(own_label).to_numpy()
        own_cmp = np.where(own_null, np.int64(-(2**62)), own).astype(np.int64)
        own_mask = own_cmp[:, None] == labels[None, :]
        key[own_mask] = -np.inf
        # argmax = first (lowest-label) occurrence of the max — the
        # old (c_cos DESC, cell ASC) rn=1 pick.
        idx = np.argmax(key, axis=1) if len(labels) else np.zeros(n, dtype=int)
        out = labels[idx] if len(labels) else np.zeros(n, dtype=np.int64)
        # No-probe cases, matching the old join exactly: a NULL own
        # label joins nothing; a corpus with no OTHER cell yields no
        # probe row; a row whose best key is -inf means every other
        # cell tied at -inf — pick the lowest other label like the
        # ASC tiebreak would (only reachable off the density
        # contract).
        res = pd.Series(out, dtype="object")
        if len(labels) == 0:
            return pd.Series([None] * n, dtype="object")
        best = key[np.arange(n), idx]
        ninf = best == -np.inf
        if ninf.any():
            for i in np.nonzero(ninf)[0]:
                others = labels[labels != own_cmp[i]]
                res.iloc[i] = int(others[0]) if len(others) else None
        res[own_null] = None
        return res

    return probe


def pq_assign_udf(cb_rows):
    """Factory: a pandas_udf computing the nearest-codebook-centroid id
    for ann.py::_pq_assign — the exact-chain NumPy replacement for the
    |subvectors| x ks broadcast-join explosion + interpreted sqdist
    folds + MIN(struct) re-aggregation (guide §4.2).

    ``cb_rows`` is the COLLECTED codebook (≤ PQ_M·PQ_KS rows — the same
    bounded relation the old plan broadcast; collecting it to build the
    kernel tables is the identical driver/executor footprint). Per
    batch, each subspace's rows score against that subspace's centroid
    matrix via vecmath.seq_sqdist_matrix — the bit-identical IEEE754
    chain of ann.py::_pq_sqdist — and take argmin along centroids
    sorted by cid ascending, which reproduces the old
    ``MIN(struct(d2, cid, subvec))`` / the oracle's
    ``ORDER BY d2, cid`` tie rule exactly: NumPy argmin returns the
    FIRST (= lowest-cid) occurrence of the minimum. NaN d2 (possible
    only off the density contract) is mapped to +inf first, matching
    Spark's NaN-sorts-last struct ordering for any group holding at
    least one non-NaN distance."""
    by_sub: dict[int, list] = {}
    for r in cb_rows:
        by_sub.setdefault(int(r["sub"]), []).append(
            (int(r["cid"]), r["centroid"])
        )
    tables: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for sub, lst in by_sub.items():
        lst.sort(key=lambda t: t[0])
        tables[sub] = (
            np.array([c for c, _ in lst], dtype=np.int64),
            np.array([v for _, v in lst], dtype=np.float64),
        )

    @F.pandas_udf(LongType())
    def assign(sub: pd.Series, subvec: pd.Series) -> pd.Series:
        n = len(sub)
        if n == 0:
            return pd.Series(np.array([], dtype=np.int64))
        out = np.zeros(n, dtype=np.int64)
        subv = sub.to_numpy()
        A = _mat(subvec)
        for s in np.unique(subv):
            si = int(s)
            if si not in tables:
                # The old inner join silently DROPPED rows of a
                # subspace absent from the codebook; that cannot occur
                # (every subspace retains >= 1 centroid by
                # construction), so fail loudly rather than silently
                # diverge.
                raise ValueError(f"pq_assign: subspace {si} not in codebook")
            cids, C = tables[si]
            mask = subv == s
            D = vecmath.seq_sqdist_matrix(A[mask], C)
            D = np.where(np.isnan(D), np.inf, D)
            out[mask] = cids[np.argmin(D, axis=1)]
        return pd.Series(out)

    return assign


@F.pandas_udf(LongType())
def pair_qdot(
    a_qv: pd.Series, b_qv: pd.Series
) -> pd.Series:
    """Drop-in for the int64 fold ``aggregate(zip_with(a, b, x*y), 0L,
    acc+v)`` over quantized code vectors — exact integer arithmetic,
    order-independent, so a plain vectorized product-sum is identical
    (values bounded by 127²·d, far from int64 overflow)."""
    if len(a_qv) == 0:
        return pd.Series(np.array([], dtype=np.int64))
    A = np.stack(a_qv.to_numpy()).astype(np.int64, copy=False)
    B = np.stack(b_qv.to_numpy()).astype(np.int64, copy=False)
    return pd.Series((A * B).sum(axis=1))


@F.pandas_udf(DoubleType())
def pair_dot(a_emb: pd.Series, b_emb: pd.Series) -> pd.Series:
    """Drop-in for the bare sequential-fold ``_dot(a, b)``."""
    if len(a_emb) == 0:
        return pd.Series(np.array([], dtype=np.float64))
    return pd.Series(vecmath.seq_dot_pairs(_mat(a_emb), _mat(b_emb)))
