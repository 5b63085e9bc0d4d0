"""Exact-chain vectorized cosine/distance kernels (r20 optimization).

The registry's determinism contract pins every similarity score to a
*sequential left fold* over the vector elements (similarity.py::_dot /
DOT_SQL): ``((0.0 + a1*b1) + a2*b2) + ...`` — the identical IEEE754
addition chain in Spark and DuckDB, so scores hash-match bit-for-bit.

Spark evaluates that fold as a HigherOrderFunction expression tree —
per element, per row, interpreted. Measured at sf0.1 (r20, guide §1):
~6-15 µs per 64-dim dot, which makes every cell-blocked pair pass
(q_knn_graph and family) CPU-bound on fold evaluation, ~1000x off
native speed.

This module computes the *same chain, same bits* in NumPy (guide
§4.2 — batch math belongs in vectorized native code): accumulate
**column-by-column in index order** over the whole batch:

    acc = zeros(n)                 # the fold's 0.0 init
    for i in range(d):             # the fold's element order
        acc = acc + A[:, i] * B[:, i]

Each ``+``/``*`` is one IEEE754 double op per row, applied in exactly
the fold's order, so the result is bit-identical to the expression
fold AND to DuckDB's list_reduce — not approximately, by construction.
(NumPy pairwise-summation never enters: we never call ``np.sum`` /
``np.dot`` on the reduction axis.)

Bit-equality with the expression fold is pinned by
tests/test_r20_vecmath.py over the driver fixtures and hostile values
(signed zeros, subnormals, huge magnitudes).

Scale note (100 TB): these kernels run *inside* cell-blocked
applyInPandas / mapInPandas tasks — the blocking (Σ|cell|², never
corpus²) and the shuffle shape are unchanged; what changes is that a
cell's members cross the Python boundary once per cell (m rows) while
the m² pair explosion happens in-task in NumPy, instead of m² joined
rows each carrying two embedding payloads through the JVM fold. Fewer
bytes shuffled, same plan skeleton, ~5x less CPU.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "seq_sqnorm",
    "seq_dot_pairs",
    "seq_dot_matrix",
    "seq_sqdist_matrix",
]


def seq_sqnorm(V: np.ndarray) -> np.ndarray:
    """Row-wise squared norm of ``V`` (n, d) as the sequential fold
    ``((0.0 + v1*v1) + v2*v2) + ...`` — bit-identical to
    similarity.py::_sqnorm / SQNORM_SQL."""
    n, d = V.shape
    acc = np.zeros(n, dtype=np.float64)
    for i in range(d):
        c = V[:, i]
        acc = acc + c * c
    return acc


def seq_dot_pairs(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Row-wise dot of aligned (n, d) matrices as the sequential fold —
    bit-identical to _dot(a, b) evaluated on each row pair."""
    n, d = A.shape
    acc = np.zeros(n, dtype=np.float64)
    for i in range(d):
        acc = acc + A[:, i] * B[:, i]
    return acc


def seq_dot_matrix(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """All-pairs dots between rows of ``A`` (n, d) and rows of ``B``
    (m, d) as the sequential fold per pair: out[i, j] = the exact
    left-fold dot(A[i], B[j]). Column-by-column outer accumulation —
    every partial sum is one IEEE754 add in fold order."""
    n, d = A.shape
    m = B.shape[0]
    acc = np.zeros((n, m), dtype=np.float64)
    for i in range(d):
        acc = acc + A[:, i, None] * B[None, :, i]
    return acc


def seq_sqdist_matrix(A: np.ndarray, C: np.ndarray) -> np.ndarray:
    """All-pairs squared distances between rows of ``A`` (n, d) and
    rows of ``C`` (k, d) as the sequential fold over
    ``(a_i - c_i) * (a_i - c_i)`` — bit-identical to ann.py::_pq_sqdist
    evaluated per pair."""
    n, d = A.shape
    k = C.shape[0]
    acc = np.zeros((n, k), dtype=np.float64)
    for i in range(d):
        diff = A[:, i, None] - C[None, :, i]
        acc = acc + diff * diff
    return acc
