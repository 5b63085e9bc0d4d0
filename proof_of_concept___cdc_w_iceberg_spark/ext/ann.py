"""Graph-based ANN refinement — NN-Descent (r11).

Closes the one deliberate gap the r10 verdict named in the similarity
family: a graph-based ANN step. HNSW itself is a pointer-chasing
in-memory structure with no faithful relational rendering, but the
*graph refinement* idea underneath it — Dong et al. 2011, "Efficient
K-Nearest Neighbor Graph Construction for Generic Similarity
Measures" (NN-Descent) — is join-shaped: a neighbor of my neighbor is
likely my neighbor. One refinement round over a blocked kNN graph is:

  1. init: the cell-blocked kNN edges (ext/similarity.py::q_knn_graph
     — exact within a cell, blind across cells) UNION a deterministic
     "random" graph (md5-hash buckets of ~8 vectors, first R in-bucket
     peers per node) that supplies the cross-cell exploration edges
     the paper gets from random initialization;
  2. candidates: join the undirected neighbor relation with itself on
     the pivot node — (a,b),(b,c) → candidate (a,c);
  3. re-rank: score current ∪ candidate pairs once, keep top-k per
     source.

Per-node candidate count is bounded by (2·(K+R))² — constant, so the
round costs O(N·(K+R)²·d) at any corpus size, embarrassingly
partition-parallel, with no iteration-count blowup (each extra round
is the same bounded join). Recall is monotone non-decreasing vs the
blocked graph (the candidate pool is a superset; an exact edge is
displaced only by strictly closer neighbors) — asserted against the
exact numpy all-pairs graph in tests/test_r11_ops.py, alongside the
cross-cell-discovery property the blocked graph structurally lacks.

Determinism (hash-check contract): cosines are the sequential-fold
chains both engines execute bit-identically (DOT_SQL/SQNORM_SQL),
bucket routing is the portable md5→u32 decode, and every top-k ties on
the neighbor id — so the DuckDB oracle replays the refinement exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.sketches import _hex_u32_sql
from ..registry import query
from ..sources.tables import load
from .similarity import DOT_SQL, KNN_GRAPH_SQL, KNN_K, SQNORM_SQL, _dot, _sqnorm

NND_BUCKET = 8  # target random-bucket size (paper: random init pool)
NND_R = 3       # random-init neighbors kept per node


def _nnd_bucket_sql(vc: str) -> str:
    return _hex_u32_sql(f"md5('nnd|' || CAST(vec_id AS {vc}))")


def _knn_descent_sql(rounds: int) -> str:
    """DuckDB oracle for ``nnd_rounds(e, n, rounds)`` — the loop
    unrolled into one CTE chain per round: g0 is the init graph, and
    round i symmetrizes g{i-1}, closes it one hop, and re-ranks to
    g{i}. Each CTE mirrors its DataFrame stage 1:1 (_nnd_symmetrize /
    _nnd_expand / _nnd_rerank), so the driver hash check replays the
    paper's actual iteration, not just one step."""
    one_round = """
    u{i} AS (SELECT src, dst FROM g{p}
             UNION SELECT dst AS src, src AS dst FROM g{p}),
    cand{i} AS (
        SELECT DISTINCT u1.src, u2.dst
        FROM u{i} u1 JOIN u{i} u2 ON u1.dst = u2.src AND u1.src <> u2.dst
    ),
    pairs{i} AS (SELECT src, dst FROM u{i}
                 UNION SELECT src, dst FROM cand{i}),
    ranked{i} AS (
        SELECT p.src, p.dst,
               {dot} / sqrt(ea.sq * eb.sq) AS cosine,
               row_number() OVER (
                   PARTITION BY p.src
                   ORDER BY {dot} / sqrt(ea.sq * eb.sq) DESC, p.dst) AS rn
        FROM pairs{i} p
        JOIN e ea ON ea.vec_id = p.src
        JOIN e eb ON eb.vec_id = p.dst
    ),
    g{i} AS (SELECT src, dst FROM ranked{i} WHERE rn <= {k})"""
    dot = DOT_SQL.format(a="ea.embedding", b="eb.embedding")
    body = "".join(
        ("," if i > 1 else "")
        + one_round.format(i=i, p=i - 1 if i > 1 else 0, dot=dot, k=KNN_K)
        for i in range(1, rounds + 1)
    )
    return f"""
    WITH e AS (
        SELECT vec_id, label, embedding,
               {SQNORM_SQL.format(a='embedding')} AS sq
        FROM embeddings
    ),
    nb AS (SELECT CAST(CEIL(COUNT(*) / {NND_BUCKET}.0) AS BIGINT) AS b FROM e),
    rb AS (
        SELECT vec_id, {_nnd_bucket_sql('VARCHAR')} % nb.b AS rb
        FROM e, nb
    ),
    cell_ranked AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY {DOT_SQL.format(a='a.embedding', b='b.embedding')}
                            / sqrt(a.sq * b.sq) DESC, b.vec_id) AS rn
        FROM e a JOIN e b
          ON a.label = b.label AND a.vec_id <> b.vec_id
    ),
    cell_edges AS (SELECT src, dst FROM cell_ranked WHERE rn <= {KNN_K}),
    rnd_ranked AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY b.vec_id) AS rn
        FROM rb a JOIN rb b ON a.rb = b.rb AND a.vec_id <> b.vec_id
    ),
    rnd_edges AS (SELECT src, dst FROM rnd_ranked WHERE rn <= {NND_R}),
    g0 AS (SELECT src, dst FROM cell_edges
           UNION SELECT src, dst FROM rnd_edges),{body}
    SELECT src, dst, ROUND(cosine, 6) AS cosine, CAST(rn AS BIGINT) AS rn
    FROM ranked{rounds} WHERE rn <= {KNN_K}
"""


KNN_DESCENT_SQL = _knn_descent_sql(1)
KNN_DESCENT2_SQL = _knn_descent_sql(2)


def _nnd_init_edges(e, n_vecs: int):
    """Directed init edges for round 1: the cell-blocked kNN graph ∪
    the deterministic hash-bucket exploration graph (the paper's
    random initialization, rendered portable)."""
    from .vecexec import cell_pair_scores

    b_cnt = max(1, math.ceil(n_vecs / NND_BUCKET))

    # r20 (guide §4.2): per-cell NumPy pair scoring — same bits as the
    # join + fold it replaces (vecexec module docstring).
    w_cell = Window.partitionBy("src").orderBy(
        F.col("cosine").desc(), F.col("dst")
    )
    cell_edges = (
        cell_pair_scores(e)
        .withColumn("rn", F.row_number().over(w_cell))
        .filter(F.col("rn") <= KNN_K)
        .select("src", "dst")
    )

    rb = e.select(
        "vec_id",
        (F.expr(_nnd_bucket_sql("STRING")) % b_cnt).alias("rb"),
    )
    rb2 = rb.select(F.col("vec_id").alias("dst"), F.col("rb").alias("rb2"))
    w_rnd = Window.partitionBy("src").orderBy("dst")
    rnd_edges = (
        rb.join(rb2, (F.col("rb") == F.col("rb2")) & (F.col("vec_id") != F.col("dst")))
        .select(F.col("vec_id").alias("src"), "dst")
        .withColumn("rn", F.row_number().over(w_rnd))
        .filter(F.col("rn") <= NND_R)
        .select("src", "dst")
    )

    return cell_edges.unionByName(rnd_edges).distinct()


def _nnd_symmetrize(g):
    """Undirected view of a directed edge set — the paper scans both
    forward and reverse neighbor lists for candidates."""
    return g.unionByName(
        g.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def _nnd_expand(u):
    """One neighbor-of-neighbor closure over an undirected edge set:
    (a,b),(b,c) -> candidate (a,c), plus the edges themselves — every
    pair one refinement round scores."""
    u2 = u.select(F.col("src").alias("pivot"), F.col("dst").alias("c_dst"))
    cand = (
        u.join(u2, F.col("dst") == F.col("pivot"))
        .filter(F.col("src") != F.col("c_dst"))
        .select("src", F.col("c_dst").alias("dst"))
        .distinct()
    )
    return u.unionByName(cand).distinct()


def _nnd_rerank(pairs, e):
    """Score a (src, dst) pair relation once and keep the top-k per
    source — the round's single re-rank, partitioned on the join's
    own src keying (no extra Exchange beyond the window's)."""
    ea = e.select(
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("a_emb"),
        F.col("sq").alias("a_sq"),
    )
    eb = e.select(
        F.col("vec_id").alias("dst"),
        F.col("embedding").alias("b_emb"),
        F.col("sq").alias("b_sq"),
    )
    scored = (
        pairs.join(ea, "src")
        .join(eb, "dst")
        .select(
            "src",
            "dst",
            (
                _dot(F.col("a_emb"), F.col("b_emb"))
                / F.sqrt(F.col("a_sq") * F.col("b_sq"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.col("cosine").desc(), F.col("dst"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KNN_K)
        .select(
            "src", "dst", F.round("cosine", 6).alias("cosine"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


def nnd_candidate_pairs(e, n_vecs: int):
    """(src, dst) pair relation after one NN-Descent round: init edges
    (cell kNN ∪ hash-bucket random graph, both directions) plus their
    neighbor-of-neighbor closure — every pair the re-rank scores.
    Bounded: ≤ (2·(K+R))² candidates per node by construction."""
    return _nnd_expand(_nnd_symmetrize(_nnd_init_edges(e, n_vecs)))


def nnd_rounds(e, n_vecs: int, rounds: int):
    """ITERATED NN-Descent — the paper's actual loop (Dong et al.
    2011 §2.2), not just one step: starting from the init graph,
    each round symmetrizes the current top-k graph, closes it one
    neighbor-of-neighbor hop, and re-ranks. Per-round recall vs the
    exact graph is monotone non-decreasing — every src keeps its
    current out-neighbors in the candidate pool, so a held exact
    edge is displaced only by a strictly closer neighbor (law
    property-tested across rounds 1..3, exercising the
    localCheckpoint branch, in tests/test_r13_ops.py).

    Scale shape: each round is the same bounded equi-join pipeline —
    O(N·(K+R)²·d), linear in N — and intermediate graphs are
    localCheckpointed (N·k rows, eager) so the lineage stays one
    round deep however many rounds run: the IVM discipline, without
    which the analyzer re-plans a 2^rounds plan tree. Returns the
    final graph in q_knn_graph's (src, dst, cosine, rn) schema."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    # r20 (guide §2.4/§5): the init graph is referenced ~5x by the
    # first round's symmetrize + expand closure (g twice, the
    # undirected set three more times); materialize it ONCE so those
    # references read checkpoint blocks instead of re-running the
    # whole init pipeline (cell scoring + bucket join + two windows)
    # per reference. Same rows, one job earlier.
    g = _nnd_init_edges(e, n_vecs).localCheckpoint(eager=True)
    ranked = None
    for i in range(rounds):
        ranked = _nnd_rerank(_nnd_expand(_nnd_symmetrize(g)), e)
        g = ranked.select("src", "dst")
        if i < rounds - 1:
            g = g.localCheckpoint(eager=True)
    return ranked


@query("q_knn_graph_descent", oracle=KNN_DESCENT_SQL)
def q_knn_graph_descent(spark, sf_dir):
    """One NN-Descent refinement round over the blocked kNN graph —
    the graph-ANN member of the similarity family (module docstring
    for the algorithm and scale shape). Returns the refined graph in
    q_knn_graph's schema; recall vs the exact graph is monotone
    non-decreasing and, unlike the blocked graph, cross-cell edges
    are reachable (via the hash-bucket exploration edges). The one
    driver-side action is the corpus count (sizes the random-bucket
    modulus — 1 long)."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding", _sqnorm(F.col("embedding")).alias("sq")
    )
    return nnd_rounds(e, e.count(), rounds=1)


@query("q_knn_graph_descent2", oracle=KNN_DESCENT2_SQL)
def q_knn_graph_descent2(spark, sf_dir):
    """TWO NN-Descent refinement rounds — the iterated loop the paper
    actually runs (Dong et al. 2011 §2.2), driver-hash-checked against
    the 2-round unrolled oracle so the loop body (symmetrize the
    round-1 TOP-K graph, not the init graph; re-close; re-rank) and
    the localCheckpoint lineage cut between rounds are verified end to
    end, not just the rounds=1 degenerate case. recall(2) >= recall(1)
    vs the exact graph is asserted in tests/test_r13_ops.py. Scale
    shape: identical per-round bounded equi-join pipeline as
    q_knn_graph_descent — O(N·(K+R)²·d) per round, lineage held flat
    by the eager checkpoint (N·k rows) between rounds."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding", _sqnorm(F.col("embedding")).alias("sq")
    )
    return nnd_rounds(e, e.count(), rounds=2)


# --- incremental kNN-graph maintenance (r13; deletes r14) --------------
#
# The IVM rung for the ANN family — the dedup ladder has an
# incremental twin per rung (band index, capped shingles, components,
# spans); the kNN graph now has one too. Inserting a batch into the
# cell-blocked graph touches only the batch's OWN cells:
#
#   new nodes:  score against their cell's members (old ∪ new), top-k
#   old nodes in touched cells: re-rank their CURRENT top-k edges
#       (scores carried in state, never recomputed) ∪ fresh edges to
#       the new cell members — exact, because the old top-k are the
#       exact best among old members, so best-of(old top-k ∪ new) is
#       best-of(everything)
#   untouched nodes: state rows pass through byte-identical
#
# Apply cost is O(|batch|·|cell| + |touched nodes|·(k + |batch|)) —
# independent of corpus size outside the touched cells, the same
# touched-partitions-only discipline as cdc_apply_partitioned. State
# carries UNROUNDED cosines so the re-rank is bit-identical to a
# rebuild's ordering; rounding happens only at read-out.
#
# DELETES (r13 verdict item 3 — the boundary the insert rung left
# open; CDC-fed embedding tables delete rows): a delete batch breaks
# the carried-edges-exact argument for exactly the survivors whose
# top-k REFERENCE a deleted node — the dead edge's replacement can be
# any cell member outside the carried k, so those nodes re-rank
# against their FULL surviving cell. Everyone else passes through:
# removing members cannot improve another node's neighbors, and all k
# of their carried edges survive, so they remain the exact top-k among
# survivors. Cost O(|affected|·|cell|·d), affected ⊆ the deleted
# nodes' cells — touched-cells-only, like the insert path. A mixed
# CDC batch applies delete-then-insert: delete-apply leaves every
# carried top-k exact among old survivors, which is precisely the
# precondition insert-apply's argument needs.

ANN_BATCH_OFF = 100_000


def _knn_scored(e_src, e_dst):
    """Cell-blocked scored pairs (src, dst, cosine) — unrounded
    internal form of q_knn_graph's scorer (ext/similarity.py), kept
    separate so the frozen one-shot query is untouched.

    r20 measured negative result (kept as the join + fold ON PURPOSE):
    swapping this for vecexec.cogroup_pair_scores REGRESSED every
    incremental rung ~2x (q_knn_graph_delete 1.12 -> 2.18 s warm min,
    upsert 2.12 -> 4.64). The batch sides here are small, so the fold
    CPU is negligible while the cogroup costs two exchanges plus a
    Python stage per call — and the IVM rungs call this several times
    per apply. The one-shot full-corpus scorer (q_knn_graph), where
    fold CPU dominates, DID win from the NumPy kernel and keeps it."""
    b = e_dst.select(
        F.col("label").alias("b_label"),
        F.col("vec_id").alias("dst"),
        F.col("embedding").alias("b_emb"),
        F.col("sq").alias("b_sq"),
    )
    return (
        e_src.join(
            b,
            (F.col("label") == F.col("b_label")) & (F.col("vec_id") != F.col("dst")),
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


def _knn_topk(scored):
    w = Window.partitionBy("src").orderBy(F.col("cosine").desc(), F.col("dst"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KNN_K)
    )


def knn_graph_state(e):
    """Full-precision blocked kNN graph state (src, dst, cosine, rn).

    r21 (guide §4.2): the FULL-CORPUS self-score goes through the
    per-cell NumPy kernel (vecexec.cell_pair_scores — identical
    IEEE754 chain, bit-equality pinned in tests/test_r20_vecmath.py),
    exactly like the one-shot q_knn_graph. This is the scoped half of
    the r20 negative result on _knn_scored: the kernel LOST on the
    batch-sized apply calls (which keep the join + fold below), but
    the state build is Σ|cell|² pairs over the whole corpus — the
    shape where the fold's interpreted per-pair cost dominates and
    the kernel won in r20."""
    from .vecexec import cell_pair_scores

    return _knn_topk(cell_pair_scores(e))


def knn_graph_apply(state, e_old, e_new):
    """One insert batch applied to the graph state — see the module
    comment for the algorithm and cost; apply == rebuild is
    driver-hash-checked via q_knn_graph_incremental's oracle and
    unit-asserted in tests/test_r13_ops.py."""
    touched = e_new.select("label").distinct()
    touched_nodes = (
        e_old.join(F.broadcast(touched), "label").select(F.col("vec_id").alias("src"))
    )
    g_untouched = state.join(touched_nodes, "src", "left_anti")
    g_touched = state.join(touched_nodes, "src").select("src", "dst", "cosine")
    old_to_new = _knn_scored(e_old, e_new)
    reranked = _knn_topk(g_touched.unionByName(old_to_new))
    e_all = e_old.unionByName(e_new)
    new_edges = _knn_topk(_knn_scored(e_new, e_all))
    return g_untouched.unionByName(reranked).unionByName(new_edges)


def knn_graph_delete_apply(state, e_surv, deletes):
    """One delete batch applied to the graph state (module comment for
    the exactness argument and cost). ``deletes`` is a one-column
    (vec_id) relation of removed nodes; ``e_surv`` the surviving
    corpus. Deleted nodes' own rows drop; survivors whose carried
    top-k lost an edge re-rank against their full surviving cell;
    everyone else passes through byte-identical. apply == rebuild is
    driver-hash-checked via q_knn_graph_delete's oracle (the full
    rebuild over corpus ∖ deletes) and unit-asserted in
    tests/test_r14_ops.py. The delete relation is broadcast (a CDC
    batch, not a corpus)."""
    dels = F.broadcast(deletes.select(F.col("vec_id").alias("del_id")))
    alive = state.join(dels, F.col("src") == F.col("del_id"), "left_anti")
    broken = (
        alive.join(dels, F.col("dst") == F.col("del_id"), "left_semi")
        .select("src")
        .distinct()
    )
    keep = alive.join(broken, "src", "left_anti")
    e_broken = e_surv.join(
        broken.withColumnRenamed("src", "vec_id"), "vec_id"
    )
    # r21 (guide §4.2): the broken-node rerank scores |broken|·|cell|
    # pairs — a scattered delete batch breaks a quarter of the corpus
    # (k edges each), so this side is corpus-scale, not batch-scale:
    # the regime where the NumPy kernel wins (interleaved A/B r21:
    # 0.88 -> 0.57 s at q_knn_graph_delete shape, neutral at the
    # streaming upsert's 600-vector shape). The truly batch-sized
    # scoring calls (knn_graph_apply) keep the join + fold per the
    # r20 negative result on _knn_scored.
    from .vecexec import cogroup_pair_scores

    reranked = _knn_topk(cogroup_pair_scores(e_broken, e_surv))
    return keep.unionByName(reranked)


KNN_DELETE_SQL = f"""
    WITH e AS (
        SELECT vec_id, label, embedding,
               {SQNORM_SQL.format(a='embedding')} AS sq
        FROM embeddings WHERE vec_id % 11 <> 3
    ),
    scored AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               {DOT_SQL.format(a='a.embedding', b='b.embedding')}
                   / sqrt(a.sq * b.sq) AS cosine
        FROM e a JOIN e b
          ON a.label = b.label AND a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT src, dst, cosine,
               row_number() OVER (PARTITION BY src
                                  ORDER BY cosine DESC, dst) AS rn
        FROM scored
    )
    SELECT src, dst, ROUND(cosine, 6) AS cosine, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {KNN_K}
"""


@query("q_knn_graph_delete", oracle=KNN_DELETE_SQL)
def q_knn_graph_delete(spark, sf_dir):
    """Delete-maintained blocked kNN graph: build the graph over the
    corpus, then apply a delete batch (every 11th vector — ~9% of the
    corpus, scattered across every cell, so survivors in every cell
    lose carried edges and must re-rank) and return the maintained
    graph. Oracle = the full rebuild over corpus ∖ deletes, so the
    delete-apply == rebuild law is hash-checked end to end — closing
    the ANN IVM family's r13 insert-only boundary. Touched-cells-only:
    only survivors that actually LOST a top-k edge re-rank (module
    comment for the argument); at 100 TB a delete batch touches
    O(|affected|·|cell|) pairs, never the corpus."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding", _sqnorm(F.col("embedding")).alias("sq")
    )
    state = knn_graph_state(e).localCheckpoint(eager=True)
    dels = e.filter(F.col("vec_id") % 11 == 3).select("vec_id")
    surv = e.filter(F.col("vec_id") % 11 != 3)
    out = knn_graph_delete_apply(state, surv, dels)
    return out.select(
        "src", "dst", F.round("cosine", 6).alias("cosine"),
        F.col("rn").cast("long").alias("rn"),
    )


KNN_INCR_SQL = f"""
    WITH batch AS (
        SELECT vec_id + {ANN_BATCH_OFF} AS vec_id, label, embedding
        FROM embeddings WHERE vec_id % 13 = 5
    ),
    stream AS (
        SELECT vec_id, label, embedding FROM embeddings
        UNION ALL SELECT vec_id, label, embedding FROM batch
    ),
    e AS (
        SELECT vec_id, label, embedding,
               {SQNORM_SQL.format(a='embedding')} AS sq
        FROM stream
    ),
    scored AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               {DOT_SQL.format(a='a.embedding', b='b.embedding')}
                   / sqrt(a.sq * b.sq) AS cosine
        FROM e a JOIN e b
          ON a.label = b.label AND a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT src, dst, cosine,
               row_number() OVER (PARTITION BY src
                                  ORDER BY cosine DESC, dst) AS rn
        FROM scored
    )
    SELECT src, dst, ROUND(cosine, 6) AS cosine, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {KNN_K}
"""


@query("q_knn_graph_incremental", oracle=KNN_INCR_SQL)
def q_knn_graph_incremental(spark, sf_dir):
    """Incrementally-maintained blocked kNN graph: build the graph
    over the corpus, then apply an insert batch (every 13th vector
    replayed under a new id — planted exact-duplicate vectors, so
    cosine-1.0 edges must displace existing neighbors) and return the
    maintained graph. Oracle = the full rebuild over corpus ∪ batch,
    so the apply==rebuild law is hash-checked end to end — the ANN
    family's IVM rung, completing the column the dedup ladder already
    has at every level. The corpus graph state is localCheckpointed
    once (the at-rest graph table a real pipeline maintains); the
    apply touches only the batch's own cells (module comment for the
    exactness argument and cost)."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding", _sqnorm(F.col("embedding")).alias("sq")
    )
    batch = e.filter(F.col("vec_id") % 13 == 5).select(
        (F.col("vec_id") + ANN_BATCH_OFF).alias("vec_id"),
        "label",
        "embedding",
        "sq",
    )
    state = knn_graph_state(e).localCheckpoint(eager=True)
    out = knn_graph_apply(state, e, batch)
    return out.select(
        "src", "dst", F.round("cosine", 6).alias("cosine"),
        F.col("rn").cast("long").alias("rn"),
    )


KNN_UPSERT_SQL = f"""
    WITH e AS (
        SELECT vec_id, label, embedding,
               {SQNORM_SQL.format(a='embedding')} AS sq
        FROM embeddings
        WHERE NOT (vec_id <= 1200 AND vec_id % 7 = 2)
    ),
    scored AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               {DOT_SQL.format(a='a.embedding', b='b.embedding')}
                   / sqrt(a.sq * b.sq) AS cosine
        FROM e a JOIN e b
          ON a.label = b.label AND a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT src, dst, cosine,
               row_number() OVER (PARTITION BY src
                                  ORDER BY cosine DESC, dst) AS rn
        FROM scored
    )
    SELECT src, dst, ROUND(cosine, 6) AS cosine, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {KNN_K}
"""


@query("q_stream_knn_graph_upsert", oracle=KNN_UPSERT_SQL)
def q_stream_knn_graph_upsert(spark, sf_dir):
    """Streaming kNN-graph maintenance under MIXED CDC batches — the
    case the r13 verdict named (CDC-fed embedding tables delete rows):
    the corpus arrives as three micro-batches, and batches 2 and 3
    each DELETE every 7th already-present vector from the prior range
    and INSERT a fresh range. Per batch the state advances
    delete-then-insert (knn_graph_delete_apply, then knn_graph_apply
    over the survivors — delete-apply leaves every carried top-k exact
    among survivors, the exact precondition insert-apply's argument
    needs; module comment). The registered oracle is the ONE-SHOT
    rebuild over the final survivor set, so the driver hash check
    proves the full upsert law (delete∘insert apply == rebuild) under
    multi-batch arrival. State is N·k full-precision edges,
    localCheckpointed per batch."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding", _sqnorm(F.col("embedding")).alias("sq")
    )
    batches = [
        (F.col("vec_id").between(601, 1200), F.col("vec_id") <= 600),
        (F.col("vec_id") >= 1201, F.col("vec_id").between(601, 1200)),
    ]
    corpus = e.filter(F.col("vec_id") <= 600).localCheckpoint(eager=True)
    state = knn_graph_state(corpus).localCheckpoint(eager=True)
    # r21 (guide §2.6): each batch's four eager checkpoints pair into
    # two independent groups — (surv, batch) touch only checkpointed
    # corpus / the scan, and (state', corpus') touch disjoint inputs —
    # so they overlap from a 2-thread pool: ~2 job latencies per batch
    # instead of 4. Same relations, same rows.
    from concurrent.futures import ThreadPoolExecutor

    def _cp(df):
        return df.localCheckpoint(eager=True)

    with ThreadPoolExecutor(max_workers=2) as pool:
        for ins_cond, del_range in batches:
            del_cond = del_range & (F.col("vec_id") % 7 == 2)
            dels = corpus.filter(del_cond).select("vec_id")
            f_surv = pool.submit(_cp, corpus.filter(~del_cond))
            f_batch = pool.submit(_cp, e.filter(ins_cond))
            surv, batch = f_surv.result(), f_batch.result()
            state = knn_graph_delete_apply(state, surv, dels)
            f_state = pool.submit(_cp, knn_graph_apply(state, surv, batch))
            f_corpus = pool.submit(_cp, surv.unionByName(batch))
            state, corpus = f_state.result(), f_corpus.result()
    return state.select(
        "src", "dst", F.round("cosine", 6).alias("cosine"),
        F.col("rn").cast("long").alias("rn"),
    )


@query("q_stream_knn_graph", oracle=KNN_GRAPH_SQL)
def q_stream_knn_graph(spark, sf_dir):
    """Streaming kNN-graph maintenance: the corpus ARRIVES as three
    micro-batches (open-ended vec_id splits) — the first seeds the
    graph, each later batch is applied via knn_graph_apply with the
    corpus-so-far and graph state localCheckpointed per batch. The
    registered oracle is q_knn_graph's ONE-SHOT build over the whole
    corpus, so the driver hash check proves the ANN IVM law under
    MULTI-batch arrival (the registered complement of the live
    readStream twin in tests/test_r13_ops.py) — the same contract the
    sketch family's q_stream_* twins carry. Per-batch cost is the
    touched-cells-only apply (module comment above knn_graph_state);
    state is N·k rows of full-precision edges."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding", _sqnorm(F.col("embedding")).alias("sq")
    )
    splits = [
        F.col("vec_id") <= 600,
        F.col("vec_id").between(601, 1200),
        F.col("vec_id") >= 1201,
    ]
    corpus = e.filter(splits[0]).localCheckpoint(eager=True)
    state = knn_graph_state(corpus).localCheckpoint(eager=True)
    # r21 (guide §2.6): state' and corpus' are independent eager
    # checkpoints — overlap them per batch (same pairing as the
    # upsert twin above).
    from concurrent.futures import ThreadPoolExecutor

    def _cp(df):
        return df.localCheckpoint(eager=True)

    with ThreadPoolExecutor(max_workers=2) as pool:
        for cond in splits[1:]:
            batch = e.filter(cond).localCheckpoint(eager=True)
            f_state = pool.submit(_cp, knn_graph_apply(state, corpus, batch))
            f_corpus = pool.submit(_cp, corpus.unionByName(batch))
            state, corpus = f_state.result(), f_corpus.result()
    return state.select(
        "src", "dst", F.round("cosine", 6).alias("cosine"),
        F.col("rn").cast("long").alias("rn"),
    )


# --- quantized-vector similarity (r15) ----------------------------------

QUANT_TOPK_SQL = """
    WITH e AS (
        SELECT vec_id, embedding,
               list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS ma
        FROM embeddings
    ),
    q8 AS (
        -- Zero-vector guard at SOURCE, on the cheap ma: an all-zero
        -- embedding (ma = 0) has no defined cosine — its qsq = 0 would
        -- make cosine_q 0/0 = NaN, which sorts FIRST under the
        -- descending rank in both engines. ma > 0 <=> qsq > 0 (the
        -- max-magnitude element quantizes to FLOOR(+-127.0) = +-127,
        -- so qsq >= 127^2 whenever ma > 0); filtering on the already-
        -- computed ma instead of qsq spares every candidate row a
        -- second evaluation of the 64-element fold inside a Filter
        -- node (+50% on the whole rung, measured).
        SELECT vec_id,
               list_transform(embedding, x ->
                   CAST(FLOOR(x::DOUBLE * 127 / ma) AS BIGINT)) AS qv
        FROM e WHERE ma > 0
    ),
    n AS (
        SELECT vec_id, qv,
               list_reduce(list_transform(qv, x -> x * x),
                           (x, y) -> x + y) AS qsq
        FROM q8
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               list_reduce(
                   list_transform(range(1, len(q.qv) + 1),
                                  i -> q.qv[i] * c.qv[i]),
                   (x, y) -> x + y) AS qdot,
               q.qsq AS q_qsq, c.qsq AS c_qsq
        FROM (SELECT * FROM n WHERE vec_id % 100 = 0) q
        JOIN n c ON c.vec_id <> q.vec_id
    ),
    ranked AS (
        SELECT query_id, cand_id, qdot,
               ROUND(qdot / sqrt(q_qsq * c_qsq), 6) AS cosine_q,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY qdot / sqrt(q_qsq * c_qsq) DESC, cand_id) AS rn
        FROM scored
    )
    SELECT query_id, cand_id, CAST(qdot AS BIGINT) AS qdot, cosine_q
    FROM ranked WHERE rn <= 5
"""


def int8_codes(e):
    """(vec_id[, label], qv, qsq): per-vector symmetric int8
    quantization — scale max|x|/127, elements FLOOR(x·127/max|x|)
    (q_embed_quantize's exact arithmetic; floor because IEEE floor is
    bit-identical across engines while round-half ties are not) — plus
    the integer square norm. ONE copy shared by the quantized rungs so
    the determinism contract cannot silently diverge between them
    (review finding r16)."""
    keep = [c for c in ("vec_id", "label") if c in e.columns]
    ma = F.array_max(
        F.transform("embedding", lambda v: F.abs(v.cast("double")))
    )
    q8 = e.select(
        *keep,
        F.transform(
            "embedding",
            lambda x: F.when(F.lit(0.0) == ma, F.lit(0.0))
            .otherwise(F.floor(x.cast("double") * 127 / ma))
            .cast("long"),
        ).alias("qv"),
    )
    return q8.select(
        *keep,
        "qv",
        F.aggregate(
            F.transform("qv", lambda x: x * x),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("qsq"),
    )


@query("q_sim_topk_quantized", oracle=QUANT_TOPK_SQL)
def q_sim_topk_quantized(spark, sf_dir):
    """Brute-force cosine top-k over SCALAR-QUANTIZED (int8) vectors —
    the memory-bandwidth rung of the ANN serving ladder: a production
    index stores 4x-smaller int8 codes and scores with integer dot
    products, rescoring survivors at full precision only if needed.
    Quantization reuses q_embed_quantize's exact arithmetic (per-vector
    symmetric scale max|x|/127, elements FLOOR(x*127/max|x|) — floor
    because IEEE floor is bit-identical across engines while round-half
    ties are not), so the quantized scores are EXACT INTEGERS and the
    whole approximate pipeline is hash-checkable end to end: qdot is a
    BIGINT fold (order-independent — safe under any partitioning),
    cosine_q one IEEE division per pair. Same plan shape as q_sim_topk
    (broadcast query block, ONE corpus scan, per-query rank window);
    recall vs the full-precision top-5 is asserted in
    tests/test_r15_ops.py. All-zero embeddings are filtered at SOURCE
    on the cheap max-magnitude test (ma > 0 <=> qsq > 0: the
    max-magnitude element quantizes to FLOOR(+-127.0) = +-127, so a
    nonzero vector's qsq >= 127^2) — their cosine is 0/0 = NaN, which
    would sort ahead of every real neighbor. Filtering on qsq itself
    made Catalyst re-evaluate the 64-element square fold inside the
    Filter node for every candidate row (+50% on the rung, measured —
    the r16 drift flag's root cause); ma is already computed for the
    scale. Mirrored in QUANT_TOPK_SQL."""
    ma = F.array_max(
        F.transform("embedding", lambda v: F.abs(v.cast("double")))
    )
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding").filter(ma > 0)
    n = int8_codes(e)
    q = n.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("q_qv"),
        F.col("qsq").alias("q_qsq"),
    )
    scored = n.join(
        F.broadcast(q), F.col("query_id") != F.col("vec_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        F.aggregate(
            F.zip_with("q_qv", "qv", lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("qdot"),
        (F.col("q_qsq") * F.col("qsq")).alias("qq"),
    ).withColumn(
        "cosine_q", F.col("qdot") / F.sqrt(F.col("qq").cast("double"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_q").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            "query_id", "cand_id", "qdot",
            F.round("cosine_q", 6).alias("cosine_q"),
        )
    )


# --- quantized codes INSIDE IVF cells (r16) ------------------------------

IVF_QUANT_NPROBE = 3

IVF_QUANT_SQL = f"""
    WITH e AS (
        SELECT vec_id, label, embedding,
               {SQNORM_SQL.format(a='embedding')} AS sq,
               list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS ma
        FROM embeddings
    ),
    n AS (
        -- Zero-vector guard at source on the cheap ma (ma > 0 <=>
        -- qsq > 0, see QUANT_TOPK_SQL): spares the per-candidate
        -- re-evaluation of the square fold inside a Filter node.
        SELECT vec_id, label, qv,
               list_reduce(list_transform(qv, x -> x * x),
                           (x, y) -> x + y) AS qsq
        FROM (
            SELECT vec_id, label,
                   list_transform(embedding, x ->
                       CAST(FLOOR(x::DOUBLE * 127 / ma) AS BIGINT)) AS qv
            FROM e WHERE ma > 0
        )
    ),
    cent0 AS (
        SELECT label, p.pos,
               CAST(SUM(CAST(CAST(embedding[p.pos + 1] AS DOUBLE)
                             AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS cv
        FROM embeddings,
             (SELECT unnest(range(0, (SELECT len(embedding) FROM embeddings
                                      LIMIT 1))) AS pos) p
        GROUP BY label, p.pos
    ),
    centn AS (
        SELECT label AS c_label, centroid,
               {SQNORM_SQL.format(a='centroid')} AS c_sq
        FROM (SELECT label, list(cv ORDER BY pos) AS centroid
              FROM cent0 GROUP BY label)
    ),
    q AS (SELECT vec_id AS query_id, embedding AS q_emb, sq AS q_sq
          FROM e WHERE vec_id % 100 = 0 AND sq > 0),
    simc AS (
        SELECT q.query_id, c.c_label,
               {DOT_SQL.format(a='q.q_emb', b='c.centroid')}
                   / sqrt(q.q_sq * c.c_sq) AS c_cos
        FROM q, centn c
    ),
    probed AS (
        SELECT query_id, c_label FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                          ORDER BY c_cos DESC, c_label) AS rn
            FROM simc
        ) WHERE rn <= {IVF_QUANT_NPROBE}
    ),
    qn AS (
        SELECT vec_id AS query_id, qv AS q_qv, qsq AS q_qsq
        FROM n WHERE vec_id % 100 = 0
    ),
    scored AS (
        SELECT p.query_id, c.vec_id AS cand_id,
               list_reduce(
                   list_transform(range(1, len(qn.q_qv) + 1),
                                  i -> qn.q_qv[i] * c.qv[i]),
                   (x, y) -> x + y) AS qdot,
               qn.q_qsq AS q_qsq, c.qsq AS c_qsq
        FROM probed p
        JOIN qn ON qn.query_id = p.query_id
        JOIN n c ON c.label = p.c_label
        WHERE c.vec_id <> p.query_id
    ),
    ranked AS (
        SELECT query_id, cand_id, qdot,
               ROUND(qdot / sqrt(q_qsq * c_qsq), 6) AS cosine_q,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY qdot / sqrt(q_qsq * c_qsq) DESC, cand_id) AS rn
        FROM scored
    )
    SELECT query_id, cand_id, CAST(qdot AS BIGINT) AS qdot, cosine_q
    FROM ranked WHERE rn <= 5
"""


@query("q_sim_ivf_quantized", oracle=IVF_QUANT_SQL)
def q_sim_ivf_quantized(spark, sf_dir):
    """The composed ANN serving layout — IVF probe routing OVER int8
    codes, closing the ladder q_sim_topk_quantized's docstring names:
    bucketing bounds the CANDIDATE count (each query scores only its
    nprobe=3 cells, never the corpus) and scalar quantization bounds
    the BANDWIDTH per candidate (4x-smaller codes, integer dot
    products). This is the layout a 100 TB vector store actually
    serves from: full-precision centroids route (tiny, broadcast),
    cells hold codes, scan cost is nprobe·|cell|·d int8 MACs.

    Determinism (hash-check contract): routing reuses q_sim_ivf's
    exact-decimal centroids (probe decisions are identical chains in
    both engines); in-cell scores reuse q_sim_topk_quantized's exact
    arithmetic — qdot an order-independent BIGINT fold, cosine_q one
    IEEE division — so the whole approximate pipeline is hash-checked
    end to end. Zero vectors (qsq = 0, cosine undefined = NaN) are
    filtered from query and candidate sides exactly as in the
    brute-force rung. Recall vs q_sim_topk's full-precision exact
    top-5 (same % 100 query set) is asserted in tests/test_r16_ops.py.
    Reference parity: the Trino pass-through surface
    (`init_for_test.py:66-79`) has no ANN — this rung extends the
    engine for LLM-pipeline retrieval workloads."""
    from .similarity import _dot, ivf_cell_centroids

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding",
        _sqnorm(F.col("embedding")).alias("sq"),
    )
    # int8 codes + integer square norms: the SHARED quantization block
    # (int8_codes — q_embed_quantize arithmetic, one copy per contract).
    # Candidates drop zero vectors at SOURCE on the cheap ma test
    # (ma > 0 <=> qsq > 0, see q_sim_topk_quantized) — filtering on
    # qsq re-evaluated the square fold per candidate row. Centroids
    # still train on the FULL corpus (routing geometry is independent
    # of the scoring guard), matching the oracle's cent0.
    ma = F.array_max(
        F.transform("embedding", lambda v: F.abs(v.cast("double")))
    )
    n = int8_codes(e.filter(ma > 0))
    # Coarse quantizer: q_sim_ivf's exact-decimal per-cell centroids,
    # via the shared helper (ivf_cell_centroids).
    cent = ivf_cell_centroids(e).select(
        F.col("label").alias("c_label"), "centroid", "c_sq"
    )
    q = e.filter((F.col("vec_id") % 100 == 0) & (F.col("sq") > 0)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("sq").alias("q_sq"),
    )
    # Probe: top-nprobe cells per query, routed at full precision.
    sim_c = q.join(F.broadcast(cent)).select(
        "query_id", "c_label",
        (_dot(F.col("q_emb"), F.col("centroid"))
         / F.sqrt(F.col("q_sq") * F.col("c_sq"))).alias("c_cos"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("c_cos").desc(), F.col("c_label"))
    probed = (
        sim_c.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= IVF_QUANT_NPROBE)
        .select("query_id", "c_label")
    )
    qn = n.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("q_qv"),
        F.col("qsq").alias("q_qsq"),
    )
    # Score int8 codes within probed cells only (the bounded join:
    # candidates co-partition by cell label; the query block and its
    # probe routing broadcast).
    routed = probed.join(F.broadcast(qn), "query_id")
    scored = (
        n.join(F.broadcast(routed), F.col("label") == F.col("c_label"))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            F.aggregate(
                F.zip_with("q_qv", "qv", lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("qdot"),
            (F.col("q_qsq") * F.col("qsq")).alias("qq"),
        )
        .withColumn(
            "cosine_q", F.col("qdot") / F.sqrt(F.col("qq").cast("double"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_q").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            "query_id", "cand_id", "qdot",
            F.round("cosine_q", 6).alias("cosine_q"),
        )
    )


# --- product quantization (r16, library-only; staged r17 registration) ---
#
# The ANN serving ladder's final compression rung: scalar int8 codes
# (q_sim_topk_quantized) cut bandwidth 4x; PRODUCT quantization (Jegou,
# Douze & Schmid 2011, "Product Quantization for Nearest Neighbor
# Search") cuts it ~32x by splitting each vector into PQ_M contiguous
# subspaces and replacing every subvector with the id of its nearest
# codebook centroid — PQ_M small ids per vector instead of d floats —
# while queries score candidates with ASYMMETRIC DISTANCE COMPUTATION
# (ADC): the full-precision query builds one |codebook|-entry dot table
# per subspace and every candidate's score is PQ_M table lookups summed.
#
# Everything is built from the repo's proven deterministic parts so an
# r17 registered rung can oracle it in DuckDB (the unrolled-CTE pattern
# of q_knn_graph_descent2 / q_kmeans_embed):
#   - codebook training = decimal-sum means (order-independent exact
#     addition, the q_sim_ivf centroid technique): seed centroids are
#     the per-(subspace, vec_id % PQ_KS) group means; ONE Lloyd
#     refinement reassigns every subvector to its nearest seed
#     (decimal-exact squared distances, ties on centroid id) and
#     re-means — Lloyd monotonicity is law-tested;
#   - encoding = the same nearest-centroid rank window (deterministic
#     ties), so codes are partitioning-invariant (law-tested);
#   - ADC tables = decimal-sum dots, so scores are exact arithmetic.
#
# At 100 TB: training touches each subvector twice (two map-combined
# decimal aggregates + one broadcast-codebook assignment join — the
# codebook is PQ_M x PQ_KS rows, always broadcastable); encoding is one
# broadcast join; serving scans CODES (PQ_M ints/vector), not vectors,
# and composes with IVF routing exactly like q_sim_ivf_quantized
# (coarse cells hold PQ codes instead of int8 codes).

PQ_M = 8    # subspaces: 64-dim fixture -> 8 dims per subvector
PQ_KS = 32  # centroids per subspace codebook (probed: recall@5 0.28
#             ADC-only / 0.80 with the exact rerank at shortlist=50,
#             vs 0.01 chance, on the sf0.001 fixture)


def _pq_dim(e) -> int:
    """Embedding dimensionality (1-row driver lookup, bounded)."""
    return len(e.select("embedding").first()[0])


def pq_subvectors(e, m: int = PQ_M, keep: tuple = ()):
    """(vec_id, keep..., sub, subvec): contiguous d/m-dim slices of
    each embedding, doubles. One narrow projection, no shuffle.
    ``keep`` columns ride through the explode (r20: lets build-time
    metadata like the IVF cell label attach without a corpus-sized
    join afterwards)."""
    d = _pq_dim(e)
    subdim = d // m
    assert subdim * m == d, f"dim {d} not divisible into {m} subspaces"
    slices = F.array(*[
        F.slice(
            F.transform("embedding", lambda x: x.cast("double")),
            i * subdim + 1, subdim,
        )
        for i in range(m)
    ])
    return e.select(
        "vec_id", *keep, F.posexplode(slices).alias("sub", "subvec")
    )


def _pq_group_means(assigned, id_col: str):
    """Per-(sub, id_col) decimal-exact mean vector of ``subvec`` —
    the order-independent centroid aggregate (q_sim_ivf technique).
    Map-combined: two groupBys, no row ever leaves its partition
    before partial aggregation."""
    return (
        assigned.select(
            "sub", F.col(id_col).alias("cid"),
            F.posexplode("subvec").alias("pos", "v"),
        )
        .groupBy("sub", "cid", "pos")
        .agg(
            (
                F.sum(F.col("v").cast("decimal(28,12)")).cast("double")
                / F.count("*")
            ).alias("cv")
        )
        .groupBy("sub", "cid")
        .agg(F.array_agg(F.struct("pos", "cv")).alias("pcs"))
        .select("sub", "cid", F.array_sort("pcs").cv.alias("centroid"))
    )


def _pq_sqdist():
    """Squared distance between ``subvec`` and ``centroid`` as a
    SEQUENTIAL double left fold — the DOT_SQL/SQNORM_SQL determinism
    contract (bit-identical IEEE754 chains in both engines; the fold
    order is fixed, so no order-dependence to neutralize)."""
    return F.aggregate(
        F.zip_with("subvec", "centroid", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _pq_assign(subs, codebook):
    """Nearest-centroid id per (vec_id, sub): argmin by (sqdist, cid) —
    deterministic ties (cid is unique within a subspace).

    Plan note (r20 optimization, guide §4.2): the r17 shape joined
    every subvector against the broadcast codebook (ks=32x row
    explosion), evaluated the sqdist as an interpreted
    HigherOrderFunction fold per scored row, and re-aggregated with
    MIN(struct) — CPU-bound on fold evaluation (the vecmath module's
    measured ~6-15 µs/fold). Now the bounded codebook (≤ m·ks rows,
    the SAME relation the old plan broadcast) is collected once into a
    NumPy kernel (vecexec.pq_assign_udf) that replays the identical
    IEEE754 sqdist chain batch-at-a-time and takes the identical
    (d2, cid) argmin — one ArrowEvalPython projection, NO row
    explosion, NO groupBy exchange. Output bit-identical by the
    vecmath chain construction (held by the PQ/IVFADC oracle-equality
    law tests and tests/test_r20_vecmath.py)."""
    from . import vecexec

    assign = vecexec.pq_assign_udf(codebook.collect())
    return subs.select(
        "vec_id", "sub", "subvec",
        assign("sub", "subvec").alias("cid"),
    )


def pq_train(e, m: int = PQ_M, ks: int = PQ_KS, iters: int = 2):
    """Codebook (sub, cid, centroid): seed = per-(sub, vec_id % ks)
    group means; ``iters`` Lloyd refinements (assign to nearest
    centroid, re-mean per assignment — total in-cluster sqdist is
    monotone non-increasing per iteration, law-tested). Centroids
    that attract no subvector simply drop out (the codebook may hold
    < ks entries per subspace). Returns the refined codebook.

    r21 (guide §1.2/§5 — VERDICT item 7's job-count lever): the old
    loop localCheckpointed each INTERMEDIATE codebook AND then
    collected it inside the next ``_pq_assign`` — two driver jobs per
    Lloyd iteration for a ≤ m·ks-row relation whose only consumer is
    the next assignment's kernel (built from collected rows anyway).
    Now each non-final iteration COLLECTS the means once and feeds
    the rows to the kernel directly. The FINAL codebook stays an
    eager localCheckpoint: returning a LOCAL relation
    (createDataFrame over the rows) was measured ~1.5-2 s WORSE end
    to end on the serving side (probe pq_iso: local cb 7.1-7.2 s vs
    checkpointed 4.7-4.8 s warm at the IVFADC shape — the
    LocalTableScan re-plans the broadcast legs), so the collect-loop
    applies to intermediates only."""
    from . import vecexec

    # subs checkpointed (r20, guide §5): the subvector relation is
    # re-read by every Lloyd iteration's assign+means job (and it is
    # tiny — |vectors|·m rows); without the cut each checkpointed
    # iteration re-ran the scan/join/slice/posexplode subtree.
    subs = pq_subvectors(e, m).localCheckpoint(eager=True)
    means = _pq_group_means(subs.withColumn("g", F.col("vec_id") % ks), "g")
    if iters < 1:
        return means.localCheckpoint(eager=True)
    rows = means.collect()
    for i in range(iters):
        assign = vecexec.pq_assign_udf(rows)
        assigned = subs.select(
            "vec_id", "sub", "subvec",
            assign("sub", "subvec").alias("cid"),
        )
        refined = _pq_group_means(assigned, "cid")
        if i < iters - 1:
            rows = refined.collect()
    return refined.localCheckpoint(eager=True)


def pq_encode(e, codebook, m: int = PQ_M, keep: tuple = ()):
    """Codes (vec_id, keep..., sub, code): each subvector replaced by
    its nearest refined centroid's id — PQ_M small ints per vector,
    the ~32x-compressed serving representation. ``keep`` columns ride
    through (r20: the IVF build attaches the cell label here instead
    of re-joining the corpus afterwards — one join fewer, and no
    reliance on size estimates the checkpointed centroid relation no
    longer carries)."""
    from . import vecexec

    subs = pq_subvectors(e, m, keep=keep)
    assign = vecexec.pq_assign_udf(codebook.collect())
    return subs.select(
        "vec_id", *keep, "sub", assign("sub", "subvec").alias("code")
    )


def _pq_code_arrays(codes, *extra_cols: str):
    """(vec_id, extra_cols..., mks): each vector's m codes pivoted to
    ONE sorted array of map keys ``sub·ks + code`` — the per-sub key
    ranges are disjoint and increasing, so sorting the flat keys IS
    sub order. The m rows of a vector are produced co-located (one
    posexplode row group), so the groupBy combines map-side and the
    exchange carries one row per vector."""
    return codes.groupBy("vec_id", *extra_cols).agg(
        F.array_sort(
            F.collect_list(F.col("sub") * PQ_KS + F.col("code"))
        ).alias("mks")
    )


def _pq_adc_fold(mks_col: str, tm_col: str):
    """Σ over subspaces of the query's table entry for this vector's
    code — m broadcast-map lookups folded with an exact DECIMAL
    accumulator in fixed sub order. Bit-identical to the former
    (query, cand) groupBy's ``SUM(CAST(t AS DECIMAL(28,12)))`` →
    DOUBLE, including NULL semantics: NULL entries (a |t| ≥ 1e16
    decimal-cast overflow — only hostile-fuzz magnitudes) are SKIPPED
    like SUM skips them, and an all-NULL entry set yields NULL like an
    all-NULL SUM group. Exactness: every t is ROUND(·, 9), so all
    addends carry ≤9 decimal digits and the fold's (38,12)+(28,12) →
    (38,11) intermediate (Spark trims one scale digit at the precision
    cap) is still exact — the re-cast to the (38,12) accumulator type
    loses nothing; the final decimal→double cast is the same cast SUM's
    decimal(38,12) took."""
    decs = F.filter(
        F.transform(
            F.col(mks_col),
            lambda mk: F.element_at(F.col(tm_col), mk).cast("decimal(28,12)"),
        ),
        lambda v: v.isNotNull(),
    )
    folded = F.aggregate(
        decs,
        F.lit(0).cast("decimal(38,12)"),
        lambda acc, v: (acc + v).cast("decimal(38,12)"),
    ).cast("double")
    return F.when(F.size(decs) == 0, F.lit(None).cast("double")).otherwise(folded)


def pq_adc_topk(e, codebook, codes, k: int = 5, query_mod: int = 100,
                m: int = PQ_M):
    """Asymmetric-distance top-k: full-precision queries (vec_id %
    query_mod == 0) build a per-(query, sub, cid) dot TABLE against
    the broadcast codebook (|queries|·m·ks rows — bounded); every
    candidate's score is the sum of its m code lookups (approximates
    dot(q, x) by dot(q, reconstruction(x))). The corpus-side scan
    reads CODES only — never the vectors. Returns (query_id, cand_id,
    adc_dot, rn ≤ k), self-pairs excluded, ties on cand_id."""
    qsubs = pq_subvectors(e.filter(F.col("vec_id") % query_mod == 0), m)
    # Table entries are sequential double folds (bit-identical chains
    # in both engines), ROUNDED to 9 decimals BEFORE the cross-subspace
    # decimal sum: a post-round double sits ~1e-17 from a 9-digit
    # value, far from any 12-digit decimal-cast tie, so the decimal
    # cast is rounding-rule-independent — the piece that makes adc_dot
    # hash-checkable across engines (staged r17 oracle, PQ_TOPK_SQL).
    table = qsubs.join(F.broadcast(codebook), "sub").select(
        F.col("vec_id").alias("query_id"),
        "sub",
        F.col("cid").alias("code"),
        F.round(
            F.aggregate(
                F.zip_with("subvec", "centroid", lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            9,
        ).alias("t"),
    )
    # r20 (guide §1.2/§2.3): the old shape JOINED every code row
    # against the table on (sub, code) — an m-fold row explosion
    # (|codes|·|queries| joined rows) hash-aggregated back down by a
    # (query, cand) groupBy. Now codes pivot to one array per vector
    # (map-side combined — the m rows of a vector are co-located by
    # construction) and each query's table becomes a broadcast lookup
    # map; the score is m map lookups summed by a DECIMAL fold in
    # fixed sub order. Decimal addition is exact, so the fold equals
    # the old order-nondeterministic decimal SUM bit for bit (the
    # registry determinism rule — same addends, exact arithmetic).
    tmap = table.groupBy("query_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(
                (F.col("sub") * PQ_KS + F.col("code")).alias("mk"),
                F.col("t"),
            ))
        ).alias("tm")
    )
    scored = (
        _pq_code_arrays(codes)
        .crossJoin(F.broadcast(tmap))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("cand_id"),
            _pq_adc_fold("mks", "tm").alias("adc_dot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dot").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def pq_rerank_topk(e, codebook, codes, k: int = 5, shortlist: int = 50,
                   query_mod: int = 100, m: int = PQ_M):
    """The production PQ serving shape: ADC over CODES builds a
    per-query shortlist (cheap — m table lookups per candidate, no
    vector reads), then ONLY the shortlist's full-precision vectors
    are fetched and rescored exactly (sequential-fold dot, the
    DOT_SQL chain) for the final top-k. At 100 TB the exact-rescore
    join touches |queries|·shortlist vectors, never the corpus — the
    IO asymmetry that makes PQ the index format and full precision
    the rerank format. Probed on the fixture: recall@5 0.80 at
    shortlist=50 vs 0.28 ADC-only (chance 0.01)."""
    short = pq_adc_topk(
        e, codebook, codes, k=shortlist, query_mod=query_mod, m=m
    ).select("query_id", "cand_id")
    emb = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    q = emb.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cand = (
        short.join(F.broadcast(q), "query_id")
        .join(emb, short.cand_id == emb.vec_id)
    )
    scored = cand.select(
        "query_id", "cand_id",
        F.aggregate(
            F.zip_with("qv", "v", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("dot"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


# --- staged r17 oracle for the PQ rung -----------------------------------

PQ_SUBDIM = 8       # 64-dim fixture / PQ_M subspaces
PQ_QUERY_MOD = 100  # same query set as the other similarity rungs
PQ_ITERS = 2        # Lloyd refinements (pq_train default)

_PQ_D2_SQL = (
    "list_reduce(list_transform(range(1, {sd} + 1),"
    " i -> (s.subvec[i] - c.centroid[i]) * (s.subvec[i] - c.centroid[i])),"
    " (x, y) -> x + y)"
)


def _pq_means_sql(src: str, out: str) -> str:
    """Decimal-exact per-(sub, cid) mean-vector CTE pair — the SQL twin
    of _pq_group_means (order-independent decimal sums, list reassembled
    in position order)."""
    return f"""
    {out}0 AS (
        SELECT sub, cid, p.pos,
               CAST(SUM(CAST(subvec[p.pos + 1] AS DECIMAL(28,12)))
                    AS DOUBLE) / COUNT(*) AS cv
        FROM {src}, (SELECT unnest(range(0, {PQ_SUBDIM})) AS pos) p
        GROUP BY sub, cid, p.pos
    ),
    {out} AS (
        SELECT sub, cid, list(cv ORDER BY pos) AS centroid
        FROM {out}0 GROUP BY sub, cid
    )"""


def _pq_assign_sql(cb: str, out: str, src: str = "subs") -> str:
    """Nearest-centroid assignment CTE — the SQL twin of _pq_assign
    (sequential-fold squared distance, ties on centroid id).
    ``src`` names the subvector CTE (raw subvectors for the plain PQ
    chain, residual subvectors for the IVF×PQ one)."""
    return f"""
    {out} AS (
        SELECT vec_id, sub, subvec, cid FROM (
            SELECT s.vec_id, s.sub, s.subvec, c.cid,
                   row_number() OVER (
                       PARTITION BY s.vec_id, s.sub
                       ORDER BY {_PQ_D2_SQL.format(sd=PQ_SUBDIM)}, c.cid
                   ) AS rn
            FROM {src} s JOIN {cb} c ON c.sub = s.sub
        ) WHERE rn = 1
    )"""


def _pq_topk_sql() -> str:
    """DuckDB oracle for the full PQ pipeline at the library defaults
    (pq_train iters=2 → pq_encode → pq_adc_topk): the Lloyd loop
    unrolled into one CTE chain per iteration (the q_knn_graph_descent2
    pattern), every arithmetic step the bit-identical twin of the
    DataFrame stage (decimal-sum means; sequential-fold d2 and dots;
    9-decimal-rounded table entries so the cross-subspace decimal sum
    is rounding-rule-independent; ties on cid / cand_id). Staged for
    the r17 registration of q_sim_topk_pq; cross-engine equality is
    law-tested NOW in tests/test_r16_ops.py so the registration is a
    decorator away."""
    chain = [f"""
    WITH e AS (SELECT vec_id, embedding FROM embeddings),
    subs AS (
        SELECT e.vec_id, m.sub,
               list_transform(
                   range({PQ_SUBDIM} * m.sub + 1,
                         {PQ_SUBDIM} * m.sub + {PQ_SUBDIM} + 1),
                   i -> CAST(e.embedding[i] AS DOUBLE)) AS subvec
        FROM e, (SELECT unnest(range(0, {PQ_M})) AS sub) m
    ),
    seeded AS (
        SELECT vec_id, sub, subvec, vec_id % {PQ_KS} AS cid FROM subs
    ),{_pq_means_sql('seeded', 'cb0')}"""]
    cb = "cb0"
    for i in range(1, PQ_ITERS + 1):
        chain.append("," + _pq_assign_sql(cb, f"a{i}"))
        chain.append("," + _pq_means_sql(f"a{i}", f"cb{i}"))
        cb = f"cb{i}"
    chain.append(f""",{_pq_assign_sql(cb, 'enc')},
    codes AS (SELECT vec_id, sub, cid AS code FROM enc),
    qsubs AS (SELECT * FROM subs WHERE vec_id % {PQ_QUERY_MOD} = 0),
    tbl AS (
        SELECT q.vec_id AS query_id, c.sub, c.cid AS code,
               ROUND(list_reduce(
                   list_transform(range(1, {PQ_SUBDIM} + 1),
                                  i -> q.subvec[i] * c.centroid[i]),
                   (x, y) -> x + y), 9) AS t
        FROM qsubs q JOIN {cb} c ON c.sub = q.sub
    ),
    scored AS (
        SELECT t.query_id, co.vec_id AS cand_id,
               CAST(SUM(CAST(t.t AS DECIMAL(28,12))) AS DOUBLE) AS adc_dot
        FROM codes co
        JOIN tbl t ON t.sub = co.sub AND t.code = co.code
        WHERE co.vec_id <> t.query_id
        GROUP BY t.query_id, co.vec_id
    ),
    ranked AS (
        SELECT query_id, cand_id, adc_dot,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY adc_dot DESC, cand_id) AS rn
        FROM scored
    )""")
    return "".join(chain)


PQ_TOPK_SQL = _pq_topk_sql() + """
    SELECT query_id, cand_id, ROUND(adc_dot, 6) AS adc_dot,
           CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= 5"""

PQ_RERANK_SHORTLIST = 50

# The production serving twin (pq_rerank_topk): ADC shortlist from the
# same chain, then EXACT rescore of the shortlist's full-precision
# vectors only (sequential-fold dot — the DOT_SQL chain) for the final
# top-5. Staged for the r17 registration of q_sim_topk_pq_rerank;
# cross-engine equality law-tested alongside PQ_TOPK_SQL's.
PQ_RERANK_SQL = _pq_topk_sql() + f""",
    shortlist AS (
        SELECT query_id, cand_id FROM ranked
        WHERE rn <= {PQ_RERANK_SHORTLIST}
    ),
    resc AS (
        SELECT s.query_id, s.cand_id,
               list_reduce(
                   list_transform(range(1, {PQ_M} * {PQ_SUBDIM} + 1),
                       i -> CAST(eq.embedding[i] AS DOUBLE)
                            * CAST(ec.embedding[i] AS DOUBLE)),
                   (x, y) -> x + y) AS dot
        FROM shortlist s
        JOIN e eq ON eq.vec_id = s.query_id
        JOIN e ec ON ec.vec_id = s.cand_id
    ),
    rr AS (
        SELECT query_id, cand_id, dot,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY dot DESC, cand_id) AS rn
        FROM resc
    )
    SELECT query_id, cand_id, ROUND(dot, 6) AS dot, CAST(rn AS BIGINT) AS rn
    FROM rr WHERE rn <= 5"""


# --- IVF x PQ: residual product quantization (r16, library-only) ---------
#
# The terminal ANN serving rung, composing the whole ladder: IVF cells
# bound the CANDIDATE count (probe routing, q_sim_ivf), PQ codes over
# CELL RESIDUALS bound the bytes per candidate (~32x), and ADC scores
# decompose exactly as dot(q, x_hat) = dot(q, centroid_cell) +
# sum_m table_m[code_m] — the Jegou et al. 2011 IVFADC layout every
# production vector store (FAISS IndexIVFPQ) serves from. Residuals
# (x - centroid_cell) are what PQ quantizes because they are smaller
# and more isotropic than raw vectors: the same codebook budget spends
# itself on the within-cell detail the router cannot see.
#
# Built entirely from proven parts: ivf_cell_centroids (decimal-sum
# routing geometry), pq_train/pq_encode on the residual relation
# (Lloyd monotonicity + partitioning invariance inherit), and the
# 9-decimal-rounded fold + decimal-sum discipline for the score so a
# future registered rung can oracle it like PQ_TOPK_SQL.

IVF_PQ_NPROBE = 3


def ivf_pq_build(e, m: int = PQ_M, ks: int = PQ_KS):
    """(centroids, codebook, codes): route geometry from the FULL
    corpus, one shared PQ codebook trained on cell residuals, and
    per-vector residual codes. Residual computation is one broadcast
    join (|cells| rows) — no shuffle of the corpus."""
    from .similarity import ivf_cell_centroids

    # cent checkpointed (r20, guide §5): the centroid aggregation
    # subtree is referenced by every training iteration, the encode
    # and the serving probe — each a separate job that re-ran it
    # before the cut. It is ≤|cells| rows; values are unchanged by
    # materialization. resid deliberately NOT checkpointed: a
    # LogicalRDD carries no size statistics, which flipped the
    # build-time label join to sort-merge (plan-ledger catch) — the
    # residual projection itself is one broadcast join + a per-row
    # subtract, cheap to recompute per job once cent is cut. (r21
    # probe pq_iso: replacing checkpoint with a collected LOCAL
    # relation — exact stats — was measured WORSE on the serving
    # side; the checkpoint stays.)
    cent = ivf_cell_centroids(e).localCheckpoint(eager=True)
    resid = e.join(F.broadcast(cent), "label").select(
        "vec_id",
        "label",
        F.zip_with(
            F.transform("embedding", lambda x: x.cast("double")),
            "centroid",
            lambda x, c: x - c,
        ).alias("embedding"),
    )
    cb = pq_train(resid, m=m, ks=ks)
    # Codes carry their cell label RIDE-ALONG through the encode (r20:
    # the former build-time join on vec_id is gone), so serving never
    # touches a corpus-scale id→label map — the index IS
    # (label, vec_id, sub, code).
    codes = pq_encode(resid, cb, m=m, keep=("label",))
    return cent, cb, codes


def ivf_pq_topk(e, cent, cb, codes, k: int = 5,
                nprobe: int = IVF_PQ_NPROBE, query_mod: int = 100,
                m: int = PQ_M):
    """IVFADC top-k: full-precision queries route to their nprobe
    nearest cells (cosine vs broadcast centroids, ties on label);
    within probed cells only, candidates score as

        adc = round(dot(q, centroid_cell), 9)
            + sum_m round(dot(q_sub_m, codeword_m), 9)

    — m+1 table lookups per candidate, CODES are the only per-
    candidate data read. The cross-term sum goes through the decimal
    cast (order-independent), every fold is sequential — the same
    hash-checkability discipline as PQ_TOPK_SQL. Returns (query_id,
    cand_id, adc_dot, rn <= k).

    Plan note: the one nested-loop join in the plan is the
    query × |centroids| probe-routing cross join — bounded by design
    (|queries|·|cells| rows, centroids broadcast), the exact shape
    already allowlisted for q_sim_ivf in tests/test_plan_sweep.py;
    candidate scoring itself is equi-joins on (label) and
    (query_id, sub, code)."""
    from .similarity import _dot, _sqnorm

    emb_d = e.select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    q = emb_d.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        _sqnorm(F.col("v")).alias("q_sq"),
    )
    # Probe routing: top-nprobe cells per query at full precision.
    sim_c = q.join(F.broadcast(cent)).select(
        "query_id", "qv", "label",
        (_dot(F.col("qv"), F.col("centroid"))
         / F.sqrt(F.col("q_sq") * F.col("c_sq"))).alias("c_cos"),
        F.round(_dot(F.col("qv"), F.col("centroid")), 9).alias("qc_dot"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("c_cos").desc(), F.col("label"))
    probed = (
        sim_c.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", "label", "qc_dot")
    )
    # ADC tables: per (query, sub, cid) residual-codeword dots.
    qsubs = pq_subvectors(
        probed.select(F.col("query_id").alias("vec_id"),
                      F.col("qv").alias("embedding")).distinct(),
        m,
    )
    table = qsubs.join(F.broadcast(cb), "sub").select(
        F.col("vec_id").alias("query_id"),
        "sub",
        F.col("cid").alias("code"),
        F.round(
            F.aggregate(
                F.zip_with("subvec", "centroid", lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            9,
        ).alias("t"),
    )
    # Candidates: codes of vectors in probed cells only (codes carry
    # their label from build; the probe routing broadcasts). r20: the
    # per-(query, sub, code) table join + re-aggregation is replaced
    # by the pivoted-code broadcast-map fold — see pq_adc_topk; the
    # cross-subspace decimal fold is bit-identical to the former
    # decimal SUM.
    tmap = table.groupBy("query_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(
                (F.col("sub") * PQ_KS + F.col("code")).alias("mk"),
                F.col("t"),
            ))
        ).alias("tm")
    )
    cand = _pq_code_arrays(codes, "label").join(
        F.broadcast(probed.select("query_id", "label", "qc_dot")), "label"
    ).filter(F.col("vec_id") != F.col("query_id"))
    scored = (
        cand.join(F.broadcast(tmap), "query_id")
        .select(
            "query_id", F.col("vec_id").alias("cand_id"),
            (F.col("qc_dot") + _pq_adc_fold("mks", "tm")).alias("adc_dot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dot").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def ivf_pq_rerank_topk(e, cent, cb, codes, k: int = 5, shortlist: int = 40,
                       nprobe: int = IVF_PQ_NPROBE, query_mod: int = 100,
                       m: int = PQ_M):
    """Full IVFADC serving: ADC shortlist within probed cells, then
    exact rescore of ONLY the shortlist's full-precision vectors
    (sequential-fold dot) for the final top-k — probed at 0.92 recall
    vs the exact probe ceiling at shortlist=40 on the fixture (0.32
    ADC-only; the rescore reads |queries|·shortlist vectors, never a
    cell, never the corpus)."""
    short = ivf_pq_topk(
        e, cent, cb, codes, k=shortlist, nprobe=nprobe,
        query_mod=query_mod, m=m,
    ).select("query_id", "cand_id")
    emb = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    q = emb.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        short.join(F.broadcast(q), "query_id")
        .join(emb, short.cand_id == emb.vec_id)
        .select(
            "query_id", "cand_id",
            F.aggregate(
                F.zip_with("qv", "v", lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("dot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def ivf_pq_upsert(cent, cb, codes, e_new, delete_ids=None, m: int = PQ_M):
    """Maintain the IVFADC index under a CDC batch with the routing
    geometry and codebook FROZEN — the production regime (FAISS/
    vector-store practice: codebooks retrain offline and rarely; the
    online path only routes + encodes). ``delete_ids`` drop; ``e_new``
    rows (vec_id, label, embedding) insert or REPLACE. The batch must
    be per-key RESOLVED (one op per vec_id — the envelope-decode
    latest-wins contract upstream, cdc/queries.py); a key in both
    ``e_new`` and ``delete_ids`` is taken as insert here, but don't
    rely on that — resolve first. Cost: O(|batch|·d) to encode
    + one broadcast of the centroid/codebook relations — the index
    never rewrites untouched rows, the same touched-only discipline
    as the bucketed CDC apply.

    Law (tests/test_r16_ops.py): upsert(build(S₀), batch) produces
    code-for-code the index that encoding the final survivor corpus
    with the SAME frozen centroids/codebook would — so serving over
    the maintained index equals serving over a rebuild, under any
    batch arrival. (Codebook REFRESH is deliberately out of scope:
    retraining changes every code by design and is a rebuild, not a
    maintenance op.)"""
    resid = e_new.join(F.broadcast(cent), "label").select(
        "vec_id",
        "label",
        F.zip_with(
            F.transform("embedding", lambda x: x.cast("double")),
            "centroid",
            lambda x, c: x - c,
        ).alias("embedding"),
    )
    new_codes = pq_encode(resid, cb, m=m, keep=("label",))
    gone = e_new.select("vec_id")
    if delete_ids is not None:
        gone = gone.unionByName(delete_ids.select("vec_id"))
    survivors = codes.join(gone, "vec_id", "left_anti")
    return survivors.unionByName(
        new_codes.select(*codes.columns)
    )


def _ivf_pq_sql() -> str:
    """DuckDB oracle for the full IVFADC pipeline at the library
    defaults (ivf_pq_build → ivf_pq_topk): cell centroids from
    decimal sums (the q_sim_ivf geometry), residuals per vector, the
    PQ Lloyd chain unrolled over RESIDUAL subvectors, probe routing
    at full precision (cosine ties on label), and the decomposed ADC
    score qc_dot + Σ table lookups — every step the bit-identical
    twin of the DataFrame stage. Staged for an r17+ registration of
    q_sim_ivf_pq; cross-engine equality law-tested in
    tests/test_r16_ops.py."""
    d = PQ_M * PQ_SUBDIM
    chain = [f"""
    WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
    cent0 AS (
        SELECT label, p.pos,
               CAST(SUM(CAST(CAST(embedding[p.pos + 1] AS DOUBLE)
                             AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS cv
        FROM e, (SELECT unnest(range(0, {d})) AS pos) p
        GROUP BY label, p.pos
    ),
    centn AS (
        SELECT label, centroid,
               {SQNORM_SQL.format(a='centroid')} AS c_sq
        FROM (SELECT label, list(cv ORDER BY pos) AS centroid
              FROM cent0 GROUP BY label)
    ),
    resid AS (
        SELECT e.vec_id, e.label,
               list_transform(range(1, {d} + 1),
                   i -> CAST(e.embedding[i] AS DOUBLE) - c.centroid[i])
                   AS remb
        FROM e JOIN centn c ON c.label = e.label
    ),
    rsubs AS (
        SELECT r.vec_id, m.sub,
               list_transform(
                   range({PQ_SUBDIM} * m.sub + 1,
                         {PQ_SUBDIM} * m.sub + {PQ_SUBDIM} + 1),
                   i -> r.remb[i]) AS subvec
        FROM resid r, (SELECT unnest(range(0, {PQ_M})) AS sub) m
    ),
    seeded AS (
        SELECT vec_id, sub, subvec, vec_id % {PQ_KS} AS cid FROM rsubs
    ),{_pq_means_sql('seeded', 'rcb0')}"""]
    cb = "rcb0"
    for i in range(1, PQ_ITERS + 1):
        chain.append("," + _pq_assign_sql(cb, f"ra{i}", src="rsubs"))
        chain.append("," + _pq_means_sql(f"ra{i}", f"rcb{i}"))
        cb = f"rcb{i}"
    chain.append(f""",{_pq_assign_sql(cb, 'renc', src='rsubs')},
    codes AS (
        SELECT rn.vec_id, rn.sub, rn.cid AS code, r.label
        FROM renc rn JOIN resid r ON r.vec_id = rn.vec_id
    ),
    q AS (
        SELECT vec_id AS query_id,
               list_transform(range(1, {d} + 1),
                   i -> CAST(embedding[i] AS DOUBLE)) AS qv
        FROM e WHERE vec_id % {PQ_QUERY_MOD} = 0
    ),
    qn AS (
        SELECT query_id, qv, {SQNORM_SQL.format(a='qv')} AS q_sq FROM q
    ),
    simc AS (
        SELECT qn.query_id, qn.qv, c.label,
               {DOT_SQL.format(a='qn.qv', b='c.centroid')}
                   / sqrt(qn.q_sq * c.c_sq) AS c_cos,
               ROUND({DOT_SQL.format(a='qn.qv', b='c.centroid')}, 9)
                   AS qc_dot
        FROM qn, centn c
    ),
    probed AS (
        SELECT query_id, qv, label, qc_dot FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                          ORDER BY c_cos DESC, label) AS rn
            FROM simc
        ) WHERE rn <= {IVF_PQ_NPROBE}
    ),
    qsubs AS (
        SELECT q.query_id, m.sub,
               list_transform(
                   range({PQ_SUBDIM} * m.sub + 1,
                         {PQ_SUBDIM} * m.sub + {PQ_SUBDIM} + 1),
                   i -> q.qv[i]) AS subvec
        FROM q, (SELECT unnest(range(0, {PQ_M})) AS sub) m
    ),
    tbl AS (
        SELECT s.query_id, c.sub, c.cid AS code,
               ROUND(list_reduce(
                   list_transform(range(1, {PQ_SUBDIM} + 1),
                                  i -> s.subvec[i] * c.centroid[i]),
                   (x, y) -> x + y), 9) AS t
        FROM qsubs s JOIN {cb} c ON c.sub = s.sub
    ),
    scored AS (
        SELECT p.query_id, co.vec_id AS cand_id,
               p.qc_dot + CAST(SUM(CAST(t.t AS DECIMAL(28,12)))
                               AS DOUBLE) AS adc_dot
        FROM codes co
        JOIN probed p ON p.label = co.label AND co.vec_id <> p.query_id
        JOIN tbl t ON t.query_id = p.query_id AND t.sub = co.sub
                  AND t.code = co.code
        GROUP BY p.query_id, co.vec_id, p.qc_dot
    ),
    ranked AS (
        SELECT query_id, cand_id, adc_dot,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY adc_dot DESC, cand_id) AS rn
        FROM scored
    )""")
    return "".join(chain)


IVF_PQ_SQL = _ivf_pq_sql() + """
    SELECT query_id, cand_id, ROUND(adc_dot, 6) AS adc_dot,
           CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= 5"""

IVF_PQ_RERANK_SHORTLIST = 40

# The serving twin (ivf_pq_rerank_topk): ADC shortlist within probed
# cells from the same chain, then the exact sequential-fold rescore of
# only the shortlist's full-precision vectors. Staged alongside
# IVF_PQ_SQL; equality law-tested in tests/test_r16_ops.py.
IVF_PQ_RERANK_SQL = _ivf_pq_sql() + f""",
    shortlist AS (
        SELECT query_id, cand_id FROM ranked
        WHERE rn <= {IVF_PQ_RERANK_SHORTLIST}
    ),
    resc AS (
        SELECT s.query_id, s.cand_id,
               list_reduce(
                   list_transform(range(1, {PQ_M} * {PQ_SUBDIM} + 1),
                       i -> CAST(eq.embedding[i] AS DOUBLE)
                            * CAST(ec.embedding[i] AS DOUBLE)),
                   (x, y) -> x + y) AS dot
        FROM shortlist s
        JOIN e eq ON eq.vec_id = s.query_id
        JOIN e ec ON ec.vec_id = s.cand_id
    ),
    rr AS (
        SELECT query_id, cand_id, dot,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY dot DESC, cand_id) AS rn
        FROM resc
    )
    SELECT query_id, cand_id, ROUND(dot, 6) AS dot, CAST(rn AS BIGINT) AS rn
    FROM rr WHERE rn <= 5"""


@query("q_sim_ivf_pq", oracle=IVF_PQ_RERANK_SQL)
def q_sim_ivf_pq(spark, sf_dir):
    """IVFADC serving — the terminal ANN rung (r17 registration of the
    r16-staged IVF×PQ library): IVF probe routing bounds the CANDIDATE
    count (nprobe=3 cells per query, never the corpus), residual
    product-quantization codes bound the BYTES per candidate (~32x —
    PQ_M=8 small ints instead of 64 floats), ADC scores candidates
    with m+1 table lookups each, and ONLY the shortlist's
    full-precision vectors are fetched for the exact rescore
    (|queries|·shortlist vector reads). This is the Jégou et al. 2011
    IVFADC layout production vector stores (FAISS IndexIVFPQ) serve
    from, end-to-end hash-checked: routing geometry and codebooks are
    decimal-exact, every fold sequential, every top-k tied on id —
    the oracle (IVF_PQ_RERANK_SQL) replays build→shortlist→rerank
    bit-for-bit (law-tested cross-engine in tests/test_r16_ops.py
    before registration; recall 0.92 vs the exact probe ceiling at
    shortlist=40 on the fixture, 0.32 ADC-only).

    At 100 TB: centroids/codebook/probe-table all broadcast (≤ cells +
    m·ks rows); codes co-partition by cell label; the one nested-loop
    join is the bounded query×|centroids| probe routing (allowlisted,
    same shape as q_sim_ivf). Reference parity: the Trino pass-through
    surface (`init_for_test.py:66-79`) has no ANN — this rung extends
    the engine for LLM-pipeline retrieval workloads."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    cent, cb, codes = ivf_pq_build(e)
    return ivf_pq_rerank_topk(
        e, cent, cb, codes, k=5, shortlist=IVF_PQ_RERANK_SHORTLIST
    ).select(
        "query_id", "cand_id",
        F.round("dot", 6).alias("dot"),
        F.col("rn").cast("long").alias("rn"),
    )


# --- r18 rung: flat-PQ serving (no IVF routing) ---------------------------
#
# REGISTERED r18 (staged r17): the r18 window's two free slots go to
# this rung and q_cdc_evolve_spec, exactly as the r17 ledger projected
# — the registration is the one-decorator flip on the r17-staged
# function, whose cross-engine equality was law-tested BEFORE
# registration (tests/test_r17_ops.py::test_sim_pq_staged_rung_
# matches_oracle).

@query("q_sim_pq", oracle=PQ_RERANK_SQL)
def sim_pq_query(spark, sf_dir):
    """Flat product-quantization serving — ADC shortlist over the full
    code table (no coarse routing), exact rerank of shortlist vectors
    only. The rung between int8 scalar quantization (q_sim_topk_
    quantized: 4x compression, full scan) and IVFADC (q_sim_ivf_pq:
    ~32x + probe-bounded candidates): same ~32x code compression,
    corpus-wide candidate set — the right layout when recall must not
    depend on router quality (FAISS IndexPQ). Every arithmetic step is
    the deterministic twin of PQ_RERANK_SQL (decimal-sum codebooks,
    sequential folds, 9-decimal-rounded table entries, ties on id)."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    cb = pq_train(e)
    codes = pq_encode(e, cb)
    return pq_rerank_topk(
        e, cb, codes, k=5, shortlist=PQ_RERANK_SHORTLIST
    ).select(
        "query_id", "cand_id",
        F.round("dot", 6).alias("dot"),
        F.col("rn").cast("long").alias("rn"),
    )
