"""EXT operator semantics beyond the oracle comparisons: planted
near-dups are actually found, IVF recall vs brute force, multimodal
decode plumbing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from proof_of_concept___cdc_w_iceberg_spark import registry
from proof_of_concept___cdc_w_iceberg_spark.ext.multimodal import (
    fake_decode,
    with_binary_payload,
)
from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load

QS = registry.queries()


def test_minhash_finds_planted_near_dups(spark, sf_dir):
    """The fixtures contain J≈0.99 near-dup pairs; MinHash+LSH must
    surface the same pair set as guaranteed-recall shingle blocking."""
    ngram = {(r["id_a"], r["id_b"]) for r in QS["q_dedup_ngram"](spark, sf_dir).collect()}
    minhash = {(r["id_a"], r["id_b"]) for r in QS["q_dedup_minhash"](spark, sf_dir).collect()}
    assert ngram, "expected planted near-dup pairs in fixtures"
    assert minhash == ngram


def test_exact_dedup_collapses_planted_copies(spark, sf_dir):
    out = QS["q_dedup_exact"](spark, sf_dir)
    n_docs = load(spark, sf_dir, "documents").count()
    dups = out.filter(F.col("n_copies") > 1)
    assert dups.count() >= n_docs // 10  # every planted copy collapsed
    assert dups.filter(F.col("keep_id") >= 10_000_000).count() == 0  # keeps originals


def test_ivf_structure_and_recall(spark, sf_dir):
    """IVF returns exactly top-5 per query from the probed cells. The
    fixture embeddings are random (labels uncorrelated with geometry),
    so nprobe=3/10 gives ~30% expected recall — assert the mechanism
    works (nonempty, correct arity, all results are real corpus hits),
    not a clustering win the data can't provide."""
    ivf = QS["q_sim_ivf"](spark, sf_dir).collect()
    assert ivf
    per_query: dict[int, int] = {}
    for r in ivf:
        per_query[r["query_id"]] = per_query.get(r["query_id"], 0) + 1
        assert -1.0 <= r["cosine"] <= 1.0
    assert all(v == 5 for v in per_query.values())
    brute = QS["q_sim_topk"](spark, sf_dir)
    b = {
        (r["query_id"], r["cand_id"])
        for r in brute.filter(F.col("query_id") % 500 == 0).collect()
    }
    a = {(r["query_id"], r["cand_id"]) for r in ivf}
    if len(per_query) >= 10:
        recall = len(a & b) / len(b)
        assert recall >= 0.05, f"IVF recall collapsed: {recall}"


def test_multimodal_decode_stub_is_deterministic():
    n, w, h, f = fake_decode(b"x" * 1000)
    assert (n, w, h, f) == (1000, 360, 280, 11)


def test_binary_payload_schema(spark, sf_dir):
    df = with_binary_payload(load(spark, sf_dir, "documents"))
    assert dict(df.dtypes)["payload"] == "binary"
    row = df.first()
    assert isinstance(row["payload"], bytearray | bytes)


def test_lsh_ann_recall_vs_brute_force(spark, sf_dir):
    """Hyperplane LSH: 5 results per query, all real corpus hits, and
    recall vs brute force well above the random baseline (band
    collision keeps near neighbors; random 64-dim vectors cluster
    weakly, so assert the mechanism, not a miracle)."""
    lsh = QS["q_sim_lsh"](spark, sf_dir).collect()
    assert lsh
    per_query: dict[int, int] = {}
    for r in lsh:
        per_query[r["query_id"]] = per_query.get(r["query_id"], 0) + 1
        assert -1.0 <= r["cosine"] <= 1.0
    assert all(v == 5 for v in per_query.values())
    brute = {
        (r["query_id"], r["cand_id"])
        for r in QS["q_sim_topk"](spark, sf_dir)
        .filter(F.col("query_id") % 500 == 0)
        .collect()
    }
    got = {(r["query_id"], r["cand_id"]) for r in lsh}
    if len(per_query) >= 4:
        recall = len(got & brute) / len(brute)
        assert recall >= 0.2, f"LSH recall collapsed: {recall}"


def test_connected_components_chain_transitivity(spark):
    """A chain 1-2, 2-3, 3-4 plus isolated 9 must collapse to one
    component labeled 1 (transitive), with 9 its own singleton —
    and converge within the round cap (diameter 3)."""
    from proof_of_concept___cdc_w_iceberg_spark.ext.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 9]], ["node"])
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], ["id_a", "id_b"]
    )
    got = {r["node"]: r["comp"] for r in connected_components(nodes, pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 9: 9}


def test_dedup_cluster_components_contain_pair_endpoints(spark, sf_dir):
    """Every near-dup pair's two docs must land in the same component,
    and each component's canonical doc must be its min doc_id."""
    comp = {
        r["doc_id"]: (r["component"], r["is_canonical"])
        for r in QS["q_dedup_cluster"](spark, sf_dir).collect()
    }
    pairs = QS["q_dedup_ngram"](spark, sf_dir).collect()
    assert pairs, "fixture should contain planted near-dups"
    for p in pairs:
        assert comp[p["id_a"]][0] == comp[p["id_b"]][0]
    by_comp: dict[int, list[int]] = {}
    for doc, (c, _canon) in comp.items():
        by_comp.setdefault(c, []).append(doc)
    for c, members in by_comp.items():
        assert c == min(members)
        assert comp[c][1] == 1


def test_dedup_cluster_releases_loop_persists(spark, sf_dir):
    """Persist hygiene: the pair relation and per-round label persists
    are scoped to the connected-components loop (``with persisted``) —
    after the query's action only the plan-backing persists survive
    (ngram's sh/sh_c feeding the returned lineage, plus the final
    labels), released session-wide by the harness clearCache."""
    # getPersistentRDDs also counts localCheckpoint blocks from EARLIER
    # tests (IVM queries): their Python refs are gone, but the blocks
    # release only when the JVM's ContextCleaner sees the RDDs become
    # weakly reachable (after a JVM GC) and drains asynchronously — and
    # under full-suite ordering a few blocks can stay pinned for the
    # whole session (r14: stuck at exactly 4 through 30 GC cycles, yet
    # 0 when the test runs alone). So assert the DELTA against a
    # settled baseline, not a global absolute: the property under test
    # is that q_dedup_cluster's loop releases ITS OWN persists, which
    # suite-order leftovers cannot fake either way.
    import gc
    import time

    def settled_count() -> int:
        prev = None
        for _ in range(30):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            n = spark.sparkContext._jsc.getPersistentRDDs().size()
            if n == prev:
                return n
            prev = n
            time.sleep(1.0)
        return prev

    spark.catalog.clearCache()
    base = settled_count()
    QS["q_dedup_cluster"](spark, sf_dir).collect()
    n_cached = None
    for _ in range(30):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        n_cached = spark.sparkContext._jsc.getPersistentRDDs().size()
        if n_cached <= base + 3:
            break
        time.sleep(1.0)
    assert n_cached <= base + 3, (
        f"loop-scoped persists leaked: {n_cached} cached RDDs vs "
        f"baseline {base} (+3 plan-backing persists allowed)"
    )
    spark.catalog.clearCache()


def test_dedup_incremental_reads_index_not_corpus_text(spark, sf_dir):
    """The O(|batch|) claim: the corpus side of q_dedup_incremental
    must come from the materialized band index relations, never a
    re-scan of the corpus text. Every documents.parquet scan in the
    plan must carry the batch filter (doc_id % 13), and the index
    relations must appear as input files."""
    spark.catalog.clearCache()
    df = QS["q_dedup_incremental"](spark, sf_dir)
    files = df.inputFiles()
    assert [f for f in files if "dedup_band_index_" in f], "index not read"
    plan = df._jdf.queryExecution().executedPlan().toString()
    doc_scans = [
        ln for ln in plan.splitlines()
        if ("Scan parquet" in ln or "FileScan" in ln) and "documents.parquet" in ln
    ]
    assert doc_scans, "batch branch should read the corpus table"
    for ln in doc_scans:
        assert "% 13" in ln, f"corpus-wide text scan on the batch path: {ln[:200]}"
    spark.catalog.clearCache()


def test_band_index_apply_appends(spark, tmp_path):
    """Apply-style index maintenance is O(new docs): appending a new
    doc grows the size relation by one and its band buckets collide
    with its duplicate's — without touching previously indexed rows."""
    from proof_of_concept___cdc_w_iceberg_spark.ext.dedup import band_index_apply

    base = str(tmp_path / "idx")
    docs1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "one two three four five six seven eight nine")],
        ["doc_id", "text"],
    )
    band_index_apply(spark, base, docs1)
    n1 = spark.read.parquet(base + "/sizes").count()
    assert n1 == 2
    band_index_apply(
        spark, base,
        spark.createDataFrame(
            [(3, "alpha beta gamma delta epsilon zeta eta theta")],
            ["doc_id", "text"],
        ),
    )
    assert spark.read.parquet(base + "/sizes").count() == 3
    bands = spark.read.parquet(base + "/bands")
    a, b = bands.alias("a"), bands.alias("b")
    hits = {
        (r[0], r[1])
        for r in a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select("a.doc_id", "b.doc_id").distinct().collect()
    }
    assert (1, 3) in hits and (1, 2) not in hits


def test_embed_centroid_matches_numpy(spark, sf_dir):
    """Per-label centroid agrees with a local numpy mean."""
    import numpy as np

    e = load(spark, sf_dir, "embeddings").collect()
    want: dict[int, np.ndarray] = {}
    for lab in {r["label"] for r in e}:
        vecs = np.array([r["embedding"] for r in e if r["label"] == lab],
                        dtype=np.float64)
        want[lab] = vecs.mean(axis=0)
    got = QS["q_embed_centroid"](spark, sf_dir).collect()
    assert len(got) == len(want) * 64
    for r in got:
        assert abs(r["centroid"] - want[r["label"]][r["dim"]]) < 1e-5


def test_pii_scrub_removes_all_planted_pii(spark, sf_dir):
    """Every doc had exactly one email and one phone injected; both
    counts must be 1 (regexes catch all planted PII)."""
    rows = QS["q_text_pii_scrub"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_emails"] == 1, r
        assert r["n_phones"] == 1, r


def test_multiprobe_knn_recall_monotone_vs_single_cell(spark, sf_dir):
    """Multi-probe kNN (own cell + nearest other centroid) must be at
    least as close to the exact kNN graph as single-cell blocking: the
    per-source candidate pool is a superset, so every exact edge the
    single-cell graph keeps stays in the multi-probe graph (at most
    k-1 corpus vectors beat it). Exact graph via numpy all-pairs on
    the 500-vector fixture."""
    import numpy as np

    from proof_of_concept___cdc_w_iceberg_spark.ext.similarity import KNN_K

    single = {(r["src"], r["dst"]) for r in QS["q_knn_graph"](spark, sf_dir).collect()}
    multi_rows = QS["q_knn_graph_multiprobe"](spark, sf_dir).collect()
    spark.catalog.clearCache()
    multi = {(r["src"], r["dst"]) for r in multi_rows}
    per_src: dict[int, int] = {}
    for r in multi_rows:
        per_src[r["src"]] = per_src.get(r["src"], 0) + 1
    assert all(v == KNN_K for v in per_src.values())

    rows = load(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    np.fill_diagonal(sims, -2.0)
    exact = set()
    for i in range(len(ids)):
        # same ordering contract as the operators: cosine desc, id asc
        order = sorted(range(len(ids)), key=lambda j: (-sims[i, j], ids[j]))
        for j in order[:KNN_K]:
            exact.add((int(ids[i]), int(ids[j])))
    r_single = len(single & exact) / len(exact)
    r_multi = len(multi & exact) / len(exact)
    assert r_multi >= r_single, (r_multi, r_single)
    # the probe actually reaches outside the own cell
    assert len(multi - single) > 0


def test_multiprobe_semantic_edges_superset_of_in_cell(spark, sf_dir):
    """The multi-probe duplicate-edge relation must be a strict-or-
    equal SUPERSET of the in-cell relation (own cell is always among
    the assigned cells), and its recall against exact all-pairs edges
    must be monotone non-decreasing."""
    import numpy as np

    from proof_of_concept___cdc_w_iceberg_spark.ext.similarity import (
        SEM_T,
        _cell_blocked_pairs,
        _dot,
        _sqnorm,
        semantic_edges_multiprobe,
    )

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding", _sqnorm(F.col("embedding")).alias("sq")
    )
    own = e.select("vec_id", F.col("label").alias("cell"))
    cos = _dot(F.col("a_emb"), F.col("b_emb")) / F.sqrt(F.col("a_sq") * F.col("b_sq"))
    in_cell = {
        (r["id_a"], r["id_b"])
        for r in _cell_blocked_pairs(e, own)
        .filter(F.round(cos, 6) >= SEM_T)
        .select("id_a", "id_b")
        .collect()
    }
    multi = {
        (r["id_a"], r["id_b"])
        for r in semantic_edges_multiprobe(spark, sf_dir).collect()
    }
    spark.catalog.clearCache()
    assert in_cell <= multi

    rows = load(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = [int(r["vec_id"]) for r in rows]
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    exact = {
        (min(ids[i], ids[j]), max(ids[i], ids[j]))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if round(sims[i, j], 6) >= SEM_T
    }
    if exact:
        r_in = len(in_cell & exact) / len(exact)
        r_multi = len(multi & exact) / len(exact)
        assert r_multi >= r_in, (r_multi, r_in)


def test_blocked_trio_reads_materialized_capped_stage(spark, sf_dir):
    """Round-4 verdict task 5: q_dedup_ngram / containment / fuzzy must
    read the materialized capped-shingle stage instead of re-deriving
    corpus shingles per query — no documents.parquet text scan on the
    candidate-generation path (fuzzy still reads documents for its
    Levenshtein verification TEXT, which is candidate-scoped)."""
    spark.catalog.clearCache()
    for name in ("q_dedup_ngram", "q_dedup_containment"):
        df = QS[name](spark, sf_dir)
        files = df.inputFiles()
        assert [f for f in files if "dedup_capped_" in f], f"{name}: stage not read"
        assert not [f for f in files if "documents.parquet" in f], (
            f"{name}: corpus text re-scan"
        )
    df = QS["q_dedup_fuzzy"](spark, sf_dir)
    files = df.inputFiles()
    assert [f for f in files if "dedup_capped_" in f]
