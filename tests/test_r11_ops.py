"""Round-11 additions: the mergeable quantile sketch
(q_sketch_quantile, operators/sketches.py) — merge law, plan shape,
and in-band error sanity. Conformance vs the DuckDB oracle is covered
by tests/test_correctness.py like every other registered query.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from proof_of_concept___cdc_w_iceberg_spark import registry
from proof_of_concept___cdc_w_iceberg_spark.operators.sketches import (
    KQ_K,
    KQ_TARGETS,
    kq_sample,
)
from proof_of_concept___cdc_w_iceberg_spark.plans import explain_str
from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load

QS = registry.queries()


def _stream(spark, sf_dir):
    return load(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").cast("double").alias("v"),
        F.md5(
            F.concat(
                F.lit("kq|"),
                F.col("l_orderkey").cast("string"),
                F.lit("|"),
                F.col("l_linenumber").cast("string"),
            )
        ).alias("h"),
    )


def _rows(df):
    return sorted((r["v"], r["h"]) for r in df.collect())


def test_kq_sample_merge_law(spark, sf_dir):
    """bottom-k is a monoid: sketching each shard then merging the
    k-row sketches equals sketching the whole stream — the property
    that lets day-level/table-level sketches combine at 100 TB
    without a re-scan (same contract as HLL register-wise max)."""
    li = load(spark, sf_dir, "lineitem")
    full = _stream(spark, sf_dir)
    shards = [
        _stream(spark, sf_dir).where(
            F.crc32(F.col("h")) % 3 == i
        )
        for i in range(3)
    ]
    merged_parts = shards[0].unionByName(shards[1]).unionByName(shards[2])
    # the shards partition the stream
    assert merged_parts.count() == li.count()
    resketched = kq_sample(
        kq_sample(shards[0])
        .unionByName(kq_sample(shards[1]))
        .unionByName(kq_sample(shards[2]))
    )
    assert _rows(resketched) == _rows(kq_sample(full))


def test_kq_sample_idempotent_and_bounded(spark, sf_dir):
    s = kq_sample(_stream(spark, sf_dir))
    assert s.count() == KQ_K
    assert _rows(kq_sample(s)) == _rows(s)


def test_kq_sample_plans_take_ordered(spark, sf_dir):
    """The sketch build must be the map-combined top-k operator (each
    task keeps a k-row heap), never a global sort + limit."""
    plan = explain_str(kq_sample(_stream(spark, sf_dir)))
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower(), (
        "sketch build plans a global range sort"
    )


def test_sketch_quantile_output_contract(spark, sf_dir):
    rows = {r["q"]: r for r in QS["q_sketch_quantile"](spark, sf_dir).collect()}
    assert set(rows) == set(KQ_TARGETS)
    for q, r in rows.items():
        # uniform k=1024 sample: ~2-3% rank error; value-space error
        # bounded loosely (exact bound depends on local density)
        assert r["rel_err"] < 0.15, (q, r)
        assert r["k_sample"] == KQ_K
        assert r["n_stream"] > r["k_sample"]
        # estimates and exacts are real order statistics of the value
        # column: both positive, est within the stream's range
        assert r["est"] > 0 and r["exact_v"] > 0
    # monotone in q — order statistics of the same sample
    qs = sorted(rows)
    ests = [rows[q]["est"] for q in qs]
    exacts = [rows[q]["exact_v"] for q in qs]
    assert ests == sorted(ests)
    assert exacts == sorted(exacts)


# --- r10-advice closures on the ExactSubstr engine -------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_substr_apply_rejects_colliding_batch(spark, tmp_path):
    """The disjoint-ids precondition is ENFORCED, not just documented
    (r10 advice): a batch reusing a corpus doc_id raises instead of
    silently emitting two report rows for that doc."""
    import pytest as _pytest

    from proof_of_concept___cdc_w_iceberg_spark.ext.dedup import (
        substr_state_apply,
        substr_state_build,
    )

    corpus = _docs(spark, [(0, "a b c d e"), (1, "f g h i j")])
    grams, hist, report = substr_state_build(corpus, w=3)
    colliding = _docs(spark, [(1, "a b c d e")])
    with _pytest.raises(ValueError, match="collide"):
        substr_state_apply(grams, hist, report, colliding, w=3)
    # opt-out for callers that guarantee disjointness themselves
    g2, h2, r2 = substr_state_apply(
        grams, hist, report, colliding, w=3, check_disjoint=False
    )
    assert r2.schema is not None  # plan builds action-free
    # and a genuinely disjoint batch passes the default guard
    ok = _docs(spark, [(100, "a b c d e")])
    _, _, r3 = substr_state_apply(grams, hist, report, ok, w=3)
    rows = {r["doc_id"]: r for r in r3.collect()}
    assert rows[0]["dup_tokens"] == 5 and rows[100]["dup_tokens"] == 5
    spark.catalog.clearCache()


def test_substr_cap_is_oracle_checked_on_degenerate_corpus(spark):
    """The stop-gram cap is now threaded into the oracle SQL (r10
    advice: the registered conformance silently depended on the
    fixture's max gram DF staying under the cap). Prove the coupling
    on a corpus where the cap FIRES: engine and DuckDB oracle must
    agree that the over-cap boilerplate header marks no spans while
    the under-cap genuine duplicate still does."""
    import duckdb

    from proof_of_concept___cdc_w_iceberg_spark.ext import dedup as dd

    n_docs, cap = 12, 5
    boiler = " ".join(f"h{i}" for i in range(dd.SUBSTR_W))
    pair = " ".join(f"p{i}" for i in range(dd.SUBSTR_W))
    rows = [
        (d, f"{boiler} {pair}" if d < 2 else
            f"{boiler} " + " ".join(f"u{d}x{i}" for i in range(dd.SUBSTR_W)))
        for d in range(n_docs)
    ]
    spark_out = sorted(
        tuple(r) for r in dd.substr_span_report(
            _docs(spark, rows), max_gram_df=cap
        ).collect()
    )

    con = duckdb.connect()
    import pandas as pd

    con.register("degen", pd.DataFrame(rows, columns=["doc_id", "text"]))
    sql = dd._substr_report_sql("SELECT doc_id, text FROM degen").replace(
        f"c <= {dd.SUBSTR_MAX_GRAM_DF}", f"c <= {cap}"
    )
    duck_out = sorted(tuple(r) for r in con.sql(sql).fetchall())
    con.close()
    assert spark_out == duck_out
    # the cap actually fired: boiler-only docs are span-free
    by_id = {t[0]: t for t in spark_out}
    assert by_id[5][2] == 0  # (doc_id, n_tokens, dup_spans, ...)
    assert by_id[0][2] >= 1
    spark.catalog.clearCache()


def _scan_output_rows(df) -> int:
    """Rows emitted by the parquet scan node of an EXECUTED DataFrame
    — with row-group pruning this is (groups read) x (rows/group),
    strictly less than the relation size when groups were skipped."""
    df.collect()
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    for i in range(leaves.size()):
        leaf = leaves.apply(i)
        if "Scan" not in leaf.nodeName():
            continue
        m = leaf.metrics()
        it = m.keys().iterator()
        while it.hasNext():
            k = it.next()
            if k == "numOutputRows":
                return m.apply(k).value()
    raise AssertionError("no scan node with numOutputRows found")


def test_substr_index_probe_prunes_row_groups(spark, sf_dir, tmp_path):
    """The at-rest layout claim as exercised code (r10 verdict item:
    the one scale claim without a measurement behind it): the sorted
    index's parquet min/max stats must let a small pushed IN probe
    skip most row groups, while the identical probe over a
    hash-shuffled layout decodes the whole relation."""
    from proof_of_concept___cdc_w_iceberg_spark.ext import dedup as dd
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    tok, _ = dd._tokenized(docs)
    grams = dd._positioned_grams(tok, dd.SUBSTR_W, False)
    total = grams.count()

    sorted_path = str(tmp_path / "idx_sorted")
    shuffled_path = str(tmp_path / "idx_shuffled")
    dd.substr_index_write(grams, sorted_path, n_files=64)
    grams.repartition(64).write.mode("overwrite").parquet(shuffled_path)

    # 3 scattered probe keys — a tiny changed set, the probe regime
    # (|changed| << |row groups|) where stats pruning can act
    keys = [
        r["gram"]
        for r in grams.select("gram").distinct().orderBy(F.crc32("gram")).limit(3).collect()
    ]
    probed = _scan_output_rows(dd.substr_index_probe(spark, sorted_path, keys))
    full = _scan_output_rows(
        spark.read.parquet(shuffled_path).filter(F.col("gram").isin(keys))
    )
    assert full == total, "shuffled layout should decode everything"
    assert probed < total * 0.5, (
        f"sorted layout decoded {probed}/{total} rows — row groups not pruned"
    )
    # the probe returns the right rows either way
    assert sorted(
        r["doc_id"] for r in dd.substr_index_probe(spark, sorted_path, keys).collect()
    ) == sorted(
        r["doc_id"]
        for r in spark.read.parquet(shuffled_path).filter(F.col("gram").isin(keys)).collect()
    )


# --- theta/KMV set-operation sketch ----------------------------------


def test_theta_sketch_union_law(spark, sf_dir):
    """Theta sketches are mergeable: sketch(A ∪ B) == re-sketch of
    (sketch(A) ∪ sketch(B)) — union-on-sketches needs no raw data."""
    from proof_of_concept___cdc_w_iceberg_spark.operators.sketches import (
        THETA_K,
        _theta_hash_sql,
        _theta_sketch,
    )
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load

    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")

    def hashes(year):
        return (
            o.filter(F.year("o_orderdate") == year)
            .select(F.col("o_custkey").alias("k"))
            .distinct()
            .select(F.expr(_theta_hash_sql("k", "STRING")).alias("h"))
        )

    a, b = hashes(1995), hashes(1996)
    direct = sorted(r["h"] for r in _theta_sketch(a.unionByName(b)).collect())
    merged = sorted(
        r["h"]
        for r in _theta_sketch(
            _theta_sketch(a).unionByName(_theta_sketch(b))
        ).collect()
    )
    assert direct == merged
    assert len(direct) <= THETA_K


def test_theta_sketch_exact_regime(spark, sf_dir):
    """Streams smaller than k: theta = full hash space and every
    estimate is EXACT — rel_err must be 0.0 on all four measures at
    sf0.001 (each year has <256 distinct customers)."""
    rows = {r["measure"]: r for r in QS["q_sketch_theta"](spark, sf_dir).collect()}
    assert set(rows) == {"distinct_a", "distinct_b", "union", "intersection"}
    for m, r in rows.items():
        assert r["rel_err"] == 0.0, (m, r)
        assert r["est"] == float(r["exact_v"]), (m, r)
    # inclusion-exclusion sanity on the exact values
    assert (
        rows["union"]["exact_v"]
        == rows["distinct_a"]["exact_v"]
        + rows["distinct_b"]["exact_v"]
        - rows["intersection"]["exact_v"]
    )


def test_theta_sketch_estimation_regime(spark):
    """Above k distinct keys the estimator engages: build a synthetic
    pair of streams with known overlap, check estimates land within
    the sketch's error budget (~4/sqrt(k) is a generous 4-sigma)."""
    from proof_of_concept___cdc_w_iceberg_spark.operators.sketches import (
        THETA_K,
        _theta_hash_sql,
        _theta_of,
        _theta_sketch,
    )

    # A = 0..3999, B = 2000..5999 -> |A|=|B|=4000, |A∩B|=2000, |A∪B|=6000
    a = spark.range(0, 4000).select(F.col("id").alias("k"))
    b = spark.range(2000, 6000).select(F.col("id").alias("k"))
    ah = a.select(F.expr(_theta_hash_sql("k", "STRING")).alias("h"))
    bh = b.select(F.expr(_theta_hash_sql("k", "STRING")).alias("h"))
    sk_a, sk_b = _theta_sketch(ah), _theta_sketch(bh)
    theta_a = _theta_of(sk_a).first()["theta"]
    theta_b = _theta_of(sk_b).first()["theta"]
    assert theta_a < (1 << 32) and theta_b < (1 << 32)
    theta_u = min(theta_a, theta_b)
    space = float(1 << 32)
    tol = 4.0 / (THETA_K ** 0.5)  # ~25% at k=256
    n_a = sk_a.filter(F.col("h") < theta_a).count()
    est_a = n_a * space / theta_a
    assert abs(est_a - 4000) / 4000 < tol
    inter = sk_a.join(sk_b, "h").filter(F.col("h") < theta_u).count()
    est_i = inter * space / theta_u
    assert abs(est_i - 2000) / 2000 < tol


# --- NN-Descent graph-ANN refinement ----------------------------------


def _exact_knn_edges(spark, sf_dir, k):
    import numpy as np

    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load as _load

    rows = _load(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = [int(r["vec_id"]) for r in rows]
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    np.fill_diagonal(sims, -2.0)
    exact = set()
    for i in range(len(ids)):
        # same ordering contract as the operators: cosine desc, id asc
        order = sorted(range(len(ids)), key=lambda j: (-sims[i, j], ids[j]))
        for j in order[:k]:
            exact.add((ids[i], ids[j]))
    return exact


def test_nn_descent_recall_monotone_and_cross_cell(spark, sf_dir):
    """One NN-Descent round must (a) never lose recall vs the blocked
    graph — its candidate pool is a superset, so a kept exact edge is
    displaced only by strictly closer neighbors — and (b) reach
    cross-cell edges, which label-blocking structurally cannot
    (measured r11: recall 0.088 → 0.150, cross-cell edges 0 → 640 at
    sf0.001)."""
    from proof_of_concept___cdc_w_iceberg_spark.ext.similarity import KNN_K
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load as _load

    blocked = {
        (r["src"], r["dst"]) for r in QS["q_knn_graph"](spark, sf_dir).collect()
    }
    rows = QS["q_knn_graph_descent"](spark, sf_dir).collect()
    spark.catalog.clearCache()
    descent = {(r["src"], r["dst"]) for r in rows}

    per_src = {}
    for r in rows:
        per_src[r["src"]] = per_src.get(r["src"], 0) + 1
    assert all(v == KNN_K for v in per_src.values())

    exact = _exact_knn_edges(spark, sf_dir, KNN_K)
    recall_b = len(blocked & exact) / len(exact)
    recall_d = len(descent & exact) / len(exact)
    assert recall_d >= recall_b, (recall_d, recall_b)
    assert recall_d > recall_b, "descent round found no new exact edges"

    labels = {
        r["vec_id"]: r["label"]
        for r in _load(spark, sf_dir, "embeddings").select("vec_id", "label").collect()
    }
    assert all(labels[a] == labels[b] for a, b in blocked)
    assert any(labels[a] != labels[b] for a, b in descent), (
        "no cross-cell edge discovered"
    )


def test_nn_descent_candidates_bounded(spark, sf_dir):
    """The per-node candidate pool after one round is bounded by the
    (2·(K+R))² closure constant — the property that makes the round
    O(N) at any corpus size."""
    from proof_of_concept___cdc_w_iceberg_spark.ext.ann import (
        NND_R,
        nnd_candidate_pairs,
    )
    from proof_of_concept___cdc_w_iceberg_spark.ext.similarity import KNN_K, _sqnorm
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load as _load

    e = _load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding", _sqnorm(F.col("embedding")).alias("sq")
    )
    pairs = nnd_candidate_pairs(e, e.count())
    cap = (2 * (KNN_K + NND_R)) ** 2
    worst = (
        pairs.groupBy("src").count().agg(F.max("count").alias("mx")).first()["mx"]
    )
    assert worst <= cap, (worst, cap)


# --- streaming sketch maintenance -------------------------------------


def test_stream_sketch_split_invariance(spark, sf_dir):
    """The maintained sketch state must be independent of HOW the
    stream was micro-batched (merge-law corollary): two different
    batchings and the one-shot build all yield the identical k-row
    state."""
    from proof_of_concept___cdc_w_iceberg_spark.operators.sketches import kq_sample
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load as _load

    ev = _load(spark, sf_dir, "events").select(
        F.col("value").cast("double").alias("v"),
        F.md5(F.concat(F.lit("skq|"), F.col("event_id").cast("string"))).alias("h"),
        "event_id",
    )
    k = 256

    def maintained(splits):
        state = ev.select("v", "h").limit(0)
        for lo, hi in splits:
            batch = ev.filter(F.col("event_id").between(lo, hi)).select("v", "h")
            state = kq_sample(
                state.unionByName(kq_sample(batch, k=k)), k=k
            ).localCheckpoint(eager=True)
        return sorted((r["v"], r["h"]) for r in state.collect())

    one_shot = sorted(
        (r["v"], r["h"]) for r in kq_sample(ev.select("v", "h"), k=k).collect()
    )
    assert maintained([(0, 300), (301, 700), (701, 10_000_000)]) == one_shot
    assert maintained([(0, 100), (101, 10_000_000)]) == one_shot
    spark.catalog.clearCache()


def test_stream_sketch_live_readstream_twin(spark, sf_dir):
    """q_stream_sketch's docstring contract: the SAME state transition
    under a real readStream + foreachBatch (multiple micro-batches via
    maxFilesPerTrigger) ends with the identical k-row sketch state as
    the one-shot build."""
    import shutil
    import tempfile

    from proof_of_concept___cdc_w_iceberg_spark.operators.sketches import kq_sample
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load as _load

    ev = _load(spark, sf_dir, "events").select(
        F.col("value").cast("double").alias("v"),
        F.md5(F.concat(F.lit("skq|"), F.col("event_id").cast("string"))).alias("h"),
        "event_id",
    )
    k = 256
    src = tempfile.mkdtemp(prefix="stream_sketch_")
    try:
        ev.withColumn("_b", (F.col("event_id") % 3).cast("int")).write.partitionBy(
            "_b"
        ).mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema("v double, h string")
            .option("maxFilesPerTrigger", 2)
            .parquet(src + "/_b=*")
        )
        holder = {"state": ev.select("v", "h").limit(0), "batches": 0}

        def step(batch_df, _bid):
            holder["state"] = kq_sample(
                holder["state"].unionByName(kq_sample(batch_df, k=k)), k=k
            ).localCheckpoint(eager=True)
            holder["batches"] += 1

        q = (
            stream.writeStream.foreachBatch(step)
            .trigger(availableNow=True)
            .option("checkpointLocation", src + "_ckpt")
            .start()
        )
        q.awaitTermination(300)
        assert holder["batches"] >= 2, "stream collapsed to one micro-batch"
        got = sorted((r["v"], r["h"]) for r in holder["state"].collect())
        want = sorted(
            (r["v"], r["h"]) for r in kq_sample(ev.select("v", "h"), k=k).collect()
        )
        assert got == want
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(src + "_ckpt", ignore_errors=True)
    spark.catalog.clearCache()


# --- property-based laws for the r11 sketches -------------------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _keys_strategy = st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=60,
        unique=True,
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow,
            HealthCheck.function_scoped_fixture,
        ],
    )
    @given(keys=_keys_strategy, n_shards=st.integers(min_value=1, max_value=4), k=st.sampled_from([1, 3, 8]))
    def test_kq_sample_merge_law_property(spark, keys, n_shards, k):
        """bottom-k(∪ shards) == bottom-k(∪ bottom-k(shard)) for ANY
        key set, ANY sharding, ANY k — including k larger than the
        stream (degenerate sketch = the stream itself)."""
        from proof_of_concept___cdc_w_iceberg_spark.operators.sketches import kq_sample

        df = spark.createDataFrame(
            [(float(x), f"h{x:06d}") for x in keys], "v double, h string"
        )
        shards = [df.filter(F.crc32("h") % n_shards == i) for i in range(n_shards)]
        merged = shards[0]
        for s in shards[1:]:
            merged = merged.unionByName(s)
        resketch = shards[0].limit(0)
        for s in shards:
            resketch = resketch.unionByName(kq_sample(s, k=k))
        got = sorted((r["v"], r["h"]) for r in kq_sample(resketch, k=k).collect())
        want = sorted((r["v"], r["h"]) for r in kq_sample(merged, k=k).collect())
        assert got == want

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow,
            HealthCheck.function_scoped_fixture,
        ],
    )
    @given(
        a_keys=st.lists(st.integers(0, 400), min_size=1, max_size=40, unique=True),
        b_keys=st.lists(st.integers(0, 400), min_size=1, max_size=40, unique=True),
    )
    def test_theta_exact_regime_property(spark, a_keys, b_keys):
        """Below-k streams: the theta estimates equal the true distinct
        counts EXACTLY — for any pair of key sets, including disjoint,
        nested, and identical ones."""
        from proof_of_concept___cdc_w_iceberg_spark.operators.sketches import (
            THETA_K,
            _theta_hash_sql,
            _theta_of,
            _theta_sketch,
        )

        assert len(a_keys) < THETA_K and len(b_keys) < THETA_K

        def sketch(keys):
            df = spark.createDataFrame([(x,) for x in keys], "k long")
            return _theta_sketch(
                df.select(F.expr(_theta_hash_sql("k", "STRING")).alias("h"))
            )

        sk_a, sk_b = sketch(a_keys), sketch(b_keys)
        th_a = _theta_of(sk_a).first()["theta"]
        th_b = _theta_of(sk_b).first()["theta"]
        assert th_a == (1 << 32) and th_b == (1 << 32)
        space = float(1 << 32)
        est_a = sk_a.count() * space / th_a
        est_i = sk_a.join(sk_b, "h").count() * space / min(th_a, th_b)
        assert est_a == len(set(a_keys))
        assert est_i == len(set(a_keys) & set(b_keys))

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


# --- per-group quantile sketch ----------------------------------------


def test_grouped_sketch_single_exchange_plan(spark, sf_dir):
    """The grouped sketch's scale claim as a plan gate: ONE parquet
    scan and ONE Exchange on the group key feed all four windows and
    the pivot read-out (the final (grp, q) aggregate is satisfied by
    the grp partitioning — grp is a subset of its keys)."""
    import re

    plan = explain_str(QS["q_sketch_quantile_grouped"](spark, sf_dir))
    # the formatted explain names each node in the tree AND in the
    # details section — count detail entries, one per physical node
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"hashpartitioning\(grp", plan)) >= 1
    assert "SinglePartition" not in plan


def test_grouped_sketch_output_contract(spark, sf_dir):
    from proof_of_concept___cdc_w_iceberg_spark.operators.sketches import (
        KQG_K,
        KQG_TARGETS,
    )

    rows = QS["q_sketch_quantile_grouped"](spark, sf_dir).collect()
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r["grp"], []).append(r)
    # every group reports every target
    for grp, rs in by_grp.items():
        assert sorted(r["q"] for r in rs) == sorted(KQG_TARGETS)
        for r in rs:
            assert r["k_sample"] == min(KQG_K, r["n_group"])
            assert r["est"] > 0 and r["exact_v"] > 0
            assert r["rel_err"] < 0.25, (grp, r)


def test_grouped_sketch_per_group_merge_law(spark, sf_dir):
    """The per-group sample is the bottom-k of each group's hashes —
    so per-group sketches of two arbitrary shards re-sketch to the
    whole group's sketch (the same monoid as the global sketch, one
    instance per group)."""
    from proof_of_concept___cdc_w_iceberg_spark.operators.sketches import KQG_K
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load as _load

    o = _load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.md5(F.concat(F.lit("kqg|"), F.col("o_orderkey").cast("string"))).alias("h"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy("h")

    def sketch(df):
        return (
            df.withColumn("hr", F.row_number().over(w))
            .filter(F.col("hr") <= KQG_K)
            .select("grp", "h")
        )

    full = sorted((r["grp"], r["h"]) for r in sketch(o).collect())
    shards = [o.filter(F.crc32("h") % 2 == i) for i in range(2)]
    merged = sorted(
        (r["grp"], r["h"])
        for r in sketch(sketch(shards[0]).unionByName(sketch(shards[1]))).collect()
    )
    assert merged == full
