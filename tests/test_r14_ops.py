"""Round-14 additions: the ANN deletion rung (r13 verdict item 3 —
delete-apply == rebuild, closing the insert-only boundary), the mixed
insert+delete streaming upsert twin, and their structural properties.
The bench calibration probe and registry fingerprint tests live in
test_bench_contract.py / test_registry_order.py.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from proof_of_concept___cdc_w_iceberg_spark.registry import oracles, queries

QS = queries()
OS = oracles()


def _graph_rows(df):
    return sorted(
        (r["src"], r["dst"], r["cosine"], r["rn"]) for r in df.collect()
    )


def _assert_graph_matches(spark, got_df, duck, oracle_sql):
    got = _graph_rows(got_df)
    spark.catalog.clearCache()
    want = sorted(
        (int(s), int(d), float(c), int(rn))
        for s, d, c, rn in duck.sql(oracle_sql).fetchall()
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1] and g[3] == w[3], (g, w)
        assert g[2] == pytest.approx(w[2], abs=1e-9), (g, w)


def test_knn_graph_delete_matches_rebuild(spark, sf_dir, duck):
    """Pre-validates the driver hash check for q_knn_graph_delete: the
    maintained graph after a scattered ~9% delete batch equals the
    DuckDB rebuild over corpus ∖ deletes, row for row, at sf0.001."""
    _assert_graph_matches(
        spark, QS["q_knn_graph_delete"](spark, sf_dir), duck,
        OS["q_knn_graph_delete"],
    )


def test_knn_graph_delete_structure(spark, sf_dir):
    """Structural laws of delete-apply, independent of the oracle:
    (a) no deleted id survives as src OR dst; (b) survivors whose
    carried top-k referenced a deleted node got REPLACEMENT edges (k
    edges again wherever their surviving cell allows), i.e. the apply
    did not just drop dead edges; (c) rn is dense 1..deg per src."""
    from proof_of_concept___cdc_w_iceberg_spark.ext.ann import (
        knn_graph_delete_apply,
        knn_graph_state,
    )
    from proof_of_concept___cdc_w_iceberg_spark.ext.similarity import KNN_K, _sqnorm
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding", _sqnorm(F.col("embedding")).alias("sq")
    )
    state = knn_graph_state(e).localCheckpoint(eager=True)
    dels = e.filter(F.col("vec_id") % 11 == 3).select("vec_id")
    surv = e.filter(F.col("vec_id") % 11 != 3)
    out = knn_graph_delete_apply(state, surv, dels).localCheckpoint(eager=True)

    del_ids = {r["vec_id"] for r in dels.collect()}
    assert del_ids, "fixture must contain deletable ids"
    rows = out.collect()
    assert not {r["src"] for r in rows} & del_ids
    assert not {r["dst"] for r in rows} & del_ids

    # (b) broken nodes regain full degree where the cell allows it.
    broken = {
        r["src"]
        for r in state.collect()
        if r["dst"] in del_ids and r["src"] not in del_ids
    }
    assert broken, "a ~9% scattered delete must break someone's top-k"
    cell_sizes = {
        r["label"]: r["n"]
        for r in surv.groupBy("label").agg(F.count("*").alias("n")).collect()
    }
    label_of = {r["vec_id"]: r["label"] for r in surv.collect()}
    deg = {}
    for r in rows:
        deg[r["src"]] = deg.get(r["src"], 0) + 1
    for src in broken:
        expect = min(KNN_K, cell_sizes[label_of[src]] - 1)
        assert deg.get(src, 0) == expect, (src, deg.get(src), expect)

    # (c) dense ranks per src.
    per_src = {}
    for r in rows:
        per_src.setdefault(r["src"], []).append(r["rn"])
    for src, rns in per_src.items():
        assert sorted(rns) == list(range(1, len(rns) + 1)), src
    spark.catalog.clearCache()


def test_stream_knn_graph_upsert_matches_rebuild(spark, sf_dir, duck):
    """Pre-validates the driver hash check for q_stream_knn_graph_upsert:
    three micro-batches with interleaved deletes and inserts converge
    to the one-shot rebuild over the final survivor set — the full
    delete∘insert apply == rebuild law under multi-batch arrival."""
    _assert_graph_matches(
        spark, QS["q_stream_knn_graph_upsert"](spark, sf_dir), duck,
        OS["q_stream_knn_graph_upsert"],
    )


def test_delete_then_insert_same_cell_composition(spark, sf_dir):
    """The mixed-batch composition argument (module comment in
    ext/ann.py): delete and insert applied to the SAME cells in one
    batch equals the rebuild — exercised directly, not via the
    registered three-batch split, with the insert REPLAYING some
    deleted vectors under new ids (so a replacement edge must point at
    a re-inserted duplicate at cosine 1.0 wherever a node's nearest
    neighbor was deleted and replayed)."""
    from proof_of_concept___cdc_w_iceberg_spark.ext.ann import (
        knn_graph_apply,
        knn_graph_delete_apply,
        knn_graph_state,
        _knn_topk,
        _knn_scored,
    )
    from proof_of_concept___cdc_w_iceberg_spark.ext.similarity import _sqnorm
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding", _sqnorm(F.col("embedding")).alias("sq")
    )
    state = knn_graph_state(e).localCheckpoint(eager=True)
    del_cond = F.col("vec_id") % 5 == 0
    dels = e.filter(del_cond).select("vec_id")
    surv = e.filter(~del_cond)
    # Replay every 10th vector (a subset of the deleted ones) under a
    # fresh id: its old nearest-neighbors must pick the clone back up.
    batch = e.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "label", "embedding", "sq"
    )
    got = knn_graph_apply(
        knn_graph_delete_apply(state, surv, dels), surv, batch
    )
    want = _knn_topk(_knn_scored(surv.unionByName(batch), surv.unionByName(batch)))
    got_rows = _graph_rows(got)
    assert got_rows == _graph_rows(want)
    # And at least one survivor's edge list contains a replayed clone.
    assert any(d >= 1_000_000 for _s, d, _c, _rn in got_rows)
    spark.catalog.clearCache()


def test_sketch_cms_rollup_matches_oracle_and_merge_law(spark, sf_dir, duck):
    """Pre-validates the driver hash check for q_sketch_cms_rollup at
    sf0.001, and asserts the merge law structurally: the Spark-side
    'total' grid (cell-wise SUM of the per-year leaves) equals a
    one-shot grid built directly from the whole stream."""
    got = sorted(
        (r["g"], r["k"], r["est_cnt"], r["exact_cnt"])
        for r in QS["q_sketch_cms_rollup"](spark, sf_dir).collect()
    )
    want = sorted(
        (g, int(k), int(e), int(x))
        for g, k, e, x in duck.sql(OS["q_sketch_cms_rollup"]).fetchall()
    )
    assert got == want
    groups = {g for g, *_ in got}
    assert "total" in groups and len(groups) >= 3
    # per-group top-N contract: every group emits <= CMS_ROLLUP_TOPN
    # rows and est >= exact (CMS overestimates, never under).
    from collections import Counter

    from proof_of_concept___cdc_w_iceberg_spark.operators.sketches import (
        CMS_ROLLUP_TOPN,
        cms_cell_exprs,
        cms_sketch,
    )

    per_g = Counter(g for g, *_ in got)
    assert all(n <= CMS_ROLLUP_TOPN for n in per_g.values())
    assert all(e >= x for _g, _k, e, x in got)

    # merge law on the grids themselves
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load

    li = load(spark, sf_dir, "lineitem").select(
        F.year("l_shipdate").cast("string").alias("g"),
        F.col("l_suppkey").alias("k"),
    )
    leaf = (
        li.select("g", F.posexplode(F.array(*cms_cell_exprs())).alias("r", "c"))
        .groupBy("g", "r", "c")
        .agg(F.count("*").alias("cnt"))
    )
    merged = sorted(
        (r["r"], r["c"], r["cnt"])
        for r in leaf.groupBy("r", "c").agg(F.sum("cnt").alias("cnt")).collect()
    )
    one_shot = sorted(
        (r["r"], r["c"], r["cnt"]) for r in cms_sketch(li.select("k")).collect()
    )
    assert merged == one_shot
    spark.catalog.clearCache()


def test_sketch_bloom_rollup_matches_oracle_and_merge_law(spark, sf_dir, duck):
    """Pre-validates the driver hash check for q_sketch_bloom_rollup
    at sf0.001, and asserts the OR-merge law structurally: the merged
    total position set equals the one-shot set over the whole dim."""
    got = sorted(tuple(r) for r in QS["q_sketch_bloom_rollup"](spark, sf_dir).collect())
    want = sorted(
        (g, int(nk), int(np_), int(ns), int(ne))
        for g, nk, np_, ns, ne in duck.sql(OS["q_sketch_bloom_rollup"]).fetchall()
    )
    assert got == want
    rows = {g: (nk, np_, ns, ne) for g, nk, np_, ns, ne in got}
    assert "total" in rows and len(rows) >= 4
    for g, (nk, np_, ns, ne) in rows.items():
        assert ns >= ne, (g, "bloom must never reject a qualifying order")
        assert np_ <= 3 * nk  # k hashes per key, distinct
    # total filter ⊇ every leaf filter; survived(total) >= survived(leaf)
    assert all(rows["total"][1] >= v[1] for v in rows.values())

    from proof_of_concept___cdc_w_iceberg_spark.operators.sketches import (
        bloom_positions,
    )
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load

    c = load(spark, sf_dir, "customer")
    one_shot = {
        r["pos"]
        for r in bloom_positions(c.select("c_custkey"), "c_custkey").collect()
    }
    merged = set()
    for seg in [r["c_mktsegment"] for r in c.select("c_mktsegment").distinct().collect()]:
        merged |= {
            r["pos"]
            for r in bloom_positions(
                c.filter(F.col("c_mktsegment") == seg).select("c_custkey"),
                "c_custkey",
            ).collect()
        }
    assert merged == one_shot
    spark.catalog.clearCache()


def test_sketch_theta_rollup_matches_oracle_and_merge_law(spark, sf_dir, duck):
    """Pre-validates the driver hash check for q_sketch_theta_rollup
    at sf0.001, and asserts the KMV merge law structurally: bottom-k
    distinct hashes of the merged leaves == one-shot bottom-k."""
    got = sorted(tuple(r) for r in QS["q_sketch_theta_rollup"](spark, sf_dir).collect())
    want = sorted(
        (g, float(e), int(x), None if r is None else float(r))
        for g, e, x, r in duck.sql(OS["q_sketch_theta_rollup"]).fetchall()
    )
    assert len(got) == len(want) and {g for g, *_ in got} >= {"total"}
    for a, b in zip(got, want):
        assert a[0] == b[0] and a[2] == b[2], (a, b)
        assert a[1] == pytest.approx(b[1], abs=1e-9)

    from pyspark.sql import Window as W

    from proof_of_concept___cdc_w_iceberg_spark.operators.sketches import (
        THETA_K,
        _theta_hash_sql,
        _theta_sketch,
    )
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load

    o = load(spark, sf_dir, "orders").select(
        F.year("o_orderdate").cast("string").alias("g"),
        F.col("o_custkey").alias("k"),
    )
    hashes = o.select("g", F.expr(_theta_hash_sql("k", "STRING")).alias("h")).distinct()
    leaf = (
        hashes.withColumn("rn", F.row_number().over(W.partitionBy("g").orderBy("h")))
        .filter(F.col("rn") <= THETA_K)
        .select("h")
    )
    merged = sorted(r["h"] for r in _theta_sketch(leaf).collect())
    one_shot = sorted(
        r["h"] for r in _theta_sketch(hashes.select("h")).collect()
    )
    assert merged == one_shot
    spark.catalog.clearCache()


def test_sketch_quantile_rollup_matches_oracle_and_merge_law(spark, sf_dir, duck):
    """Pre-validates the driver hash check for q_sketch_quantile_rollup
    at sf0.001, and asserts the sample-merge law: bottom-k-by-hash of
    the merged per-year samples == the one-shot sample."""
    got = sorted(
        (r["g"], r["q"], r["est"], r["exact_v"], r["rel_err"], r["k_sample"], r["n_group"])
        for r in QS["q_sketch_quantile_rollup"](spark, sf_dir).collect()
    )
    want = sorted(
        (g, float(q), float(e), float(x), float(rr), int(ks), int(n))
        for g, q, e, x, rr, ks, n in duck.sql(OS["q_sketch_quantile_rollup"]).fetchall()
    )
    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert a[0] == b[0] and a[1] == b[1] and a[5] == b[5] and a[6] == b[6], (a, b)
        assert a[2] == pytest.approx(b[2], abs=1e-9)
        assert a[3] == pytest.approx(b[3], abs=1e-9)
    # every grain present, estimates within the sample's error regime
    assert {g for g, *_ in got} >= {"total"}

    from pyspark.sql import Window as W

    from proof_of_concept___cdc_w_iceberg_spark.operators.sketches import (
        KQR_K,
        kq_sample,
    )
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load

    o = load(spark, sf_dir, "orders").select(
        F.year("o_orderdate").cast("string").alias("g"),
        F.col("o_totalprice").cast("double").alias("v"),
        F.md5(F.concat(F.lit("kqr|"), F.col("o_orderkey").cast("string"))).alias("h"),
    )
    leaf = (
        o.withColumn("rn", F.row_number().over(W.partitionBy("g").orderBy("h")))
        .filter(F.col("rn") <= KQR_K)
        .select("v", "h")
    )
    merged = sorted((r["v"], r["h"]) for r in kq_sample(leaf, k=KQR_K).collect())
    one_shot = sorted(
        (r["v"], r["h"]) for r in kq_sample(o.select("v", "h"), k=KQR_K).collect()
    )
    assert merged == one_shot
    spark.catalog.clearCache()


def test_cms_retract_grid_equals_net_rebuild(spark, sf_dir, duck):
    """The turnstile law on the grid itself: insert∘delete signed-sum
    maintenance equals the one-shot grid over the net survivor stream
    row for row — and the retractions actually bite (the maintained
    grid differs from the no-delete grid). Also pre-validates the
    registered read-out against its DuckDB oracle at sf0.001."""
    from proof_of_concept___cdc_w_iceberg_spark.operators.sketches import cms_sketch
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load
    from proof_of_concept___cdc_w_iceberg_spark.streaming.queries import (
        cms_retract_apply,
    )

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("k"), "l_orderkey"
    )
    from proof_of_concept___cdc_w_iceberg_spark.operators.sketches import (
        cms_empty_grid,
    )

    empty = cms_empty_grid(li)
    ins1 = li.filter(F.col("l_orderkey") <= 20_000).select("k")
    ins2 = li.filter(F.col("l_orderkey") > 20_000).select("k")
    del2 = li.filter(
        (F.col("l_orderkey") <= 20_000) & (F.col("l_orderkey") % 7 == 3)
    ).select("k")
    none = li.select("k").limit(0)
    state = cms_retract_apply(cms_retract_apply(empty, ins1, none), ins2, del2)
    got = sorted(tuple(r) for r in state.collect())
    net = li.filter(
        ~((F.col("l_orderkey") <= 20_000) & (F.col("l_orderkey") % 7 == 3))
    ).select("k")
    want = sorted(tuple(r) for r in cms_sketch(net).collect())
    assert got == want
    undeleted = sorted(tuple(r) for r in cms_sketch(li.select("k")).collect())
    assert got != undeleted, "delete batch retracted nothing"

    got_ro = sorted(
        tuple(r) for r in QS["q_stream_cms_retract"](spark, sf_dir).collect()
    )
    want_ro = sorted(
        (int(k), int(e), int(x))
        for k, e, x in duck.sql(OS["q_stream_cms_retract"]).fetchall()
    )
    assert got_ro == want_ro
    spark.catalog.clearCache()


def test_cms_retract_live_changelog_readstream_twin(spark, sf_dir):
    """The retraction twin under a REAL changelog stream: insert and
    delete events interleave in arbitrary micro-batches through
    readStream + foreachBatch, and the final grid equals the one-shot
    build over the net survivors — deletes may even arrive before
    their inserts (cells go transiently negative), because signed
    sums commute; the group structure makes arrival order irrelevant."""
    import shutil
    import tempfile

    from proof_of_concept___cdc_w_iceberg_spark.operators.sketches import cms_sketch
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load
    from proof_of_concept___cdc_w_iceberg_spark.streaming.queries import (
        cms_retract_apply,
    )

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("k"), "l_orderkey"
    )
    retracted = (F.col("l_orderkey") % 7 == 3)
    changelog = li.select("k", "l_orderkey", F.lit("c").alias("op")).unionByName(
        li.filter(retracted).select("k", "l_orderkey", F.lit("d").alias("op"))
    )
    src = tempfile.mkdtemp(prefix="cms_retract_")
    try:
        # Batch by a key UNRELATED to op, so inserts and deletes of the
        # same row can land in any order across micro-batches.
        changelog.withColumn(
            "_b", (F.col("l_orderkey") % 3).cast("int")
        ).drop("l_orderkey").write.partitionBy("_b").mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(spark.read.parquet(src + "/_b=*").schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src + "/_b=*")
        )
        from proof_of_concept___cdc_w_iceberg_spark.operators.sketches import (
            cms_empty_grid,
        )

        empty = cms_empty_grid(li)
        holder = {"state": empty, "batches": 0}

        def step(batch_df, _bid):
            b = batch_df.localCheckpoint(eager=True)
            holder["state"] = cms_retract_apply(
                holder["state"],
                b.filter(F.col("op") == "c").select("k"),
                b.filter(F.col("op") == "d").select("k"),
            )
            holder["batches"] += 1

        q = (
            stream.writeStream.foreachBatch(step)
            .trigger(availableNow=True)
            .option("checkpointLocation", src + "_ckpt")
            .start()
        )
        q.awaitTermination(300)
        assert holder["batches"] >= 2, "stream collapsed to one micro-batch"
        got = sorted(tuple(r) for r in holder["state"].collect())
        want = sorted(
            tuple(r) for r in cms_sketch(li.filter(~retracted).select("k")).collect()
        )
        assert got == want
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(src + "_ckpt", ignore_errors=True)
    spark.catalog.clearCache()


def test_cms_retract_order_insensitive(spark):
    """Group commutativity on a synthetic changelog: any batch
    arrangement of the same insert/delete events converges to the
    rebuild over net survivors, including a delete arriving BEFORE its
    insert and a key whose rows fully retract (its cells drop unless
    shared by collision)."""
    from proof_of_concept___cdc_w_iceberg_spark.operators.sketches import cms_sketch
    from proof_of_concept___cdc_w_iceberg_spark.streaming.queries import (
        cms_retract_apply,
    )

    rows = [(k, op) for k in range(1, 9) for op in ["c"] * (k % 3 + 1)]
    dels = [(k, "d") for k in (2, 5, 8) for _ in range(k % 3 + 1)]  # full retract
    log = spark.createDataFrame(rows + dels, "k long, op string")
    net = spark.createDataFrame(
        [(k,) for k, op in rows if k not in (2, 5, 8)], "k long"
    )
    from proof_of_concept___cdc_w_iceberg_spark.operators.sketches import (
        cms_empty_grid,
    )

    empty = cms_empty_grid(log)
    want = sorted(tuple(r) for r in cms_sketch(net).collect())

    import itertools

    splits = [F.col("k") % 3 == i for i in range(3)]
    for order in itertools.permutations(range(3)):
        state = empty
        for i in order:
            b = log.filter(splits[i])
            state = cms_retract_apply(
                state,
                b.filter(F.col("op") == "c").select("k"),
                b.filter(F.col("op") == "d").select("k"),
            )
        got = sorted(tuple(r) for r in state.collect())
        assert got == want, order
    spark.catalog.clearCache()


@pytest.mark.parametrize("name", ["q_sim_ivf", "q_sim_lsh"])
def test_sim_ann_graduated_to_oracle(spark, sf_dir, duck, name):
    """q_sim_ivf / q_sim_lsh graduated from rows-only to hash-checked
    in r14 (decimal-sum centroids / literal-embedded hyperplanes):
    pre-validates the driver hash check at sf0.001. 'Approximate by
    design' constrains recall, not determinism."""
    got = sorted(
        (r["query_id"], r["cand_id"], r["cosine"])
        for r in QS[name](spark, sf_dir).collect()
    )
    spark.catalog.clearCache()
    want = sorted(
        (int(q), int(c), float(cos)) for q, c, cos in duck.sql(OS[name]).fetchall()
    )
    assert len(got) == len(want) and len(got) > 0
    for a, b in zip(got, want):
        assert a[0] == b[0] and a[1] == b[1], (name, a, b)
        assert a[2] == pytest.approx(b[2], abs=1e-9)


def test_knn_cell_stream_durable_state_restart(spark, sf_dir):
    """The durable-state form of the kNN-graph IVM (r13 verdict item
    7): the graph lives in the checkpointed state store keyed by cell,
    so it SURVIVES a query stop + restart — phase 1 streams part of
    the corpus and stops; more files land; phase 2 is a NEW query on
    the SAME checkpoint that processes only the new batches. The final
    latest-emission-per-cell graph must equal the one-shot Spark build
    BIT-EXACTLY (the state fn replays _dot's sequential fold), which
    is only possible if phase 2 restored phase 1's members and carried
    edges from the store rather than restarting empty."""
    import shutil
    import tempfile

    from proof_of_concept___cdc_w_iceberg_spark import registry
    from proof_of_concept___cdc_w_iceberg_spark.ext.ann import knn_graph_state
    from proof_of_concept___cdc_w_iceberg_spark.ext.similarity import KNN_K, _sqnorm
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load
    from proof_of_concept___cdc_w_iceberg_spark.streaming.stateful import (
        knn_cell_stream,
    )

    # r14 advice + r15 review: k is a closure-bound default from the
    # module-LEAF copy (worker unpickle must not drag the registration
    # chain); knn_cell_stream asserts the pairing at wiring time, and
    # this pins it at test time too.
    from proof_of_concept___cdc_w_iceberg_spark.streaming.stateful import (
        KNN_K_DEFAULT,
        knn_cell_state_fn,
    )

    assert knn_cell_state_fn.__defaults__ == (KNN_K_DEFAULT,)
    assert KNN_K_DEFAULT == KNN_K
    registry._ship_package(spark)  # state fn unpickles on workers

    e = load(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    src = tempfile.mkdtemp(prefix="knn_durable_")
    ckpt = src + "_ckpt"
    latest: dict[int, list] = {}
    phase_batches = []

    def run_stream():
        stream = (
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def step(batch_df, _bid):
            for lbl, rows in _group_by_label(batch_df.collect()).items():
                latest[lbl] = rows
            phase_batches.append(_bid)

        q = (
            knn_cell_stream(stream)
            .writeStream.outputMode("update")
            .foreachBatch(step)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(300)

    def _group_by_label(rows):
        by = {}
        for r in rows:
            by.setdefault(r["label"], []).append(
                (r["src"], r["dst"], r["cosine"], r["rn"])
            )
        return by

    try:
        # Phase 1: two-thirds of the corpus, two files.
        e.filter(F.col("vec_id") % 3 == 0).repartition(1).write.mode(
            "append"
        ).parquet(src)
        e.filter(F.col("vec_id") % 3 == 1).repartition(1).write.mode(
            "append"
        ).parquet(src)
        run_stream()
        n_phase1 = len(phase_batches)
        assert n_phase1 >= 2, "phase 1 collapsed to one micro-batch"

        # Phase 2: the rest lands as a new file; NEW query, SAME ckpt.
        e.filter(F.col("vec_id") % 3 == 2).repartition(1).write.mode(
            "append"
        ).parquet(src)
        run_stream()
        assert len(phase_batches) > n_phase1, "restart processed nothing"

        got = sorted(t for rows in latest.values() for t in rows)
        want = sorted(
            (r["src"], r["dst"], r["cosine"], r["rn"])
            for r in knn_graph_state(
                e.select(
                    "vec_id", "label", "embedding",
                    _sqnorm(F.col("embedding")).alias("sq"),
                )
            ).collect()
        )
        assert got == want  # bit-exact, including cosines
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    spark.catalog.clearCache()
