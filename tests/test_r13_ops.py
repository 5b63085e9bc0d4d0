"""Round-13 additions: the iterated NN-Descent property test its r12
docstring promised (recall monotone over rounds, localCheckpoint branch
exercised), the registered 2-round descent query, the streaming
sketch-maintenance column (theta/CMS/HLL/Bloom apply == rebuild, each
with a live readStream twin), the HLL rollup merge law, the incremental
kNN-graph apply==rebuild law, and the chunked-isin probe regression.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from proof_of_concept___cdc_w_iceberg_spark.registry import oracles, queries

QS = queries()
OS = oracles()


def test_substr_index_probe_chunked_large_keyset(spark, tmp_path):
    """r12 advice: the probe predicate must stay shallow (balanced Or
    of <=10-key isin chunks) so a thousand-key probe neither degrades
    Catalyst analysis nor risks JVM stack overflow — and stays
    key-exact at any probe size."""
    from proof_of_concept___cdc_w_iceberg_spark.ext import dedup as dd

    grams = spark.range(0, 20_000).select(
        F.concat(F.lit("g"), F.format_string("%06d", F.col("id"))).alias("gram"),
        F.col("id").alias("doc_id"),
        F.lit(0).alias("start"),
    )
    path = str(tmp_path / "idx")
    dd.substr_index_write(grams, path, n_files=8)

    keys = [f"g{i:06d}" for i in range(0, 20_000, 17)]  # 1177 scattered keys
    got = dd.substr_index_probe(spark, path, keys)
    # Predicate depth: a balanced tree over ceil(1177/10)=118 chunks is
    # ~7 Or levels; the old left-fold was 1176 deep. Walk the Catalyst
    # tree of the Filter node's CONDITION and measure Or-nesting
    # directly (r13 advice: counting parens over the whole plan string
    # was brittle — any unrelated nested expression or print-format
    # change could flip it).
    def _kids(tree_node):
        kids = tree_node.children()
        return [kids.apply(i) for i in range(kids.size())]

    def _or_depth(expr) -> int:
        cls = expr.getClass().getSimpleName()
        best = max((_or_depth(k) for k in _kids(expr)), default=0)
        return best + (1 if cls == "Or" else 0)

    def _filters(node):
        if node.getClass().getSimpleName() == "Filter":
            yield node.condition()
        for k in _kids(node):
            yield from _filters(k)

    plan = got._jdf.queryExecution().analyzed()
    filters = list(_filters(plan))
    assert filters, "probe plan lost its Filter node"
    depth = max(_or_depth(c) for c in filters)
    assert depth < 12, f"filter Or-tree nests {depth} deep — not balanced"
    assert depth >= 4, f"Or depth {depth}: chunking disappeared?"
    assert got.count() == len(keys)
    assert sorted(r["gram"] for r in got.select("gram").collect()) == sorted(keys)
    # empty probe still short-circuits
    assert dd.substr_index_probe(spark, path, []).count() == 0


# --- iterated NN-Descent (the test nnd_rounds' r12 docstring promised)


def test_nnd_rounds_recall_monotone_and_checkpoint_branch(spark, sf_dir):
    """The paper's iterated loop (Dong et al. 2011 §2.2), rounds 1..3
    at sf0.001: (a) recall vs the exact kNN graph is monotone
    non-decreasing round over round — every src keeps its current
    out-neighbors in the candidate pool, so a held exact edge is
    displaced only by a strictly closer one; (b) rounds >= 2 exercises
    the localCheckpoint lineage-cut branch that shipped untested in
    r12; (c) rounds=1 is plan-equivalent to q_knn_graph_descent —
    identical output; (d) every round emits exactly K neighbors per
    src; (e) rounds < 1 raises."""
    from proof_of_concept___cdc_w_iceberg_spark.ext.ann import nnd_rounds
    from proof_of_concept___cdc_w_iceberg_spark.ext.similarity import KNN_K, _sqnorm
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load
    from tests.test_r11_ops import _exact_knn_edges

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding", _sqnorm(F.col("embedding")).alias("sq")
    )
    n = e.count()
    exact = _exact_knn_edges(spark, sf_dir, KNN_K)

    with pytest.raises(ValueError):
        nnd_rounds(e, n, rounds=0)

    recalls = []
    graphs = {}
    for rounds in (1, 2, 3):
        rows = nnd_rounds(e, n, rounds=rounds).collect()
        graphs[rounds] = {(r["src"], r["dst"]) for r in rows}
        per_src = {}
        for r in rows:
            per_src[r["src"]] = per_src.get(r["src"], 0) + 1
        assert all(v == KNN_K for v in per_src.values()), rounds
        recalls.append(len(graphs[rounds] & exact) / len(exact))
    spark.catalog.clearCache()

    assert recalls[1] >= recalls[0], recalls
    assert recalls[2] >= recalls[1], recalls
    # and the iteration must actually add information on this fixture
    # (measured: 0.150 -> 0.27+ at sf0.001), not just not-regress
    assert recalls[1] > recalls[0], recalls

    one_shot = {
        (r["src"], r["dst"], r["cosine"], r["rn"])
        for r in QS["q_knn_graph_descent"](spark, sf_dir).collect()
    }
    round1 = {
        (r["src"], r["dst"], r["cosine"], r["rn"])
        for r in nnd_rounds(e, n, rounds=1).collect()
    }
    assert one_shot == round1


def test_knn_graph_descent2_matches_oracle(spark, sf_dir, duck):
    """Pre-validates the driver hash check for the newly registered
    q_knn_graph_descent2: the Spark 2-round loop and the 2-round
    unrolled DuckDB oracle agree row for row at sf0.001."""
    got = sorted(
        (r["src"], r["dst"], r["cosine"], r["rn"])
        for r in QS["q_knn_graph_descent2"](spark, sf_dir).collect()
    )
    spark.catalog.clearCache()
    want = sorted(
        (int(s), int(d), float(c), int(rn))
        for s, d, c, rn in duck.sql(OS["q_knn_graph_descent2"]).fetchall()
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1] and g[3] == w[3], (g, w)
        assert g[2] == pytest.approx(w[2], abs=1e-9), (g, w)


# --- streaming theta maintenance ---------------------------------------


def test_stream_theta_live_readstream_twin(spark, sf_dir):
    """q_stream_theta's docstring contract: the SAME per-batch state
    transition (theta_stream_apply) under a real readStream +
    foreachBatch ends with both year-sketches identical to the
    one-shot builds — union-on-sketches as live streaming state."""
    import shutil
    import tempfile

    from proof_of_concept___cdc_w_iceberg_spark.operators.sketches import (
        _theta_sketch,
        theta_order_stream,
    )
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load
    from proof_of_concept___cdc_w_iceberg_spark.streaming.queries import (
        theta_stream_apply,
    )

    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    src = tempfile.mkdtemp(prefix="stream_theta_")
    try:
        o.withColumn("_b", (F.col("o_orderkey") % 3).cast("int")).write.partitionBy(
            "_b"
        ).mode("overwrite").parquet(src)
        stream = (
            # schema from the written files (fixture stamps are INT96
            # timestamps, not dates — hardcoding `date` fails the scan)
            spark.readStream.schema(spark.read.parquet(src + "/_b=*").schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src + "/_b=*")
        )
        empty = o.select(
            F.md5(F.col("o_custkey").cast("string")).alias("h")
        ).limit(0)
        holder = {"a": empty, "b": empty, "batches": 0}

        def step(batch_df, _bid):
            holder["a"], holder["b"] = theta_stream_apply(
                holder["a"], holder["b"], batch_df
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
        for year, state in ((1995, holder["a"]), (1996, holder["b"])):
            _, h = theta_order_stream(o, year)
            want = sorted(r["h"] for r in _theta_sketch(h).collect())
            got = sorted(r["h"] for r in state.collect())
            assert got == want, year
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(src + "_ckpt", ignore_errors=True)
    spark.catalog.clearCache()


# --- streaming CMS / HLL / Bloom maintenance ---------------------------


@pytest.mark.parametrize("which", ["cms", "hll", "bloom"])
def test_stream_sketch_family_live_readstream_twins(spark, sf_dir, which):
    """The r13 maintenance twins' docstring contract: each sketch's
    monoid transition (cell-sum / register-max / position-union) under
    a real readStream + foreachBatch ends with state identical to the
    one-shot build over the whole stream."""
    import shutil
    import tempfile

    from proof_of_concept___cdc_w_iceberg_spark.operators import sketches as sk
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load
    from proof_of_concept___cdc_w_iceberg_spark.streaming import queries as sq

    if which == "cms":
        src_df = load(spark, sf_dir, "lineitem").select(
            F.col("l_suppkey").alias("k"), F.col("l_orderkey").alias("bkey")
        )
        init = lambda: (
            src_df.select(
                F.lit(0).alias("r"),
                F.lit(0).cast("bigint").alias("c"),
                F.lit(0).cast("bigint").alias("cnt"),
            ).limit(0)
        )
        apply_fn = lambda st, b: sq.cms_stream_apply(st, b.select("k"))
        one_shot = lambda: sk.cms_sketch(src_df.select("k"))
        key_cols = ("r", "c", "cnt")
    elif which == "hll":
        src_df = load(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("k"), F.col("o_orderkey").alias("bkey")
        )
        init = lambda: src_df.select(
            F.lit(0).cast("bigint").alias("j"), F.lit(0).cast("int").alias("m")
        ).limit(0)
        apply_fn = lambda st, b: sq.hll_stream_apply(st, b.select("k"))
        one_shot = lambda: sk.hll_regs(src_df.select("k"))
        key_cols = ("j", "m")
    else:
        src_df = (
            load(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey", F.col("c_custkey").alias("bkey"))
        )
        init = lambda: spark.range(0).select(F.col("id").cast("bigint").alias("pos"))
        apply_fn = lambda st, b: sq.bloom_stream_apply(
            st, b.select("c_custkey"), "c_custkey"
        )
        one_shot = lambda: sk.bloom_positions(src_df, "c_custkey")
        key_cols = ("pos",)

    src = tempfile.mkdtemp(prefix=f"stream_{which}_")
    try:
        src_df.withColumn("_b", (F.col("bkey") % 3).cast("int")).drop(
            "bkey"
        ).write.partitionBy("_b").mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(spark.read.parquet(src + "/_b=*").schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src + "/_b=*")
        )
        holder = {"state": init(), "batches": 0}

        def step(batch_df, _bid):
            holder["state"] = apply_fn(holder["state"], batch_df)
            holder["batches"] += 1

        q = (
            stream.writeStream.foreachBatch(step)
            .trigger(availableNow=True)
            .option("checkpointLocation", src + "_ckpt")
            .start()
        )
        q.awaitTermination(300)
        assert holder["batches"] >= 2, "stream collapsed to one micro-batch"
        got = sorted(tuple(r[c] for c in key_cols) for r in holder["state"].collect())
        want = sorted(tuple(r[c] for c in key_cols) for r in one_shot().collect())
        assert got == want
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(src + "_ckpt", ignore_errors=True)
    spark.catalog.clearCache()


# --- HLL rollup (sketch-as-materialized-aggregate) ----------------------


def test_hll_rollup_merge_equals_rebuild(spark, sf_dir, duck):
    """The rollup's 'total' registers (register-wise max over the
    per-year leaf sketches) must equal a from-scratch register build
    over the whole stream — the merge law at the rollup grain — and
    the registered query must agree with its oracle at sf0.001."""
    from proof_of_concept___cdc_w_iceberg_spark.operators.sketches import (
        _hll_fields_sql,
        hll_regs,
    )
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load

    o = load(spark, sf_dir, "orders").select(
        F.year("o_orderdate").cast("string").alias("g"),
        F.col("o_custkey").alias("k"),
    )
    bucket, rho = _hll_fields_sql("k", "STRING")
    leaf = (
        o.select("g", F.expr(bucket).alias("j"), F.expr(rho).alias("r"))
        .groupBy("g", "j")
        .agg(F.max("r").alias("m"))
    )
    merged = sorted(
        (r["j"], r["m"])
        for r in leaf.groupBy("j").agg(F.max("m").alias("m")).collect()
    )
    rebuilt = sorted(
        (r["j"], r["m"]) for r in hll_regs(o.select("k")).collect()
    )
    assert merged == rebuilt

    got = sorted(tuple(r) for r in QS["q_sketch_hll_rollup"](spark, sf_dir).collect())
    want = sorted(tuple(r) for r in duck.sql(OS["q_sketch_hll_rollup"]).fetchall())
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1], (g, w)
        assert g[2] == pytest.approx(w[2], abs=1e-9) and g[3] == pytest.approx(w[3], abs=1e-9), (g, w)
    # error budget applies only in the raw-estimate regime (n >=
    # 2.5m; below it raw HLL overestimates by design — the documented
    # linear-counting boundary). sf0.001 has 150 customers < 640, so
    # the budget is asserted only when the fixture is in-regime (the
    # driver's sf0.01, with 1500, is).
    tot = dict((r[0], r) for r in got)["total"]
    if tot[1] >= 2.5 * 256:
        assert abs(tot[2] - tot[1]) / tot[1] < 0.2
    spark.catalog.clearCache()


# --- incremental kNN-graph maintenance -----------------------------------


def test_knn_graph_apply_equals_rebuild(spark, sf_dir):
    """The ANN IVM law in-engine at full precision: applying an insert
    batch to the blocked-graph state equals rebuilding the graph over
    corpus ∪ batch, row for row including unrounded cosines — and
    rows for nodes in untouched cells pass through byte-identical."""
    from proof_of_concept___cdc_w_iceberg_spark.ext.ann import (
        ANN_BATCH_OFF,
        knn_graph_apply,
        knn_graph_state,
    )
    from proof_of_concept___cdc_w_iceberg_spark.ext.similarity import _sqnorm
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding", _sqnorm(F.col("embedding")).alias("sq")
    )
    batch = e.filter(F.col("vec_id") % 13 == 5).select(
        (F.col("vec_id") + ANN_BATCH_OFF).alias("vec_id"), "label", "embedding", "sq"
    )
    state = knn_graph_state(e).localCheckpoint(eager=True)
    applied = sorted(
        tuple(r) for r in knn_graph_apply(state, e, batch).collect()
    )
    rebuilt = sorted(
        tuple(r) for r in knn_graph_state(e.unionByName(batch)).collect()
    )
    assert applied == rebuilt
    # planted exact duplicates: every batch node's top-1 neighbor is
    # its source vector at cosine ~1.0 (tie-break on id)
    by_src = {}
    for src, dst, cos, rn in applied:
        if src >= ANN_BATCH_OFF and rn == 1:
            by_src[src] = (dst, cos)
    assert by_src, "no batch nodes in the applied graph"
    for src, (dst, cos) in by_src.items():
        assert dst == src - ANN_BATCH_OFF, (src, dst)
        assert cos == pytest.approx(1.0, abs=1e-9)
    spark.catalog.clearCache()


def test_knn_graph_apply_live_readstream_twin(spark, sf_dir):
    """knn_graph_apply as live streaming state: vectors arrive in
    micro-batches through a real readStream + foreachBatch, each batch
    applied to the maintained graph — final graph equals the one-shot
    build over everything. Seeds with the first batch-key slice as the
    initial corpus so every later batch exercises the touched-cell
    path."""
    import shutil
    import tempfile

    from proof_of_concept___cdc_w_iceberg_spark.ext.ann import (
        knn_graph_apply,
        knn_graph_state,
    )
    from proof_of_concept___cdc_w_iceberg_spark.ext.similarity import _sqnorm
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding", _sqnorm(F.col("embedding")).alias("sq")
    )
    seed = e.filter(F.col("vec_id") % 3 == 0)
    rest = e.filter(F.col("vec_id") % 3 != 0)
    src = tempfile.mkdtemp(prefix="stream_knn_")
    try:
        rest.withColumn("_b", (F.col("vec_id") % 2).cast("int")).write.partitionBy(
            "_b"
        ).mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(spark.read.parquet(src + "/_b=*").schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/_b=*")
        )
        holder = {
            "corpus": seed.localCheckpoint(eager=True),
            "graph": knn_graph_state(seed).localCheckpoint(eager=True),
            "batches": 0,
        }

        def step(batch_df, _bid):
            b = batch_df.localCheckpoint(eager=True)
            holder["graph"] = knn_graph_apply(
                holder["graph"], holder["corpus"], b
            ).localCheckpoint(eager=True)
            holder["corpus"] = holder["corpus"].unionByName(b).localCheckpoint(
                eager=True
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
        got = sorted(tuple(r) for r in holder["graph"].collect())
        want = sorted(tuple(r) for r in knn_graph_state(e).collect())
        assert got == want
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(src + "_ckpt", ignore_errors=True)
    spark.catalog.clearCache()


# --- property-based ANN IVM law ------------------------------------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _vec = st.lists(
        st.integers(min_value=-4, max_value=4), min_size=3, max_size=3
    )
    _corpus_strategy = st.lists(
        st.tuples(_vec, st.integers(min_value=0, max_value=3)),  # (vec, label)
        min_size=2,
        max_size=16,
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow,
            HealthCheck.function_scoped_fixture,
        ],
    )
    @given(
        rows=_corpus_strategy,
        batch_mod=st.integers(min_value=2, max_value=5),
    )
    def test_knn_graph_apply_rebuild_property(spark, rows, batch_mod):
        """apply == rebuild for ANY corpus/batch split — including a
        batch that creates a brand-new cell, a singleton cell (no
        edges, matching the rebuild), duplicate vectors (tie-break on
        id), and an empty batch (state passes through)."""
        from proof_of_concept___cdc_w_iceberg_spark.ext.ann import (
            knn_graph_apply,
            knn_graph_state,
        )
        from proof_of_concept___cdc_w_iceberg_spark.ext.similarity import _sqnorm

        data = [
            # offset vectors away from the origin so no zero norms
            (i, f"cell{lbl}", [float(v) + 5.0 for v in vec])
            for i, (vec, lbl) in enumerate(rows)
        ]
        e_all = spark.createDataFrame(
            data, "vec_id long, label string, embedding array<double>"
        ).select("vec_id", "label", "embedding", _sqnorm(F.col("embedding")).alias("sq"))
        e_old = e_all.filter(F.col("vec_id") % batch_mod != 0)
        e_new = e_all.filter(F.col("vec_id") % batch_mod == 0)

        state = knn_graph_state(e_old).localCheckpoint(eager=True)
        applied = sorted(
            tuple(r) for r in knn_graph_apply(state, e_old, e_new).collect()
        )
        rebuilt = sorted(tuple(r) for r in knn_graph_state(e_all).collect())
        assert applied == rebuilt
        spark.catalog.clearCache()

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass
