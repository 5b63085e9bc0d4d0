"""r21 optimization probes: interleaved same-session A/B for the
round's candidate changes (guide §1; r20 protocol — box noise is
bursty, only interleaved comparisons are trusted). Run with probe
names as argv. Not part of the driver contract."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from proof_of_concept___cdc_w_iceberg_spark.session import get_spark
from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("opt_probe_r21")
spark.sparkContext.setLogLevel("ERROR")

_t0 = None


def tic():
    global _t0
    _t0 = time.perf_counter()


def toc(label):
    dt = time.perf_counter() - _t0
    print(f"  {label:46s} {dt:7.3f}s", flush=True)
    return dt


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def probe_knn_state_ab(rounds: int = 3):
    """Old join+fold state build vs new cell_pair_scores kernel, and
    the same comparison for the delete-apply rerank leg."""
    from proof_of_concept___cdc_w_iceberg_spark.ext import ann
    from proof_of_concept___cdc_w_iceberg_spark.ext.similarity import _sqnorm
    from proof_of_concept___cdc_w_iceberg_spark.ext.vecexec import (
        cell_pair_scores, cogroup_pair_scores)

    e = load(spark, SF, "embeddings").select(
        "vec_id", "label", "embedding", _sqnorm(F.col("embedding")).alias("sq")
    ).localCheckpoint(eager=True)
    print("== knn_graph_state build: old join+fold vs kernel ==")

    def old_build():
        noop(ann._knn_topk(ann._knn_scored(e, e)))

    def new_build():
        noop(ann._knn_topk(cell_pair_scores(e)))

    for i in range(rounds):
        for label, fn in (("old", old_build), ("new", new_build)):
            tic(); fn(); toc(f"state build round {i} {label}")

    print("== delete-apply rerank: old join+fold vs cogroup kernel ==")
    state = ann.knn_graph_state(e).localCheckpoint(eager=True)
    dels = e.filter(F.col("vec_id") % 11 == 3).select("vec_id")
    surv = e.filter(F.col("vec_id") % 11 != 3).localCheckpoint(eager=True)
    dels_b = F.broadcast(dels.select(F.col("vec_id").alias("del_id")))
    alive = state.join(dels_b, F.col("src") == F.col("del_id"), "left_anti")
    broken = (
        alive.join(dels_b, F.col("dst") == F.col("del_id"), "left_semi")
        .select("src").distinct().localCheckpoint(eager=True)
    )
    e_broken = surv.join(
        broken.withColumnRenamed("src", "vec_id"), "vec_id"
    ).localCheckpoint(eager=True)
    print(f"  broken nodes: {e_broken.count()} of {surv.count()}")

    def old_rerank():
        noop(ann._knn_topk(ann._knn_scored(e_broken, surv)))

    def new_rerank():
        noop(ann._knn_topk(cogroup_pair_scores(e_broken, surv)))

    def filt_rerank():
        scored = cell_pair_scores(surv).join(broken, "src", "left_semi")
        noop(ann._knn_topk(scored))

    for i in range(rounds):
        for label, fn in (("old", old_rerank), ("cogroup", new_rerank),
                          ("filter", filt_rerank)):
            tic(); fn(); toc(f"rerank round {i} {label}")


def probe_knn_queries(rounds: int = 2):
    """End-to-end timing of the four IVM rungs as registered (current
    code state — run before/after an edit for same-session A/B)."""
    from proof_of_concept___cdc_w_iceberg_spark import registry
    qs = registry.queries()
    names = ["q_knn_graph_delete", "q_knn_graph_incremental",
             "q_stream_knn_graph_upsert", "q_stream_knn_graph"]
    for i in range(rounds):
        for n in names:
            spark.catalog.clearCache()
            tic(); noop(qs[n](spark, SF)); toc(f"round {i} {n}")


PROBES = {
    "knn_state_ab": probe_knn_state_ab,
    "knn_queries": probe_knn_queries,
}


def probe_rerank_small(rounds: int = 3):
    """Delete-apply rerank A/B at q_stream_knn_graph_upsert scale
    (600-vector corpus, ~86 deletes) — the regime where r20 measured
    cogroup 2x worse."""
    from proof_of_concept___cdc_w_iceberg_spark.ext import ann
    from proof_of_concept___cdc_w_iceberg_spark.ext.similarity import _sqnorm
    from proof_of_concept___cdc_w_iceberg_spark.ext.vecexec import (
        cogroup_pair_scores)

    e = load(spark, SF, "embeddings").select(
        "vec_id", "label", "embedding", _sqnorm(F.col("embedding")).alias("sq")
    ).filter(F.col("vec_id") <= 600).localCheckpoint(eager=True)
    state = ann.knn_graph_state(e).localCheckpoint(eager=True)
    del_cond = F.col("vec_id") % 7 == 2
    dels = e.filter(del_cond).select("vec_id")
    surv = e.filter(~del_cond).localCheckpoint(eager=True)
    dels_b = F.broadcast(dels.select(F.col("vec_id").alias("del_id")))
    alive = state.join(dels_b, F.col("src") == F.col("del_id"), "left_anti")
    broken = (
        alive.join(dels_b, F.col("dst") == F.col("del_id"), "left_semi")
        .select("src").distinct().localCheckpoint(eager=True)
    )
    e_broken = surv.join(
        broken.withColumnRenamed("src", "vec_id"), "vec_id"
    ).localCheckpoint(eager=True)
    print(f"== small rerank: broken {e_broken.count()} of {surv.count()} ==")

    def old_rerank():
        noop(ann._knn_topk(ann._knn_scored(e_broken, surv)))

    def new_rerank():
        noop(ann._knn_topk(cogroup_pair_scores(e_broken, surv)))

    for i in range(rounds):
        for label, fn in (("old", old_rerank), ("cogroup", new_rerank)):
            tic(); fn(); toc(f"small rerank round {i} {label}")


PROBES["rerank_small"] = probe_rerank_small


def probe_wap_publish_ab(rounds: int = 3):
    """Serial (r20 shape) vs overlapped (r21) q_cdc_wap_publish flow,
    interleaved in one session."""
    import tempfile
    from concurrent.futures import ThreadPoolExecutor
    from proof_of_concept___cdc_w_iceberg_spark.cdc import queries as cq
    from proof_of_concept___cdc_w_iceberg_spark.cdc.branches import (
        BranchedMirror, wap_audit)

    keys = ["l_orderkey", "l_linenumber"]

    def setup():
        li, changes = cq._scale_mirror_and_changes(spark, SF)
        path = os.path.join(tempfile.mkdtemp(prefix="ab_wap_"), "mirror")
        m = BranchedMirror(spark, path, keys=keys, n_buckets=16)
        m.init(li)
        bad = li.limit(50).select(
            F.col("l_orderkey"),
            F.lit(None).cast(dict(li.dtypes)["l_linenumber"]).alias(
                "l_linenumber"),
            F.col("l_quantity").cast("double").alias("l_quantity"),
            F.col("l_extendedprice").cast("double").alias("l_extendedprice"),
            F.lit("c").alias("op"), F.lit(9000).cast("long").alias("ts_ms"),
            (F.col("l_orderkey") * 10 + F.lit(3_000_000_000)).cast("long")
            .alias("off"),
        )
        return m, changes, bad

    def serial(m, changes, bad):
        m.branch_create("audit_good")
        m.apply_to_branch("audit_good", changes)
        a = wap_audit(m.read_ref("audit_good").drop("__bucket"), keys,
                      batch_keys=changes)
        assert a == {"null_keys": 0, "dup_keys": 0}
        m.fast_forward("main", "audit_good"); m.drop_branch("audit_good")
        m.branch_create("audit_bad")
        m.apply_to_branch("audit_bad", bad)
        a = wap_audit(m.read_ref("audit_bad").drop("__bucket"), keys)
        assert a["null_keys"] > 0
        m.drop_branch("audit_bad")
        m.read_ref("main").select(*keys, "l_quantity",
                                  "l_extendedprice").count()

    def overlapped(m, changes, bad):
        m.branch_create("audit_good"); m.branch_create("audit_bad")

        def good():
            m.apply_to_branch("audit_good", changes)
            a = wap_audit(m.read_ref("audit_good").drop("__bucket"), keys,
                          batch_keys=changes)
            assert a == {"null_keys": 0, "dup_keys": 0}
            m.fast_forward("main", "audit_good")
            m.drop_branch("audit_good")

        def badleg():
            m.apply_to_branch("audit_bad", bad)
            a = wap_audit(m.read_ref("audit_bad").drop("__bucket"), keys)
            assert a["null_keys"] > 0
            m.drop_branch("audit_bad")

        with ThreadPoolExecutor(max_workers=2) as pool:
            fg, fb = pool.submit(good), pool.submit(badleg)
            fg.result(), fb.result()
        m.read_ref("main").select(*keys, "l_quantity",
                                  "l_extendedprice").count()

    for i in range(rounds):
        for label, fn in (("serial", serial), ("overlap", overlapped)):
            m, changes, bad = setup()
            tic(); fn(m, changes, bad); toc(f"round {i} wap legs {label}")


PROBES["wap_publish_ab"] = probe_wap_publish_ab


def probe_substr_ab(rounds: int = 3):
    """Old (grams-only checkpoint) vs new (materialize-in-build +
    report checkpoint) q_dedup_substr_incremental state+apply flow."""
    from proof_of_concept___cdc_w_iceberg_spark.ext import dedup as dd

    docs = load(spark, SF, "documents").select("doc_id", "text")
    batch = docs.filter(F.col("doc_id") % 13 == 5).select(
        (F.col("doc_id") + dd._BATCH_OFF).alias("doc_id"), "text"
    )

    def old():
        grams, hist, report = dd.substr_state_build(docs)
        grams = grams.localCheckpoint(eager=True)
        _, _, rep = dd.substr_state_apply(grams, hist, report, batch)
        noop(rep)

    def new():
        grams, hist, report = dd.substr_state_build(
            docs, materialize=lambda df: df.localCheckpoint(eager=True)
        )
        report = report.localCheckpoint(eager=True)
        _, _, rep = dd.substr_state_apply(grams, hist, report, batch)
        noop(rep)

    for i in range(rounds):
        for label, fn in (("old", old), ("new", new)):
            tic(); fn(); toc(f"round {i} substr incr {label}")


PROBES["substr_ab"] = probe_substr_ab


def probe_theta_ab(rounds: int = 3):
    """Old (lazy readout inputs) vs new (checkpointed) theta readout,
    for both the one-shot and the streaming-maintained query shapes."""
    from proof_of_concept___cdc_w_iceberg_spark.operators import sketches as sk
    from proof_of_concept___cdc_w_iceberg_spark.streaming import queries as sq

    o = load(spark, SF, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey")

    def readout_old(sk_a, sk_b, a_keys, b_keys):
        th_a, th_b = sk._theta_of(sk_a), sk._theta_of(sk_b)
        th_u = (
            th_a.crossJoin(th_b.withColumnRenamed("theta", "theta_b"))
            .select(F.least("theta", "theta_b").alias("theta"))
        )

        def below(s, th):
            cnt = (
                s.crossJoin(F.broadcast(th))
                .filter(F.col("h") < F.col("theta"))
                .groupBy("theta").agg(F.count("*").alias("cnt"))
            )
            return th.join(cnt, "theta", "left").select(
                "theta", F.coalesce("cnt", F.lit(0).cast("long")).alias("cnt")
            )

        est_a = below(sk_a, th_a).select(sk._theta_est("theta").alias("est"))
        est_b = below(sk_b, th_b).select(sk._theta_est("theta").alias("est"))
        est_u = below(sk_a.unionByName(sk_b).distinct(), th_u).select(
            sk._theta_est("theta").alias("est"))
        est_i = below(sk_a.join(sk_b, "h"), th_u).select(
            sk._theta_est("theta").alias("est"))
        ex_a = a_keys.agg(F.count("*").cast("long").alias("v"))
        ex_b = b_keys.agg(F.count("*").cast("long").alias("v"))
        ex_i = a_keys.join(b_keys, "k").agg(
            F.count("*").cast("long").alias("v"))
        ex_u = (
            ex_a.withColumnRenamed("v", "va")
            .crossJoin(ex_b.withColumnRenamed("v", "vb"))
            .crossJoin(ex_i.withColumnRenamed("v", "vi"))
            .select((F.col("va") + F.col("vb") - F.col("vi")).alias("v"))
        )

        def row(name, est, ex):
            return est.crossJoin(F.broadcast(ex)).select(
                F.lit(name).alias("measure"),
                F.round("est", 4).alias("est"),
                F.col("v").alias("exact_v"),
                F.round(F.try_divide(
                    F.abs(F.col("est") - F.col("v")), F.col("v")), 4
                ).alias("rel_err"),
            )

        return (
            row("distinct_a", est_a, ex_a)
            .unionByName(row("distinct_b", est_b, ex_b))
            .unionByName(row("union", est_u, ex_u))
            .unionByName(row("intersection", est_i, ex_i))
        )

    def oneshot(readout):
        a_keys, a_h = sk.theta_order_stream(o, 1995)
        b_keys, b_h = sk.theta_order_stream(o, 1996)
        noop(readout(sk._theta_sketch(a_h), sk._theta_sketch(b_h),
                     a_keys, b_keys))

    def stream(readout):
        empty = o.select(F.lit(0).cast("bigint").alias("h")).limit(0)
        state_a, state_b = empty, empty
        for cond in (F.col("o_orderkey") <= 20_000,
                     F.col("o_orderkey").between(20_001, 40_000),
                     F.col("o_orderkey") >= 40_001):
            state_a, state_b = sq.theta_stream_apply(
                state_a, state_b,
                o.filter(cond).select("o_custkey", "o_orderdate"))
        a_keys, _ = sk.theta_order_stream(o, 1995)
        b_keys, _ = sk.theta_order_stream(o, 1996)
        noop(readout(state_a, state_b, a_keys, b_keys))

    for i in range(rounds):
        for label, ro in (("old", readout_old), ("new", sk.theta_readout)):
            tic(); oneshot(ro); toc(f"round {i} oneshot {label}")
            tic(); stream(ro); toc(f"round {i} stream  {label}")


PROBES["theta_ab"] = probe_theta_ab


def probe_kq_ab(rounds: int = 3):
    """Old (separate count + serial probes) vs new (count-in-stats +
    overlapped probes) exact-rank flow for q_sketch_quantile and the
    rollup total."""
    import math as _math
    from proof_of_concept___cdc_w_iceberg_spark.operators import sketches as sk
    from pyspark.sql import Window

    li = load(spark, SF, "lineitem").select(
        F.col("l_extendedprice").cast("double").alias("v"),
        F.md5(F.concat(F.lit("kq|"), F.col("l_orderkey").cast("string"),
                       F.lit("|"), F.col("l_linenumber").cast("string"))
              ).alias("h"),
    )

    def exact_old(df, targets):
        buckets = 64
        n = df.count()
        lo, hi = df.agg(F.min("v"), F.max("v")).first()
        width = (hi - lo) / buckets or 1.0
        bucket = F.least(
            F.floor((F.col("v") - F.lit(lo)) / F.lit(width)).cast("long"),
            F.lit(buckets - 1).cast("long"),
        )
        counts = dict(
            (r["b"], r["cnt"]) for r in
            df.groupBy(bucket.alias("b")).agg(F.count("*").alias("cnt"))
            .collect())
        out = {}
        for q in targets:
            k = int(_math.ceil(q * n))
            cum = 0
            for b in range(buckets):
                c = counts.get(b, 0)
                if cum + c >= k:
                    break
                cum += c
            offset = k - cum
            b_lo = lo + (b - 1) * width
            b_hi = hi if b >= buckets - 2 else lo + (b + 2) * width
            out[q] = (df.filter((F.col("v") >= F.lit(b_lo))
                                & (F.col("v") <= F.lit(b_hi))
                                & (bucket == b))
                      .orderBy("v").limit(offset).agg(F.max("v")).first()[0])
        return out, n

    def run(exact_fn):
        samp = sk.kq_sample(li)
        sord = samp.select(
            "v",
            F.row_number().over(Window.orderBy("v", "h")).alias("rn"),
            F.count("*").over(
                Window.partitionBy().rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing)
            ).alias("kk"),
        )
        exact, n = exact_fn(li, sk.KQ_TARGETS)
        spine = spark.createDataFrame(
            [(float(q), float(exact[q])) for q in sk.KQ_TARGETS],
            "q double, exact_v double")
        est = sord.join(F.broadcast(spine),
                        F.col("rn") == F.ceil(F.col("q") * F.col("kk")))
        noop(est.select(
            "q", F.col("v").alias("est"), "exact_v",
            F.round(F.abs(F.col("v") - F.col("exact_v"))
                    / F.col("exact_v"), 4).alias("rel_err"),
            F.col("kk").cast("long").alias("k_sample"),
            F.lit(n).cast("long").alias("n_stream"),
        ))

    def new_exact(df, targets):
        return sk._kq_exact_ranks(spark, df, targets)

    for i in range(rounds):
        for label, fn in (("old", exact_old), ("new", new_exact)):
            tic(); run(fn); toc(f"round {i} kq_quantile {label}")


PROBES["kq_ab"] = probe_kq_ab


def probe_pq_ab(rounds: int = 3):
    """Old (checkpoint + collect per Lloyd iteration) vs new (collect-
    once, local codebook) PQ training + serving, end to end for
    q_sim_pq and q_sim_ivf_pq shapes."""
    from proof_of_concept___cdc_w_iceberg_spark.ext import ann, vecexec

    e = load(spark, SF, "embeddings").select("vec_id", "label", "embedding")

    def train_old(src, m=ann.PQ_M, ks=ann.PQ_KS, iters=2):
        subs = ann.pq_subvectors(src, m).localCheckpoint(eager=True)
        cb = ann._pq_group_means(
            subs.withColumn("g", F.col("vec_id") % ks), "g"
        ).localCheckpoint(eager=True)
        for _ in range(iters):
            cb = ann._pq_group_means(
                ann._pq_assign(subs, cb), "cid"
            ).localCheckpoint(eager=True)
        return cb

    def sim_pq(train):
        cb = train(e)
        codes = ann.pq_encode(e, cb)
        noop(ann.pq_rerank_topk(e, cb, codes, k=5,
                                shortlist=ann.PQ_RERANK_SHORTLIST))

    def ivf_pq(train):
        cent_rel = ann.ivf_cell_centroids_ref(e) if False else None
        from proof_of_concept___cdc_w_iceberg_spark.ext.similarity import (
            ivf_cell_centroids)
        if train is train_old:
            cent = ivf_cell_centroids(e).localCheckpoint(eager=True)
        else:
            rel = ivf_cell_centroids(e)
            cent = spark.createDataFrame(rel.collect(), rel.schema)
        resid = e.join(F.broadcast(cent), "label").select(
            "vec_id", "label",
            F.zip_with(
                F.transform("embedding", lambda x: x.cast("double")),
                "centroid", lambda x, c: x - c,
            ).alias("embedding"),
        )
        cb = train(resid)
        codes = ann.pq_encode(resid, cb, keep=("label",))
        noop(ann.ivf_pq_rerank_topk(e, cent, cb, codes, k=5,
                                    shortlist=ann.IVF_PQ_RERANK_SHORTLIST))

    for i in range(rounds):
        for label, train in (("old", train_old), ("new", ann.pq_train)):
            tic(); sim_pq(train); toc(f"round {i} sim_pq  {label}")
            tic(); ivf_pq(train); toc(f"round {i} ivf_pq  {label}")


PROBES["pq_ab"] = probe_pq_ab


def probe_pq_iso(rounds: int = 3):
    """Isolate the PQ regression: old (cp everywhere) vs hybrid
    (collect-loop training, CHECKPOINTED final cb + cp cent) vs new
    (local relations everywhere)."""
    from proof_of_concept___cdc_w_iceberg_spark.ext import ann, vecexec
    from proof_of_concept___cdc_w_iceberg_spark.ext.similarity import (
        ivf_cell_centroids)

    e = load(spark, SF, "embeddings").select("vec_id", "label", "embedding")

    def train_old(src, m=ann.PQ_M, ks=ann.PQ_KS, iters=2):
        subs = ann.pq_subvectors(src, m).localCheckpoint(eager=True)
        cb = ann._pq_group_means(
            subs.withColumn("g", F.col("vec_id") % ks), "g"
        ).localCheckpoint(eager=True)
        for _ in range(iters):
            cb = ann._pq_group_means(
                ann._pq_assign(subs, cb), "cid"
            ).localCheckpoint(eager=True)
        return cb

    def train_hybrid(src, m=ann.PQ_M, ks=ann.PQ_KS, iters=2):
        subs = ann.pq_subvectors(src, m).localCheckpoint(eager=True)
        means = ann._pq_group_means(
            subs.withColumn("g", F.col("vec_id") % ks), "g")
        schema = means.schema
        rows = means.collect()
        for i in range(iters):
            assign = vecexec.pq_assign_udf(rows)
            assigned = subs.select(
                "vec_id", "sub", "subvec",
                assign("sub", "subvec").alias("cid"))
            mm = ann._pq_group_means(assigned, "cid")
            if i < iters - 1:
                rows = mm.collect()
            else:
                return mm.localCheckpoint(eager=True)

    def ivf(train, cent_mode):
        if cent_mode == "cp":
            cent = ivf_cell_centroids(e).localCheckpoint(eager=True)
        else:
            rel = ivf_cell_centroids(e)
            cent = spark.createDataFrame(rel.collect(), rel.schema)
        resid = e.join(F.broadcast(cent), "label").select(
            "vec_id", "label",
            F.zip_with(
                F.transform("embedding", lambda x: x.cast("double")),
                "centroid", lambda x, c: x - c,
            ).alias("embedding"),
        )
        cb = train(resid)
        codes = ann.pq_encode(resid, cb, keep=("label",))
        noop(ann.ivf_pq_rerank_topk(e, cent, cb, codes, k=5,
                                    shortlist=ann.IVF_PQ_RERANK_SHORTLIST))

    for i in range(rounds):
        tic(); ivf(train_old, "cp"); toc(f"round {i} ivf old(cp,cp)")
        tic(); ivf(train_hybrid, "cp"); toc(f"round {i} ivf hybrid(collect-loop,cp)")
        tic(); ivf(ann.pq_train, "local"); toc(f"round {i} ivf new(local,local)")
        tic(); ivf(ann.pq_train, "cp"); toc(f"round {i} ivf mix(localcb,cpcent)")


PROBES["pq_iso"] = probe_pq_iso


def probe_pq_final(rounds: int = 3):
    """Registered (hybrid) PQ shape vs the r20 cp-everywhere shape."""
    from proof_of_concept___cdc_w_iceberg_spark.ext import ann

    e = load(spark, SF, "embeddings").select("vec_id", "label", "embedding")

    def train_old(src, m=ann.PQ_M, ks=ann.PQ_KS, iters=2):
        subs = ann.pq_subvectors(src, m).localCheckpoint(eager=True)
        cb = ann._pq_group_means(
            subs.withColumn("g", F.col("vec_id") % ks), "g"
        ).localCheckpoint(eager=True)
        for _ in range(iters):
            cb = ann._pq_group_means(
                ann._pq_assign(subs, cb), "cid"
            ).localCheckpoint(eager=True)
        return cb

    def sim_pq(train):
        cb = train(e)
        codes = ann.pq_encode(e, cb)
        noop(ann.pq_rerank_topk(e, cb, codes, k=5,
                                shortlist=ann.PQ_RERANK_SHORTLIST))

    def ivf_pq_registered():
        cent, cb, codes = ann.ivf_pq_build(e)
        noop(ann.ivf_pq_rerank_topk(e, cent, cb, codes, k=5,
                                    shortlist=ann.IVF_PQ_RERANK_SHORTLIST))

    from proof_of_concept___cdc_w_iceberg_spark.ext.similarity import (
        ivf_cell_centroids)

    def ivf_pq_old():
        cent = ivf_cell_centroids(e).localCheckpoint(eager=True)
        resid = e.join(F.broadcast(cent), "label").select(
            "vec_id", "label",
            F.zip_with(
                F.transform("embedding", lambda x: x.cast("double")),
                "centroid", lambda x, c: x - c,
            ).alias("embedding"),
        )
        cb = train_old(resid)
        codes = ann.pq_encode(resid, cb, keep=("label",))
        noop(ann.ivf_pq_rerank_topk(e, cent, cb, codes, k=5,
                                    shortlist=ann.IVF_PQ_RERANK_SHORTLIST))

    for i in range(rounds):
        tic(); sim_pq(train_old); toc(f"round {i} sim_pq old")
        tic(); sim_pq(ann.pq_train); toc(f"round {i} sim_pq new")
        tic(); ivf_pq_old(); toc(f"round {i} ivf_pq old")
        tic(); ivf_pq_registered(); toc(f"round {i} ivf_pq new")


PROBES["pq_final"] = probe_pq_final


def probe_pair_cosine_ab(rounds: int = 3):
    """Interpreted fold vs vecexec.pair_cosine on the bounded pair
    relations: NN-Descent rerank (descent2 shape) and _knn_scored's
    batch legs (knn_graph_apply shape)."""
    from proof_of_concept___cdc_w_iceberg_spark.ext import ann, vecexec
    from proof_of_concept___cdc_w_iceberg_spark.ext.similarity import (
        _dot, _sqnorm)
    from pyspark.sql import Window

    e = load(spark, SF, "embeddings").select(
        "vec_id", "label", "embedding", _sqnorm(F.col("embedding")).alias("sq")
    ).localCheckpoint(eager=True)
    n = e.count()
    pairs = ann.nnd_candidate_pairs(e, n).localCheckpoint(eager=True)
    print(f"  candidate pairs: {pairs.count()}")

    def rerank(scorer):
        ea = e.select(F.col("vec_id").alias("src"),
                      F.col("embedding").alias("a_emb"),
                      F.col("sq").alias("a_sq"))
        eb = e.select(F.col("vec_id").alias("dst"),
                      F.col("embedding").alias("b_emb"),
                      F.col("sq").alias("b_sq"))
        scored = pairs.join(ea, "src").join(eb, "dst").select(
            "src", "dst", scorer().alias("cosine"))
        w = Window.partitionBy("src").orderBy(
            F.col("cosine").desc(), F.col("dst"))
        noop(scored.withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") <= ann.KNN_K))

    def fold():
        return _dot(F.col("a_emb"), F.col("b_emb")) / F.sqrt(
            F.col("a_sq") * F.col("b_sq"))

    def arrow():
        return vecexec.pair_cosine(
            F.col("a_emb"), F.col("b_emb"), F.col("a_sq"), F.col("b_sq"))

    for i in range(rounds):
        for label, sc in (("fold", fold), ("arrow", arrow)):
            tic(); rerank(sc); toc(f"round {i} nnd rerank {label}")

    # batch leg: e_new (every 13th) scored against e_all within cells
    batch = e.filter(F.col("vec_id") % 13 == 5).select(
        (F.col("vec_id") + ann.ANN_BATCH_OFF).alias("vec_id"),
        "label", "embedding", "sq").localCheckpoint(eager=True)
    e_all = e.unionByName(batch).localCheckpoint(eager=True)

    def knn_scored(scorer_col):
        b = e_all.select(F.col("label").alias("b_label"),
                         F.col("vec_id").alias("dst"),
                         F.col("embedding").alias("b_emb"),
                         F.col("sq").alias("b_sq"))
        sc = batch.join(
            b, (F.col("label") == F.col("b_label"))
            & (F.col("vec_id") != F.col("dst"))
        ).select(F.col("vec_id").alias("src"), "dst",
                 scorer_col().alias("cosine"))
        noop(ann._knn_topk(sc))

    def fold2():
        return _dot(F.col("embedding"), F.col("b_emb")) / F.sqrt(
            F.col("sq") * F.col("b_sq"))

    def arrow2():
        return vecexec.pair_cosine(
            F.col("embedding"), F.col("b_emb"), F.col("sq"), F.col("b_sq"))

    for i in range(rounds):
        for label, sc in (("fold", fold2), ("arrow", arrow2)):
            tic(); knn_scored(sc); toc(f"round {i} batch leg  {label}")


PROBES["pair_cosine_ab"] = probe_pair_cosine_ab


def probe_cdc_phases():
    """Phase attribution for q_cdc_compact_files, q_cdc_evolve_spec,
    q_cdc_expire_branch (guide §1)."""
    import tempfile
    from proof_of_concept___cdc_w_iceberg_spark.cdc import queries as cq
    from proof_of_concept___cdc_w_iceberg_spark.cdc.bucketed import (
        BucketedMirror)
    from proof_of_concept___cdc_w_iceberg_spark.cdc.branches import (
        BranchedMirror)

    li, changes = cq._scale_mirror_and_changes(spark, SF)
    keys = ["l_orderkey", "l_linenumber"]

    print("== q_cdc_compact_files phases ==")
    path = os.path.join(tempfile.mkdtemp(prefix="pr_compact_"), "mirror")
    m = BucketedMirror(spark, path, keys=keys, n_buckets=16)
    tic(); m.init(li, writers=8); toc("init writers=8")
    tic(); ingest_files = sum(
        len(fs) for fs in m.partition_files().values()); toc("partition_files")
    tic(); m.apply(changes); toc("apply")
    tic(); m.compact(max_files=1); toc("compact")
    tic(); after = m.partition_files(); toc("partition_files 2")
    tic(); assert m.compact(max_files=1) == {}; toc("compact idempotent")
    tic(); m.read().count(); toc("read+count")

    print("== q_cdc_evolve_spec / expire_branch totals ==")
    from proof_of_concept___cdc_w_iceberg_spark import registry
    qs = registry.queries()
    for n in ("q_cdc_evolve_spec", "q_cdc_expire_branch"):
        for i in range(2):
            tic(); qs[n](spark, SF).count(); toc(f"{n} run {i}")


def probe_init_ab(rounds: int = 3):
    """Round-robin repartition(8) (local sort) vs hash repartition on
    xxhash64(keys) for the cheap-ingest init write."""
    import tempfile
    from proof_of_concept___cdc_w_iceberg_spark.cdc import queries as cq
    from proof_of_concept___cdc_w_iceberg_spark.cdc.bucketed import (
        BucketedMirror, BUCKET_COL)

    li, _ = cq._scale_mirror_and_changes(spark, SF)
    keys = ["l_orderkey", "l_linenumber"]

    def rr():
        path = os.path.join(tempfile.mkdtemp(prefix="ab_rr_"), "m")
        m = BucketedMirror(spark, path, keys=keys, n_buckets=16)
        m.init(li, writers=8)
        return m

    def hashed():
        path = os.path.join(tempfile.mkdtemp(prefix="ab_h_"), "m")
        m = BucketedMirror(spark, path, keys=keys, n_buckets=16)
        part = m._with_bucket(li).repartition(
            8, F.xxhash64(*[F.col(k) for k in keys]))
        (part.write.mode("overwrite").partitionBy(BUCKET_COL)
         .parquet(m.path))
        with open(m._schema_path(), "w") as f:
            f.write(li.schema.json())
        return m

    for i in range(rounds):
        for label, fn in (("roundrobin", rr), ("hashed", hashed)):
            tic(); m = fn(); dt = toc(f"round {i} init {label}")
            files = sum(len(fs) for fs in m.partition_files().values())
            print(f"      files={files}")


PROBES["init_ab"] = probe_init_ab


PROBES["cdc_phases"] = probe_cdc_phases


def probe_prepare_cost(rounds: int = 3):
    """Warm cost of _prepare_batch (compact window + persist + touched
    collect) and of init, to size a prepare/init overlap."""
    import tempfile
    from proof_of_concept___cdc_w_iceberg_spark.cdc import queries as cq
    from proof_of_concept___cdc_w_iceberg_spark.cdc.branches import (
        BranchedMirror)

    li, changes = cq._scale_mirror_and_changes(spark, SF)
    keys = ["l_orderkey", "l_linenumber"]
    for i in range(rounds):
        path = os.path.join(tempfile.mkdtemp(prefix="prep_"), "m")
        m = BranchedMirror(spark, path, keys=keys, n_buckets=16)
        tic(); latest, touched = m._prepare_batch(changes); toc(
            f"round {i} prepare_batch")
        latest.unpersist()
        tic(); m.init(li); toc(f"round {i} init")


PROBES["prepare_cost"] = probe_prepare_cost


def probe_wap_prep_ab(rounds: int = 3):
    """Change-2 shape (init inline, legs overlapped) vs change-9 shape
    (init + both batch prepares overlapped too), full query flow."""
    import tempfile
    from concurrent.futures import ThreadPoolExecutor
    from proof_of_concept___cdc_w_iceberg_spark.cdc import queries as cq
    from proof_of_concept___cdc_w_iceberg_spark.cdc.branches import (
        BranchedMirror, wap_audit)

    keys = ["l_orderkey", "l_linenumber"]

    def setup():
        li, changes = cq._scale_mirror_and_changes(spark, SF)
        path = os.path.join(tempfile.mkdtemp(prefix="ab_wp_"), "mirror")
        m = BranchedMirror(spark, path, keys=keys, n_buckets=16)
        bad = li.limit(50).select(
            F.col("l_orderkey"),
            F.lit(None).cast(dict(li.dtypes)["l_linenumber"]).alias(
                "l_linenumber"),
            F.col("l_quantity").cast("double").alias("l_quantity"),
            F.col("l_extendedprice").cast("double").alias("l_extendedprice"),
            F.lit("c").alias("op"), F.lit(9000).cast("long").alias("ts_ms"),
            (F.col("l_orderkey") * 10 + F.lit(3_000_000_000)).cast("long")
            .alias("off"),
        )
        return m, li, changes, bad

    def legs(m, pool, prep_good, prep_bad, changes):
        m.branch_create("audit_good"); m.branch_create("audit_bad")

        def good():
            m.apply_to_branch("audit_good", prepared=prep_good())
            a = wap_audit(m.read_ref("audit_good").drop("__bucket"), keys,
                          batch_keys=changes)
            assert a == {"null_keys": 0, "dup_keys": 0}
            m.fast_forward("main", "audit_good")
            m.drop_branch("audit_good")

        def badleg():
            m.apply_to_branch("audit_bad", prepared=prep_bad())
            a = wap_audit(m.read_ref("audit_bad").drop("__bucket"), keys)
            assert a["null_keys"] > 0
            m.drop_branch("audit_bad")

        fg, fb = pool.submit(good), pool.submit(badleg)
        fg.result(), fb.result()
        m.read_ref("main").select(*keys, "l_quantity",
                                  "l_extendedprice").count()

    def v_change2(m, li, changes, bad):
        m.init(li)
        with ThreadPoolExecutor(max_workers=2) as pool:
            legs(m, pool, lambda: m.prepare(changes), lambda: m.prepare(bad),
                 changes)

    def v_change9(m, li, changes, bad):
        with ThreadPoolExecutor(max_workers=4) as pool:
            f_init = pool.submit(m.init, li)
            f_pg = pool.submit(m.prepare, changes)
            f_pb = pool.submit(m.prepare, bad)
            f_init.result()
            legs(m, pool, f_pg.result, f_pb.result, changes)

    for i in range(rounds):
        for label, fn in (("serial-prep", v_change2),
                          ("overlap-prep", v_change9)):
            m, li, changes, bad = setup()
            tic(); fn(m, li, changes, bad); toc(f"round {i} wap {label}")


PROBES["wap_prep_ab"] = probe_wap_prep_ab


def probe_bloom_phases(rounds: int = 3):
    """Where q_join_bloom's time goes: bloom build, fact hash+semis,
    exact join — plus a driver-collected bitmap variant."""
    from proof_of_concept___cdc_w_iceberg_spark.operators import sketches as sk

    c = load(spark, SF, "customer")
    o = load(spark, SF, "orders")
    dim = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")

    def full():
        noop(sk.bloom_reduce_join(o, dim, sk.bloom_positions(dim, "c_custkey")))

    def bloom_only():
        noop(sk.bloom_positions(dim, "c_custkey"))

    def exact_only():
        noop(o.join(F.broadcast(dim),
                    F.col("o_custkey") == F.col("c_custkey"))
             .groupBy("o_orderpriority")
             .agg(F.count("*").alias("n_orders"),
                  sk.dec_sum("o_totalprice").alias("sum_price")))

    def bitmap():
        pos = [r["pos"] for r in
               sk.bloom_positions(dim, "c_custkey").collect()]
        words = [0] * ((sk.BLOOM_M + 63) // 64)
        for p in pos:
            words[p // 64] |= 1 << (p % 64)
        # signed-long wrap for Spark long literals
        words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
        warr = F.array(*[F.lit(w).cast("long") for w in words])
        hashed = (
            o.select("*", F.expr(sk._bloom_hash_sql("o_custkey", "STRING"))
                     .alias(sk._H))
            .select("*", *[sk._bloom_pos_from_h(i).alias(f"_p{i}")
                           for i in range(sk.BLOOM_K)])
            .drop(sk._H)
            .withColumn("_bm", warr)
        )
        cond = None
        for i in range(sk.BLOOM_K):
            c_i = F.expr(
                f"(shiftright(element_at(_bm, cast(_p{i} / 64 as int) + 1), "
                f"cast(_p{i} % 64 as int)) & 1) = 1"
            )
            cond = c_i if cond is None else (cond & c_i)
        survived = hashed.filter(cond).drop(
            "_bm", *[f"_p{i}" for i in range(sk.BLOOM_K)])
        noop(survived.join(F.broadcast(dim),
                           F.col("o_custkey") == F.col("c_custkey"))
             .groupBy("o_orderpriority")
             .agg(F.count("*").alias("n_orders"),
                  sk.dec_sum("o_totalprice").alias("sum_price")))

    for i in range(rounds):
        for label, fn in (("full-semis", full), ("bloom-only", bloom_only),
                          ("exact-only", exact_only), ("bitmap", bitmap)):
            tic(); fn(); toc(f"round {i} {label}")


PROBES["bloom_phases"] = probe_bloom_phases


def probe_bucketed_prep_ab(rounds: int = 3):
    """Serial init->apply vs overlapped init+prepare for the bucketed
    mirror (q_cdc_apply_bucketed shape)."""
    import tempfile
    from concurrent.futures import ThreadPoolExecutor
    from proof_of_concept___cdc_w_iceberg_spark.cdc import queries as cq
    from proof_of_concept___cdc_w_iceberg_spark.cdc.bucketed import (
        BucketedMirror)

    li, changes = cq._scale_mirror_and_changes(spark, SF)
    keys = ["l_orderkey", "l_linenumber"]

    def serial():
        path = os.path.join(tempfile.mkdtemp(prefix="abp_s_"), "m")
        m = BucketedMirror(spark, path, keys=keys, n_buckets=16)
        m.init(li)
        m.apply(changes)
        m.read().count()

    def overlap():
        path = os.path.join(tempfile.mkdtemp(prefix="abp_o_"), "m")
        m = BucketedMirror(spark, path, keys=keys, n_buckets=16)
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_init = pool.submit(m.init, li)
            f_prep = pool.submit(m.prepare, changes)
            f_init.result()
            m.apply(prepared=f_prep.result())
        m.read().count()

    for i in range(rounds):
        for label, fn in (("serial", serial), ("overlap", overlap)):
            tic(); fn(); toc(f"round {i} bucketed {label}")


PROBES["bucketed_prep_ab"] = probe_bucketed_prep_ab


def probe_wap_race_e2e(rounds: int = 3):
    """End-to-end registered q_cdc_wap_race wall time (current code)."""
    from proof_of_concept___cdc_w_iceberg_spark import registry
    qs = registry.queries()
    for i in range(rounds):
        spark.catalog.clearCache()
        tic(); qs["q_cdc_wap_race"](spark, SF).count(); toc(
            f"round {i} q_cdc_wap_race")
        tic(); qs["q_cdc_evolve_spec"](spark, SF).count(); toc(
            f"round {i} q_cdc_evolve_spec")
        tic(); qs["q_cdc_compact_files"](spark, SF).count(); toc(
            f"round {i} q_cdc_compact_files")


PROBES["wap_race_e2e"] = probe_wap_race_e2e


def probe_cms_durable_ab(rounds: int = 3):
    """Durable CMS guard: checkpoint-then-write (old) vs write-only
    (new) state transitions, full registered flow."""
    import tempfile
    from proof_of_concept___cdc_w_iceberg_spark.streaming import queries as sq
    from proof_of_concept___cdc_w_iceberg_spark.operators.sketches import (
        cms_empty_grid, cms_topk)

    li = load(spark, SF, "lineitem").select(
        F.col("l_suppkey").alias("k"), "l_orderkey")
    empty = cms_empty_grid(li)
    batches = [
        (F.col("l_orderkey") <= 20_000, None),
        (F.col("l_orderkey").between(20_001, 40_000),
         (F.col("l_orderkey") <= 20_000) & (F.col("l_orderkey") % 7 == 3)),
        (F.col("l_orderkey") >= 40_001,
         F.col("l_orderkey").between(20_001, 40_000)
         & (F.col("l_orderkey") % 7 == 3)),
    ]

    def args(i):
        ins_cond, del_cond = batches[i]
        ins = li.filter(ins_cond).select("k")
        dels = (li.filter(del_cond).select("k") if del_cond is not None
                else li.select("k").limit(0))
        return ins, dels

    def run(apply_fn):
        path = tempfile.mkdtemp(prefix="ab_cmsd_")
        g = sq.DurableReplayGuard(spark, path, empty, apply_fn)
        assert g.apply(0, *args(0)) is True
        assert g.apply(1, *args(1)) is True
        assert g.apply(1, *args(1)) is False
        g2 = sq.DurableReplayGuard(spark, path, empty, apply_fn)
        assert g2.apply(1, *args(1)) is False
        assert g2.apply(2, *args(2)) is True
        net = li.filter(~((F.col("l_orderkey") <= 40_000)
                          & (F.col("l_orderkey") % 7 == 3)))
        keys = net.groupBy("k").agg(F.count("*").alias("exact_cnt"))
        noop(cms_topk(g2.state(), keys))

    def old_fn(state, ins, dels):
        return sq.cms_retract_apply(state, ins, dels, checkpoint=True)

    def new_fn(state, ins, dels):
        return sq.cms_retract_apply(state, ins, dels, checkpoint=False)

    for i in range(rounds):
        for label, fn in (("cp+write", old_fn), ("write-only", new_fn)):
            tic(); run(fn); toc(f"round {i} cms durable {label}")


PROBES["cms_durable_ab"] = probe_cms_durable_ab


def probe_count_regime_ab(rounds: int = 3):
    """Bench-regime (count() consumption) A/B for the substr and theta
    restructures: the bench's timed action is count(), under which a
    LAZY plan may prune subtrees an eager checkpoint always pays."""
    from proof_of_concept___cdc_w_iceberg_spark.ext import dedup as dd
    from proof_of_concept___cdc_w_iceberg_spark.operators import sketches as sk

    docs = load(spark, SF, "documents").select("doc_id", "text")
    batch = docs.filter(F.col("doc_id") % 13 == 5).select(
        (F.col("doc_id") + dd._BATCH_OFF).alias("doc_id"), "text")

    def substr_old():
        grams, hist, report = dd.substr_state_build(docs)
        grams = grams.localCheckpoint(eager=True)
        _, _, rep = dd.substr_state_apply(grams, hist, report, batch)
        rep.count()

    def substr_new():
        grams, hist, report = dd.substr_state_build(
            docs, materialize=lambda df: df.localCheckpoint(eager=True))
        report = report.localCheckpoint(eager=True)
        _, _, rep = dd.substr_state_apply(grams, hist, report, batch)
        rep.count()

    o = load(spark, SF, "orders").select("o_custkey", "o_orderdate")

    def theta_old():
        # pre-r21 readout inlined (same as theta_fresh.py's)
        def readout(sk_a, sk_b, a_keys, b_keys):
            th_a, th_b = sk._theta_of(sk_a), sk._theta_of(sk_b)
            th_u = (th_a.crossJoin(th_b.withColumnRenamed("theta", "theta_b"))
                    .select(F.least("theta", "theta_b").alias("theta")))

            def below(s, th):
                cnt = (s.crossJoin(F.broadcast(th))
                       .filter(F.col("h") < F.col("theta"))
                       .groupBy("theta").agg(F.count("*").alias("cnt")))
                return th.join(cnt, "theta", "left").select(
                    "theta",
                    F.coalesce("cnt", F.lit(0).cast("long")).alias("cnt"))

            est_a = below(sk_a, th_a).select(
                sk._theta_est("theta").alias("est"))
            est_b = below(sk_b, th_b).select(
                sk._theta_est("theta").alias("est"))
            est_u = below(sk_a.unionByName(sk_b).distinct(), th_u).select(
                sk._theta_est("theta").alias("est"))
            est_i = below(sk_a.join(sk_b, "h"), th_u).select(
                sk._theta_est("theta").alias("est"))
            ex_a = a_keys.agg(F.count("*").cast("long").alias("v"))
            ex_b = b_keys.agg(F.count("*").cast("long").alias("v"))
            ex_i = a_keys.join(b_keys, "k").agg(
                F.count("*").cast("long").alias("v"))
            ex_u = (ex_a.withColumnRenamed("v", "va")
                    .crossJoin(ex_b.withColumnRenamed("v", "vb"))
                    .crossJoin(ex_i.withColumnRenamed("v", "vi"))
                    .select((F.col("va") + F.col("vb") - F.col("vi"))
                            .alias("v")))

            def row(name, est, ex):
                return est.crossJoin(F.broadcast(ex)).select(
                    F.lit(name).alias("measure"),
                    F.round("est", 4).alias("est"),
                    F.col("v").alias("exact_v"),
                    F.round(F.try_divide(
                        F.abs(F.col("est") - F.col("v")), F.col("v")), 4
                    ).alias("rel_err"))

            return (row("distinct_a", est_a, ex_a)
                    .unionByName(row("distinct_b", est_b, ex_b))
                    .unionByName(row("union", est_u, ex_u))
                    .unionByName(row("intersection", est_i, ex_i)))

        a_keys, a_h = sk.theta_order_stream(o, 1995)
        b_keys, b_h = sk.theta_order_stream(o, 1996)
        readout(sk._theta_sketch(a_h), sk._theta_sketch(b_h),
                a_keys, b_keys).count()

    def theta_new():
        a_keys, a_h = sk.theta_order_stream(o, 1995)
        b_keys, b_h = sk.theta_order_stream(o, 1996)
        sk.theta_readout(sk._theta_sketch(a_h), sk._theta_sketch(b_h),
                         a_keys, b_keys).count()

    for i in range(rounds):
        for label, fn in (("substr old", substr_old),
                          ("substr new", substr_new),
                          ("theta  old", theta_old),
                          ("theta  new", theta_new)):
            spark.catalog.clearCache()
            tic(); fn(); toc(f"round {i} {label} (count)")


PROBES["count_regime_ab"] = probe_count_regime_ab


def probe_race_prefetch_ab(rounds: int = 4):
    """wap_race: 3 overlapped front jobs + serial cherry-pick prepare
    (A) vs 4 overlapped front jobs incl. prefetched cherry-pick (B)."""
    import tempfile
    from concurrent.futures import ThreadPoolExecutor
    from proof_of_concept___cdc_w_iceberg_spark.cdc import queries as cq
    from proof_of_concept___cdc_w_iceberg_spark.cdc.branches import (
        BranchedMirror, wap_audit)

    keys = ["l_orderkey", "l_linenumber"]

    def run(prefetch):
        li, batch_a = cq._scale_mirror_and_changes(spark, SF)
        batch_b = cq._wap_race_batch_b(li)
        path = os.path.join(tempfile.mkdtemp(prefix="abr_"), "mirror")
        m = BranchedMirror(spark, path, keys=keys, n_buckets=16)
        with ThreadPoolExecutor(max_workers=4) as pool:
            f_init = pool.submit(m.init, li)
            f_a = pool.submit(m.prepare, batch_a)
            f_b = pool.submit(m.prepare, batch_b)
            f_b2 = pool.submit(m.prepare, batch_b) if prefetch else None
            f_init.result()
            m.branch_create("race_a"); m.branch_create("race_b")
            fa = pool.submit(m.apply_to_branch, "race_a",
                             prepared=f_a.result())
            fb = pool.submit(m.apply_to_branch, "race_b",
                             prepared=f_b.result())
            fa.result(), fb.result()
            audits = {
                br: pool.submit(wap_audit,
                                m.read_ref(br).drop("__bucket"), keys, b)
                for br, b in (("race_a", batch_a), ("race_b", batch_b))
            }
            for br, fut in audits.items():
                assert fut.result() == {"null_keys": 0, "dup_keys": 0}, br
        m.fast_forward("main", "race_a")
        published = m.get_ref("main")
        try:
            m.fast_forward("main", "race_b")
            raise AssertionError
        except ValueError:
            pass
        m.drop_branch("race_b")
        m.branch_create("race_pick")
        m.apply_to_branch(
            "race_pick",
            prepared=(f_b2.result() if prefetch else m.prepare(batch_b)))
        a = wap_audit(m.read_ref("race_pick").drop("__bucket"), keys,
                      batch_keys=batch_b)
        assert a == {"null_keys": 0, "dup_keys": 0}
        m.fast_forward("main", "race_pick")
        m.drop_branch("race_a"); m.drop_branch("race_pick")
        m.read_ref("main").select(*keys, "l_quantity",
                                  "l_extendedprice").count()

    for i in range(rounds):
        for label, pf in (("serial-pick", False), ("prefetch", True)):
            tic(); run(pf); toc(f"round {i} race {label}")


PROBES["race_prefetch_ab"] = probe_race_prefetch_ab


def probe_untouched_sanity(rounds: int = 4):
    """q_centroid_classify and the quantized sim rungs were NOT touched
    this round but moved +0.4-1.1s in the close-window bench runs —
    time them warm to pin the moves on regime, not code."""
    from proof_of_concept___cdc_w_iceberg_spark import registry
    qs = registry.queries()
    for i in range(rounds):
        for n in ("q_centroid_classify", "q_sim_topk_quantized",
                  "q_sim_ivf_quantized"):
            spark.catalog.clearCache()
            tic(); qs[n](spark, SF).count(); toc(f"round {i} {n}")


PROBES["untouched_sanity"] = probe_untouched_sanity


if __name__ == "__main__":
    for name in (sys.argv[1:] or list(PROBES)):
        t0 = time.perf_counter()
        PROBES[name]()
        print(f"== total {name}: {time.perf_counter()-t0:.3f}s", flush=True)
