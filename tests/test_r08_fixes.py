"""Round-8 regression gates.

The round-8 plan audit ran every registered query under ``.count()``
(bench-shaped consumption) instead of the driver's ``.collect()`` and
exposed a Spark 4.1.2 hazard in cogrouped applyInPandas: when both
sides of the cogroup are filters of ONE scan, the sides share
attribute ids, dedup-right re-ids the right child, and column pruning
then strips every non-grouping column from the right side as soon as
any operator sits above the node. These tests pin the fixed behavior.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from proof_of_concept___cdc_w_iceberg_spark import registry

QS = registry.queries()


def test_cogrouped_survives_count_and_projection(spark, sf_dir):
    """q_udf_cogrouped must work under EVERY consumption shape, not
    just the driver's full collect: count() and a narrow projection
    both triggered the right-side pruning before the fix (the kernel
    received purchases as a key-only frame -> KeyError 'ts')."""
    df = QS["q_udf_cogrouped"](spark, sf_dir)
    n_full = len(df.toPandas())
    assert df.count() == n_full
    assert df.select("purchase_id").count() == n_full
    got = df.filter(F.col("last_click_value").isNotNull()).count()
    assert 0 < got <= n_full


def test_self_cogroup_pruning_hazard_still_present_upstream(spark, sf_dir):
    """Canary for the UPSTREAM Spark behavior the fix routes around.

    If this starts failing (i.e. the self-cogroup shape stops losing
    the right side's data columns), the Spark version has fixed
    dedup-right + column pruning for FlatMapCoGroupsInPandas and
    q_udf_cogrouped may go back to sharing one scan. Until then the
    two-scan form is load-bearing, not style.
    """
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load

    registry._ship_package(spark)
    ev = load(spark, sf_dir, "events")  # ONE scan, both sides
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )

    def probe(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": l["user_id"].head(0), "ok": []}).astype(
            {"user_id": "int64", "ok": "int64"}
        ) if "ts" in r.columns else pd.DataFrame(
            {"user_id": [-1], "ok": [0]}
        ).astype({"user_id": "int64", "ok": "int64"})

    out = (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(probe, "user_id long, ok long")
    )
    # Under count(), the hazard delivers a right frame WITHOUT 'ts':
    # the probe emits one sentinel row per group. If Spark fixes the
    # pruning, 'ts' survives and the probe emits nothing.
    pruned_groups = out.count()
    assert pruned_groups > 0, (
        "self-cogroup right-side pruning no longer reproduces — Spark "
        "fixed it; q_udf_cogrouped's two-scan workaround can be retired"
    )


def test_substr_dedup_overlap_union_and_edges(spark):
    """q_dedup_substr's engine on constructed corpora: overlapping
    duplicated windows must merge into ONE span counted once (union,
    not sum); sub-W docs pass through whole; a fully-unique doc
    reports zero; and a doc repeated verbatim is 100% duplicated."""
    from proof_of_concept___cdc_w_iceberg_spark.ext.dedup import (
        SUBSTR_W,
        substr_span_report,
    )

    w = SUBSTR_W
    # 12 tokens shared by docs 1 and 2 -> every one of the 12-w+1
    # windows is duplicated and they all overlap: exactly one span of
    # 12 tokens, never (12-w+1)*w.
    shared = " ".join(f"s{i}" for i in range(12))
    uniq1 = " ".join(f"a{i}" for i in range(w))
    uniq2 = " ".join(f"b{i}" for i in range(w))
    docs = spark.createDataFrame(
        [
            (1, f"{uniq1} {shared}"),
            (2, f"{shared} {uniq2}"),
            (3, "tiny doc"),  # < w tokens: no windows at all
            (4, " ".join(f"u{i}" for i in range(20))),  # fully unique
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in substr_span_report(docs).collect()}
    assert got[1]["dup_spans"] == 1 and got[1]["dup_tokens"] == 12
    assert got[1]["kept_tokens"] == got[1]["n_tokens"] - 12
    assert got[2]["dup_spans"] == 1 and got[2]["dup_tokens"] == 12
    assert got[3] == {
        "doc_id": 3, "n_tokens": 2, "dup_spans": 0,
        "dup_tokens": 0, "kept_tokens": 2,
    }
    assert got[4]["dup_spans"] == 0 and got[4]["kept_tokens"] == 20

    # Verbatim repeat: both copies fully duplicated, zero kept.
    rep = " ".join(f"r{i}" for i in range(15))
    docs2 = spark.createDataFrame(
        [(1, rep), (2, rep)], "doc_id long, text string"
    )
    for r in substr_span_report(docs2).collect():
        assert r["dup_tokens"] == 15 and r["kept_tokens"] == 0

    # Two DISJOINT duplicated regions in one doc stay two spans.
    sh1 = " ".join(f"x{i}" for i in range(w))
    sh2 = " ".join(f"y{i}" for i in range(w))
    gap = " ".join(f"g{i}" for i in range(3))
    docs3 = spark.createDataFrame(
        [(1, f"{sh1} {gap} {sh2}"), (2, sh1), (3, sh2)],
        "doc_id long, text string",
    )
    got3 = {r["doc_id"]: r.asDict() for r in substr_span_report(docs3).collect()}
    assert got3[1]["dup_spans"] == 2 and got3[1]["dup_tokens"] == 2 * w
    assert got3[1]["kept_tokens"] == 3


def test_substr_dedup_hashed_transport_equivalent(spark, sf_dir):
    """The xxhash64-keyed shuffle form (the 100 TB transport path) must
    produce the exact span report the string-keyed form does on the
    fixture corpus — proving the scale optimization is semantics-free
    here (64-bit collisions are negligible below 2^32 grams)."""
    from proof_of_concept___cdc_w_iceberg_spark.ext.dedup import substr_span_report
    from proof_of_concept___cdc_w_iceberg_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    a = substr_span_report(docs, hashed=False)
    b = substr_span_report(docs, hashed=True)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def _substr_reference(corpus: dict[int, list[str]], w: int):
    """Brute-force Python reference for the span report: enumerate
    every W-window, count occurrences corpus-wide, mark duplicated
    positions, take the per-doc union, and count maximal runs."""
    from collections import Counter

    occ = Counter(
        tuple(toks[i : i + w])
        for toks in corpus.values()
        for i in range(len(toks) - w + 1)
    )
    out = {}
    for doc_id, toks in corpus.items():
        covered = set()
        for i in range(len(toks) - w + 1):
            if occ[tuple(toks[i : i + w])] > 1:
                covered.update(range(i, i + w))
        spans = 0
        prev = None
        for p in sorted(covered):
            if prev is None or p != prev + 1:
                spans += 1
            prev = p
        out[doc_id] = (len(toks), spans, len(covered), len(toks) - len(covered))
    return out


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    # Tiny alphabet + short docs force heavy window collisions — the
    # regime where interval-union vs naive-sum diverge.
    corpus_strategy = st.lists(
        st.lists(st.sampled_from("abc"), min_size=0, max_size=14),
        min_size=1,
        max_size=5,
    )

    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.too_slow,
                                     HealthCheck.function_scoped_fixture])
    @given(token_lists=corpus_strategy)
    def test_substr_dedup_matches_reference_semantics(spark, token_lists):
        """substr_span_report == the brute-force reference for ANY
        corpus (random short docs over a 3-letter alphabet: repeated
        windows inside one doc, across docs, zero-window docs)."""
        from proof_of_concept___cdc_w_iceberg_spark.ext.dedup import (
            substr_span_report,
        )

        w = 3  # small W so tiny docs still produce windows
        corpus = {i: toks for i, toks in enumerate(token_lists)}
        docs = spark.createDataFrame(
            [(i, " ".join(toks) if toks else "") for i, toks in corpus.items()],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (r["n_tokens"], r["dup_spans"], r["dup_tokens"],
                          r["kept_tokens"])
            for r in substr_span_report(docs, w=w).collect()
        }
        # Empty text tokenizes to [''] on both engines: one token.
        want = _substr_reference(
            {i: (toks if toks else [""]) for i, toks in corpus.items()}, w
        )
        assert got == want

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_substr_dedup_at_paper_window_width(spark):
    """The pipeline is W-agnostic (docstring claim): at the paper's
    W=50, a 60-token region shared by two long docs yields exactly one
    60-token span each; the unique remainders survive."""
    from proof_of_concept___cdc_w_iceberg_spark.ext.dedup import substr_span_report

    shared = " ".join(f"s{i}" for i in range(60))
    u1 = " ".join(f"a{i}" for i in range(40))
    u2 = " ".join(f"b{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, f"{u1} {shared}"), (2, f"{shared} {u2}")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in substr_span_report(docs, w=50).collect()}
    for d in (1, 2):
        assert got[d]["dup_spans"] == 1
        assert got[d]["dup_tokens"] == 60
        assert got[d]["kept_tokens"] == 40
