"""Round-10 fixes: the q_dedup_substr stop-gram DF cap as real code
(r8/r9 verdict carry: the hot-gram hazard was prose at scale) and the
ExactSubstr REMOVAL step (substr_rewrite / q_dedup_substr_rewrite).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from proof_of_concept___cdc_w_iceberg_spark.ext.dedup import (
    SUBSTR_MAX_GRAM_DF,
    SUBSTR_W,
    substr_rewrite,
    substr_span_report,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _boiler_corpus(spark, n_docs=12):
    """Every doc opens with the same W-token boilerplate header (a
    degenerate gram: corpus frequency n_docs) followed by a unique
    tail; docs 0 and 1 additionally share a genuine W-token duplicate
    in their tails (frequency 2 — under any sane cap)."""
    boiler = " ".join(f"h{i}" for i in range(SUBSTR_W))
    pair = " ".join(f"p{i}" for i in range(SUBSTR_W))
    rows = []
    for d in range(n_docs):
        tail = pair if d < 2 else " ".join(f"u{d}x{i}" for i in range(SUBSTR_W))
        rows.append((d, f"{boiler} {tail}"))
    return _docs(spark, rows)


def test_stop_gram_cap_excludes_degenerate_grams(spark):
    docs = _boiler_corpus(spark)
    # Cap below the boilerplate's corpus frequency (12): the header
    # gram is a stop-gram — only the genuine 2x duplicate marks spans.
    # (Grams STRADDLING the header/tail boundary have frequency 1 for
    # d >= 2 and 2 for the pair docs, so capped output is: pair docs
    # lose everything from the first straddling dup gram on; others
    # report nothing.)
    capped = {
        r["doc_id"]: r
        for r in substr_span_report(docs, max_gram_df=5).collect()
    }
    for d in range(2, 12):
        assert capped[d]["dup_tokens"] == 0, "stop-gram leaked into spans"
        assert capped[d]["kept_tokens"] == capped[d]["n_tokens"]
    # The under-cap genuine duplicate is still caught in docs 0/1:
    # every gram they carry occurs twice (boiler, straddle, pair) but
    # only the boiler-only grams are over cap -> the duplicated span
    # starts at the first straddling gram (start 1) and runs to the
    # end (2W tokens total, span [1, 2W)).
    for d in (0, 1):
        assert capped[d]["dup_spans"] == 1
        assert capped[d]["dup_tokens"] == 2 * SUBSTR_W - 1

    # Default cap (fixture-safe): never fires -> the header itself is
    # a corpus-wide duplicate and every doc is fully covered.
    uncapped = {
        r["doc_id"]: r
        for r in substr_span_report(docs, max_gram_df=SUBSTR_MAX_GRAM_DF).collect()
    }
    for d in (0, 1):
        assert uncapped[d]["dup_tokens"] == 2 * SUBSTR_W
        assert uncapped[d]["kept_tokens"] == 0
    for d in range(2, 12):
        assert uncapped[d]["dup_tokens"] == SUBSTR_W
        assert uncapped[d]["kept_tokens"] == SUBSTR_W
    spark.catalog.clearCache()


def test_rewrite_matches_report_and_reconstructs(spark):
    docs = _docs(
        spark,
        [
            # 'a0..a7' duplicated between 0 and 1 (head of 0, tail of 1)
            (0, " ".join(f"a{i}" for i in range(SUBSTR_W)) + " tail0 tail1"),
            (1, "head0 head1 " + " ".join(f"a{i}" for i in range(SUBSTR_W))),
            (2, "short doc"),
            # fully duplicated pair
            (3, " ".join(f"b{i}" for i in range(SUBSTR_W))),
            (4, " ".join(f"b{i}" for i in range(SUBSTR_W))),
        ],
    )
    got = {r["doc_id"]: r for r in substr_rewrite(docs).collect()}
    assert got[0]["kept_text"] == "tail0 tail1"
    assert got[1]["kept_text"] == "head0 head1"
    assert got[2]["kept_text"] == "short doc"  # < W tokens: untouched
    assert got[3]["kept_text"] == "" and got[3]["kept_tokens"] == 0
    assert got[4]["kept_text"] == "" and got[4]["kept_tokens"] == 0

    # kept_tokens must agree with the report's accounting, and
    # kept_text's token count must equal kept_tokens.
    rep = {r["doc_id"]: r for r in substr_span_report(docs).collect()}
    for d, r in got.items():
        assert r["kept_tokens"] == rep[d]["kept_tokens"]
        n = len(r["kept_text"].split()) if r["kept_text"] else 0
        assert n == r["kept_tokens"]
    spark.catalog.clearCache()


def test_rewrite_respects_stop_gram_cap(spark):
    docs = _boiler_corpus(spark)
    got = {
        r["doc_id"]: r for r in substr_rewrite(docs, max_gram_df=5).collect()
    }
    boiler = " ".join(f"h{i}" for i in range(SUBSTR_W))
    for d in range(2, 12):
        # Header is a stop-gram -> untouched.
        assert got[d]["kept_text"].startswith(boiler)
        assert got[d]["kept_tokens"] == 2 * SUBSTR_W
    for d in (0, 1):
        # Span [1, 2W): only the header's first token survives.
        assert got[d]["kept_text"] == "h0"
    spark.catalog.clearCache()


def _rewrite_reference(corpus: dict[int, list[str]], w: int):
    """Brute-force Python reference for the REMOVAL step: mark every
    position covered by a corpus-duplicated W-window, keep the rest."""
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
        kept = [t for p, t in enumerate(toks) if p not in covered]
        out[doc_id] = (len(kept), " ".join(kept))
    return out


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    corpus_strategy = st.lists(
        st.lists(st.sampled_from("abc"), min_size=0, max_size=14),
        min_size=1,
        max_size=5,
    )

    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.too_slow,
                                     HealthCheck.function_scoped_fixture])
    @given(token_lists=corpus_strategy)
    def test_substr_rewrite_matches_reference_semantics(spark, token_lists):
        """substr_rewrite == the brute-force removal reference for ANY
        corpus in the heavy-collision regime (3-letter alphabet)."""
        w = 3
        corpus = {i: toks for i, toks in enumerate(token_lists)}
        docs = _docs(
            spark,
            [(i, " ".join(toks) if toks else "") for i, toks in corpus.items()],
        )
        got = {
            r["doc_id"]: (r["kept_tokens"], r["kept_text"])
            for r in substr_rewrite(docs, w=w).collect()
        }
        # Empty text tokenizes to [''] on both engines: one token.
        want = _rewrite_reference(
            {i: (toks if toks else [""]) for i, toks in corpus.items()}, w
        )
        assert got == want

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_substr_plan_has_no_gram_window_partition(spark, sf_dir):
    """Plan gate for the r10 restructure: duplication scoring must be
    a gram-keyed HASH AGGREGATE (map-side combinable histogram), and
    every window in the plan must partition by doc_id — a window
    partitioned by gram is the unbounded hot-partition hazard the
    restructure removed."""
    from proof_of_concept___cdc_w_iceberg_spark import registry

    for name in ("q_dedup_substr", "q_dedup_substr_rewrite"):
        df = registry.queries()[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        specs = [
            seg.split(",")[0]
            for seg in plan.split("windowspecdefinition(")[1:]
        ]
        assert specs, f"{name}: span merge windows missing from plan"
        for s in specs:
            assert s.strip().startswith("doc_id#"), (
                f"{name}: window partitioned by {s!r}, not doc_id"
            )
        assert "windowspecdefinition(gram" not in plan
        # The histogram: a hash aggregate keyed on gram.
        assert "hashaggregate(keys=[gram#" in plan.lower().replace(" ", ""), (
            f"{name}: gram histogram aggregate missing"
        )
    spark.catalog.clearCache()


def _state_frames_equal(got, want, what):
    assert got.exceptAll(want).count() == 0, f"{what}: extra rows"
    assert want.exceptAll(got).count() == 0, f"{what}: missing rows"


def test_substr_state_apply_equals_rebuild(spark, tmp_path):
    """The span rung's IVM law: sequential applies over epoch-cycled
    state == one full rebuild, including the RETROACTIVE flip (a batch
    doc makes a previously-unique corpus gram duplicated)."""
    from proof_of_concept___cdc_w_iceberg_spark.ext.dedup import (
        cycle_state,
        substr_state_apply,
        substr_state_build,
    )

    w = 3
    corpus = _docs(
        spark,
        [
            (0, "a b c d e"),          # duplicated by batch1's doc 100
            (1, "f g h i j"),          # duplicated by batch2's doc 101
            (2, "k l m n o"),          # never duplicated
            (3, "x"),                  # < w tokens
        ],
    )
    b1 = _docs(spark, [(100, "a b c d e")])
    b2 = _docs(spark, [(101, "f g h i j"), (102, "p q r s t")])

    grams, hist, report = substr_state_build(corpus, w=w)
    base = str(tmp_path / "substr_state")
    for batch in (b1, b2):
        st = cycle_state(base, {"grams": grams, "hist": hist, "report": report})
        grams, hist, report = st["grams"], st["hist"], st["report"]
        grams, hist, report = substr_state_apply(grams, hist, report, batch, w=w)

    all_docs = corpus.unionByName(b1).unionByName(b2)
    wg, wh, wr = substr_state_build(all_docs, w=w)
    _state_frames_equal(grams, wg, "grams")
    _state_frames_equal(hist, wh, "hist")
    _state_frames_equal(report, wr, "report")

    # Spot-check the retroactive semantics: docs 0/1 were span-free at
    # build time and are now fully duplicated.
    rows = {r["doc_id"]: r for r in report.collect()}
    for d in (0, 1, 100, 101):
        assert rows[d]["dup_tokens"] == 5 and rows[d]["kept_tokens"] == 0
    for d in (2, 3, 102):
        assert rows[d]["dup_tokens"] == 0
    spark.catalog.clearCache()


def test_substr_state_apply_cap_crossing(spark):
    """A batch occurrence pushing a gram OVER the stop-gram cap must
    retroactively SHRINK corpus spans — and still equal the rebuild."""
    from proof_of_concept___cdc_w_iceberg_spark.ext.dedup import (
        substr_state_apply,
        substr_state_build,
    )

    w, cap = 3, 2
    # 'c0 c1 c2' occurs twice in the corpus (df=2 <= cap: a real dup),
    # a third time in the batch (df=3 > cap: becomes a stop-gram).
    corpus = _docs(
        spark, [(0, "c0 c1 c2 u0"), (1, "u1 c0 c1 c2"), (2, "v0 v1 v2 v3")]
    )
    batch = _docs(spark, [(100, "c0 c1 c2 w0")])

    _, _, before = substr_state_build(corpus, w=w, max_gram_df=cap)
    brows = {r["doc_id"]: r for r in before.collect()}
    assert brows[0]["dup_tokens"] == 3 and brows[1]["dup_tokens"] == 3

    g, h, r = substr_state_build(corpus, w=w, max_gram_df=cap)
    g, h, r = substr_state_apply(g, h, r, batch, w=w, max_gram_df=cap)
    wg, wh, wr = substr_state_build(
        corpus.unionByName(batch), w=w, max_gram_df=cap
    )
    _state_frames_equal(r, wr, "report")
    _state_frames_equal(h, wh, "hist")
    arows = {r_["doc_id"]: r_ for r_ in r.collect()}
    for d in (0, 1, 100):  # the shared gram is now over-cap: no spans
        assert arows[d]["dup_tokens"] == 0
    spark.catalog.clearCache()
