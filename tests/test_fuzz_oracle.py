"""Cross-engine oracle fuzzing gate (r18).

The driver compare proves Spark == DuckDB on ONE fixed dataset. These
tests replay the identical compare on RANDOMIZED hostile fixtures
(tools/fuzz_fixtures.py: tie clusters in top-k value columns, exact-
and near-duplicate documents, duplicated embedding rows, zipf hot
keys) so the registered determinism rules — unique tiebreakers,
decimal sums, sequential float folds — are proven properties of the
query semantics rather than accidents of the seed-42 fixture.

The in-suite gate covers a curated one-per-family sample at one seed
(runtime-bounded); the FULL registry is swept offline per round by
``tools/fuzz_oracle.py`` (results recorded in SCALING.md r18
addendum). Generator fidelity tests pin the fixture invariants the
queries rely on (schema identity with TESTDATA.md, monotone event ts,
referential integrity) and the hostile properties the fuzz exists to
inject (ties, duplicates).
"""

from __future__ import annotations

import duckdb
import pyarrow.parquet as pq
import pytest

from tools.fuzz_fixtures import TABLES, make_tables, write_fixture
from tools.fuzz_oracle import compare_one

SEED = 18

# One representative per family: relational agg/join/window/topk/setop,
# TPC-H, CDC apply, streaming twin, dedup (exact + near), similarity,
# text, sketch, events. Chosen for coverage-per-second — the offline
# sweep covers the rest.
SAMPLE = [
    "q_tpch_q1",
    "q_tpch_q3",
    "q_agg_groupby",
    "q_agg_rollup",
    "q_join_inner",
    "q_join_asof",
    "q_win_rownumber",
    "q_topk",
    "q_union_distinct",
    "q_cdc_apply",
    "q_stream_tumbling",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_sim_topk",
    "q_text_stats",
    "q_bm25",
    "q_sketch_hll",
    "q_sessionize",
]


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fuzzfix"))
    write_fixture(SEED, d, tier="hostile")
    return d


@pytest.fixture(scope="module")
def fuzz_duck(fuzz_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{fuzz_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.fixture(scope="module")
def registry():
    import __spark_entry__ as entrymod

    return entrymod.queries(), entrymod.oracle_sql()


def test_sample_queries_registered(registry):
    qs, orc = registry
    missing = [n for n in SAMPLE if n not in qs or n not in orc]
    assert not missing, f"sample queries not registered/oracled: {missing}"


@pytest.mark.parametrize("name", SAMPLE)
def test_fuzz_oracle_agreement(spark, fuzz_dir, fuzz_duck, registry, name):
    qs, orc = registry
    status, nrows, detail = compare_one(
        spark, fuzz_duck, qs[name], orc[name], fuzz_dir
    )
    assert status == "OK", f"{name} on hostile seed {SEED}: {detail}"
    assert nrows is not None


# --- regression: the queries the r18 sweeps caught -----------------------
#
# The first full-registry fuzz sweeps (r18, hostile seeds 1-3) proved
# ROUND(double, k) diverges cross-engine when its input is already
# decimal-quantized at a few places past k (a ~1%-per-row tie
# probability): q_embed_outlier's dist2 (1.036597 vs 1.036596, seed
# 1), q_rerank's final_score (6.20865 blend boundary, seed 1), and
# q_udaf_grouped's mean (group size 8 → the 2-dp sum's quotient
# TERMINATES at 5 dp: 4323.76125, seed 2). All — plus the same
# pattern feeding q_centroid_classify's argmin — now round in exact
# DECIMAL/integer arithmetic. Pin each fix at the seed that fired.

FUZZ_REGRESSION = [
    ("q_embed_outlier", 1, "hostile"),
    ("q_rerank", 1, "hostile"),
    ("q_centroid_classify", 1, "hostile"),
    ("q_udaf_grouped", 2, "hostile"),
    # seed 5: Spark unix_timestamp TRUNCATES to seconds vs DuckDB
    # epoch()'s fractional DOUBLE — a RANGE frame admitted an event
    # 3600.02 s back on one side only. Fixed by µs-integer keys
    # (unix_micros / epoch_us) on both engines.
    ("q_win_time_range", 5, "hostile"),
    # The forced-size 'ties' tier caught the ROUND-after-division
    # class live (means over 2-adically tie-eligible group sizes) and
    # q_sample_stratified's fixed-fraction sampling bound (legit
    # Bin(40, 0.1) noise); all now exact-integer rdiv / σ-scaled.
    ("q_agg_moments", 48, "ties"),
    ("q_sample_stratified", 48, "ties"),
    ("q_ts_seasonal", 49, "ties"),
    # Representatives of the census-fixed integer-ratio family, on the
    # forced-size fixtures that make their denominators tie-eligible.
    ("q_ts_out_of_order", 48, "ties"),
    ("q_skew_diagnose", 48, "ties"),
    ("q_text_readability", 49, "ties"),
    # r19 'nulls' tier (seed 3, first sweep: 20 queries diverged).
    # The classes and one pinned representative each: window NULL
    # ordering (Spark ASC=NULLS FIRST vs DuckDB ASC=NULLS LAST shifts
    # every subsequent rank), rank statistics over a nullable measure
    # (filtered to observed values on both sides), zero-variance 0/0
    # (Spark ANSI DIVIDE_BY_ZERO vs DuckDB NULL — guarded to NULL),
    # NaN through a Pandas-UDF int64 cast, NULL group keys through a
    # full-outer IVM merge (join keys never match NULL; now a
    # union+re-aggregate monoid merge), NULL-absorbing Spark concat vs
    # NULL-skipping DuckDB concat, and to_json dropping NULL fields.
    ("q_win_percent_rank", 3, "nulls"),
    ("q_agg_trimmed", 3, "nulls"),
    ("q_agg_moments", 3, "nulls"),
    ("q_udaf_grouped", 3, "nulls"),
    ("q_centroid_incremental", 3, "nulls"),
    ("q_str_funcs", 3, "nulls"),
    ("q_struct_ops", 3, "nulls"),
    ("q_agg_argmax", 3, "nulls"),
    ("q_stream_sketch", 3, "nulls"),
    # nulls seed 4 caught a DIFFERENT class in q_agg_moments: DuckDB's
    # native DECIMAL→DOUBLE cast double-rounds (int128→double, THEN
    # /10^scale) and lands an ulp below Spark's correctly-rounded
    # Decimal.toDouble once the unscaled value exceeds 2^53 — which
    # flipped an rdiv floor at a constructed tie. Fixed by dec2d_sql
    # (VARCHAR-mediated cast = strtod's single correct rounding).
    ("q_agg_moments", 4, "nulls"),
    # nulls seed 5 caught the SIGNED-ZERO class: a tiny-negative mean
    # rounds to -0.0 in DuckDB's double ROUND (rint keeps the sign)
    # while Spark's round (BigDecimal HALF_UP) always returns +0.0 —
    # and the hash canon distinguishes repr(-0.0) from repr(0.0).
    # Fixed by "+ 0" on the oracle side (IEEE -0.0 + 0 = +0.0). The
    # embedding-centroid family has the highest hit density (symmetric
    # near-zero means, ~4% per fixture); a detector sweep over all 341
    # oracle outputs at sf0.01 found zero ACTIVE emitters elsewhere
    # (SCALING.md r19 addendum).
    ("q_embed_centroid", 5, "nulls"),
    ("q_centroid_incremental", 5, "nulls"),
]


@pytest.fixture(scope="module")
def regression_fixtures(tmp_path_factory):
    """(tier, seed) -> (fixture dir, duckdb con with views)."""
    out = {}
    for tier, seed in sorted({(t, s) for _, s, t in FUZZ_REGRESSION}):
        d = str(tmp_path_factory.mktemp(f"fuzzfix_{tier}_s{seed}"))
        write_fixture(seed, d, tier=tier)
        con = duckdb.connect()
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
        out[(tier, seed)] = (d, con)
    yield out
    for _, con in out.values():
        con.close()


@pytest.mark.parametrize("name,seed,tier", FUZZ_REGRESSION)
def test_decimal_round_fix_regression(
    spark, regression_fixtures, registry, name, seed, tier
):
    qs, orc = registry
    d, con = regression_fixtures[(tier, seed)]
    status, _, detail = compare_one(spark, con, qs[name], orc[name], d)
    assert status == "OK", (
        f"{name} regressed on the {tier} seed-{seed} boundary: {detail}"
    )


# --- generator fidelity -------------------------------------------------


def test_fixture_schema_identical_to_testdata(fuzz_dir, sf_dir):
    for t in TABLES:
        ref = [(f.name, str(f.type)) for f in pq.read_schema(f"{sf_dir}/{t}.parquet")]
        fz = [(f.name, str(f.type)) for f in pq.read_schema(f"{fuzz_dir}/{t}.parquet")]
        assert fz == ref, f"{t}: schema drifted from TESTDATA"


def test_fixture_determinism():
    a = make_tables(7, tier="hostile")
    b = make_tables(7, tier="hostile")
    for t in TABLES:
        assert a[t].equals(b[t]), f"{t}: same seed must be byte-identical"
    c = make_tables(8, tier="hostile")
    assert not a["orders"].equals(c["orders"]), "different seeds must differ"


def test_hostile_tier_injects_edges():
    tbls = make_tables(SEED, tier="hostile")
    prices = tbls["orders"].column("o_totalprice").to_pylist()
    assert len(prices) > len(set(prices)), "hostile tier must plant price ties"
    texts = tbls["documents"].column("text").to_pylist()
    assert len(texts) > len(set(texts)), "hostile tier must plant duplicate docs"
    embs = [tuple(v) for v in tbls["embeddings"].column("embedding").to_pylist()]
    assert len(embs) > len(set(embs)), "hostile tier must plant duplicate vectors"


def test_plain_tier_is_clean():
    tbls = make_tables(SEED, tier="plain")
    texts = tbls["documents"].column("text").to_pylist()
    assert len(texts) == len(set(texts))


def test_nulls_tier_injects_edges():
    """The r19 'nulls' tier must actually produce the degenerate
    shapes its sweep exists to exercise."""
    tbls = make_tables(SEED, tier="nulls")
    c = tbls["customer"]
    assert c.column("c_acctbal").null_count > 0
    assert c.column("c_mktsegment").null_count > 0
    o = tbls["orders"]
    assert o.column("o_totalprice").null_count > 0
    # zero-variance group: every 5-LOW order at exactly 1000.00
    low = [
        v for p, v in zip(
            o.column("o_orderpriority").to_pylist(),
            o.column("o_totalprice").to_pylist(),
        ) if p == "5-LOW"
    ]
    assert low and set(low) == {1000.00}
    ev = tbls["events"]
    assert "signup" not in set(ev.column("event_type").to_pylist())
    u0 = [
        v for u, v in zip(
            ev.column("user_id").to_pylist(), ev.column("value").to_pylist()
        ) if u == 0
    ]
    assert len(u0) > 1 and set(u0) == {50.00}
    # all-negative group: nation-3 balances strictly < 0 (never NULL)
    neg = [
        b for nk, b in zip(
            c.column("c_nationkey").to_pylist(),
            c.column("c_acctbal").to_pylist(),
        ) if nk == 3
    ]
    assert neg and all(b is not None and b < 0 for b in neg)
    # keys and text stay dense — NULLs go in payloads only
    assert tbls["documents"].column("text").null_count == 0
    for t, k in [("customer", "c_custkey"), ("orders", "o_orderkey"),
                 ("events", "event_id"), ("documents", "doc_id")]:
        assert tbls[t].column(k).null_count == 0


def test_unicode_tier_injects_multibyte():
    """The r19 'unicode' tier mixes multi-byte words into documents
    while keeping the codepoint-count law (n_chars == Python len ==
    Spark length == DuckDB len) and the fixture vocab's query terms
    selectable."""
    tbls = make_tables(SEED, tier="unicode")
    texts = tbls["documents"].column("text").to_pylist()
    nonascii = sum(1 for t in texts if any(ord(ch) > 127 for ch in t))
    assert nonascii > len(texts) * 0.5
    # astral-plane coverage (the UTF-16-code-unit trap)
    assert any(any(ord(ch) > 0xFFFF for ch in t) for t in texts)
    assert tbls["documents"].column("n_chars").to_pylist() == [
        len(t) for t in texts
    ]
    # the registered BM25/hybrid query terms still occur in the corpus
    joined = " ".join(texts)
    for term in ("vector", "merge", "stream"):
        assert term in joined


def test_no_active_signed_zero_emitters(registry):
    """No registered oracle emits -0.0 on the driver fixture (the r19
    signed-zero class: DuckDB's double ROUND keeps the sign of a
    tiny-negative value, Spark's round never does, and the hash canon
    distinguishes the reprs). A query whose data drifts into emitting
    one must normalize with '+ 0' oracle-side, as the embedding-
    centroid family does. Incidentally proves every oracle runs clean
    in DuckDB at sf0.001."""
    import math

    _, orc = registry
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'/root/testdata/sf0.001/{t}.parquet'"
        )
    emitters = {}
    for name, sql in orc.items():
        rows = con.sql(sql).fetchall()
        c = sum(
            1
            for r in rows
            for v in r
            if isinstance(v, float) and v == 0.0 and math.copysign(1, v) < 0
        )
        if c:
            emitters[name] = c
    con.close()
    assert not emitters, f"active signed-zero emitters: {emitters}"


def test_merge_round_artifact(tmp_path, monkeypatch):
    """FUZZ_r{N}.json accumulates across tier/seed sweeps (r18 verdict
    item 3: the campaign evidence is machine-checkable, keyed
    tier/seed/query, merged not clobbered)."""
    import tools.fuzz_oracle as fo

    monkeypatch.setattr(fo, "REPO", str(tmp_path))
    p1 = fo.merge_round_artifact(
        19, "nulls", {"3/q_x": {"status": "OK", "rows": 1, "detail": ""}}
    )
    p2 = fo.merge_round_artifact(
        19, "unicode", {"3/q_x": {"status": "OK", "rows": 2, "detail": ""}}
    )
    assert p1 == p2 == str(tmp_path / "FUZZ_r19.json")
    import json as _json

    with open(p1) as fh:
        doc = _json.load(fh)
    assert doc["nulls/3/q_x"]["rows"] == 1
    assert doc["unicode/3/q_x"]["rows"] == 2


def test_tier_exclusions_are_declared_with_reasons():
    """Every tier exclusion carries a non-empty contract reason and
    names a registered query — the no-silent-caps discipline."""
    import __spark_entry__ as entrymod
    from tools.fuzz_oracle import TIER_EXCLUSIONS, TIERS

    qs = entrymod.queries()
    for tier, excl in TIER_EXCLUSIONS.items():
        assert tier in TIERS
        for name, reason in excl.items():
            assert name in qs, name
            assert reason.strip()


def test_new_tiers_deterministic():
    for tier in ("nulls", "unicode"):
        a = make_tables(9, tier=tier)
        b = make_tables(9, tier=tier)
        for t in TABLES:
            assert a[t].equals(b[t]), (tier, t)


def test_fixture_invariants():
    """Invariants the fixed fixture has and queries may rely on."""
    tbls = make_tables(SEED, tier="hostile")
    # events.ts monotone in event_id (as-of/sessionize shape)
    ts = tbls["events"].column("ts").to_pylist()
    assert all(a <= b for a, b in zip(ts, ts[1:]))
    # referential integrity
    custkeys = set(tbls["customer"].column("c_custkey").to_pylist())
    assert set(tbls["orders"].column("o_custkey").to_pylist()) <= custkeys
    okeys = set(tbls["orders"].column("o_orderkey").to_pylist())
    assert set(tbls["lineitem"].column("l_orderkey").to_pylist()) <= okeys
    # n_chars consistency
    docs = tbls["documents"]
    assert docs.column("n_chars").to_pylist() == [
        len(t) for t in docs.column("text").to_pylist()
    ]
    # primary keys unique + dense from 0
    for t, k in [
        ("orders", "o_orderkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
        ("customer", "c_custkey"),
    ]:
        keys = tbls[t].column(k).to_pylist()
        assert keys == list(range(len(keys))), f"{t}.{k} not dense"
