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
