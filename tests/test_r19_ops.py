"""Round-19 session tests: the q_search_hybrid registration, the r18
ADVICE hardenings (rdiv_sql parenthesization, the rdiv exactness debug
guard, exact-integer oracle twins for the two Python-bignum UDF
sites), and the r19 window projection (ledger-relative, stands down
once CORRECTNESS_r19 lands)."""

from __future__ import annotations

import json
import os

import duckdb
import pytest

from proof_of_concept___cdc_w_iceberg_spark import registry
from proof_of_concept___cdc_w_iceberg_spark.operators._util import (
    RDIV_DEBUG_ENV,
    rdiv,
    rdiv_sql,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# --- q_search_hybrid registration ------------------------------------------


def test_hybrid_registered_with_its_proven_oracle():
    """The r19 rung registered under the exact oracle its r17 law test
    proved (the formatted HYBRID_RRF_SQL, not the {sqnorm}/{dot}
    template), wrapping the staged library function unchanged."""
    from proof_of_concept___cdc_w_iceberg_spark.ext import text

    qs = registry.queries()
    ors = registry.oracles()
    assert "q_search_hybrid" in qs
    assert ors["q_search_hybrid"] == text.HYBRID_RRF_SQL
    assert "{sqnorm}" not in ors["q_search_hybrid"]
    assert qs["q_search_hybrid"].__wrapped__ is text.hybrid_rrf_query.__wrapped__


# --- rdiv hardenings (r18 advice) -------------------------------------------


def test_rdiv_sql_parenthesizes_interpolations():
    """num/den are wrapped as ({num})/({den}) so a lower-precedence
    expression cannot silently change semantics inside the CASE WHEN /
    2.0 * CAST contexts."""
    sql = rdiv_sql("a - b", "c + d", 2)
    assert "(a - b)" in sql and "(c + d)" in sql
    # A compound expression evaluates correctly end to end: CASE WHEN
    # would mis-associate an unparenthesized OR-containing numerator.
    con = duckdb.connect()
    expr = rdiv_sql("CASE WHEN 1=1 OR 1=0 THEN -25 ELSE 0 END", "2 + 8", 1)
    (got,) = con.sql(f"SELECT {expr}").fetchall()[0]
    assert got == -2.5  # half-away(-25/10, 1dp)


def test_rdiv_debug_guard(spark, monkeypatch):
    """With RDIV_DEBUG_ENV set, rdiv(exact=True) asserts its 2^53
    exactness premise at runtime; exact=False (the documented degraded
    regime, e.g. q_agg_moments' var_pop numerator) is exempt."""
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        F.lit(7).cast("double").alias("small"),
        F.lit(float(2**60)).alias("huge"),
        F.lit(2).cast("double").alias("den"),
    )
    monkeypatch.setenv(RDIV_DEBUG_ENV, "1")
    ok = df.select(rdiv(F.col("small"), F.col("den"), 1).alias("v")).collect()
    assert ok[0]["v"] == 3.5
    with pytest.raises(Exception, match="2\\^53|assert"):
        df.select(rdiv(F.col("huge"), F.col("den"), 4).alias("v")).collect()
    # degraded regime: declared, so no assertion fires
    deg = df.select(
        rdiv(F.col("huge"), F.col("den"), 4, exact=False).alias("v")
    ).collect()
    assert deg[0]["v"] is not None
    # and with the env unset the guard is compiled out entirely
    monkeypatch.delenv(RDIV_DEBUG_ENV)
    off = df.select(rdiv(F.col("huge"), F.col("den"), 4).alias("v")).collect()
    assert off[0]["v"] == deg[0]["v"]


def test_udaf_oracle_is_exact_integer_twin():
    """The q_udaf_grouped oracle now rounds with HUGEINT floordiv — the
    exact-integer twin of the UDF's Python bignum formula — so the
    r18-fuzzer tie case (n=8, mean 4323.76125) rounds half-away to
    .7613 on both sides with no 2^53 magnitude premise."""
    con = duckdb.connect()
    cents, n = 3459009, 8  # sum 34590.09 over 8 rows -> 4323.76125
    (got,) = con.sql(
        f"""SELECT (CASE WHEN {cents} >= 0 THEN 1 ELSE -1 END)
              * ((2 * CAST(ABS({cents}) AS HUGEINT) * 100 + {n}) // (2 * {n}))
              / 10000.0"""
    ).fetchall()[0]
    assert got == 4323.7613
    q = (2 * abs(cents) * 100 + n) // (2 * n)  # the UDF's exact formula
    assert got == q / 10000.0
    # negative mirror: half-AWAY, not floor
    (neg,) = con.sql(
        f"""SELECT (CASE WHEN {-cents} >= 0 THEN 1 ELSE -1 END)
              * ((2 * CAST(ABS({-cents}) AS HUGEINT) * 100 + {n}) // (2 * {n}))
              / 10000.0"""
    ).fetchall()[0]
    assert neg == -4323.7613
    # and the registered oracle actually carries the HUGEINT form
    assert "HUGEINT" in registry.oracles()["q_udaf_grouped"]
    assert "HUGEINT" in registry.oracles()["q_multimodal_features"]


def test_fingerprint_guard_rejects_midstring_block():
    """The stale-process guard must reject a getsource block that
    CONTAINS the def line but does not START at the decorator/def
    (r19: a +6-line import shift above q_funnel produced exactly that
    — the containment check passed, a bogus fingerprint persisted,
    and an unchanged query spuriously re-fronted)."""
    from unittest import mock

    def fake_fn():  # pragma: no cover - source never executed
        pass

    shifted = '    SELECT 1 AS x\n"""\n\n\n@query("q")\ndef fake_fn():\n    pass\n'
    with mock.patch("inspect.getsource", return_value=shifted):
        assert registry._fingerprint(fake_fn, None) is None
    ok = '@query("q")\ndef fake_fn():\n    pass\n'
    with mock.patch("inspect.getsource", return_value=ok):
        assert registry._fingerprint(fake_fn, None) is not None


def test_no_bogus_refronts():
    """Every since>=19 stamp corresponds to a LIVE fingerprint match
    (the registry reconciled it) — and the map is identical across two
    consecutive loads, so no entry is flapping between a bogus and a
    real fingerprint (the failure mode behind q_funnel's spurious
    stamp)."""
    m1 = dict(registry.modified_map())
    m2 = dict(registry.modified_map())
    assert m1 == m2


# --- r19 window projection (ledger-relative) --------------------------------


def test_r19_window_projection():
    """The r19 driver window fronts the 33 fingerprint re-fronts (16
    from the rdiv_sql parenthesization + exact-twin oracle fixes, 18
    from the 'nulls' fuzz-tier campaign with 2 overlapping, plus
    q_embed_centroid from the signed-zero fix) and the newly
    registered q_search_hybrid — 34 needs-check rows — keeps the
    promoted no-oracle rotation (q_ddl_create re-earning its liveness
    row), then sweeps the 15 stalest r11 rows. 16 of the 17 remaining
    r11-stale rows are covered (q_sketch_quantile_grouped rides in
    the front block as a nulls-campaign re-front); q_tpch_q9 is the
    ONE row the campaign displaces into r20 — the deliberate trade
    (driver-re-verifying every semantics fix outranks one sweep row,
    and q_tpch_q9 went through this session's 343/343 full-registry
    drive hash-green, so it carries no silent breakage).

    Ledger-relative: computed from the artifacts + fingerprint stamps
    on disk; SKIPS once an artifact newer than r18 lands (that skip is
    the pin standing down as designed — suite skip count is 5 before
    the driver drops CORRECTNESS_r19.json and 6 after, not a
    regression)."""
    latest = registry._latest_artifact_round(REPO)
    if latest != 18:
        pytest.skip(f"projection keyed to the r18 ledger; latest={latest}")
    window = list(registry.queries())[:50]

    with open(os.path.join(REPO, "QUERY_FINGERPRINTS.json")) as fh:
        fps = json.load(fh)
    refronted = {k for k, v in fps.items() if int(v.get("since", 0)) >= 19}
    front = sorted(
        refronted | {"q_search_hybrid"},
        key=lambda n: (registry._family_rank(n), n),
    )
    assert len(front) == 34, sorted(front)
    assert window[: len(front)] == front
    assert window[len(front)] == "q_ddl_create"  # promoted liveness slot

    # Independent staleness computation straight from the artifacts.
    last: dict[str, int] = {}
    ok: dict[str, bool] = {}
    arts = [
        f for f in os.listdir(REPO)
        if f.startswith("CORRECTNESS_r") and f.endswith(".json")
    ]
    for fname in sorted(arts, key=lambda f: int(f[13:-5])):
        with open(os.path.join(REPO, fname)) as fh:
            for name, row in json.load(fh).items():
                last[name] = int(fname[13:-5])
                ok[name] = registry._row_passed(row)
    oracle_names = set(registry.oracles())
    modified = registry.modified_map()
    greens = sorted(
        (last[n], n) for n in oracle_names
        if n in last and ok[n] and last[n] >= modified.get(n, 0)
    )
    n_sweep = 50 - len(front) - 1
    expected_sweep = [n for _, n in greens[:n_sweep]]
    assert window[len(front) + 1 :] == expected_sweep
    # 15 r11 rows fit; q_tpch_q9 (the 16th-stalest) heads the r20 sweep
    assert [rnd for rnd, _ in greens[:n_sweep]] == [11] * 15
    assert greens[n_sweep][1] == "q_tpch_q9"
