"""Plan-shape ledger gate (r18).

tools/plan_ledger.py records every registered query's physical-plan
shape metrics (shuffle/broadcast exchange counts, join strategies,
codegen spans) into PLAN_LEDGER.json — the committed record of the
plans the engine SHIPS. These tests keep the ledger honest:

- coverage: one row per registered query, none errored;
- hygiene: the ledger's cartesian/BNLJ columns agree with
  test_plan_sweep's allowlist (the two instruments must never
  disagree about which queries carry a bounded nested loop);
- regression: a live recompute of the headline subset must match the
  committed ledger exactly — a broadcast join degrading to sort-merge
  or a refactor adding a shuffle fails HERE, not as wall-clock drift
  three rounds later. The full-registry recompute is the per-round
  offline sweep (tools/plan_ledger.py --check).
"""

from __future__ import annotations

import json
import os

import pytest

from proof_of_concept___cdc_w_iceberg_spark import registry
from tools.plan_ledger import LEDGER_FILE, SF_DIR, plan_metrics

# Headline + the round's new rungs: cheap plans whose shape is the
# engine's public story. (CDC multi-commit and ANN-build queries are
# deliberately absent here — their fn bodies execute real commits, so
# they are exercised by the offline sweep only.)
REGRESSION_SET = [
    "q_tpch_q1",
    "q_tpch_q3",
    "q_join_broadcast",
    "q_join_asof",
    "q_dedup_minhash",
    "q_sim_topk",
    "q_text_stats",
    "q_sessionize",
]


@pytest.fixture(scope="module")
def ledger():
    if not os.path.exists(LEDGER_FILE):
        pytest.skip("PLAN_LEDGER.json not yet generated")
    with open(LEDGER_FILE) as f:
        return json.load(f)


def test_ledger_covers_every_registered_query(ledger):
    registered = set(registry.queries())
    missing = registered - set(ledger)
    extra = set(ledger) - registered
    assert not missing, f"queries with no plan row: {sorted(missing)[:10]}"
    assert not extra, f"ledger rows for unregistered queries: {sorted(extra)[:10]}"


def test_ledger_has_no_errors(ledger):
    errs = {k: v for k, v in ledger.items() if "error" in v}
    assert not errs, f"plan capture failed for: {errs}"


def test_ledger_agrees_with_plan_sweep_allowlist(ledger):
    from test_plan_sweep import NESTED_LOOP_OK

    offenders = {
        k
        for k, v in ledger.items()
        if v.get("cartesian_products", 0) or v.get("broadcast_nl_joins", 0)
    }
    unexplained = offenders - set(NESTED_LOOP_OK)
    assert not unexplained, (
        f"ledger shows nested-loop/cartesian plans with no allowlist "
        f"reason: {sorted(unexplained)}"
    )


@pytest.mark.parametrize("name", REGRESSION_SET)
def test_headline_plan_shape_unchanged(spark, ledger, name):
    qs = registry.queries()
    live = plan_metrics(qs[name](spark, SF_DIR))
    assert live == ledger[name], (
        f"{name}: plan shape drifted from PLAN_LEDGER.json — if the "
        f"change is intentional, regenerate with "
        f"`python tools/plan_ledger.py --write {name}`"
    )
