"""Physical-plan shape ledger: mechanical scale-regression detection.

tests/test_plan_sweep.py guards against FORBIDDEN nodes (cartesian /
broadcast-nested-loop outside the allowlist). This tool goes further:
it records, for every registered query, the plan-shape metrics that
decide 100 TB behavior — shuffle-exchange count, broadcast-exchange
count, join strategies, codegen span count — into ``PLAN_LEDGER.json``
at the repo root. A broadcast join silently degrading to sort-merge,
or a refactor adding an extra shuffle, then shows up as a DIFF against
the committed ledger instead of only as a wall-clock drift three
rounds later.

Plans are captured at sf0.001 pre-execution (AQE's initial plan —
deterministic given the fixed session confs and the read-only fixture;
the counts are partition-count-independent). Queries whose fn bodies
execute side work (the CDC multi-commit family) run that work, so a
full sweep costs minutes, not hours.

Usage:
    python tools/plan_ledger.py --write           # regenerate ledger
    python tools/plan_ledger.py --check           # diff live vs ledger
    python tools/plan_ledger.py --check q_tpch_q1 # subset
Exit nonzero on --check diff. Counts only; the raw plan text is not
stored (it embeds tmp paths and codegen ids that churn per session).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LEDGER_FILE = os.path.join(REPO, "PLAN_LEDGER.json")
SF_DIR = "/root/testdata/sf0.001"

# Node names counted from the formatted plan outline. Order matters:
# BroadcastExchange must be counted before the bare-Exchange regex.
_METRICS = (
    ("broadcast_exchanges", r"\bBroadcastExchange\b"),
    ("shuffle_exchanges", r"(?<!Broadcast)\bExchange\b"),
    ("sort_merge_joins", r"\bSortMergeJoin\b"),
    ("broadcast_hash_joins", r"\bBroadcastHashJoin\b"),
    ("shuffled_hash_joins", r"\bShuffledHashJoin\b"),
    ("cartesian_products", r"\bCartesianProduct\b"),
    ("broadcast_nl_joins", r"\bBroadcastNestedLoopJoin\b"),
)


def plan_string(df) -> str:
    """The formatted physical plan, captured (not printed)."""
    return str(
        df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    )


def plan_metrics(df) -> dict[str, int]:
    txt = plan_string(df)
    # Outline section only (details repeat node names in prose).
    outline = txt.split("\n\n", 1)[0]
    out = {k: len(re.findall(rx, outline)) for k, rx in _METRICS}
    out["codegen_spans"] = len(set(re.findall(r"codegen id : (\d+)", txt)))
    # r20 (verdict item 2): all-rows-through-one-task funnels, from the
    # detail section's Arguments. Most are benign global-aggregate
    # combines (O(partitions) rows through the funnel); the fatal
    # window-over-SinglePartition case is banned registry-wide by
    # tests/test_plan_sweep.py — this metric makes ANY drift in the
    # funnel count a ledger diff rather than a wall-clock mystery.
    from proof_of_concept___cdc_w_iceberg_spark.plans.explain import (
        single_partition_exchange_ids,
    )
    out["single_partition_exchanges"] = len(single_partition_exchange_ids(txt))
    return out


def sweep(names=None) -> dict[str, dict[str, int]]:
    from proof_of_concept___cdc_w_iceberg_spark.session import get_spark

    spark = get_spark("plan_ledger")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = names or sorted(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    out = {}
    for name in names:
        try:
            out[name] = plan_metrics(qs[name](spark, SF_DIR))
        except Exception as exc:  # noqa: BLE001 — survey every query
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
        spark.catalog.clearCache()
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--write", action="store_true")
    g.add_argument("--check", action="store_true")
    p.add_argument("names", nargs="*")
    a = p.parse_args(argv)

    live = sweep(a.names or None)
    if a.write:
        recorded = {}
        if os.path.exists(LEDGER_FILE):
            with open(LEDGER_FILE) as f:
                recorded = json.load(f)
        recorded.update(live)
        if not a.names:  # full sweep: drop rows for unregistered queries
            recorded = {k: v for k, v in recorded.items() if k in live}
        with open(LEDGER_FILE, "w") as f:
            json.dump(recorded, f, indent=1, sort_keys=True)
        errs = {k: v for k, v in live.items() if "error" in v}
        print(f"wrote {len(live)} rows to {LEDGER_FILE}; errors={list(errs)}")
        return 1 if errs else 0

    with open(LEDGER_FILE) as f:
        recorded = json.load(f)
    diffs = []
    for name, m in live.items():
        want = recorded.get(name)
        if want is None:
            diffs.append((name, "NOT IN LEDGER", m))
        elif want != m:
            delta = {
                k: (want.get(k), m.get(k))
                for k in set(want) | set(m)
                if want.get(k) != m.get(k)
            }
            diffs.append((name, "CHANGED", delta))
    for name, kind, detail in diffs:
        print(f"{name}: {kind} {detail}")
    print(f"plan check: {len(live)} queries, {len(diffs)} diffs")
    return 1 if diffs else 0


if __name__ == "__main__":
    sys.exit(main())
