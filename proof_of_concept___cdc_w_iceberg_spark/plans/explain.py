"""Physical-plan inspection helpers.

Used in tests and during development to keep plans scale-worthy:
filters pushed to the scan, projections pruned, small dims broadcast,
expressions inside WholeStageCodegen.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def count_exchanges(plan: str) -> int:
    """Number of physical Exchange operators in a formatted plan (each
    appears once in the tree and once in the detail section)."""
    return len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.MULTILINE))


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def plan_report(df: DataFrame) -> dict[str, bool | int]:
    """Quick structural facts about the physical plan."""
    plan = explain_str(df)
    return {
        "has_pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        "has_broadcast_join": "BroadcastHashJoin" in plan
        or "BroadcastNestedLoopJoin" in plan,
        "has_sort_merge_join": "SortMergeJoin" in plan,
        "n_exchanges": count_exchanges(plan),
        "has_codegen": "WholeStageCodegen" in plan,
        "has_take_ordered": "TakeOrderedAndProject" in plan,
    }
