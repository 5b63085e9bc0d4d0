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


def single_partition_exchange_ids(plan: str) -> set[int]:
    """Node ids of ``Exchange`` operators whose partitioning is
    ``SinglePartition`` in a formatted plan's detail section. These are
    the all-rows-through-one-task funnels: benign when they combine the
    partial states of a global aggregate (O(partitions) rows), fatal
    when an unbounded relation is sorted/windowed through one."""
    ids: set[int] = set()
    for block in re.split(r"\n\s*\n", plan):
        m = re.match(r"\((\d+)\) Exchange\b", block.lstrip())
        if m and "SinglePartition" in block:
            ids.add(int(m.group(1)))
    return ids


_OUTLINE_LINE = re.compile(
    r"^(?P<prefix>[\s+:*-]*)(?P<name>[A-Za-z][\w]*(?: [\w]+)*?)\s*"
    r"\((?P<id>\d+)\)\s*$"
)


def window_single_partition_ids(plan: str) -> set[int]:
    """Ids of SinglePartition exchanges that FEED a Window operator —
    the global-window bottleneck (every row sorted through one task)
    that tests/test_plan_sweep.py bans registry-wide. Walks the outline
    tree upward from each SinglePartition exchange; a ``Window*``
    ancestor reached before any other Exchange means that window runs
    over the single partition. A 1-row global aggregate's exchange
    (HashAggregate parent) is correctly NOT flagged."""
    sp_ids = single_partition_exchange_ids(plan)
    if not sp_ids:
        return set()
    flagged: set[int] = set()
    # (depth, name, id) stack per contiguous outline block; parent of a
    # node is the nearest preceding shallower line.
    stack: list[tuple[int, str, int]] = []
    parents: dict[int, list[tuple[str, int]]] = {}
    for line in plan.splitlines():
        m = _OUTLINE_LINE.match(line)
        if not m:
            stack = []  # left the outline block (details / subquery hdr)
            continue
        depth = len(m.group("prefix"))
        while stack and stack[-1][0] >= depth:
            stack.pop()
        nid = int(m.group("id"))
        parents[nid] = [(n, i) for _d, n, i in reversed(stack)]
        stack.append((depth, m.group("name"), nid))
    for nid in sp_ids:
        for name, _pid in parents.get(nid, []):
            if name.startswith("Window"):
                flagged.add(nid)
                break
            if "Exchange" in name:
                # Exchange / BroadcastExchange / ReusedExchange above:
                # the relation is redistributed — the funnel ends here.
                break
    return flagged


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
