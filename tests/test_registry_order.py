"""Guards the driver-verification ordering policy in registry.py.

The external driver hash-checks only ``list(queries())[:50]`` per
round, so registration order IS coverage policy: every query in the
front window must carry a DuckDB oracle, and (until all queries have
accumulated a green driver row) the window must be filled with queries
that have never been driver-checked.
"""

from __future__ import annotations

import json
import os

from proof_of_concept___cdc_w_iceberg_spark import registry

# The 50 names verified by the driver in round 1 (CORRECTNESS_r01.json).
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER_WINDOW = 50


def _driver_checked() -> set[str]:
    checked: set[str] = set()
    for fname in sorted(os.listdir(_REPO)):
        if fname.startswith("CORRECTNESS_r") and fname.endswith(".json"):
            with open(os.path.join(_REPO, fname)) as f:
                checked.update(json.load(f))
    return checked


def test_priority_list_matches_registry() -> None:
    qs = registry.queries()
    assert set(registry._CHECK_PRIORITY) <= set(qs), (
        "priority list names a query that is not registered: "
        f"{set(registry._CHECK_PRIORITY) - set(qs)}"
    )


def test_front_window_all_have_oracles() -> None:
    front = list(registry.queries())[:DRIVER_WINDOW]
    oracles = registry.oracles()
    missing = [q for q in front if q not in oracles]
    assert not missing, f"front-{DRIVER_WINDOW} queries without oracle: {missing}"


def test_front_window_prioritizes_unchecked() -> None:
    """While any oracle-backed query lacks a driver CORRECTNESS row, the
    front window must not waste slots re-checking already-green ones."""
    qs = list(registry.queries())
    oracles = registry.oracles()
    checked = _driver_checked()
    unchecked = [q for q in qs if q not in checked and q in oracles]
    if not unchecked:
        return  # full coverage achieved — any order is fine
    front = qs[:DRIVER_WINDOW]
    wasted = [q for q in front if q in checked]
    assert len(wasted) <= max(0, DRIVER_WINDOW - len(unchecked)), (
        f"front window re-checks {wasted} while {len(unchecked)} queries "
        "have never been driver-verified — rotate _CHECK_PRIORITY"
    )
