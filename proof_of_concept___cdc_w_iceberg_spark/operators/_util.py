"""Cross-engine determinism helpers (see registry.py docstring)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec_sum(col: Column | str, prec: int = 18, scale: int = 2) -> Column:
    """Order-independent (exact decimal) sum of a double column,
    surfaced back as DOUBLE. DuckDB twin:
    ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({prec},{scale})")).cast("double")


def dec_avg(col: Column | str, prec: int = 18, scale: int = 2, round_to: int = 4) -> Column:
    """Deterministic mean: exact decimal sum, IEEE double division,
    rounded. DuckDB twin:
    ``ROUND(CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE) / COUNT(x), r)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(c.cast(f"decimal({prec},{scale})")).cast("double") / F.count(c),
        round_to,
    )
