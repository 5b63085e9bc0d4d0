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


# --- exact half-away rounding of rationals (r18 fuzzer finding) --------
#
# ROUND(double, r) is NOT cross-engine deterministic when its input
# sits on (or within an ulp of) an r-dp decimal tie: Spark rounds
# HALF_UP on the exact binary expansion, DuckDB multiplies by 10^r and
# nearbyints (HALF_EVEN). A mean of k-dp-quantized values over a
# group whose size is 2^a·5^b-structured TERMINATES at the tie with
# probability up to 1/2 per group (proven live: q_udaf_grouped seed 2,
# q_agg_moments / q_ts_seasonal in the forced-size 'ties' tier). The
# fix: evaluate round_half_away(num/den, r) for INTEGER-VALUED num/den
# as sign(num)·FLOOR((2·|num|·10^r + den) / (2·den)) / 10^r, running
# the floor-division in doubles — the chains are identical IEEE ops on
# identical inputs, so both engines agree at ANY magnitude (bit-exact
# vs true rounding while 2·|num|·10^r + den < 2^53, documented).


def rdiv(num: Column, den: Column, round_to: int) -> Column:
    """round_half_away(num/den, round_to) for integer-valued columns
    (den > 0), exact and engine-portable. SQL twin: ``rdiv_sql``."""
    m = 10 ** round_to
    n_abs = F.abs(num.cast("double"))
    d = den.cast("double")
    q = F.floor((F.lit(2.0) * n_abs * m + d) / (F.lit(2.0) * d))
    return (
        F.when(num >= 0, q).otherwise(-q).cast("double") / F.lit(float(m))
    )


def rdiv_sql(num: str, den: str, round_to: int) -> str:
    """DuckDB twin of ``rdiv``: num/den are integer-valued SQL
    expressions (den > 0)."""
    m = 10 ** round_to
    return (
        f"(CASE WHEN {num} >= 0 THEN 1 ELSE -1 END) * "
        f"FLOOR((2.0 * ABS(CAST({num} AS DOUBLE)) * {m} "
        f"+ CAST({den} AS DOUBLE)) / (2.0 * CAST({den} AS DOUBLE))) "
        f"/ {m}.0"
    )


def dec_avg(col: Column | str, prec: int = 18, scale: int = 2, round_to: int = 4) -> Column:
    """Deterministic mean of a ``scale``-dp-quantized double column,
    rounded half-away at ``round_to`` dp in exact integer units
    (``rdiv`` over sum·10^scale / count·10^scale). SQL twin:
    ``avg_sql``."""
    c = F.col(col) if isinstance(col, str) else col
    mu = 10 ** scale
    return rdiv(
        F.sum(c.cast(f"decimal({prec},{scale})")) * mu,
        F.count(c) * mu,
        round_to,
    )


def avg_sql(x: str, n: str = "COUNT(*)", prec: int = 18, scale: int = 2,
            round_to: int = 4) -> str:
    """DuckDB twin of ``dec_avg``."""
    mu = 10 ** scale
    return rdiv_sql(
        f"SUM(CAST({x} AS DECIMAL({prec},{scale}))) * {mu}",
        f"{n} * {mu}",
        round_to,
    )
