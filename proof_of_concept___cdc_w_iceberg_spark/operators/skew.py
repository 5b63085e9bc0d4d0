"""Skew-aware join: explicit key salting.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; salting is the explicit tool for the pathological case AQE
can't fix — a *single* hot key whose hash partition exceeds executor
memory on a 100 TB shuffle. Standard construction: salt the big side
randomly into S buckets, replicate the small side S times, join on
(key, salt).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, on: list[str],
                how: str = "inner", salt_buckets: int = 16) -> DataFrame:
    """Equi-join with the big side salted into ``salt_buckets`` splits.

    The big side gets a uniform random salt (seeded — deterministic
    plan), the small side is exploded ``salt_buckets``x, so each hot
    key's rows spread over S reducers instead of one. Result is
    row-identical to ``big.join(small, on, how)`` for inner/left joins.
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in on], F.monotonically_increasing_id()),
                  F.lit(salt_buckets))
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    joined = b.join(s, on=[*on, "__salt"], how=how)
    return joined.drop("__salt")


def hot_keys(df: DataFrame, on: list[str], threshold_ratio: float = 10.0) -> DataFrame:
    """Diagnose skew: keys whose row count exceeds ``threshold_ratio``x
    the mean per-key count. Use on a sample at scale."""
    counts = df.groupBy(*on).agg(F.count("*").alias("n"))
    stats = counts.agg(F.avg("n").alias("mean_n"))
    cond = F.col("n") > F.col("mean_n") * threshold_ratio
    return counts.crossJoin(F.broadcast(stats)).filter(cond).select(*on, "n")


def broadcast_threshold_join(big: DataFrame, dim: DataFrame, on: list[str],
                             how: str = "inner") -> DataFrame:
    """Dim join with an explicit broadcast hint — the planner already
    broadcasts under the session threshold; the hint pins the strategy
    for dims whose size statistics are missing (fresh writes, streams).
    """
    return big.join(F.broadcast(dim), on=on, how=how)


def union_all(dfs: list[DataFrame]) -> DataFrame:
    """unionByName fold over N frames (the sink's topics.regex merge)."""
    return reduce(lambda a, b: a.unionByName(b), dfs)
