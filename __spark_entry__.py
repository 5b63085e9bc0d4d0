"""Driver contract for the spark-graft builder (PySpark target).

Re-exports the query registry of ``proof_of_concept___cdc_w_iceberg_spark``:
every operator from SURVEY.md §2 is a named entry in ``queries()``
with (where SQL-expressible) a DuckDB oracle in ``oracle_sql()``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from proof_of_concept___cdc_w_iceberg_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC apply (changelog → compaction → merge →
    mirror) on the sf0.001 fixtures — the reference's end-to-end
    semantic in one query (SURVEY.md §7.1)."""
    qs = registry.queries()
    return qs["q_cdc_apply"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracles()
