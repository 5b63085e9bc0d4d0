"""Bucketed lake tables — shuffle-free co-located joins.

The 100 TB story for the fact⋈fact join: both tables bucketed by the
join key at write time means every subsequent join/aggregation on
that key runs with ZERO exchanges — the shuffle is paid once at
ingest, not per query. This is the Spark-native analogue of keeping
the CDC mirror physically clustered by primary key (the reference's
Iceberg tables are implicitly key-addressed via equality deletes).

Bucketing requires a catalog table (``saveAsTable``); plain
``.parquet(path)`` writes can't carry bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int = 32,
                   sort: bool = True) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) catalog table.

    Sorting within buckets additionally lets sort-merge join skip its
    sort step and enables min/max skipping within files."""
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, left: str, right: str) -> bool:
    """True iff both catalog tables exist (bucket metadata travels with
    the catalog entry, so a plain describe suffices as a guard)."""
    return spark.catalog.tableExists(left) and spark.catalog.tableExists(right)
