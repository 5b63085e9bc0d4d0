"""Lake-table loaders.

The reference's at-rest model is columnar parquet tables in an object
store (SURVEY.md §1.3, `connect-iceberg-sink.json:19-29`); here the
lake is the driver's parquet fixtures. ``spark.read.parquet`` is the
built-in vectorized columnar scan — predicate pushdown and column
pruning come from Catalyst for free (verify with
``plans.explain_str``; look for PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one lake table (cf. reference Trino table scan,
    `init_for_test.py:66-79`).

    ``events.parquet`` carries TIMESTAMP(NANOS), which Spark's reader
    rejects unless nanos are surfaced as long; we convert back to a
    (microsecond) timestamp — the same ns→us truncation DuckDB applies.
    """
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register lake tables as temp views so ``spark.sql`` text queries
    work — the Spark equivalent of the reference's generic SQL-over-
    the-lake endpoint (`init_for_test.py:66-79`)."""
    for t in tables or TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def parallel(df: DataFrame, n: int = 32, floor: int = 8) -> DataFrame:
    """Round-robin repartition an input that arrived in fewer
    partitions than ``floor`` (the small-fixture single-parquet-file
    case) so a NARROW downstream pipeline — per-row expand + map-side
    combine — actually uses the cores. A real many-partition table
    skips the exchange entirely, so this never adds a shuffle at
    scale; only use upstream of order-independent aggregation (exact
    decimal sums, counts, min/max), where partitioning cannot change
    the result."""
    return df.repartition(n) if df.rdd.getNumPartitions() < floor else df
