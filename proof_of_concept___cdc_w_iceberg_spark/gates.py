"""Round-start capability probe for environment-gated integrations.

The reference deploys against real Kafka + Iceberg-on-S3
(`setup.sh:35-40`, `connect-iceberg-sink.json:19-29`) and stages
Parquet/ORC/Avro lake formats (`pom.xml:110-126`). This container
ships none of the optional jars, so those paths run through
semantically-equivalent fallbacks (DataFrame MERGE rewrite, file-source
streaming twin, ORC/Parquet). Each gate is probed here so the moment a
future environment adds a jar, the real path lights up — and so pytest
reports explicit SKIPPED-with-reason entries instead of silently
testing only the fallback.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .cdc.iceberg import iceberg_available
from .operators.scans import avro_available
from .streaming.pipeline import kafka_available

# What to install to light up each gated path (named in skip reasons).
REQUIREMENTS = {
    "iceberg": (
        "iceberg-spark-runtime-4.0_2.13 jar + "
        "spark.sql.extensions=...IcebergSparkSessionExtensions + a catalog"
    ),
    "kafka": "spark-sql-kafka-0-10_2.13 jar (+ a reachable broker)",
    "avro": "spark-avro_2.13 jar (external module, not bundled)",
}


def capabilities(spark: SparkSession) -> dict[str, bool]:
    """One probe per optional integration; keys match ``REQUIREMENTS``."""
    return {
        "iceberg": iceberg_available(spark),
        "kafka": kafka_available(spark),
        "avro": avro_available(spark),
    }
