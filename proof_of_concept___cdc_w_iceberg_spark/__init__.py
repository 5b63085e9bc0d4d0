"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference CDC-to-lakehouse pipeline
(thanminh24/Proof-of-Concept---CDC-w-Iceberg), re-expressed Spark-first.

The reference wires SQL Server CDC -> Debezium -> Kafka -> Iceberg and
exposes arbitrary SQL over the lake via Trino (see SURVEY.md). This
package reproduces those *semantics* natively on Spark:

- ``sources``   : table/changelog loaders (parquet lake, CDC fixtures)
- ``operators`` : relational operator library (scan/filter/join/agg/
                  window/sort/set-op), each a named query with a DuckDB
                  oracle
- ``functions`` : scalar function families (string/date/math/json/...)
- ``cdc``       : Debezium-envelope decode, latest-wins compaction,
                  MERGE fallback, schema evolution, mirror verify
- ``streaming`` : Structured Streaming pipeline + windowed aggregations
- ``ext``       : LLM-data-pipeline extensions (dedup, similarity
                  search, text analysis, multimodal columns)
- ``plans``     : plan inspection helpers used to keep physical plans
                  scale-worthy (pushdown, broadcast, codegen)
"""

__version__ = "0.1.0"

from .registry import queries, oracles  # noqa: F401
