"""Environment-gate probes (VERDICT r01 item 5).

Each optional integration (Iceberg MERGE, Kafka transport, Avro
datasource) is probed at test time. When the jar is absent the test
SKIPS with a reason naming exactly what to install — so a future
environment that ships the jar instantly runs the real path instead of
silently exercising only the fallback.
"""

from __future__ import annotations

import tempfile

import pytest

from pyspark.sql import functions as F

from proof_of_concept___cdc_w_iceberg_spark.gates import REQUIREMENTS, capabilities
from proof_of_concept___cdc_w_iceberg_spark.cdc.apply import apply_changes
from proof_of_concept___cdc_w_iceberg_spark.cdc.iceberg import merge_into
from proof_of_concept___cdc_w_iceberg_spark.streaming.pipeline import (
    kafka_changelog_stream,
)


def test_capability_report(spark):
    caps = capabilities(spark)
    assert set(caps) == set(REQUIREMENTS) == {"iceberg", "kafka", "avro"}
    assert all(isinstance(v, bool) for v in caps.values())


def test_iceberg_real_merge_into(spark):
    """Real Iceberg SQL MERGE INTO vs the DataFrame fallback on the
    same batch — only runnable with the runtime jar + extensions."""
    if not capabilities(spark)["iceberg"]:
        pytest.skip(f"Iceberg gate closed; needs {REQUIREMENTS['iceberg']}")
    rows = [(1, "a", 10.0, "u", 2, 1), (2, "b", 20.0, "c", 2, 2),
            (3, None, None, "d", 2, 3)]
    cols = ["k", "name", "bal", "op", "ts_ms", "off"]
    source = spark.createDataFrame(rows, cols)
    target0 = spark.createDataFrame(
        [(1, "old", 1.0), (3, "gone", 3.0)], ["k", "name", "bal"])
    spark.sql("DROP TABLE IF EXISTS iceberg_gate_t")
    target0.writeTo("iceberg_gate_t").using("iceberg").create()
    merge_into(spark, "iceberg_gate_t", source, keys=["k"])
    got = {tuple(r) for r in spark.table("iceberg_gate_t").collect()}
    want = {tuple(r) for r in
            apply_changes(target0, source, ["k"]).collect()}
    assert got == want


def test_kafka_subscribe_pattern_stream(spark):
    """subscribePattern streaming source (`connect-iceberg-sink.json:9`)
    — only constructible with the spark-sql-kafka connector."""
    if not capabilities(spark)["kafka"]:
        pytest.skip(f"Kafka gate closed; needs {REQUIREMENTS['kafka']}")
    stream = kafka_changelog_stream(spark, "localhost:9092")
    assert stream.isStreaming
    assert set(stream.columns) == {"key", "value"}


def test_avro_roundtrip_real(spark):
    """Real .avro write+read — only with the external spark-avro module."""
    if not capabilities(spark)["avro"]:
        pytest.skip(f"Avro gate closed; needs {REQUIREMENTS['avro']}")
    df = spark.range(100).select(
        F.col("id"), F.concat(F.lit("n"), F.col("id")).alias("name"))
    path = tempfile.mkdtemp(prefix="avro_gate_")
    df.write.mode("overwrite").format("avro").save(path)
    back = spark.read.format("avro").load(path)
    assert back.count() == 100
    assert {f.name for f in back.schema.fields} == {"id", "name"}


def test_sink_avro_query_degrades_cleanly(spark, sf_dir):
    """The registered q_sink_avro stays green either way: real Avro when
    the module is present, ORC stand-in otherwise."""
    from proof_of_concept___cdc_w_iceberg_spark import registry

    from proof_of_concept___cdc_w_iceberg_spark.operators.scans import avro_available

    df = registry.queries()["q_sink_avro"](spark, sf_dir)
    assert df.count() > 0
    assert set(df.columns) == {"p_partkey", "p_name", "p_retailprice", "sink_format"}
    # The result self-describes which codec it exercised (in-band
    # disclosure for the driver's correctness row).
    want = "avro" if avro_available(spark) else "orc"
    assert df.select("sink_format").distinct().collect()[0][0] == want
