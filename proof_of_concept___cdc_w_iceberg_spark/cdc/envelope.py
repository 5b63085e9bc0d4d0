"""Debezium change-event envelope: schema, encode, decode.

The reference transports JSON-with-schema Debezium envelopes
(`kafka/config/connect-standalone.properties:2-5`; envelope produced
by the connector at `connect-sqlserver-source.json:4`):
``{before, after, source{db,schema,table,lsn,ts_ms,snapshot}, op, ts_ms}``.
The sink's DebeziumTransform flattens them and adds a ``_cdc`` struct
with routing target ``cdc.{schema}_{table}``
(`connect-iceberg-sink.json:10-13`).

Spark-first mapping: the envelope is a nested ``StructType``; decode is
``from_json`` + ``select("after.*", ...)`` — all JVM-side, codegen'd,
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def row_schema(fields: list[tuple[str, T.DataType]]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


def envelope_schema(row: T.StructType) -> T.StructType:
    """Envelope for a given row schema (before/after images + source)."""
    source = T.StructType(
        [
            T.StructField("db", T.StringType(), True),
            T.StructField("schema", T.StringType(), True),
            T.StructField("table", T.StringType(), True),
            T.StructField("lsn", T.LongType(), True),
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField("snapshot", T.StringType(), True),
        ]
    )
    return T.StructType(
        [
            T.StructField("before", row, True),
            T.StructField("after", row, True),
            T.StructField("source", source, True),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
        ]
    )


# Envelope for the canonical changelog fixture row (k, name, bal).
ROW_SCHEMA = row_schema(
    [("k", T.LongType()), ("name", T.StringType()), ("bal", T.DoubleType())]
)
ENVELOPE_SCHEMA = envelope_schema(ROW_SCHEMA)


def encode_envelope(df: DataFrame, schema_name: str = "commerce",
                    table: str = "account") -> DataFrame:
    """Wrap a flat changelog (k,name,bal,op,ts_ms,off) into JSON envelopes
    — the shape the reference's source connector emits to Kafka."""
    after = F.when(
        F.col("op") != "d",
        F.struct(F.col("k"), F.col("name"), F.col("bal")),
    )
    before = F.when(
        F.col("op").isin("u", "d"),
        F.struct(F.col("k"), F.lit(None).cast("string").alias("name"),
                 F.lit(None).cast("double").alias("bal")),
    )
    source = F.struct(
        F.lit("commerce_db").alias("db"),
        F.lit(schema_name).alias("schema"),
        F.lit(table).alias("table"),
        F.col("off").alias("lsn"),
        F.col("ts_ms").alias("ts_ms"),
        F.when(F.col("op") == "r", F.lit("true")).otherwise(F.lit("false")).alias("snapshot"),
    )
    env = F.struct(before.alias("before"), after.alias("after"),
                   source.alias("source"), F.col("op"), F.col("ts_ms"))
    return df.select(F.col("k").alias("key"), F.to_json(env).alias("value"))


class MalformedEnvelopeError(ValueError):
    """Raised by strict decode when a record fails to parse — the
    reference's ``errors.tolerance: none`` fail-fast contract
    (`connect-sqlserver-source.json:19`, `connect-iceberg-sink.json:7`)."""


def decode_envelope(df: DataFrame, schema: T.StructType = ENVELOPE_SCHEMA,
                    value_col: str = "value", strict: bool = False) -> DataFrame:
    """``from_json`` decode + flatten: after-image columns, op, ordering
    keys — the Spark equivalent of the sink's DebeziumTransform
    (`connect-iceberg-sink.json:10-12`).

    ``strict=True`` reproduces ``errors.tolerance: none``: any record
    that doesn't parse (op comes back NULL) aborts the batch instead of
    flowing through as nulls. One extra pass over the batch — use
    inside foreachBatch where the batch is already small/cached."""
    env = F.from_json(F.col(value_col), schema)
    if strict:
        bad = df.filter(env.getField("op").isNull()).limit(1).collect()
        if bad:
            raw = bad[0][value_col]  # may be NULL (op parses NULL too)
            raise MalformedEnvelopeError(
                f"unparseable change event (errors.tolerance=none): "
                f"{raw[:200] if raw is not None else None!r}"
            )
    return df.select(
        env.getField("after").alias("after"),
        env.getField("before").alias("before"),
        env.getField("op").alias("op"),
        env.getField("ts_ms").alias("ts_ms"),
        env.getField("source").getField("lsn").alias("off"),
        cdc_target(env.getField("source")).alias("_cdc_target"),
    )


def cdc_target(source: Column) -> Column:
    """Routing target ``cdc.{schema}_{table}`` (`connect-iceberg-sink.json:12`)."""
    return F.concat(
        F.lit("cdc."), source.getField("schema"), F.lit("_"), source.getField("table")
    )


# --- JSON-with-schema transport (connect-standalone.properties:2-5) ---
#
# With schemas.enable=true every Kafka record is
# ``{"schema": <connect type>, "payload": <envelope>}`` — a dynamic,
# self-describing schema PER RECORD. The schema half is what feeds the
# sink's evolve-schema behavior.

_CONNECT_TYPES = {
    "long": "int64",
    "bigint": "int64",
    "int": "int32",
    "integer": "int32",
    "double": "float64",
    "float": "float32",
    "string": "string",
    "boolean": "boolean",
    "binary": "bytes",
}


def connect_schema_json(row: T.StructType, name: str = "Value") -> str:
    """Kafka Connect schema JSON for a flat row struct (the ``schema``
    half of a JSON-with-schema record)."""
    import json

    fields = [
        {
            "type": _CONNECT_TYPES.get(f.dataType.simpleString(), "string"),
            "optional": f.nullable,
            "field": f.name,
        }
        for f in row.fields
    ]
    return json.dumps(
        {"type": "struct", "fields": fields, "optional": False, "name": name},
        separators=(",", ":"),
    )


def encode_envelope_with_schema(df: DataFrame, row: T.StructType = ROW_SCHEMA,
                                schema_name: str = "commerce",
                                table: str = "account") -> DataFrame:
    """Full-fidelity transport encoding: each record carries its own
    schema alongside the payload, exactly as the reference's JSON
    converters emit."""
    enveloped = encode_envelope(df, schema_name=schema_name, table=table)
    schema_lit = connect_schema_json(row, name=f"{schema_name}.{table}.Value")
    return enveloped.select(
        "key",
        F.concat(
            F.lit('{"schema":'), F.lit(schema_lit),
            F.lit(',"payload":'), F.col("value"), F.lit("}"),
        ).alias("value"),
    )


def decode_envelope_with_schema(df: DataFrame,
                                schema: T.StructType = ENVELOPE_SCHEMA,
                                value_col: str = "value") -> DataFrame:
    """Decode JSON-with-schema records: payload through the typed
    ``from_json`` path, the per-record schema string surfaced as
    ``_record_schema`` (input to schema-drift detection — compare
    against the table schema to trigger cdc/evolve.py)."""
    env = F.from_json(F.get_json_object(F.col(value_col), "$.payload"), schema)
    return df.select(
        env.getField("after").alias("after"),
        env.getField("before").alias("before"),
        env.getField("op").alias("op"),
        env.getField("ts_ms").alias("ts_ms"),
        env.getField("source").getField("lsn").alias("off"),
        cdc_target(env.getField("source")).alias("_cdc_target"),
        F.get_json_object(F.col(value_col), "$.schema").alias("_record_schema"),
    )
