"""§2.8 — scalar function families.

Grounding: string payload columns (`sqlserver/init.sql:11,16`,
`test_cdc.py:57-58` string formatting), epoch-millis envelope
timestamps (`connect-sqlserver-source.json:13`), JSON-with-schema
transport (`connect-standalone.properties:2-5`), int→long key widening
(`connect-iceberg-sink.json:31,33` vs `sqlserver/init.sql:10,15`),
op-code mapping (DebeziumTransform, `connect-iceberg-sink.json:10-12`).

All expressions are built-in ``pyspark.sql.functions`` — JVM-side,
inside whole-stage codegen; no Python UDFs in these paths.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..sources.cdc_fixtures import CHANGELOG_SQL, changelog
from ..sources.tables import load


@query(
    "q_str_funcs",
    oracle="""
        SELECT c_custkey,
               upper(c_name) AS name_upper,
               lower(c_mktsegment) AS seg_lower,
               length(c_name) AS name_len,
               substring(c_name, 1, 8) AS name_prefix,
               split_part(c_name, '#', 2) AS name_num,
               concat(c_mktsegment, ':', c_name) AS tagged,
               replace(c_name, 'Customer', 'Cust') AS name_short,
               trim(concat(' ', c_name, ' ')) AS name_trim
        FROM customer
    """,
)
def q_str_funcs(spark, sf_dir):
    c = F.col("c_name")
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.upper(c).alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length(c).alias("name_len"),
        F.substring(c, 1, 8).alias("name_prefix"),
        F.split_part(c, F.lit("#"), F.lit(2)).alias("name_num"),
        # concat_ws('') is the Spark twin of DuckDB concat()'s
        # skip-NULL semantics (r19 'nulls' tier: Spark concat() is
        # NULL-absorbing, so a NULL segment nulled the whole tag)
        F.concat_ws("", "c_mktsegment", F.lit(":"), c).alias("tagged"),
        F.replace(c, F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.trim(F.concat(F.lit(" "), c, F.lit(" "))).alias("name_trim"),
    )


@query(
    "q_str_regex",
    oracle="""
        SELECT p_partkey,
               regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS noun,
               CASE WHEN regexp_matches(p_name, '^(cold|small)') THEN 1 ELSE 0 END
                   AS starts_special
        FROM part
        WHERE regexp_matches(p_type, 'ECONOMY|PROMO')
    """,
)
def q_str_regex(spark, sf_dir):
    return (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type").rlike("ECONOMY|PROMO"))
        .select(
            "p_partkey",
            F.regexp_extract("p_name", r"([a-z]+) ([a-z]+)", 2).alias("noun"),
            F.when(F.col("p_name").rlike(r"^(cold|small)"), 1).otherwise(0).alias(
                "starts_special"
            ),
        )
    )


@query(
    "q_date_funcs",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(month(o_orderdate) AS INT) AS o_month,
               CAST(dayofmonth(o_orderdate) AS INT) AS o_day,
               date_trunc('month', o_orderdate) AS month_start,
               CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT)
                   AS days_since_95,
               CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date
        FROM orders
    """,
)
def q_date_funcs(spark, sf_dir):
    """Date/time family. Wall-clock functions only, so Spark (session
    UTC) and the tz-naive oracle agree; epoch-millis conversion
    (`timestamp_millis``/``unix_millis``) is exercised in cdc/envelope
    paths."""
    d = F.col("o_orderdate")
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year(d).alias("o_year"),
        F.month(d).alias("o_month"),
        F.dayofmonth(d).alias("o_day"),
        # trunc() returns DATE, matching DuckDB's date_trunc on a DATE input
        # (Spark's date_trunc would widen to TIMESTAMP and hash-mismatch).
        F.trunc(d, "month").alias("month_start"),
        F.datediff(d, F.lit("1995-01-01").cast("timestamp")).alias("days_since_95"),
        (d + F.expr("INTERVAL 30 DAY")).alias("due_date"),
    )


@query(
    "q_math_funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2))
                          * CAST(l_discount AS DECIMAL(6,2)), 2) AS DOUBLE)
                   AS disc_amount,
               ROUND(abs(l_discount - 0.05), 4) AS disc_dev,
               l_orderkey % 7 AS key_mod,
               CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
               CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
               ROUND(sqrt(l_quantity), 4) AS qty_sqrt
        FROM lineitem
    """,
)
def q_math_funcs(spark, sf_dir):
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.col("l_extendedprice").cast("decimal(12,2)")
            * F.col("l_discount").cast("decimal(6,2)"),
            2,
        )
        .cast("double")
        .alias("disc_amount"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("key_mod"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.round(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
    )


@query(
    "q_cast",
    oracle="""
        SELECT l_orderkey,
               CAST(l_linenumber AS BIGINT) AS line_long,
               CAST(CAST(l_quantity AS DECIMAL(9,2)) AS DOUBLE) AS qty_dec,
               CAST(l_orderkey AS VARCHAR) AS key_str,
               CAST(l_linenumber AS DOUBLE) AS line_dbl
        FROM lineitem
    """,
)
def q_cast(spark, sf_dir):
    """Type casts incl. the reference's int→long key widening
    (`connect-iceberg-sink.json:31,33` vs `sqlserver/init.sql:10,15`)."""
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("line_long"),
        F.col("l_quantity").cast("decimal(9,2)").cast("double").alias("qty_dec"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
    )


@query(
    "q_case_when",
    oracle=f"""
        WITH changes AS ({CHANGELOG_SQL})
        SELECT CASE WHEN op = 'd' THEN 'delete'
                    WHEN op IN ('c', 'u') THEN 'upsert'
                    ELSE 'snapshot' END AS action,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM changes GROUP BY 1
    """,
)
def q_case_when(spark, sf_dir):
    """Op-code → action mapping (c/u→upsert, d→delete), the
    DebeziumTransform dispatch (`connect-iceberg-sink.json:10-12`)."""
    return (
        changelog(spark, sf_dir)
        .select(
            F.when(F.col("op") == "d", "delete")
            .when(F.col("op").isin("c", "u"), "upsert")
            .otherwise("snapshot")
            .alias("action")
        )
        .groupBy("action")
        .agg(F.count("*").alias("n_events"))
    )


@query(
    "q_json_funcs",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
               event_type
        FROM events
    """,
)
def q_json_funcs(spark, sf_dir):
    """JSON extraction from string payloads — the envelope transport is
    JSON-with-schema (`connect-standalone.properties:2-5`)."""
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        "event_type",
    )


@query(
    "q_array_funcs",
    oracle="""
        SELECT vec_id,
               len(embedding) AS dim,
               CAST(embedding[1] AS DOUBLE) AS first_val,
               ROUND(list_reduce(
                   list_transform(embedding, x -> x::DOUBLE * x::DOUBLE),
                   (a, b) -> a + b
               ), 4) AS sq_norm
        FROM embeddings
    """,
)
def q_array_funcs(spark, sf_dir):
    """Array ops over the embedding column. The squared-norm fold is a
    *sequential* left fold on both engines (Spark ``aggregate`` /
    DuckDB ``list_reduce``) — bit-identical IEEE754 chains."""
    return load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.round(
            F.aggregate(
                F.transform(
                    F.col("embedding"),
                    lambda x: x.cast("double") * x.cast("double"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("sq_norm"),
    )


@query(
    "q_map_funcs",
    oracle="""
        SELECT c_custkey, c_acctbal AS bal_from_map,
               'bal,seg' AS map_keys_joined,
               c_mktsegment AS seg_from_map
        FROM customer
    """,
)
def q_map_funcs(spark, sf_dir):
    """Map construction + element access round-trip: values pulled back
    out of the map must equal the originals."""
    m = F.create_map(
        F.lit("bal"), F.col("c_acctbal").cast("string"),
        F.lit("seg"), F.col("c_mktsegment"),
    )
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.element_at(m, "bal").cast("double").alias("bal_from_map"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("map_keys_joined"),
        F.element_at(m, "seg").alias("seg_from_map"),
    )


@query(
    "q_json_roundtrip",
    oracle="""
        WITH enc AS (
            SELECT o_orderkey,
                   '{"custkey":' || CAST(o_custkey AS BIGINT)
                   || ',"status":"' || o_orderstatus
                   || '","prio":"' || o_orderpriority || '"}' AS payload
            FROM orders
        )
        SELECT o_orderkey, payload,
               CAST(json_extract(payload, '$.custkey') AS BIGINT) AS custkey,
               json_extract_string(payload, '$.status') AS status,
               json_extract_string(payload, '$.prio') AS prio
        FROM enc WHERE o_orderkey % 100 = 0
    """,
)
def q_json_roundtrip(spark, sf_dir):
    """Structured → JSON → structured round-trip: ``to_json(struct)``
    encode, then ``from_json`` with an explicit schema back to typed
    columns — the full codec path an event-transport pipeline runs
    (the get_json_object path in q_json_funcs only reads; this writes
    AND reads). Payload fields are int/string only: JSON float
    formatting is engine-specific, so doubles travel outside the
    payload (the same rule the envelope codec follows).

    Scale: narrow per-row codec in whole-stage codegen, zero shuffle;
    the %100 filter pushes to the scan."""
    enc = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            F.to_json(
                F.struct(
                    F.col("o_custkey").cast("long").alias("custkey"),
                    F.col("o_orderstatus").alias("status"),
                    F.col("o_orderpriority").alias("prio"),
                )
            ).alias("payload"),
        )
    )
    parsed = F.from_json(
        "payload", "custkey BIGINT, status STRING, prio STRING"
    )
    return enc.select(
        "o_orderkey",
        "payload",
        parsed.getField("custkey").alias("custkey"),
        parsed.getField("status").alias("status"),
        parsed.getField("prio").alias("prio"),
    )


@query(
    "q_null_semantics",
    oracle="""
        SELECT c_custkey,
               NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
               (NULLIF(c_mktsegment, 'BUILDING')
                   IS NOT DISTINCT FROM NULLIF(c_mktsegment, 'BUILDING'))
                   AS nullsafe_self_eq,
               (NULLIF(c_mktsegment, 'BUILDING') IS DISTINCT FROM 'MACHINERY')
                   AS distinct_from_machinery,
               COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(redacted)')
                   AS seg_filled
        FROM customer
    """,
)
def q_null_semantics(spark, sf_dir):
    """Three-valued-logic surface: NULLIF null injection, null-safe
    equality (``<=>`` / IS NOT DISTINCT FROM — true even when both
    sides are NULL), IS DISTINCT FROM, and COALESCE backfill. These
    are the predicates CDC merge logic lives on (mirror vs change
    comparisons must treat NULL=NULL as a match — see
    q_cdc_incremental_read's IS DISTINCT FROM usage); this query pins
    the cross-engine semantics explicitly."""
    seg_or_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        seg_or_null.alias("seg_or_null"),
        seg_or_null.eqNullSafe(seg_or_null).alias("nullsafe_self_eq"),
        (~seg_or_null.eqNullSafe(F.lit("MACHINERY"))).alias(
            "distinct_from_machinery"
        ),
        F.coalesce(seg_or_null, F.lit("(redacted)")).alias("seg_filled"),
    )


@query(
    "q_explode_outer",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(trim(text), '\\s+'),
                               t -> t = 'zebra') AS hits
            FROM documents
        )
        SELECT t.doc_id, u.h AS hit
        FROM toks t
        LEFT JOIN (SELECT doc_id, unnest(hits) AS h FROM toks) u
          ON t.doc_id = u.doc_id
    """,
)
def q_explode_outer(spark, sf_dir):
    """Outer explode: documents whose filtered token array is EMPTY
    survive as a (doc_id, NULL) row instead of vanishing — the
    row-preserving flatten required when downstream joins must keep
    every parent (inner explode silently drops empty-array parents,
    a classic correctness trap in token/feature expansion)."""
    toks = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(
            F.split(F.trim(F.col("text")), r"\s+"), lambda t: t == "zebra"
        ).alias("hits"),
    )
    return toks.select("doc_id", F.explode_outer("hits").alias("hit"))


@query(
    "q_struct_ops",
    oracle="""
        SELECT c_custkey,
               c_name AS profile_name,
               c_acctbal + 100.0 AS profile_bal_adjusted,
               c_mktsegment AS profile_segment,
               2 + 1 AS n_fields
        FROM customer
    """,
)
def q_struct_ops(spark, sf_dir):
    """Nested-struct manipulation: build a struct column, withField
    (add/overwrite a nested field in place), dropFields (remove one),
    then flatten back out. The schema-evolution primitives for nested
    lake columns — at 100 TB you restructure nested data with these
    (single narrow projection) rather than exploding and re-grouping."""
    c = load(spark, sf_dir, "customer")
    profile = F.struct(
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
        F.col("c_mktsegment").alias("segment"),
    )
    reshaped = (
        c.select("c_custkey", profile.alias("profile"))
        .withColumn(
            "profile",
            F.col("profile").withField(
                "bal_adjusted", F.col("profile.bal") + 100.0
            ),
        )
        .withColumn("profile", F.col("profile").dropFields("bal"))
    )
    return reshaped.select(
        "c_custkey",
        F.col("profile.name").alias("profile_name"),
        F.col("profile.bal_adjusted").alias("profile_bal_adjusted"),
        F.col("profile.segment").alias("profile_segment"),
        # real field count of the reshaped struct (name, segment,
        # bal_adjusted), derived from the data not hardcoded
        # ignoreNullFields=false: to_json drops NULL fields by
        # default, so a NULL balance shrank the data-derived field
        # count (r19 'nulls' tier)
        F.size(
            F.json_object_keys(
                F.to_json("profile", {"ignoreNullFields": "false"})
            )
        ).alias("n_fields"),
    )
