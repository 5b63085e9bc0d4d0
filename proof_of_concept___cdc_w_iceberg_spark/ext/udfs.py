"""§2.11 — UDF / UDAF / UDTF surface.

Demonstrates the full custom-code ladder, worst to best for scale:
row-at-a-time Python UDF (kept off hot paths), Arrow-vectorized
pandas UDF, grouped applyInPandas UDAF, and explode-style UDTF.
Numeric kernels use integer-cent arithmetic so results are exact and
hash-match the decimal-based oracles.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..sources.tables import load


@query(
    "q_udf_python",
    oracle="""
        SELECT c_custkey, lower(replace(c_name, '#', '_')) AS handle
        FROM customer
    """,
)
def q_udf_python(spark, sf_dir):
    """Scalar Python UDF (row-at-a-time — the slow path, shown for API
    parity; everything hot uses built-ins or pandas UDFs)."""

    @F.udf(T.StringType())
    def make_handle(name: str) -> str:
        return name.replace("#", "_").lower()

    return load(spark, sf_dir, "customer").select(
        "c_custkey", make_handle("c_name").alias("handle")
    )


@query(
    "q_udf_pandas",
    oracle="""
        SELECT c_custkey,
               ROUND((c_acctbal - 1000.0) / 7.0, 4) AS scaled
        FROM customer
    """,
)
def q_udf_pandas(spark, sf_dir):
    """Vectorized pandas UDF — Arrow batches, ~10-100x the row UDF."""

    @F.pandas_udf(T.DoubleType())
    def scale(bal: pd.Series) -> pd.Series:
        return (bal - 1000.0) / 7.0

    return load(spark, sf_dir, "customer").select(
        "c_custkey", F.round(scale("c_acctbal"), 4).alias("scaled")
    )


@query(
    "q_udaf_grouped",
    oracle="""
        WITH g AS (
            SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS cents
            FROM customer WHERE c_acctbal IS NOT NULL
            GROUP BY c_nationkey
        )
        SELECT c_nationkey, n,
               (CASE WHEN cents >= 0 THEN 1 ELSE -1 END)
                 * ((2 * CAST(ABS(cents) AS HUGEINT) * 100 + n) // (2 * n))
                 / 10000.0 AS mean_bal
        FROM g
    """,
)
def q_udaf_grouped(spark, sf_dir):
    """Grouped custom aggregate via applyInPandas. Sums in integer
    cents (exact, order-independent), then rounds the mean to 4 dp
    half-away-from-zero in EXACT integer arithmetic inside the UDF —
    (2·|cents|·100 + n) // (2n) in 1e-4 units. The r18 fuzzer (seed 2)
    proved ROUND(double, 4) diverges cross-engine exactly when the
    group size is 2^a·5^b (the quotient of a 2-dp-quantized sum then
    TERMINATES at ≥5 dp and ties at the 4th: n=8 mean 4323.76125 →
    Spark 4323.7613, DuckDB 4323.7612). The oracle replays the same
    formula in EXACT integer arithmetic too (DuckDB HUGEINT ``//``,
    r18 advice) — both sides are true bignum floordiv, so agreement no
    longer rests on the 2·|cents|·100+n < 2^53 magnitude bound; only
    the final /10000.0 touches doubles, identically on both sides."""
    out_schema = T.StructType(
        [
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("n", T.LongType()),
            T.StructField("mean_bal", T.DoubleType()),
        ]
    )

    def mean_bal(pdf: pd.DataFrame) -> pd.DataFrame:
        # int(): numpy int64 -> Python bignum before the *200 headroom
        cents = int((pdf["c_acctbal"] * 100).round().astype("int64").sum())
        n = len(pdf)
        q = (2 * abs(cents) * 100 + n) // (2 * n)  # half away from zero
        return pd.DataFrame(
            {
                "c_nationkey": [pdf["c_nationkey"].iloc[0]],
                "n": [n],
                "mean_bal": [(q if cents >= 0 else -q) / 10000.0],
            }
        )

    return (
        load(spark, sf_dir, "customer")
        .select("c_nationkey", "c_acctbal")
        # observed balances only (r19 'nulls' fuzz tier: a NaN reaching
        # the kernel's int64 cast raised, and n must be the non-null
        # count on both sides)
        .filter(F.col("c_acctbal").isNotNull())
        .groupBy("c_nationkey")
        .applyInPandas(mean_bal, schema=out_schema)
        .select("c_nationkey", "n", "mean_bal")
    )


@query(
    "q_udtf_python",
    oracle="""
        WITH parts AS (
            SELECT doc_id,
                   unnest(string_split(text, ',')) AS s,
                   generate_subscripts(string_split(text, ','), 1) AS idx
            FROM documents WHERE doc_id % 50 = 0
        )
        SELECT doc_id, CAST(idx - 1 AS INT) AS clause_no,
               trim(s) AS clause,
               CAST(len(string_split_regex(trim(s), '\\s+')) AS INT) AS n_tokens
        FROM parts WHERE trim(s) <> ''
    """,
)
def q_udtf_python(spark, sf_dir):
    """Real Python UDTF (Spark 3.5+ ``@udtf``): one document row →
    N clause rows with positions — the arbitrary-arity table-function
    surface (the built-in explode fast path is q_udtf_explode)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, clause_no: int, clause: string, n_tokens: int")
    class ClauseSplit:
        def eval(self, doc_id, text):
            for i, raw in enumerate(text.split(",")):
                clause = raw.strip()
                if clause:
                    yield doc_id, i, clause, len(clause.split())

    spark.udtf.register("clause_split", ClauseSplit)
    load(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0) \
        .createOrReplaceTempView("udtf_docs")
    return spark.sql(
        "SELECT t.doc_id, t.clause_no, t.clause, t.n_tokens "
        "FROM udtf_docs, LATERAL clause_split(doc_id, text) t"
    )


@query(
    "q_udtf_explode",
    oracle="""
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents WHERE doc_id % 25 = 0
    """,
)
def q_udtf_explode(spark, sf_dir):
    """Table function: 1 row → N rows (explode). The built-in explode
    is the codegen'd fast path; a Python UDTF (Spark 3.5+) would hit
    serde for no gain here."""
    return (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 25 == 0)
        .select("doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("token"))
    )


ASOF_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("purchase_id", T.LongType()),
        T.StructField("last_click_value", T.DoubleType()),
    ]
)


def asof_cogroup_kernel(clicks: pd.DataFrame, purchases: pd.DataFrame) -> pd.DataFrame:
    """Cogrouped-map kernel: per-user as-of alignment — for every
    purchase, the value of the latest click at-or-before it. Ties on
    click ts resolve to the max event_id (clicks sorted by (ts,
    event_id); merge_asof backward keeps the last row <= ts), matching
    the oracle's ORDER BY ts DESC, event_id DESC LIMIT 1."""
    if len(purchases) == 0:
        return pd.DataFrame(
            {"user_id": [], "purchase_id": [], "last_click_value": []}
        ).astype({"user_id": "int64", "purchase_id": "int64",
                  "last_click_value": "float64"})
    p = purchases.sort_values(["ts", "event_id"]).reset_index(drop=True)
    if len(clicks) == 0:
        return pd.DataFrame(
            {
                "user_id": p["user_id"],
                "purchase_id": p["event_id"],
                "last_click_value": [None] * len(p),
            }
        )
    c = (
        clicks.sort_values(["ts", "event_id"])
        .rename(columns={"value": "last_click_value"})
        .reset_index(drop=True)
    )
    merged = pd.merge_asof(
        p,
        c[["ts", "last_click_value"]],
        on="ts",
        direction="backward",
        allow_exact_matches=True,
    )
    return pd.DataFrame(
        {
            "user_id": merged["user_id"],
            "purchase_id": merged["event_id"],
            "last_click_value": merged["last_click_value"],
        }
    )


@query(
    "q_udf_cogrouped",
    oracle="""
        SELECT p.user_id, p.event_id AS purchase_id,
               (SELECT c.value FROM events c
                WHERE c.event_type = 'click' AND c.user_id = p.user_id
                  AND c.ts <= p.ts
                ORDER BY c.ts DESC, c.event_id DESC LIMIT 1)
                   AS last_click_value
        FROM events p WHERE p.event_type = 'purchase'
    """,
)
def q_udf_cogrouped(spark, sf_dir):
    """Cogrouped applyInPandas (the two-input grouped-map rung of the
    UDF ladder): clicks and purchases shuffle ONCE each on user_id,
    then pandas merge_asof aligns them per user in a single Arrow
    batch — the custom-logic escape hatch for per-key algorithms no
    built-in join expresses. The oracle is the same as-of semantics as
    a correlated LIMIT 1 subquery. At scale this is two co-partitioned
    exchanges and |users| independent kernels — no driver collection,
    no cross join.

    The two sides MUST come from independent scans (two load() calls),
    never two filters of one DataFrame: a self-cogroup shares attribute
    ids across sides, Spark's dedup-right then re-ids the right child,
    and the function expression keeps referencing the old (left-owned)
    ids — so column pruning strips every non-grouping column from the
    right side the moment ANY operator sits above the cogroup (count,
    select, filter; a bare collect is the only safe shape). The kernel
    then receives purchases as a key-only frame and dies on KeyError
    'ts' (observed on Spark 4.1.2; regression-gated in
    tests/test_r08_fixes.py)."""
    clicks = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    ).select("user_id", "ts", "event_id", "value")
    purchases = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select("user_id", "ts", "event_id")
    return (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(asof_cogroup_kernel, schema=ASOF_OUT_SCHEMA)
    )
