"""Shared tokenization / shingling used by the dedup family.

Kept engine-portable: the exact same construction exists as Spark
Column expressions and as DuckDB SQL (the oracle), so the full dedup
pipelines hash-compare end to end. Hashing uses md5 — bit-identical
hex output on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SHINGLE_W = 5  # 5-gram token shingles: the fixture vocab is tiny, so
# short shingles would collide massively (see stop-shingle cap below).


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def shingles_of(toks: Column) -> Column:
    """Distinct 5-token shingles from a *materialized* token array.

    Operate on a bound token column, never on the raw text: inlining
    ``split()`` inside the transform lambda re-runs the regex split
    once per accessed element (W× per shingle — measured 15 s for 5 k
    docs single-task vs <1 s this way)."""
    w = SHINGLE_W
    idx = F.sequence(F.lit(1), F.size(toks) - (w - 1))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, w), " "))
    )


def shingles(text: Column) -> Column:
    """Distinct 5-token shingles of a document (single-expression form;
    prefer ``doc_shingles`` which materializes tokens first)."""
    return shingles_of(tokens(text))


# DuckDB twins (keep in sync with the Column builders above).
TOKENS_SQL = "string_split_regex(trim(text), '\\s+')"


def gram_select_sql(table: str, w: int, alias: str = "sh") -> str:
    """Exploded ``(doc_id, gram)`` SELECT over ``table`` with the token
    list BOUND ONCE in a subquery projection — the SQL twin of the
    ``shingles_of`` docstring's rule. Inlining ``TOKENS_SQL`` inside
    the transform lambda makes DuckDB re-run the regex split per
    element access: O(L²) splits per document, invisible on the
    ≤100-token fixture but a 4-minute-per-document wall on the r20
    'longdoc' fuzz fixture's 2048-token docs (measured >240 s for
    THREE docs inlined vs 0.1 s for the whole corpus bound)."""
    expr = " || ' ' || ".join(f"t[i+{j}]" for j in range(w))
    return f"""
    SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, len(t) - {w - 2}),
        i -> {expr}
    ))) AS {alias}
    FROM (SELECT doc_id, {TOKENS_SQL} AS t FROM {table}) _toked_{table}
    WHERE len(t) >= {w}
"""

# Exploded (doc_id, shingle) relation over documents with >= W tokens.
DOC_SHINGLES_SQL = gram_select_sql("documents", SHINGLE_W)


def doc_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, sh) exploded shingle relation (Spark twin of
    DOC_SHINGLES_SQL).

    Repartitions by doc_id before the CPU-heavy tokenize+shingle step:
    a small upstream file count must not serialize the explode (at
    cluster scale the scan already yields many splits, and the shuffle
    pre-spreads keys for the groupBy/join consumers downstream)."""
    spread = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < spread:
        docs = docs.repartition(spread, "doc_id")
    toked = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    return (
        toked.filter(F.size("toks") >= SHINGLE_W)
        .select("doc_id", F.explode(shingles_of(F.col("toks"))).alias("sh"))
    )
