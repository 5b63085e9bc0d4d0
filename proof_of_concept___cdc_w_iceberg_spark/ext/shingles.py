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


def shingles(text: Column) -> Column:
    """Distinct 5-token shingles of a document."""
    t = tokens(text)
    w = SHINGLE_W
    idx = F.sequence(F.lit(1), F.size(t) - (w - 1))
    make = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(t, i + j) for j in range(w)]
    )
    return F.array_distinct(F.transform(idx, make))


# DuckDB twins (keep in sync with the Column builders above).
TOKENS_SQL = "string_split_regex(trim(text), '\\s+')"
SHINGLES_SQL = f"""
    list_distinct(list_transform(
        range(1, len({TOKENS_SQL}) - {SHINGLE_W - 2}),
        i -> {" || ' ' || ".join(f"{TOKENS_SQL}[i+{j}]" for j in range(SHINGLE_W))}
    ))
"""

# Exploded (doc_id, shingle) relation over documents with >= W tokens.
DOC_SHINGLES_SQL = f"""
    SELECT doc_id, unnest({SHINGLES_SQL}) AS sh
    FROM documents WHERE len({TOKENS_SQL}) >= {SHINGLE_W}
"""


def doc_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, sh) exploded shingle relation (Spark twin of
    DOC_SHINGLES_SQL)."""
    return (
        docs.filter(F.size(tokens(F.col("text"))) >= SHINGLE_W)
        .select("doc_id", F.explode(shingles(F.col("text"))).alias("sh"))
    )
