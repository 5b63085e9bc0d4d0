"""EXT — end-to-end training-data curation pipeline composite.

The single-query form of what an LLM data pipeline runs over a crawl
snapshot: language filter → length/quality gate → near-dup removal
(greedy min-id keep over the shingle-Jaccard pair graph) → per-source
reservoir sample. Each stage exists as a standalone verified operator
(q_text_langid, q_text_quality, q_dedup_ngram, q_sample_reservoir);
this composite proves they compose into one Catalyst plan — filters
push into the scan, the dedup anti-join blocks on shingles, the final
sample is a per-group top-k window, and nothing materializes between
stages.

Dedup policy here is *pair-greedy* (drop any doc having a near-dup
with a smaller id) rather than full connected components
(q_dedup_cluster): one anti-join instead of an iterative fixpoint —
the right trade inside a single declarative pipeline; chains still
collapse to their head doc.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load
from .dedup import NGRAM_PAIRS_SQL, q_dedup_ngram

MIN_CHARS = 150


@query(
    "q_pipeline_curate",
    oracle=f"""
        WITH pairs AS ({NGRAM_PAIRS_SQL}),
        near_dup_tails AS (SELECT DISTINCT id_b FROM pairs),
        gated AS (
            SELECT doc_id, source, n_chars FROM documents
            WHERE lang = 'en' AND n_chars >= {MIN_CHARS}
              AND doc_id NOT IN (SELECT id_b FROM near_dup_tails)
        ),
        ranked AS (
            SELECT doc_id, source, n_chars,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rn
            FROM gated
        )
        SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
        FROM ranked WHERE rn <= 2
    """,
)
def q_pipeline_curate(spark, sf_dir):
    """Curation composite: lang='en' + length gate + near-dup drop +
    deterministic per-source sample, as ONE DataFrame pipeline."""
    d = load(spark, sf_dir, "documents")
    tails = q_dedup_ngram(spark, sf_dir).select("id_b").distinct() \
        .withColumnRenamed("id_b", "doc_id")
    gated = (
        d.filter((F.col("lang") == "en") & (F.col("n_chars") >= MIN_CHARS))
        .join(tails, "doc_id", "left_anti")
        .select("doc_id", "source", "n_chars")
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        gated.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("doc_id", "source", F.col("n_chars").cast("long").alias("n_chars"))
    )
