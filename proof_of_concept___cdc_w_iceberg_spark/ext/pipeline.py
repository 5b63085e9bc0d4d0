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


ASSEMBLE_MIN_CHARS = 100
ASSEMBLE_TRAIN_FRAC = 0.9


def _assemble_split_sql(vc: str) -> str:
    from .corpus import _hex_u32_sql

    h = _hex_u32_sql(f"md5('asm|' || CAST(doc_id AS {vc}))")
    return (
        f"CASE WHEN {h} / 4294967296.0 < {ASSEMBLE_TRAIN_FRAC} "
        f"THEN 'train' ELSE 'val' END"
    )


SAMPLE_ASSEMBLE_SQL = f"""
    SELECT d.doc_id, d.lang, e.label,
           CAST(len(string_split_regex(trim(d.text), '\\s+')) AS BIGINT)
               AS n_toks,
           ROUND(sqrt(list_reduce(
               list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE),
               (x, y) -> x + y)), 6) AS emb_norm,
           {_assemble_split_sql('VARCHAR')} AS split
    FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    WHERE d.n_chars >= {ASSEMBLE_MIN_CHARS}
"""


@query("q_sample_assemble", oracle=SAMPLE_ASSEMBLE_SQL)
def q_sample_assemble(spark, sf_dir):
    """Multimodal training-sample assembly — the last-mile join that
    turns curated tables into training records: text features
    (token count) + the aligned embedding (with its L2 norm as the
    sanity stat) + a deterministic train/val split, one row per
    sample.

    Scale shape: ONE equi-join on the sample id — with both tables
    bucketed on id (sources/bucketed.py) this is the zero-exchange
    join; everything else is narrow maps (token count, fold-based
    norm, hash split) that pipeline into the join's output without
    materialization. The split is hash-derived (corpus.py idiom), so
    sample membership is stable under repartitioning, reruns, and
    corpus growth — the property rand() splits lack."""
    from .corpus import _hex_u32_sql
    from .similarity import _sqnorm

    d = load(spark, sf_dir, "documents").filter(
        F.col("n_chars") >= ASSEMBLE_MIN_CHARS
    )
    e = load(spark, sf_dir, "embeddings")
    split = F.expr(_assemble_split_sql("STRING"))
    return (
        d.join(e, d.doc_id == e.vec_id)
        .select(
            "doc_id",
            "lang",
            "label",
            F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_toks"),
            F.round(F.sqrt(_sqnorm(F.col("embedding"))), 6).alias("emb_norm"),
            split.alias("split"),
        )
    )
