"""EXT — embedding-column transformations for training-data pipelines.

Per-label centroids (the build step of IVF/coarse k-means, and the
class-prototype computation used in data curation) and L2
normalization (the preprocessing step every cosine-similarity pipeline
runs). Both emit LONG format (id/label, dim, value) rather than float
arrays: element-at-a-time rows hash cross-engine exactly, and at scale
long format is also what you want — per-(label, dim) partial sums
map-combine to a tiny shuffle (|labels| x |dims| groups), instead of
shipping whole vectors to a per-label reducer.

Determinism: element sums go through DECIMAL(20,10) (exact,
order-independent addition); the float32 -> double element conversion
is exact; single divisions on identical inputs are IEEE754-stable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load
from .similarity import SQNORM_SQL, _sqnorm


@query(
    "q_embed_centroid",
    oracle="""
        SELECT label, CAST(i - 1 AS BIGINT) AS dim,
               ROUND(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(20,10))) AS DOUBLE)
                     / COUNT(*), 6) AS centroid
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
        GROUP BY label, i
    """,
)
def q_embed_centroid(spark, sf_dir):
    """Per-label mean embedding (IVF build step / class prototypes).
    posexplode -> groupBy(label, dim): partial aggregation collapses
    each map task to |labels| x |dims| rows before the shuffle, so the
    exchange is tiny no matter how many vectors feed it."""
    e = load(spark, sf_dir, "embeddings")
    exploded = e.select("label", F.posexplode("embedding").alias("dim", "x"))
    return (
        exploded.groupBy("label", F.col("dim").cast("long").alias("dim"))
        .agg(
            F.round(
                F.sum(F.col("x").cast("double").cast("decimal(20,10)"))
                .cast("double") / F.count("*"),
                6,
            ).alias("centroid")
        )
    )


@query(
    "q_embed_normalize",
    oracle=f"""
        SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
               ROUND(CAST(embedding[i] AS DOUBLE)
                     / sqrt({SQNORM_SQL.format(a='embedding')}), 6) AS val
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
        WHERE vec_id % 50 = 0
    """,
)
def q_embed_normalize(spark, sf_dir):
    """L2 normalization of the embedding column (sampled slice so the
    long-format output stays bounded). The squared norm is the same
    sequential fold as the cosine pipeline, so scores downstream of
    either path agree bit-for-bit."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 50 == 0)
    exploded = e.select(
        "vec_id",
        _sqnorm(F.col("embedding")).alias("sq"),
        F.posexplode("embedding").alias("dim", "x"),
    )
    return exploded.select(
        "vec_id",
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("x").cast("double") / F.sqrt("sq"), 6).alias("val"),
    )


@query(
    "q_embed_quantize",
    oracle="""
        WITH e AS (
            SELECT vec_id, embedding,
                   list_max(list_transform(embedding,
                       v -> abs(CAST(v AS DOUBLE)))) AS ma
            FROM embeddings WHERE vec_id % 20 = 0
        )
        SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
               CAST(CASE WHEN ma = 0 THEN 0
                    ELSE floor(CAST(embedding[i] AS DOUBLE) * 127 / ma)
                    END AS BIGINT) AS qval,
               ROUND(ma / 127, 8) AS scale
        FROM e, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    """,
)
def q_embed_quantize(spark, sf_dir):
    """Symmetric int8 quantization of the embedding column (the
    storage/bandwidth step before ANN serving: 4x smaller vectors,
    SIMD-friendly dot products). Per-vector scale = max|x| / 127;
    elements map by FLOOR(x * 127 / max|x|) — floor, not round,
    because IEEE floor is bit-identical across engines while
    round-half ties are not. Zero vectors quantize to zeros (scale
    guard). Narrow per-row transform: no shuffle at any scale; long
    format on a sampled slice for exact cross-engine hashing."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 20 == 0)
    ma = F.array_max(
        F.transform("embedding", lambda v: F.abs(v.cast("double")))
    )
    exploded = e.select(
        "vec_id", ma.alias("ma"), F.posexplode("embedding").alias("dim", "x")
    )
    qval = F.when(F.col("ma") == 0, F.lit(0)).otherwise(
        F.floor(F.col("x").cast("double") * 127 / F.col("ma"))
    )
    return exploded.select(
        "vec_id",
        F.col("dim").cast("long").alias("dim"),
        qval.cast("long").alias("qval"),
        F.round(F.col("ma") / 127, 8).alias("scale"),
    )


@query(
    "q_embed_gram",
    oracle="""
        WITH pairs AS (
            SELECT i, j,
                   ROUND(CAST(embedding[i] AS DOUBLE)
                         * CAST(embedding[j] AS DOUBLE), 9) AS term
            FROM embeddings,
                 UNNEST(range(1, len(embedding) + 1)) AS t(i),
                 UNNEST(range(1, len(embedding) + 1)) AS u(j)
            WHERE j >= i
        )
        SELECT CAST(i - 1 AS BIGINT) AS i, CAST(j - 1 AS BIGINT) AS j,
               CAST(SUM(CAST(term AS DECIMAL(25,12))) AS DOUBLE) AS gram,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM pairs GROUP BY i, j
    """,
)
def q_embed_gram(spark, sf_dir):
    """Upper-triangle Gram matrix accumulation Σ x_i·x_j over the
    corpus — the single-pass statistic behind PCA / whitening /
    low-rank compression of an embedding table (combine with
    q_embed_centroid's means for the covariance). Per-row products are
    rounded to 9 dp (absorbing any cross-engine product ulp) and
    summed through DECIMAL: order-independent, hash-exact.

    Scale shape: the d(d+1)/2 index pairs are expanded ARRAY-SIDE
    (nested transform + one flatten/explode — no self-join of the
    exploded relation, which would shuffle |rows|·d rows), then ONE
    map-side-combinable groupBy: every map task pre-collapses to at
    most d(d+1)/2 partial sums, so the shuffle is O(d²) per task
    regardless of corpus size — the DataFrame rendering of a
    tree-aggregated outer-product accumulator."""
    e = load(spark, sf_dir, "embeddings").select("embedding")
    d = F.size("embedding")
    xi = lambda i: F.element_at("embedding", i + 1).cast("double")  # noqa: E731
    pairs = e.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), d - 1),
                    lambda i: F.transform(
                        F.sequence(i, d - 1),
                        lambda j: F.struct(
                            i.cast("long").alias("i"),
                            j.cast("long").alias("j"),
                            F.round(xi(i) * xi(j), 9).alias("term"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.i", "p.j", "p.term")
    return pairs.groupBy("i", "j").agg(
        F.sum(F.col("term").cast("decimal(25,12)")).cast("double").alias("gram"),
        F.count("*").cast("long").alias("n"),
    )


@query(
    "q_centroid_incremental",
    oracle="""
        SELECT label, CAST(i - 1 AS BIGINT) AS dim,
               ROUND(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE)
                                   AS DECIMAL(20,10))) AS DOUBLE)
                     / COUNT(*), 6) AS centroid,
               CAST(COUNT(*) AS BIGINT) AS n_vecs
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
        GROUP BY label, i
    """,
)
def q_centroid_incremental(spark, sf_dir):
    """Incremental IVF-index maintenance: per-label centroids updated
    by MERGING partial states — (decimal sum, count) per (label, dim)
    from the existing corpus combined with the same state from an
    arriving batch — instead of rescanning everything. The oracle
    recomputes from the full corpus, so the driver hash-check PROVES
    state-merge == full recompute (the algebraic property that makes
    centroid maintenance O(|batch|) per ingest at 100 TB; decimal
    partial sums make the merge exact, where float partials would
    drift by accumulation order).

    This is the index-side twin of q_cdc_incremental_agg: same IVM
    delta algebra, applied to the vector-index build that q_sim_ivf
    probes."""
    e = load(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") % 13 != 5)
    batch = e.filter(F.col("vec_id") % 13 == 5)

    def partial(df):
        return (
            df.select("label", F.posexplode("embedding").alias("dim", "x"))
            .groupBy("label", F.col("dim").cast("long").alias("dim"))
            .agg(
                F.sum(F.col("x").cast("double").cast("decimal(20,10)")).alias("s"),
                F.count("*").alias("n"),
            )
        )

    pc = partial(corpus).alias("c")
    pb = partial(batch).alias("b")
    merged = pc.join(pb, ["label", "dim"], "full").select(
        "label",
        "dim",
        (
            F.coalesce(F.col("c.s"), F.lit(0).cast("decimal(20,10)"))
            + F.coalesce(F.col("b.s"), F.lit(0).cast("decimal(20,10)"))
        ).alias("s"),
        (F.coalesce(F.col("c.n"), F.lit(0)) + F.coalesce(F.col("b.n"), F.lit(0))).alias("n"),
    )
    return merged.select(
        "label",
        "dim",
        F.round(F.col("s").cast("double") / F.col("n"), 6).alias("centroid"),
        F.col("n").cast("long").alias("n_vecs"),
    )
