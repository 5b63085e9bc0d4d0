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
        -- "+ 0" normalizes the SIGNED ZERO (r19 nulls seed 5): a
        -- tiny-negative mean rounds to -0.0 in DuckDB's double ROUND
        -- while Spark's round (BigDecimal HALF_UP) always returns
        -- +0.0; IEEE -0.0 + 0 = +0.0, nonzero values unchanged.
        SELECT label, CAST(i - 1 AS BIGINT) AS dim,
               ROUND(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(20,10))) AS DOUBLE)
                     / COUNT(*), 6) + 0 AS centroid
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


def _gram_pairs(e):
    """(i, j, term) upper-triangle pair terms for the Gram accumulation,
    shared by q_embed_gram and q_embed_pca. Codegen'd generator
    expansion (interpreted higher-order-function lambdas cost ~5× per
    element); inputs with fewer partitions than cores are round-robin
    repartitioned so the map-side combine parallelizes."""
    e = e.select("embedding")
    if e.rdd.getNumPartitions() < 8:
        e = e.repartition(32)
    d = F.size("embedding")
    ei = e.select("embedding", F.explode(F.sequence(F.lit(0), d - 1)).alias("i"))
    return ei.select(
        "i",
        F.explode(F.sequence(F.col("i"), d - 1)).alias("j"),
        "embedding",
    ).select(
        F.col("i").cast("long").alias("i"),
        F.col("j").cast("long").alias("j"),
        F.round(
            F.element_at("embedding", F.col("i").cast("int") + 1).cast("double")
            * F.element_at("embedding", F.col("j").cast("int") + 1).cast("double"),
            9,
        ).alias("term"),
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

    Scale shape: the d(d+1)/2 index pairs are expanded ROW-SIDE by two
    chained generators (explode of the index sequences + element_at —
    all codegen'd builtins; no self-join of the exploded relation,
    which would shuffle |rows|·d rows), then ONE map-side-combinable
    groupBy: every map task pre-collapses to at most d(d+1)/2 partial
    sums, so the shuffle is O(d²) per task regardless of corpus size —
    the DataFrame rendering of a tree-aggregated outer-product
    accumulator. A small input (the single-file fixture) is round-robin
    repartitioned first so the per-partition combine actually
    parallelizes — measured 5× on local[32]; a real many-partition
    corpus skips that narrow exchange (decimal sums are
    order-independent, so the result is identical either way)."""
    pairs = _gram_pairs(load(spark, sf_dir, "embeddings"))
    return pairs.groupBy("i", "j").agg(
        F.sum(F.col("term").cast("decimal(25,12)")).cast("double").alias("gram"),
        F.count("*").cast("long").alias("n"),
    )


@query(
    "q_centroid_incremental",
    oracle="""
        -- "+ 0": signed-zero normalization, see q_embed_centroid
        SELECT label, CAST(i - 1 AS BIGINT) AS dim,
               ROUND(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE)
                                   AS DECIMAL(20,10))) AS DOUBLE)
                     / COUNT(*), 6) + 0 AS centroid,
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

    # Merge = union of partial states + re-aggregate (the monoid sum):
    # NULL-label-safe by construction — groupBy keeps a NULL key as
    # ONE group, where the previous full-outer join on the label key
    # never matched NULL to NULL and emitted the corpus-side and
    # batch-side NULL groups as separate rows (r19 'nulls' fuzz tier,
    # rows 768 != 704). Same physics: one shuffle on (label, dim),
    # partials stay exact decimals.
    merged = (
        partial(corpus)
        .unionByName(partial(batch))
        .groupBy("label", "dim")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
    )
    return merged.select(
        "label",
        "dim",
        F.round(F.col("s").cast("double") / F.col("n"), 6).alias("centroid"),
        F.col("n").cast("long").alias("n_vecs"),
    )


KMEANS_K = 4
KMEANS_ITERS = 3


def _sq_dist_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> ({a}[i]::DOUBLE - {b}[i]::DOUBLE) * ({a}[i]::DOUBLE - {b}[i]::DOUBLE)), "
        f"(x, y) -> x + y)"
    )


def _kmeans_sql(k: int = KMEANS_K, iters: int = KMEANS_ITERS) -> str:
    """Unrolled Lloyd iterations as a CTE chain (the DuckDB twin of the
    driver-broadcast loop below — same seeds, same decimal-exact
    centroid means, same (dist, cluster) argmin tie-break)."""
    parts = [
        f"cent0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, "
        f"embedding AS ctr FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {k}))"
    ]
    prev = "cent0"
    for it in range(1, iters + 1):
        parts.append(
            f"""assign{it} AS (
        SELECT vec_id, embedding, cl, dist FROM (
            SELECT vec_id, embedding, cl, dist,
                   row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
            FROM (SELECT e.vec_id, e.embedding, c.cl,
                         {_sq_dist_sql('e.embedding', 'c.ctr')} AS dist
                  FROM embeddings e CROSS JOIN {prev} c))
        WHERE rn = 1)"""
        )
        if it < iters:
            parts.append(
                f"""cent{it} AS (
        SELECT cl, list(val ORDER BY pos) AS ctr FROM (
            SELECT cl, i AS pos,
                   ROUND(CAST(SUM(CAST(embedding[i]::DOUBLE AS DECIMAL(20,10))) AS DOUBLE)
                         / COUNT(*), 6) AS val
            FROM assign{it}, UNNEST(range(1, len(embedding) + 1)) AS t(i)
            GROUP BY cl, i) GROUP BY cl)"""
            )
            prev = f"cent{it}"
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT vec_id, CAST(cl AS BIGINT) AS cluster, "
        f"ROUND(dist, 6) AS dist FROM assign{iters}"
    )


@query("q_kmeans_embed", oracle=_kmeans_sql())
def q_kmeans_embed(spark, sf_dir):
    """K-means clustering of the embedding column (Lloyd, K=4, 3
    iterations, first-K-by-id seeding): the semantic-clustering step
    LLM data pipelines run for topic balancing, cluster-based dedup
    pruning (SemDeDup-style), and IVF coarse quantizer training.

    Spark-first shape — the MLlib pattern: centroids are DRIVER-SIDE
    state (K x d doubles, a few KB) re-broadcast each iteration as
    literal arrays, so per-iteration work is one narrow map computing K
    fold-distances per row (argmin via array_position of the min — ties
    to the lowest cluster id) plus one posexplode + map-combined
    groupBy(cluster, dim) for the new means: |K x d| groups per
    partial, independent of corpus size. NO cross join, NO per-row
    Python. Per-dim means go through DECIMAL(20,10) and round to 6
    (order-independent, cross-engine exact), so every iteration's
    centroids — and therefore the final assignment — hash-match the
    unrolled-SQL oracle bit for bit.

    At 100 TB: iterations scan the corpus K more times (cacheable);
    the driver state stays K x d regardless of rows — this is exactly
    how distributed k-means is meant to run on Spark."""
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def sq_dist(emb, cent_vals):
        cent = F.array(*[F.lit(float(v)) for v in cent_vals])
        return F.aggregate(
            F.zip_with(
                emb,
                cent,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    seeds = e.orderBy("vec_id").limit(KMEANS_K).collect()
    cents = [[float(v) for v in r["embedding"]] for r in seeds]

    assigned = None
    for it in range(1, KMEANS_ITERS + 1):
        darr = F.array(*[sq_dist(F.col("embedding"), c) for c in cents])
        assigned = e.select(
            "vec_id",
            "embedding",
            (F.array_position(darr, F.array_min(darr)) - 1).cast("long").alias("cluster"),
            F.array_min(darr).alias("dist"),
        )
        if it < KMEANS_ITERS:
            means = (
                assigned.select("cluster", F.posexplode("embedding").alias("dim", "x"))
                .groupBy("cluster", "dim")
                .agg(
                    F.round(
                        F.sum(F.col("x").cast("double").cast("decimal(20,10)"))
                        .cast("double") / F.count("*"),
                        6,
                    ).alias("val")
                )
                .collect()
            )
            by_cl: dict[int, dict[int, float]] = {}
            for r in means:
                by_cl.setdefault(r["cluster"], {})[r["dim"]] = r["val"]
            cents = [
                [by_cl[cl][d] for d in sorted(by_cl[cl])] for cl in sorted(by_cl)
            ]
    return assigned.select("vec_id", "cluster", F.round("dist", 6).alias("dist"))


PCA_ITERS = 5

_GRAM_FULL_SQL = """
    gram_ut AS (
        SELECT i, j,
               CAST(SUM(CAST(term AS DECIMAL(25,12))) AS DOUBLE) AS g
        FROM (
            SELECT i, j,
                   ROUND(CAST(embedding[i] AS DOUBLE)
                         * CAST(embedding[j] AS DOUBLE), 9) AS term
            FROM embeddings,
                 UNNEST(range(1, len(embedding) + 1)) AS t(i),
                 UNNEST(range(1, len(embedding) + 1)) AS u(j)
            WHERE j >= i)
        GROUP BY i, j
    ),
    gram_full AS (
        SELECT i - 1 AS i, j - 1 AS j, g FROM gram_ut
        UNION ALL
        SELECT j - 1, i - 1, g FROM gram_ut WHERE i <> j
    )
"""


def _pca_sql(iters: int = PCA_ITERS) -> str:
    """Unrolled power iteration (DuckDB twin of the driver-side loop):
    matvec folds each row's terms in ascending-j order — the same
    sequential IEEE addition chain Python's reduce performs — and
    normalizes by the max-|component| (comparison only, no arithmetic),
    so every iterate is bit-identical across engines."""
    parts = [
        _GRAM_FULL_SQL.strip(),
        "x0 AS (SELECT DISTINCT i AS dim, 1.0 AS val FROM gram_full)",
    ]
    prev = "x0"
    for it in range(1, iters + 1):
        parts.append(
            f"""y{it} AS (
        SELECT i AS dim, list_reduce(list(gx ORDER BY j), (a, b) -> a + b) AS y
        FROM (SELECT g.i, g.j, g.g * x.val AS gx
              FROM gram_full g JOIN {prev} x ON g.j = x.dim)
        GROUP BY i)"""
        )
        parts.append(
            f"x{it} AS (SELECT dim, y / (SELECT MAX(abs(y)) FROM y{it}) AS val FROM y{it})"
        )
        prev = f"x{it}"
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT CAST(dim AS BIGINT) AS dim, ROUND(val, 8) AS loading,
           ROUND((SELECT MAX(abs(y)) FROM y{iters}), 6) AS eigenvalue_est
    FROM x{iters}"""
    )


@query("q_embed_pca", oracle=_pca_sql())
def q_embed_pca(spark, sf_dir):
    """Top principal direction of the embedding second-moment matrix
    by POWER ITERATION (5 steps, all-ones start, max-abs-component
    normalization): the PCA/whitening prep step embedding pipelines
    run before SemDeDup-style pruning or dimension reduction.

    Spark-first split of work: the GRAM accumulation is the distributed
    part (q_embed_gram's array-side pair expansion + one map-combined
    groupBy — O(d²) shuffle regardless of corpus size); the iteration
    runs DRIVER-SIDE on the collected d×d matrix (bounded KBs by
    design, like MLlib's RowMatrix.computePrincipalComponents Gramian
    collect). Each matvec row-sum folds in ascending-j order and the
    normalizer is a pure comparison, so driver arithmetic replays the
    oracle's fold chains bit-for-bit. Eigenvalue estimate = the last
    normalizer (max-abs of the unnormalized iterate). Convergence is
    the usual (lambda2/lambda1)^k rate — on a near-isotropic corpus
    (like this fixture) 5 steps yield a partially-converged direction;
    the hash-checked contract is the exact iteration, and
    tests/test_r04_ops.py asserts the spectrum-independent laws
    (Rayleigh-quotient monotonicity, eigenvalue bounds, numpy replay).

    At 100 TB: one corpus scan total; driver state d² doubles. For d
    beyond ~10k (matrix no longer driver-bounded) the same iteration
    runs distributed on the (i, j, g) relation with the vector
    broadcast — only the collect moves."""
    from functools import reduce as _reduce

    pairs = _gram_pairs(load(spark, sf_dir, "embeddings"))
    ut = (
        pairs.groupBy("i", "j")
        .agg(F.sum(F.col("term").cast("decimal(25,12)")).cast("double").alias("g"))
        .collect()
    )
    g: dict[int, dict[int, float]] = {}
    for r in ut:
        g.setdefault(r["i"], {})[r["j"]] = r["g"]
        if r["i"] != r["j"]:
            g.setdefault(r["j"], {})[r["i"]] = r["g"]
    dims = sorted(g)
    x = {dim: 1.0 for dim in dims}
    m = 1.0
    for _ in range(PCA_ITERS):
        y = {
            i: _reduce(lambda a, b: a + b, [g[i][j] * x[j] for j in sorted(g[i])])
            for i in dims
        }
        m = max(abs(v) for v in y.values())
        x = {i: v / m for i, v in y.items()}
    rows = [(int(i), round(x[i], 8), round(m, 6)) for i in dims]
    return spark.createDataFrame(
        rows, "dim: bigint, loading: double, eigenvalue_est: double"
    )


OUTLIER_FACTOR = 1.05  # dist² > factor × label mean dist² ⇒ outlier
#   (synthetic near-uniform embeddings concentrate hard at d=64 —
#   dist² spread is only ~±8% of the mean — so the screen threshold
#   sits just above the bulk; real curation pipelines tune this knob)

OUTLIER_SQL = """
    WITH exploded AS (
        SELECT vec_id, label, CAST(i - 1 AS BIGINT) AS dim,
               CAST(embedding[i] AS DOUBLE) AS x
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    cent AS (
        SELECT label, dim,
               ROUND(CAST(SUM(CAST(x AS DECIMAL(20,10))) AS DOUBLE)
                     / COUNT(*), 6) AS c
        FROM exploded GROUP BY label, dim
    ),
    terms AS (
        SELECT e.vec_id, e.label,
               ROUND((e.x - cent.c) * (e.x - cent.c), 8) AS term
        FROM exploded e JOIN cent
          ON cent.label = e.label AND cent.dim = e.dim
    ),
    d AS (
        SELECT vec_id, label,
               ROUND(SUM(CAST(term AS DECIMAL(20,8))), 6) AS dist2d
        FROM terms GROUP BY vec_id, label
    ),
    lab AS (
        SELECT label, CAST(SUM(dist2d) AS DECIMAL(20,6)) AS sum_d,
               COUNT(*) AS n_lab
        FROM d GROUP BY label
    )
    SELECT d.vec_id, d.label, CAST(d.dist2d AS DOUBLE) AS dist2,
           CAST(d.dist2d AS DECIMAL(14,6)) * CAST(n_lab AS DECIMAL(12,0))
               * {factor100} > sum_d * {factor100x} AS is_outlier
    FROM d JOIN lab ON lab.label = d.label
""".format(factor100=100, factor100x=int(round(OUTLIER_FACTOR * 100)))


@query("q_embed_outlier", oracle=OUTLIER_SQL)
def q_embed_outlier(spark, sf_dir):
    """Centroid-distance outlier screen — the embedding-space quality
    filter (mislabeled / off-distribution samples sit far from their
    class prototype; SemDeDup-style pipelines drop or re-queue them).

    Two tiny broadcast relations do all the work: the per-(label,dim)
    centroid (|labels|×d rows, from the same map-combined long-format
    partials as q_embed_centroid) and the per-label mean distance
    (|labels| rows). The corpus is scanned twice (centroid pass +
    distance pass) but shuffled only as micro-aggregates — at 100 TB
    both exchanges stay KB-sized. Determinism: rounded centroids,
    per-term round(·,8) then exact decimal summation; dist2 is rounded
    IN DECIMAL (cross-engine-identical half-away ties — double ROUND
    diverges at the 1%-per-row decimal-tie boundaries a quantized sum
    creates; found by the r18 oracle fuzzer, seed 1), and the outlier
    test is the multiplied-out EXACT decimal comparison
    n·dist2·100 > 105·Σdist2 — no double division anywhere, so the
    flag is deterministic even when a distance sits exactly on the
    factor×mean boundary."""
    e = load(spark, sf_dir, "embeddings")
    exploded = e.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("dim", "xf"),
    ).select("vec_id", "label", F.col("dim").cast("long").alias("dim"), F.col("xf").cast("double").alias("x"))
    cent = exploded.groupBy("label", "dim").agg(
        F.round(
            F.sum(F.col("x").cast("decimal(20,10)")).cast("double") / F.count("*"), 6
        ).alias("c")
    )
    terms = exploded.join(F.broadcast(cent), ["label", "dim"]).select(
        "vec_id",
        "label",
        F.round((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")), 8).alias("term"),
    )
    d = terms.groupBy("vec_id", "label").agg(
        F.round(F.sum(F.col("term").cast("decimal(20,8)")), 6).alias("dist2d")
    )
    lab = d.groupBy("label").agg(
        F.sum("dist2d").cast("decimal(20,6)").alias("sum_d"),
        F.count("*").alias("n_lab"),
    )
    return d.join(F.broadcast(lab), "label").select(
        "vec_id",
        "label",
        F.col("dist2d").cast("double").alias("dist2"),
        (
            F.col("dist2d").cast("decimal(14,6)")
            * F.col("n_lab").cast("decimal(12,0)")
            * F.lit(100)
            > F.col("sum_d") * F.lit(int(round(OUTLIER_FACTOR * 100)))
        ).alias("is_outlier"),
    )


CLASSIFY_SQL = """
    WITH exploded AS (
        SELECT vec_id, label, CAST(i - 1 AS BIGINT) AS dim,
               CAST(embedding[i] AS DOUBLE) AS x
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    cent AS (
        SELECT label AS c_label, dim,
               ROUND(CAST(SUM(CAST(x AS DECIMAL(20,10))) AS DOUBLE)
                     / COUNT(*), 6) AS c
        FROM exploded GROUP BY label, dim
    ),
    dists AS (
        SELECT e.vec_id, e.label AS true_label, cent.c_label,
               ROUND(SUM(CAST(ROUND((e.x - cent.c) * (e.x - cent.c), 8)
                              AS DECIMAL(20,8))), 6) AS d2
        FROM exploded e JOIN cent ON cent.dim = e.dim
        GROUP BY e.vec_id, e.label, cent.c_label
    ),
    pred AS (
        SELECT vec_id, true_label, c_label AS pred_label,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d2, c_label) AS rn
        FROM dists
    )
    SELECT true_label, pred_label, CAST(COUNT(*) AS BIGINT) AS n
    FROM pred WHERE rn = 1
    GROUP BY true_label, pred_label
"""


@query("q_centroid_classify", oracle=CLASSIFY_SQL)
def q_centroid_classify(spark, sf_dir):
    """Nearest-centroid classification + confusion matrix — the
    embedding-space eval loop (is the labeling / clustering coherent?)
    and the assignment step of coarse quantization (every vector vs
    EVERY cell centroid, unlike q_embed_outlier's own-label distance).

    Scale shape: centroids are a |labels|×d broadcast (KB-sized);
    distances to ALL centroids come from ONE join of the exploded
    corpus against the centroid relation on dim — the per-row work is
    |labels| partial products, map-combined by (vec, centroid) before
    the argmin window on the vector's own partitioning. The confusion
    matrix is O(|labels|²) rows out. Same rounded-term decimal
    summation as the rest of the module keeps argmin ties (broken by
    centroid label) cross-engine identical."""
    e = load(spark, sf_dir, "embeddings")
    exploded = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "xf")
    ).select(
        "vec_id",
        "label",
        F.col("dim").cast("long").alias("dim"),
        F.col("xf").cast("double").alias("x"),
    )
    cent = exploded.groupBy(F.col("label").alias("c_label"), "dim").agg(
        F.round(
            F.sum(F.col("x").cast("decimal(20,10)")).cast("double") / F.count("*"), 6
        ).alias("c")
    )
    dists = (
        exploded.join(F.broadcast(cent), "dim")
        .select(
            "vec_id",
            F.col("label").alias("true_label"),
            "c_label",
            F.round((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")), 8).alias("t"),
        )
        .groupBy("vec_id", "true_label", "c_label")
        # d2 stays DECIMAL end-to-end: it only feeds the argmin rank
        # below, and rounding the quantized decimal sum in DOUBLE
        # diverges cross-engine at 1%-per-row decimal-tie boundaries
        # (the r18 fuzzer proved the pattern on q_embed_outlier).
        .agg(F.round(F.sum(F.col("t").cast("decimal(20,8)")), 6).alias("d2"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("vec_id").orderBy("d2", "c_label")
    return (
        dists.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("true_label", F.col("c_label").alias("pred_label"))
        .agg(F.count("*").alias("n"))
    )
