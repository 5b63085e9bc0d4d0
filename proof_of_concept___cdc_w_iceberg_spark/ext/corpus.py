"""EXT — corpus-level curation ops for LLM training-data pipelines.

Four operators a crawl-to-training pipeline runs corpus-wide, beyond
the per-document text analysis in ext/text.py:

- ``q_dedup_lines``   — C4/RefinedWeb-style duplicate-LINE removal:
  lines that occur in more than one document keep only their first
  occurrence; documents are rebuilt from their surviving lines.
- ``q_contamination`` — benchmark decontamination report: n-gram
  overlap of every training doc against a held-out eval set.
- ``q_token_histogram`` — log2-bucketed token-length distribution per
  language (the corpus-shape statistic behind length-based filtering).
- ``q_domain_mix``    — deterministic re-balancing sample: per-source
  quotas (the "domain mixing" step that sets the training mixture).

The fixture corpus has no newlines, so a "line" here is a fixed
5-token segment (non-overlapping); with real data the segmenter swaps
to ``split(text, '\\n')`` and everything downstream is unchanged.

All JVM built-ins, engine-portable arithmetic (md5, floor/log2,
regexp_extract), no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load
from .shingles import TOKENS_SQL, gram_select_sql, tokens

SEG_W = 5          # tokens per "line" (fixture proxy for newline split)
CONTAM_W = 3       # n-gram width for contamination (short enough to hit
#                    overlaps in the tiny-vocab fixture; real pipelines
#                    use 8-13-gram windows — only this constant changes)
CONTAM_DF_CAP = 50  # drop n-grams present in > CAP train docs (boiler-
#                    plate/noise cap; also bounds the join's hottest key)
CONTAM_MIN_SHARED = 2
EVAL_MOD = 97      # doc_id % 97 == 0 -> held-out "benchmark" docs


def _lines_col(toks):
    """Non-overlapping SEG_W-token segments of a token array, as
    (seg, line) pairs via one transform — no explode+regroup shuffle."""
    nseg = F.ceil(F.size(toks) / F.lit(SEG_W)).cast("int")
    return F.transform(
        F.sequence(F.lit(1), nseg),
        lambda i: F.array_join(F.slice(toks, (i - F.lit(1)) * SEG_W + 1, SEG_W), " "),
    )


_LINES_SQL = f"""
    SELECT doc_id,
           CAST(ceil(len({TOKENS_SQL}) / {SEG_W}) AS BIGINT) AS n_lines,
           unnest(list_transform(
               range(1, CAST(ceil(len({TOKENS_SQL}) / {SEG_W}) AS BIGINT) + 1),
               i -> array_to_string(
                   list_slice({TOKENS_SQL}, (i-1)*{SEG_W} + 1, i*{SEG_W}), ' ')
           )) AS line,
           generate_subscripts(list_transform(
               range(1, CAST(ceil(len({TOKENS_SQL}) / {SEG_W}) AS BIGINT) + 1),
               i -> i), 1) AS seg
    FROM documents WHERE len({TOKENS_SQL}) >= 1
"""


@query(
    "q_dedup_lines",
    oracle=f"""
        WITH lines AS ({_LINES_SQL}),
        kept AS (
            SELECT doc_id, n_lines, seg, line,
                   row_number() OVER (
                       PARTITION BY md5(line) ORDER BY doc_id, seg
                   ) AS rn
            FROM lines
        ),
        rebuilt AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                   string_agg(line, ' ' ORDER BY seg) AS new_text
            FROM kept WHERE rn = 1 GROUP BY doc_id
        ),
        totals AS (SELECT DISTINCT doc_id, n_lines FROM lines)
        SELECT t.doc_id, t.n_lines,
               COALESCE(r.n_kept, 0) AS n_kept,
               COALESCE(r.new_text, '') AS new_text
        FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
    """,
)
def q_dedup_lines(spark, sf_dir):
    """Cross-document duplicate-line removal (C4 §2.2 shape): a line
    occurring in N documents survives only at its globally-first
    (doc_id, seg) position; each document is rebuilt from its kept
    lines. One window over md5(line) — the shuffle key is the line
    hash, so at 100 TB hot boilerplate lines are single keys (bounded
    by their true frequency), and everything else is near-unique."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).filter(F.size("toks") >= 1)
    lines = (
        d.select(
            "doc_id",
            F.ceil(F.size("toks") / F.lit(SEG_W)).cast("long").alias("n_lines"),
            F.posexplode(_lines_col(F.col("toks"))).alias("seg0", "line"),
        )
        # 1-based segment index to match the oracle's generate_subscripts
        .select("doc_id", "n_lines", (F.col("seg0") + 1).alias("seg"), "line")
    )
    w = Window.partitionBy(F.md5("line")).orderBy("doc_id", "seg")
    kept = lines.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg", "line"))),
                lambda x: x["line"],
            ),
            " ",
        ).alias("new_text"),
    )
    totals = lines.select("doc_id", "n_lines").distinct()
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("new_text", F.lit("")).alias("new_text"),
    )


def _ngrams_col(toks, w: int):
    idx = F.sequence(F.lit(1), F.size(toks) - (w - 1))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, w), " "))
    )


# Token list bound once (gram_select_sql): the inlined form re-ran the
# regex split per element access — O(L²), caught by the r20 'longdoc'
# fuzz fixture (see shingles.py).
_CONTAM_GRAMS_SQL = gram_select_sql("documents", CONTAM_W, alias="g")


@query(
    "q_contamination",
    oracle=f"""
        WITH grams AS ({_CONTAM_GRAMS_SQL}),
        tr AS (SELECT doc_id, g FROM grams WHERE doc_id % {EVAL_MOD} <> 0),
        ev AS (SELECT doc_id AS eval_id, g FROM grams WHERE doc_id % {EVAL_MOD} = 0),
        stop AS (SELECT g FROM tr GROUP BY g HAVING count(*) > {CONTAM_DF_CAP}),
        tr2 AS (SELECT * FROM tr WHERE g NOT IN (SELECT g FROM stop)),
        ev2 AS (SELECT * FROM ev WHERE g NOT IN (SELECT g FROM stop)),
        ev_tot AS (SELECT eval_id, count(*) AS n_ev FROM ev2 GROUP BY eval_id),
        pairs AS (
            SELECT tr2.doc_id, ev2.eval_id, CAST(count(*) AS BIGINT) AS n_shared
            FROM tr2 JOIN ev2 USING (g)
            GROUP BY tr2.doc_id, ev2.eval_id
            HAVING count(*) >= {CONTAM_MIN_SHARED}
        )
        SELECT p.doc_id, p.eval_id, p.n_shared,
               ROUND(CAST(p.n_shared AS DOUBLE) / e.n_ev, 4) AS contam_frac
        FROM pairs p JOIN ev_tot e ON p.eval_id = e.eval_id
    """,
)
def q_contamination(spark, sf_dir):
    """Benchmark decontamination report: distinct {CONTAM_W}-gram
    overlap of each training doc against each held-out eval doc
    (eval = doc_id % {EVAL_MOD} == 0). Design for 100 TB: the eval
    side is benchmark-sized (thousands of docs) and BROADCAST, so the
    corpus is scanned once with no corpus-wide shuffle except the
    final per-pair count; n-grams present in > {CONTAM_DF_CAP} train
    docs are dropped first (boilerplate noise — and the join's hot-key
    bound)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).filter(F.size("toks") >= CONTAM_W)
    grams = d.select(
        "doc_id", F.explode(_ngrams_col(F.col("toks"), CONTAM_W)).alias("g")
    )
    tr = grams.filter(F.col("doc_id") % EVAL_MOD != 0)
    ev = grams.filter(F.col("doc_id") % EVAL_MOD == 0) \
        .withColumnRenamed("doc_id", "eval_id")
    stop = tr.groupBy("g").count().filter(F.col("count") > CONTAM_DF_CAP).select("g")
    tr2 = tr.join(F.broadcast(stop), "g", "left_anti")
    ev2 = ev.join(F.broadcast(stop), "g", "left_anti")
    ev_tot = ev2.groupBy("eval_id").agg(F.count("*").alias("n_ev"))
    pairs = (
        tr2.join(F.broadcast(ev2), "g")
        .groupBy("doc_id", "eval_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= CONTAM_MIN_SHARED)
    )
    return pairs.join(F.broadcast(ev_tot), "eval_id").select(
        "doc_id",
        "eval_id",
        "n_shared",
        F.round(F.col("n_shared").cast("double") / F.col("n_ev"), 4)
        .alias("contam_frac"),
    )


@query(
    "q_token_histogram",
    oracle=f"""
        WITH t AS (
            SELECT lang, len({TOKENS_SQL}) AS n_tokens FROM documents
            WHERE len({TOKENS_SQL}) >= 1
        )
        SELECT lang,
               CAST(power(2, floor(log2(n_tokens))) AS BIGINT) AS bucket_lo,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        FROM t GROUP BY lang, bucket_lo
    """,
)
def q_token_histogram(spark, sf_dir):
    """Log2-bucketed token-length histogram per language — the
    corpus-shape statistic driving length filters and packing
    efficiency estimates. One map-side-combinable aggregate; the
    bucket count is O(log(max_len)) so the shuffle is tiny at any
    scale."""
    d = load(spark, sf_dir, "documents").select(
        "lang", F.size(tokens(F.col("text"))).alias("n_tokens")
    ).filter(F.col("n_tokens") >= 1)
    bucket = F.pow(F.lit(2.0), F.floor(F.log2("n_tokens"))).cast("long")
    return (
        d.groupBy("lang", bucket.alias("bucket_lo"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )


# Per-source quota rule: even-numbered sources are "high-quality"
# domains (quota 10), odd-numbered "low" (quota 3). A rule over the
# source NAME (not a hardcoded list) so it holds at every scale factor.
_QUOTA_SQL = ("CASE WHEN CAST(regexp_extract(source, '(\\d+)$', 1) AS INT) % 2 = 0 "
              "THEN 10 ELSE 3 END")


@query(
    "q_domain_mix",
    oracle=f"""
        WITH ranked AS (
            SELECT doc_id, source,
                   {_QUOTA_SQL} AS quota,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rn
            FROM documents
        )
        SELECT doc_id, source, CAST(quota AS INT) AS quota
        FROM ranked WHERE rn <= quota
    """,
)
def q_domain_mix(spark, sf_dir):
    """Domain-mixture rebalancing: per-source quotas drawn in
    deterministic md5(doc_id) order — the step that turns a raw crawl
    mix into the declared training mixture, reproducible across reruns
    (audit requirement). Per-group top-k window; quotas are a rule
    over the source name, so no driver-side source list is needed and
    the plan is scale-independent."""
    quota = F.when(
        F.regexp_extract("source", r"(\d+)$", 1).cast("int") % 2 == 0, F.lit(10)
    ).otherwise(F.lit(3))
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", "source", quota.alias("quota"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.col("quota"))
        .select("doc_id", "source", "quota")
    )


CHUNK_W = 32       # tokens per training chunk
CHUNK_STRIDE = 24  # chunk start stride (CHUNK_W - CHUNK_STRIDE = 8-token
#                    overlap, the standard sliding-window chunking for
#                    context-window packing)


@query(
    "q_doc_chunk",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {TOKENS_SQL} AS t FROM documents
        ),
        starts AS (
            SELECT doc_id, t,
                   unnest(range(1, len(t) + 1, {CHUNK_STRIDE})) AS start_pos
            FROM toks WHERE len(t) >= 1
        )
        SELECT doc_id,
               CAST(start_pos AS BIGINT) AS start_pos,
               CAST(len(list_slice(t, start_pos,
                        least(start_pos + {CHUNK_W} - 1, len(t)))) AS BIGINT)
                   AS n_toks,
               md5(array_to_string(
                   list_slice(t, start_pos,
                              least(start_pos + {CHUNK_W} - 1, len(t))), ' '))
                   AS chunk_fp
        FROM starts
    """,
)
def q_doc_chunk(spark, sf_dir):
    """Sliding-window document chunking for training-data prep: each
    doc becomes overlapping {CHUNK_W}-token chunks starting every
    {CHUNK_STRIDE} tokens (8-token overlap). Output is (doc_id,
    start_pos, n_toks, md5 fingerprint of the chunk text) — the
    fingerprint stands in for the chunk payload so the oracle compares
    exact chunk CONTENT without hauling the text through the hash
    compare.

    Scale shape: pure per-row narrow transform — tokens materialized
    once, starts generated with sequence(), chunks sliced array-side,
    exploded. No shuffle at all; chunking 100 TB is embarrassingly
    parallel and this plan keeps it that way (one WholeStageCodegen
    span over the scan)."""
    docs = load(spark, sf_dir, "documents")
    spread = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < spread:
        docs = docs.repartition(spread, "doc_id")
    toked = docs.select("doc_id", tokens(F.col("text")).alias("t")).filter(
        F.size("t") >= 1
    )
    chunk = lambda s: F.slice("t", s, CHUNK_W)  # noqa: E731 — capped at array end
    return (
        toked.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t"), F.lit(CHUNK_STRIDE)),
                    lambda s: F.struct(
                        s.cast("long").alias("start_pos"),
                        F.size(chunk(s)).cast("long").alias("n_toks"),
                        F.md5(F.array_join(chunk(s), " ")).alias("chunk_fp"),
                    ),
                )
            ).alias("c"),
        )
        .select("doc_id", "c.start_pos", "c.n_toks", "c.chunk_fp")
    )


BALANCE_FRAC = 0.4  # per-language token budget = 40% of the language's
#                     total tokens — scale-free, so the semantics (and
#                     the oracle) hold at every sf and at 100 TB.


@query(
    "q_corpus_balance",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang,
                   CAST(len({TOKENS_SQL}) AS BIGINT) AS n_toks
            FROM documents
        ),
        budgeted AS (
            SELECT doc_id, lang, n_toks,
                   SUM(n_toks) OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS cum_toks,
                   CAST(floor({BALANCE_FRAC} * SUM(n_toks) OVER (
                       PARTITION BY lang)) AS BIGINT) AS budget
            FROM toks
        )
        SELECT doc_id, lang, n_toks,
               CAST(cum_toks AS BIGINT) AS cum_toks, budget
        FROM budgeted WHERE cum_toks <= budget
    """,
)
def q_corpus_balance(spark, sf_dir):
    """Token-budget corpus balancing: cap every language at a fixed
    fraction of its token mass, admitting docs in deterministic
    md5(doc_id) order until the running total hits the budget — the
    "data mixture" step that downsamples over-represented languages
    before training (cf. the mixture tables in LLM data recipes).

    Deterministic order makes the sample reproducible across reruns —
    an audit requirement for training-data lineage. Scale shape: one
    shuffle on lang (the window partition); both the running sum and
    the per-lang total come from the SAME partitioning, so Catalyst
    plans a single Exchange reused by both window specs. No collect,
    no per-language driver loop — the language list is never
    materialized."""
    w_ord = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    w_all = Window.partitionBy("lang")
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(tokens(F.col("text"))).cast("long").alias("n_toks")
    )
    return (
        toks.withColumn(
            "cum_toks", F.sum("n_toks").over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
        )
        .withColumn(
            "budget",
            F.floor(F.lit(BALANCE_FRAC) * F.sum("n_toks").over(w_all)).cast("long"),
        )
        .filter(F.col("cum_toks") <= F.col("budget"))
        .select("doc_id", "lang", "n_toks", "cum_toks", "budget")
    )


SHARDS = 64  # training-output shard count: docs are hash-routed to
#              shards and ordered pseudo-randomly within each — the
#              scalable rendering of "globally shuffle the corpus"
#              (no global total order / single-partition sort).


def _hex_u32_sql(h: str) -> str:
    """First 8 hex chars of md5 string ``h`` as a 0..2^32-1 integer,
    via instr on the hex alphabet — portable across Spark SQL and
    DuckDB (both have 1-indexed instr(haystack, needle); no
    engine-specific hex cast)."""
    nibbles = [
        f"(CAST(instr('0123456789abcdef', substr({h}, {i + 1}, 1)) AS BIGINT) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    ]
    return "(" + " + ".join(nibbles) + ")"


_SHUF_HASH = _hex_u32_sql("md5(CAST(doc_id AS VARCHAR))")


@query(
    "q_shuffle_shards",
    oracle=f"""
        WITH hashed AS (
            SELECT doc_id, {_SHUF_HASH} AS h
            FROM documents
        )
        SELECT doc_id,
               CAST(h % {SHARDS} AS BIGINT) AS shard,
               CAST(row_number() OVER (
                   PARTITION BY h % {SHARDS}
                   ORDER BY md5('pos|' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS BIGINT) AS pos_in_shard
        FROM hashed
    """,
)
def q_shuffle_shards(spark, sf_dir):
    """Deterministic corpus shuffle for training-order assignment:
    route each doc to one of {SHARDS} shards by hash, order within the
    shard by an independent hash. Reading shards in order visits the
    corpus in reproducible pseudo-random order — the distributed
    replacement for ORDER BY random(), which at 100 TB would need a
    global range sort AND be unreproducible.

    Scale shape: one shuffle on the shard key (matches the physical
    write partitioning of the training shards), per-shard local sort
    inside the window — exactly `repartition(SHARDS) +
    sortWithinPartitions` when written out. The strpos-based hex
    decode keeps the hash portable (bit-identical) across engines."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"{_SHUF_HASH} % {SHARDS}".replace("AS VARCHAR", "AS STRING"))
        .cast("long")
        .alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy(
        F.md5(F.concat(F.lit("pos|"), F.col("doc_id").cast("string"))), "doc_id"
    )
    return d.select(
        "doc_id", "shard", F.row_number().over(w).cast("long").alias("pos_in_shard")
    )


SAMPLE_TARGET_TOKS = 120.0  # acceptance scale: docs at/above this token
#                             count are always kept; shorter docs keep
#                             proportionally to length (token-mass-
#                             uniform sampling).


@query(
    "q_weighted_sample",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   CAST(len({TOKENS_SQL}) AS BIGINT) AS n_toks,
                   {_hex_u32_sql("md5('samp|' || CAST(doc_id AS VARCHAR))")}
                       / 4294967296.0 AS u
            FROM documents
        )
        SELECT doc_id, lang, n_toks, ROUND(u, 8) AS u
        FROM scored
        WHERE u < n_toks / {SAMPLE_TARGET_TOKS}
    """,
)
def q_weighted_sample(spark, sf_dir):
    """Deterministic length-weighted Bernoulli sampling: doc i is kept
    iff hash-uniform(doc_id) < n_toks/{SAMPLE_TARGET_TOKS} — i.e.
    acceptance probability proportional to token count (token-mass-
    uniform sampling, the standard way to downsample a corpus without
    biasing against long documents). Hash-derived uniforms make the
    sample a pure function of doc_id: reproducible across reruns,
    engines, and partitionings — rand(seed) is none of those (it
    depends on physical row order).

    Scale shape: embarrassingly parallel narrow filter, no shuffle at
    all; the u < p predicate pushes into the scan stage."""
    u = F.expr(_hex_u32_sql("md5('samp|' || CAST(doc_id AS STRING))")) / F.lit(
        4294967296.0
    )
    return (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "lang",
            F.size(tokens(F.col("text"))).cast("long").alias("n_toks"),
            u.alias("u"),
        )
        .filter(F.col("u") < F.col("n_toks") / SAMPLE_TARGET_TOKS)
        .select("doc_id", "lang", "n_toks", F.round("u", 8).alias("u"))
    )


# 90/5/5 split on a u32 hash of doc_id, independent of the shuffle and
# sampling hashes above (different salt) — membership must not
# correlate across uses of the corpus hash.
_SPLIT_HASH = _hex_u32_sql("md5('split|' || CAST(doc_id AS VARCHAR))")
_SPLIT_CASE = (
    f"CASE WHEN {_SPLIT_HASH} < {int(0.90 * 2 ** 32)} THEN 'train' "
    f"WHEN {_SPLIT_HASH} < {int(0.95 * 2 ** 32)} THEN 'val' "
    "ELSE 'test' END"
)


@query(
    "q_stratified_split",
    oracle=f"""
        SELECT lang, {_SPLIT_CASE} AS split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc,
               CAST(MAX(doc_id) AS BIGINT) AS max_doc
        FROM documents
        GROUP BY 1, 2
    """,
)
def q_stratified_split(spark, sf_dir):
    """Deterministic train/val/test assignment (90/5/5) by salted
    doc_id hash, reported per language: the split is a pure function
    of the document identity, so it is stable under re-partitioning,
    re-runs, corpus growth (a doc never migrates between splits), and
    across engines — none of which holds for rand()-based splitting.
    A distinct salt ('split|') keeps membership independent of the
    shuffle/sampling hashes that share the corpus hash helper.

    Output is the per-(lang, split) audit summary; the row-level
    assignment is the same expression as a narrow zero-shuffle
    column. Scale: one map-side-combinable groupBy over ≤|langs|×3
    keys."""
    split_col = F.expr(_SPLIT_CASE.replace("AS VARCHAR", "AS STRING"))
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", split_col.alias("split"))
        .groupBy("lang", "split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@query(
    "q_dup_ratio_report",
    oracle="""
        WITH fp AS (
            SELECT source, md5(text) AS fp FROM documents
        ),
        per_fp AS (
            SELECT source, fp, CAST(COUNT(*) AS BIGINT) AS n
            FROM fp GROUP BY source, fp
        )
        SELECT source,
               CAST(SUM(n) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_unique,
               CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_dup_docs,
               ROUND((SUM(n) - COUNT(*)) / CAST(SUM(n) AS DOUBLE), 6)
                   AS dup_ratio
        FROM per_fp GROUP BY source
    """,
)
def q_dup_ratio_report(spark, sf_dir):
    """Corpus-health dashboard: per-source exact-duplicate ratio
    (docs beyond the first per content hash). The monitoring metric a
    crawl pipeline alerts on — a source whose dup_ratio spikes is
    re-serving content and should be throttled before it floods the
    dedup stage.

    Scale: one shuffle on (source, content hash), then a per-source
    rollup of the per-hash counts — the second aggregate reuses the
    first's partitioning prefix, and output is |sources| rows."""
    fp = load(spark, sf_dir, "documents").select(
        "source", F.md5("text").alias("fp")
    )
    per_fp = fp.groupBy("source", "fp").agg(F.count("*").alias("n"))
    return per_fp.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_unique"),
        (F.sum("n") - F.count("*")).cast("long").alias("n_dup_docs"),
        F.round(
            (F.sum("n") - F.count("*")) / F.sum("n").cast("double"), 6
        ).alias("dup_ratio"),
    )


BP_MIN_DOCS = 3  # a line present in >= 3 distinct docs of one source
#                  is that source's boilerplate (headers, nav, legal
#                  footers); real pipelines use a fraction of the
#                  source's doc count — only this constant changes.

_SRC_LINES_SQL = f"""
    SELECT doc_id, source,
           CAST(ceil(len({TOKENS_SQL}) / {SEG_W}) AS BIGINT) AS n_lines,
           unnest(list_transform(
               range(1, CAST(ceil(len({TOKENS_SQL}) / {SEG_W}) AS BIGINT) + 1),
               i -> array_to_string(
                   list_slice({TOKENS_SQL}, (i-1)*{SEG_W} + 1, i*{SEG_W}), ' ')
           )) AS line,
           generate_subscripts(list_transform(
               range(1, CAST(ceil(len({TOKENS_SQL}) / {SEG_W}) AS BIGINT) + 1),
               i -> i), 1) AS seg
    FROM documents WHERE len({TOKENS_SQL}) >= 1
"""

BOILERPLATE_SQL = f"""
    WITH lines AS ({_SRC_LINES_SQL}),
    bp AS (
        SELECT source, md5(line) AS h
        FROM lines
        GROUP BY source, md5(line)
        HAVING COUNT(DISTINCT doc_id) >= {BP_MIN_DOCS}
    ),
    kept AS (
        SELECT l.doc_id, l.n_lines, l.seg, l.line
        FROM lines l LEFT JOIN bp
          ON l.source = bp.source AND md5(l.line) = bp.h
        WHERE bp.h IS NULL
    ),
    rebuilt AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
               string_agg(line, ' ' ORDER BY seg) AS new_text
        FROM kept GROUP BY doc_id
    ),
    totals AS (SELECT DISTINCT doc_id, n_lines FROM lines)
    SELECT t.doc_id, t.n_lines,
           COALESCE(r.n_kept, 0) AS n_kept,
           COALESCE(r.new_text, '') AS new_text
    FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
"""


@query("q_boilerplate_strip", oracle=BOILERPLATE_SQL)
def q_boilerplate_strip(spark, sf_dir):
    """Per-source boilerplate removal (CCNet/RefinedWeb shape): a line
    occurring in >= BP_MIN_DOCS distinct documents of the SAME source
    is structural boilerplate (nav bars, footers, cookie banners) and
    is dropped at EVERY occurrence; documents rebuild from what's left.
    Complements q_dedup_lines, which keeps a duplicate line's first
    occurrence — boilerplate keeps none.

    Scale: the line relation shuffles once on (source, line-hash) to
    count distinct docs per line; the boilerplate set is the tiny tail
    of that aggregate (lines repeated >= 3x within a source), so the
    strip join back is a broadcast in practice. Document rebuild
    reuses q_dedup_lines' collect/sort-within-doc pattern — one
    shuffle on doc_id."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", tokens(F.col("text")).alias("toks")
    ).filter(F.size("toks") >= 1)
    lines = d.select(
        "doc_id",
        "source",
        F.ceil(F.size("toks") / F.lit(SEG_W)).cast("long").alias("n_lines"),
        F.posexplode(_lines_col(F.col("toks"))).alias("seg0", "line"),
    ).select(
        "doc_id", "source", "n_lines", (F.col("seg0") + 1).alias("seg"), "line"
    )
    bp = (
        lines.groupBy("source", F.md5("line").alias("h"))
        .agg(F.countDistinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= BP_MIN_DOCS)
        .select("source", "h")
    )
    kept = lines.alias("l").join(
        F.broadcast(bp.alias("b")),
        (F.col("l.source") == F.col("b.source"))
        & (F.md5(F.col("l.line")) == F.col("b.h")),
        "left_anti",
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg", "line"))),
                lambda x: x["line"],
            ),
            " ",
        ).alias("new_text"),
    )
    totals = lines.select("doc_id", "n_lines").distinct()
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("new_text", F.lit("")).alias("new_text"),
    )


MIX_BUDGET_FRAC = 0.5  # sampled corpus = half the input rows

MIX_TEMPERATURE_SQL = f"""
    WITH per_src AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(sqrt(COUNT(*)) AS DECIMAL(20,8)) AS w
        FROM documents GROUP BY source
    ),
    tot AS (
        SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total,
               SUM(w) AS w_total
        FROM per_src
    ),
    quota AS (
        SELECT source, n_docs,
               CAST(greatest(1, floor(
                   floor(CAST(n_total AS DOUBLE) * {MIX_BUDGET_FRAC})
                   * (CAST(w AS DOUBLE) / CAST(w_total AS DOUBLE)) + 0.5
               )) AS BIGINT) AS target
        FROM per_src, tot
    ),
    ranked AS (
        SELECT d.doc_id, d.source, q.target,
               row_number() OVER (
                   PARTITION BY d.source
                   ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
               ) AS rn
        FROM documents d JOIN quota q ON d.source = q.source
    )
    SELECT doc_id, source, target AS src_quota
    FROM ranked WHERE rn <= target
"""


@query("q_mix_temperature", oracle=MIX_TEMPERATURE_SQL)
def q_mix_temperature(spark, sf_dir):
    """Temperature-scaled domain mixing (multilingual-LM sampling,
    alpha = 0.5): per-source sampling weights proportional to
    n_docs^alpha flatten the source distribution — big domains are
    down-sampled, small ones kept whole — under a global doc budget.
    The mixture-setting step that runs AFTER curation and BEFORE
    shuffle-sharding in an LLM data pipeline.

    Determinism: sqrt is IEEE-exact in both engines; the weight sum
    crosses sources through DECIMAL(20,8) (order-independent); each
    source's quota is one double multiply + floor; doc selection is
    hash-ranked (md5 of the id), not rand(). Scale: per-source counts
    are a map-combined aggregate into |sources| rows (broadcast back),
    and the selection window partitions BY SOURCE — each source's
    rank is an independent partition sort, skew-bounded by the quota
    cap; at 100 TB swap the exact window for a per-source hash
    threshold (keep where hash < quota/n_docs) at the cost of +-1%
    quota precision."""
    d = load(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sqrt(F.count("*")).cast("decimal(20,8)").alias("w"),
    )
    tot = per_src.agg(
        F.sum("n_docs").cast("long").alias("n_total"),
        F.sum("w").alias("w_total"),
    )
    quota = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        F.greatest(
            F.lit(1),
            F.floor(
                F.floor(F.col("n_total").cast("double") * F.lit(MIX_BUDGET_FRAC))
                * (F.col("w").cast("double") / F.col("w_total").cast("double"))
                + F.lit(0.5)
            ),
        ).cast("long").alias("target"),
    )
    ranked = (
        d.select("doc_id", "source")
        .join(F.broadcast(quota), "source")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.md5(F.col("doc_id").cast("string")), "doc_id"
                )
            ),
        )
    )
    return ranked.filter(F.col("rn") <= F.col("target")).select(
        "doc_id", "source", F.col("target").alias("src_quota")
    )
