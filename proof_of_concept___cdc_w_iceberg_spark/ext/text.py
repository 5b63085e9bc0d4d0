"""EXT — text analysis for training-data pipelines.

Language ID (marker-word heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), n-gram frequency, content fingerprinting
(md5 of canonicalized token multiset). Every pipeline is expressed
with identical arithmetic on both engines (substring-count via
replace-length deltas, regexp_extract_all, md5), so the full outputs
hash-match.

All JVM-side built-ins — no Python in these hot paths.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from ..operators._util import rdiv, rdiv_sql
from ..registry import query
from ..sources.tables import load


def _count_marker(text: Column, marker: str) -> Column:
    """Occurrences of ``marker`` in text via replace-length delta —
    identical semantics in Spark and DuckDB."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(marker), F.lit(""))))
        / len(marker)
    ).cast("int")


def _count_marker_sql(marker: str) -> str:
    return (
        f"CAST((length(padded) - length(replace(padded, '{marker}', '')))"
        f" / {len(marker)} AS INT)"
    )


# language -> marker words (scored on ' word ' with padded text)
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de"],
    "fr": ["le", "et", "les"],
    "de": ["der", "und", "die"],
}


@query(
    "q_text_stats",
    oracle="""
        SELECT doc_id, lang,
               length(text) AS n_chars_calc,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens,
               ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                     / len(string_split_regex(trim(text), '\\s+')), 4) AS avg_token_len
        FROM documents
    """,
)
def q_text_stats(spark, sf_dir):
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars_calc"),
        F.size(toks).alias("n_tokens"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / F.size(toks),
            4,
        ).alias("avg_token_len"),
    )


def _langid_oracle() -> str:
    score_exprs = []
    for lang, markers in LANG_MARKERS.items():
        parts = " + ".join(_count_marker_sql(f" {m} ") for m in markers)
        score_exprs.append(f"({parts}) AS s_{lang}")
    cases = []
    langs = list(LANG_MARKERS)
    for i, lang in enumerate(langs):
        conds = " AND ".join(f"s_{lang} >= s_{other}" for other in langs[i + 1:])
        cond = f"s_{lang} > 0" + (f" AND {conds}" if conds else "")
        cases.append(f"WHEN {cond} THEN '{lang}'")
    case_sql = "CASE " + " ".join(cases) + " ELSE 'unknown' END"
    return f"""
        WITH padded_docs AS (
            SELECT doc_id, lang, ' ' || lower(text) || ' ' AS padded FROM documents
        ),
        scored AS (
            SELECT doc_id, lang, {', '.join(score_exprs)} FROM padded_docs
        )
        SELECT doc_id, lang AS labeled_lang, {case_sql} AS predicted_lang,
               s_en, s_es, s_fr, s_de
        FROM scored
    """


@query("q_text_langid", oracle=_langid_oracle())
def q_text_langid(spark, sf_dir):
    """N-gram/marker-word language ID heuristic: count per-language
    marker words, argmax with a fixed priority order (en,es,fr,de),
    'unknown' when no marker hits."""
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    df = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("labeled_lang"), padded.alias("padded")
    )
    for lang, markers in LANG_MARKERS.items():
        score = None
        for m in markers:
            c = _count_marker(F.col("padded"), f" {m} ")
            score = c if score is None else score + c
        df = df.withColumn(f"s_{lang}", score)
    langs = list(LANG_MARKERS)
    pred = None
    for i, lang in enumerate(langs):
        cond = F.col(f"s_{lang}") > 0
        for other in langs[i + 1:]:
            cond = cond & (F.col(f"s_{lang}") >= F.col(f"s_{other}"))
        branch = F.when(cond, lang)
        pred = branch if pred is None else pred.when(cond, lang)
    pred = pred.otherwise("unknown")
    return df.select(
        "doc_id", "labeled_lang", pred.alias("predicted_lang"),
        "s_en", "s_es", "s_fr", "s_de",
    )


@query(
    "q_text_quality",
    oracle="""
        WITH m AS (
            SELECT doc_id,
                   length(text) AS n,
                   CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tok,
                   CAST((length(' ' || lower(text) || ' ')
                         - length(replace(' ' || lower(text) || ' ', ' the ', ''))) / 5 AS INT)
                       AS n_stop,
                   length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))
                       AS n_punct
            FROM documents
        )
        SELECT doc_id,
               {q_expr} AS quality,
               n, n_tok, n_stop, n_punct
        FROM m
    """.replace("{q_expr}", rdiv_sql(
        "LEAST(n, 400) * 10 * n_tok * n"
        " + 2400 * LEAST(CAST(n_tok AS BIGINT), 10 * n_stop) * n"
        " + 1600 * (n - n_punct) * n_tok",
        "8000 * n_tok * n", 6
    )),
)
def q_text_quality(spark, sf_dir):
    """Quality score: length saturation + stopword-rate + punctuation
    penalty (the classic cheap pre-filter for LLM corpora)."""
    text = F.col("text")
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    n = F.length(text)
    n_tok = F.size(F.split(F.trim(text), r"\s+"))
    n_stop = (
        (F.length(padded) - F.length(F.replace(padded, F.lit(" the "), F.lit("")))) / 5
    ).cast("int")
    n_punct = n - F.length(F.regexp_replace(text, r"[^a-zA-Z0-9\s]", ""))
    # Exact integer rounding (rdiv): the old "components terminate at
    # <=5 dp" claim was FALSE for 2^7-divisible char counts (1/128 =
    # 0.0078125 — 7 dp), exactly the tie class the r18 fuzzer proved
    # cross-engine-divergent. The score is min(n,400)/800 +
    # 3·min(tok,10·stop)/(10·tok) + (n−punct)/(5n), multiplied out
    # over the common denominator 8000·tok·n.
    nl = n.cast("long")
    tokl = n_tok.cast("long")
    stopl = n_stop.cast("long")
    punctl = (n_punct).cast("long")
    # exact=False (r20 'longdoc' tier): the common-denominator numerator
    # is ~8000·tok·n, which crosses the 2·|num|·10^6 < 2^53 exactness
    # bound once tok·n exceeds ~5.6e5 — any 1000+-token document (the
    # armed RDIV_DEBUG guard fired on the 2048-token fixture docs).
    # Beyond the bound the chains stay bit-identical cross-engine
    # (rdiv's documented degraded regime); a sub-ulp deviation from
    # true half-away rounding is immaterial for a 6-dp quality score.
    quality = rdiv(
        F.least(nl, F.lit(400)) * 10 * tokl * nl
        + F.lit(2400) * F.least(tokl, F.lit(10) * stopl) * nl
        + F.lit(1600) * (nl - punctl) * tokl,
        F.lit(8000) * tokl * nl,
        6,
        exact=False,
    )
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        quality.alias("quality"),
        n.alias("n"),
        n_tok.alias("n_tok"),
        n_stop.alias("n_stop"),
        n_punct.alias("n_punct"),
    )


@query(
    "q_text_tokens",
    oracle="""
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))
                    AS INT) AS bpe_ish_tokens,
               CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS INT)
                    AS distinct_tokens
        FROM documents
    """,
)
def q_text_tokens(spark, sf_dir):
    """Token counting: whitespace tokens + a BPE-ish regex lexer
    (letter runs | digit runs | single punctuation) + distinct count."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(toks).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0
            )
        ).alias("bpe_ish_tokens"),
        F.size(F.array_distinct(toks)).alias("distinct_tokens"),
    )


@query(
    "q_text_ngram",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
        ),
        grams AS (
            SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
                AS bigram
            FROM toks WHERE len(t) >= 2
        ),
        counted AS (
            SELECT bigram, CAST(COUNT(*) AS BIGINT) AS freq FROM grams GROUP BY bigram
        )
        SELECT bigram, freq FROM counted ORDER BY freq DESC, bigram LIMIT 20
    """,
)
def q_text_ngram(spark, sf_dir):
    """Corpus bigram frequency, top-20 (freq desc, bigram asc tiebreak).

    Tokens are materialized to a column before the transform — inlining
    the split expression re-runs the regex once per accessed element
    (see ext/shingles.py)."""
    docs = load(spark, sf_dir, "documents")
    spread = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < spread:
        docs = docs.repartition(spread, "doc_id")
    toked = docs.select(F.split(F.trim(F.col("text")), r"\s+").alias("toks"))
    grams = (
        toked.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 1),
                    lambda i: F.array_join(F.slice("toks", i, 2), " "),
                )
            ).alias("bigram")
        )
    )
    return (
        grams.groupBy("bigram")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("bigram"))
        .limit(20)
    )


@query(
    "q_text_fingerprint",
    oracle="""
        SELECT doc_id,
               md5(array_to_string(
                   list_sort(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))),
                   ' ')) AS fingerprint,
               md5(text) AS exact_fp
        FROM documents
    """,
)
def q_text_fingerprint(spark, sf_dir):
    """Document fingerprinting: exact md5 + canonical fingerprint over
    the sorted distinct token set (OpenRefine-style fuzzy key — robust
    to token order / repetition)."""
    canon = F.array_join(
        F.sort_array(F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))),
        " ",
    )
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(canon).alias("fingerprint"),
        F.md5("text").alias("exact_fp"),
    )


@query(
    "q_text_vocab",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
            FROM documents
        )
        SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
               CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks GROUP BY token
        ORDER BY df DESC, token LIMIT 50
    """,
)
def q_text_vocab(spark, sf_dir):
    """Vocabulary building: per-token document frequency + term
    frequency, top-50. The tokenizer-training / vocab-pruning primitive
    of an LLM data pipeline. One explode, one groupBy — df via exact
    countDistinct (at trillion-token scale you'd swap in
    approx_count_distinct; exact keeps the oracle byte-identical)."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count("*").alias("tf"),
        )
        .orderBy(F.col("df").desc(), "token")
        .limit(50)
    )


PII_EMAIL = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
PII_PHONE = "\\+?[0-9][0-9-]{7,}[0-9]"


@query(
    "q_text_pii_scrub",
    oracle=f"""
        WITH injected AS (
            SELECT doc_id,
                   text || ' contact user' || doc_id ||
                   '@example.com or +1-555-' ||
                   lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
            FROM documents
        ),
        counted AS (
            SELECT doc_id, t,
                   CAST(len(regexp_extract_all(t, '{PII_EMAIL}')) AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(t, '{PII_PHONE}')) AS BIGINT) AS n_phones
            FROM injected
        )
        SELECT doc_id, n_emails, n_phones,
               md5(regexp_replace(regexp_replace(t, '{PII_EMAIL}', '[EMAIL]', 'g'),
                   '{PII_PHONE}', '[PHONE]', 'g')) AS scrub_fp
        FROM counted
    """,
)
def q_text_pii_scrub(spark, sf_dir):
    """PII redaction: regex-scrub emails and phone numbers, count
    redactions, fingerprint the scrubbed text. The fixture corpus is
    synthetic word-salad with no real PII, so a deterministic
    email+phone per doc is INJECTED first and then scrubbed — the
    round-trip proves the scrubber against known-planted PII. All
    JVM-side regexp (codegen), no Python in the pipeline."""
    d = load(spark, sf_dir, "documents")
    injected = F.concat(
        F.col("text"), F.lit(" contact user"), F.col("doc_id"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(injected, PII_EMAIL, "[EMAIL]"),
        PII_PHONE, "[PHONE]",
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(injected, F.lit(PII_EMAIL), 0))
        .cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(injected, F.lit(PII_PHONE), 0))
        .cast("long").alias("n_phones"),
        F.md5(scrubbed).alias("scrub_fp"),
    )


@query(
    "q_text_gopher",
    oracle="""
        WITH toks AS (
            SELECT doc_id, text,
                   string_split_regex(trim(text), '\\s+') AS t
            FROM documents
        ),
        m AS (
            SELECT doc_id, text, t,
                   CAST(len(t) AS BIGINT) AS n_words,
                   CAST(list_sum(list_transform(t, w -> length(w))) AS DOUBLE)
                       / len(t) AS mwl
            FROM toks WHERE len(t) >= 2
        ),
        bg AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(t)),
                                         i -> t[i] || ' ' || t[i+1])) AS bigram
            FROM toks WHERE len(t) >= 2
        ),
        bc AS (
            SELECT doc_id, bigram, count(*) AS cnt FROM bg GROUP BY doc_id, bigram
        ),
        top AS (
            SELECT doc_id, bigram, cnt,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY cnt DESC, bigram DESC) AS rn
            FROM bc
        )
        SELECT m.doc_id, n_words,
               ROUND(mwl, 6) AS mean_word_len,
               top.bigram AS top_bigram,
               ROUND(CAST(cnt * length(top.bigram) AS DOUBLE)
                     / length(m.text), 6) AS rep2_frac,
               (n_words >= 50 AND mwl BETWEEN 3 AND 10
                AND CAST(cnt * length(top.bigram) AS DOUBLE)
                    <= 0.2 * length(m.text)) AS keep
        FROM m JOIN top ON m.doc_id = top.doc_id AND rn = 1
    """,
)
def q_text_gopher(spark, sf_dir):
    """Gopher-style quality gate (Rae et al. 2021, public rules) over
    the corpus: per-doc mean word length in [3,10], minimum word count,
    and the repetition rule — the fraction of characters covered by the
    single most frequent word 2-gram must stay under 20%. (The fixture
    corpus has no newlines, so the line-based Gopher rules — bullet
    ratio, duplicate-line fraction — are degenerate here; the word-level
    rules are the meaningful subset. Cross-doc line dedup is
    q_dedup_lines.)

    Scale shape: doc-level metrics are one map-side pass (no shuffle);
    the top-bigram needs one shuffle on (doc_id, bigram) with map-side
    partials, then a per-doc max of (cnt, bigram) structs — max_by, not
    a row_number window — and a co-partitioned join back on doc_id.
    Tiebreak is lexicographically-last among equal counts on both
    engines."""
    docs = load(spark, sf_dir, "documents")
    spread = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < spread:
        docs = docs.repartition(spread, "doc_id")
    toked = docs.select(
        "doc_id", "text", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    ).filter(F.size("t") >= 2)
    m = toked.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size("t").cast("long").alias("n_words"),
        (
            F.aggregate(
                F.transform("t", lambda w: F.length(w)),
                F.lit(0),
                lambda acc, x: acc + x,
            ).cast("double")
            / F.size("t")
        ).alias("mwl"),
    )
    bg = toked.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.array_join(F.slice("t", i, 2), " "),
            )
        ).alias("bigram"),
    )
    top = (
        bg.groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max(F.struct("cnt", "bigram")).alias("tp"))
        .select("doc_id", F.col("tp.bigram").alias("top_bigram"), F.col("tp.cnt").alias("cnt"))
    )
    rep_chars = (F.col("cnt") * F.length("top_bigram")).cast("double")
    return (
        m.join(top, "doc_id")
        .select(
            "doc_id",
            "n_words",
            F.round("mwl", 6).alias("mean_word_len"),
            "top_bigram",
            F.round(rep_chars / F.col("n_chars"), 6).alias("rep2_frac"),
            (
                (F.col("n_words") >= 50)
                & F.col("mwl").between(3, 10)
                & (rep_chars <= 0.2 * F.col("n_chars"))
            ).alias("keep"),
        )
    )


@query(
    "q_text_tfidf",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
            FROM documents
        ),
        tf AS (
            SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token
        ),
        df AS (
            SELECT token, count(*) AS df FROM tf GROUP BY token
        ),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.token,
                   CAST(tf AS BIGINT) AS tf,
                   CAST(df AS BIGINT) AS df,
                   ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS tfidf
            FROM tf JOIN df USING (token) CROSS JOIN n
        )
        SELECT doc_id, token, tf, df, tfidf
        FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                                         ORDER BY tfidf DESC, token) AS rn
            FROM scored
        ) WHERE rn <= 3
    """,
)
def q_text_tfidf(spark, sf_dir):
    """Top-3 TF-IDF terms per document. TF is a (doc_id, token) count,
    DF aggregates the TF relation (one extra small shuffle, never a
    second corpus scan), N arrives as a 1-row broadcast cross join, and
    DF — vocabulary-sized — broadcasts back onto TF. Ranking uses the
    ROUNDED score (both engines round the same libm-double to 4
    decimals before comparing) with token-asc tiebreak, so the top-3 is
    cross-engine deterministic."""
    docs = load(spark, sf_dir, "documents")
    spread = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < spread:
        docs = docs.repartition(spread, "doc_id")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "token")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 4
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "token")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "token", "tf", "df", "tfidf")
    )


PACK_SEQ_LEN = 256  # tokens per packed training sequence


@query(
    "q_pack_sequences",
    oracle=f"""
        WITH d AS (
            SELECT doc_id,
                   len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
                   md5(CAST(doc_id AS VARCHAR)) AS ok
            FROM documents
        ),
        c AS (
            SELECT doc_id, n_tokens,
                   SUM(n_tokens) OVER (ORDER BY ok
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum
            FROM d
        )
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST((cum - n_tokens) // {PACK_SEQ_LEN} AS BIGINT) AS seq_id,
               CAST((cum - n_tokens) % {PACK_SEQ_LEN} AS BIGINT) AS seq_offset
        FROM c
    """,
)
def q_pack_sequences(spark, sf_dir):
    """Sequence packing for LLM pretraining: documents are concatenated
    in a deterministic shuffled order (md5 of doc_id) and split into
    fixed {PACK_SEQ_LEN}-token training sequences; each doc reports the
    sequence containing its first token and its offset inside it.

    The naive formulation is a GLOBAL running token sum — a
    Window.orderBy() with no partition, which Spark executes in ONE
    task (the classic scale trap). Instead this runs the textbook
    parallel prefix-sum: the md5 ordering key's first hex char splits
    the corpus into 16 ordered buckets; within-bucket running sums are
    a partitioned window (parallel), the 16 bucket totals cumsum on the
    driver-sized side and broadcast back. Because the bucket char is a
    PREFIX of the ordering key, (bucket, ok) order == global ok order,
    so the result is identical to the single-task plan — the DuckDB
    oracle computes exactly that global cumsum."""
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    d = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            toks.cast("long").alias("n_tokens"),
            F.md5(F.col("doc_id").cast("string")).alias("ok"),
        )
        .withColumn("bucket", F.substring("ok", 1, 1))
    )
    local_w = (
        Window.partitionBy("bucket")
        .orderBy("ok")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("local_cum", F.sum("n_tokens").over(local_w))
    bucket_w = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boff = (
        d.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("btok"))
        .withColumn(
            "boffset", F.coalesce(F.sum("btok").over(bucket_w), F.lit(0))
        )
        .select("bucket", "boffset")
    )
    start = F.col("boffset") + F.col("local_cum") - F.col("n_tokens")
    return d.join(F.broadcast(boff), "bucket").select(
        "doc_id",
        "n_tokens",
        F.floor(start / PACK_SEQ_LEN).cast("long").alias("seq_id"),
        (start % PACK_SEQ_LEN).cast("long").alias("seq_offset"),
    )


BM25_TERMS = ("vector", "merge", "stream")  # the fixed search query
BM25_K1 = 1.2
BM25_B = 0.75


BM25_SQL = f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split_regex(trim(text), '\\s+')) AS token
            FROM documents
        ),
        dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        stats AS (
            SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                   CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
            FROM dl
        ),
        tf AS (
            SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf
            FROM toks WHERE token IN {BM25_TERMS!r}
            GROUP BY doc_id, token
        ),
        df AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY token),
        scored AS (
            SELECT tf.doc_id,
                   SUM(ln((n_docs - df + 0.5) / (df + 0.5) + 1)
                       * tf * ({BM25_K1} + 1)
                       / (tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / avgdl)))
                       AS s
            FROM tf
            JOIN df USING (token)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN stats
            GROUP BY tf.doc_id
        )
        SELECT doc_id, ROUND(s, 4) AS bm25
        FROM scored ORDER BY ROUND(s, 4) DESC, doc_id LIMIT 20
    """


@query("q_bm25", oracle=BM25_SQL)
def q_bm25(spark, sf_dir):
    """BM25 ranking (k1={BM25_K1}, b={BM25_B}) of the corpus against a
    fixed 3-term query — the retrieval scorer of a RAG/data-curation
    stack. One tokenize pass feeds BOTH the doc-length relation and the
    (query-filtered) TF relation; DF aggregates TF (3 rows), corpus
    stats arrive as a 1-row broadcast, so the only shuffles are the two
    tiny aggregates and the dl join back (co-partitioned on doc_id).
    Per-term sums are at most |terms| addends, ordered identically in
    both engines via commutative addition over identical doubles;
    ranking uses the ROUNDED score with doc_id tiebreak, so the top-20
    is cross-engine deterministic."""
    docs = load(spark, sf_dir, "documents")
    spread = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < spread:
        docs = docs.repartition(spread, "doc_id")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    ).persist()
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    tf = (
        tok.filter(F.col("token").isin(*BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count("*").cast("double").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    term_score = (
        idf
        * F.col("tf") * (BM25_K1 + 1)
        / (
            F.col("tf")
            + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        tf.join(F.broadcast(df), "token")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(term_score).alias("s"))
    )
    return (
        scored.select("doc_id", F.round("s", 4).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


@query(
    "q_text_entropy",
    oracle="""
        WITH tok AS (
            SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS token
            FROM documents
        ),
        counts AS (
            SELECT source, token, CAST(COUNT(*) AS BIGINT) AS n
            FROM tok GROUP BY 1, 2
        ),
        totals AS (
            SELECT source, n, SUM(n) OVER (PARTITION BY source) AS tot
            FROM counts
        )
        SELECT source,
               CAST(SUM(CAST(ROUND(
                   -(n / CAST(tot AS DOUBLE)) * log2(n / CAST(tot AS DOUBLE)), 8)
                   AS DECIMAL(30, 10))) AS DOUBLE) AS entropy_bits,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens
        FROM totals GROUP BY source
    """,
)
def q_text_entropy(spark, sf_dir):
    """Per-source Shannon token entropy (bits): the corpus-diversity
    statistic behind repetition / boilerplate detection — a source
    whose entropy collapses is serving templated text. Per-token
    terms -p*log2(p) are rounded to 8 dp (absorbing any last-ulp libm
    difference between engines) and summed through DECIMAL so the
    total is order-independent and bit-equal to the oracle.

    Scale shape: explode -> map-side-combinable count on
    (source, token) -> window total on source (reuses the same
    partitioning as the final groupBy: one Exchange end-to-end after
    the count shuffle). The token-count relation is |vocab| x
    |sources| — tiny relative to input — so everything after the first
    shuffle is effectively free."""
    tok = (
        load(spark, sf_dir, "documents")
        .select("source", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"))
    )
    counts = tok.groupBy("source", "token").agg(F.count("*").alias("n"))
    tot = F.sum("n").over(Window.partitionBy("source"))
    p = F.col("n") / tot.cast("double")
    return (
        counts.select("source", F.round(-p * F.log2(p), 8).alias("term"))
        .groupBy("source")
        .agg(
            F.sum(F.col("term").cast("decimal(30,10)")).cast("double").alias("entropy_bits"),
            F.count("*").cast("long").alias("n_distinct_tokens"),
        )
    )


RERANK_W_CE = 5.0   # blend weight of the (stub) cross-encoder score
RERANK_TOP = 10

_CE_U32 = (
    "("
    + " + ".join(
        f"(CAST(instr('0123456789abcdef', substr(md5('ce|' || CAST(doc_id AS VARCHAR)), {i + 1}, 1)) AS BIGINT) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    + ")"
)


@query(
    "q_rerank",
    oracle=f"""
        WITH bm AS ({BM25_SQL}),
        ce AS (
            SELECT doc_id, bm25,
                   ROUND({_CE_U32} / 4294967296.0, 6) AS ce_score
            FROM bm
        )
        SELECT doc_id, bm25, ce_score,
               CAST(ROUND(CAST(bm25 AS DECIMAL(14,4))
                          + CAST({RERANK_W_CE} AS DECIMAL(3,1))
                            * CAST(ce_score AS DECIMAL(12,6)), 4) AS DOUBLE)
                   AS final_score
        FROM ce
        ORDER BY final_score DESC, doc_id
        LIMIT {RERANK_TOP}
    """,
)
def q_rerank(spark, sf_dir):
    """Two-stage retrieval (the RAG serving shape): BM25 recalls the
    top-20 candidates corpus-wide, then a cross-encoder re-scores ONLY
    those 20 and the blended score picks the final top-{RERANK_TOP}.
    The cross-encoder is the same honest md5-uniform stub as
    q_model_score — on a real deployment stage 2 is a per-candidate
    model call, and the whole point of the architecture is that its
    cost is O(candidates), decoupled from corpus size.

    Scale shape: stage 1 is the full q_bm25 pipeline (one tokenize
    pass, broadcast stats); stage 2 is a narrow projection over 20
    rows — free. Ordering on the ROUNDED blended score with doc_id
    tiebreak keeps the final ranking cross-engine exact; the blend is
    rounded IN DECIMAL (bm25 is 4-dp- and ce 6-dp-quantized, so the
    double sum sits exactly on a 5th-decimal tie ~1% of the time and
    double ROUND diverges across engines there — found live by the
    r18 oracle fuzzer, seed 1, final_score 6.20865)."""
    bm = q_bm25(spark, sf_dir)
    ce = F.round(
        F.expr(_CE_U32.replace("AS VARCHAR", "AS STRING")) / F.lit(4294967296.0), 6
    )
    blend = (
        F.col("bm25").cast("decimal(14,4)")
        + F.lit(RERANK_W_CE).cast("decimal(3,1)")
        * F.col("ce_score").cast("decimal(12,6)")
    )
    scored = bm.select("doc_id", "bm25", ce.alias("ce_score")).select(
        "doc_id",
        "bm25",
        "ce_score",
        F.round(blend, 4).cast("double").alias("final_score"),
    )
    return scored.orderBy(F.desc("final_score"), "doc_id").limit(RERANK_TOP)


PMI_MIN_COUNT = 20  # ignore bigrams rarer than this (PMI is unstable
#                     at low counts — standard collocation practice)
PMI_TOP = 25


@query(
    "q_text_pmi",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
            FROM documents
        ),
        bigrams AS (
            SELECT unnest(list_transform(range(1, len(t)),
                          i -> t[i] || ' ' || t[i+1])) AS bg
            FROM toks WHERE len(t) >= 2
        ),
        unigrams AS (
            SELECT unnest(t) AS u FROM toks
        ),
        bg_counts AS (
            SELECT bg, CAST(COUNT(*) AS BIGINT) AS n_bg
            FROM bigrams GROUP BY bg HAVING COUNT(*) >= {PMI_MIN_COUNT}
        ),
        u_counts AS (
            SELECT u, CAST(COUNT(*) AS BIGINT) AS n_u FROM unigrams GROUP BY u
        ),
        totals AS (
            SELECT CAST((SELECT COUNT(*) FROM bigrams) AS DOUBLE) AS nb,
                   CAST((SELECT COUNT(*) FROM unigrams) AS DOUBLE) AS nu
        ),
        scored AS (
            SELECT bg, n_bg,
                   ROUND(ln((n_bg / nb)
                         / ((ua.n_u / nu) * (ub.n_u / nu))), 4) AS pmi
            FROM bg_counts
            JOIN u_counts ua ON ua.u = split_part(bg, ' ', 1)
            JOIN u_counts ub ON ub.u = split_part(bg, ' ', 2)
            CROSS JOIN totals
        )
        SELECT bg, n_bg, pmi
        FROM scored ORDER BY pmi DESC, bg LIMIT {PMI_TOP}
    """,
)
def q_text_pmi(spark, sf_dir):
    """Pointwise mutual information over adjacent-token bigrams — the
    collocation statistic (word2vec-era PMI matrices, multi-word-
    expression mining, tokenizer-merge candidates). PMI =
    ln(p(ab) / (p(a)p(b))), computed only for bigrams with >=
    {PMI_MIN_COUNT} occurrences (low-count PMI is noise), ranked on
    the ROUNDED score with a bigram tiebreak for cross-engine-exact
    ordering.

    Scale shape: one tokenize pass feeds both the bigram and unigram
    counts; unigram counts are vocabulary-sized and BROADCAST into the
    bigram relation (two broadcast joins, no corpus re-shuffle); the
    corpus totals are a 1-row broadcast. The only big shuffle is the
    bigram count itself — vocabulary-bounded, map-side combined."""
    toks = load(spark, sf_dir, "documents").select(
        F.split(F.trim(F.col("text")), r"\s+").alias("t")
    )
    bigrams = toks.filter(F.size("t") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("t", i), F.element_at("t", i + 1)
                ),
            )
        ).alias("bg")
    )
    unigrams = toks.select(F.explode("t").alias("u"))
    bg_counts = (
        bigrams.groupBy("bg").agg(F.count("*").cast("long").alias("n_bg"))
        .filter(F.col("n_bg") >= PMI_MIN_COUNT)
    )
    u_counts = unigrams.groupBy("u").agg(F.count("*").cast("long").alias("n_u"))
    totals = bigrams.agg(F.count("*").cast("double").alias("nb")).crossJoin(
        unigrams.agg(F.count("*").cast("double").alias("nu"))
    )
    ua = u_counts.alias("ua")
    ub = u_counts.alias("ub")
    pmi = F.round(
        F.log(
            (F.col("n_bg") / F.col("nb"))
            / ((F.col("ua.n_u") / F.col("nu")) * (F.col("ub.n_u") / F.col("nu")))
        ),
        4,
    )
    return (
        bg_counts.join(
            F.broadcast(ua), F.col("ua.u") == F.split_part(F.col("bg"), F.lit(" "), F.lit(1))
        )
        .join(
            F.broadcast(ub), F.col("ub.u") == F.split_part(F.col("bg"), F.lit(" "), F.lit(2))
        )
        .crossJoin(F.broadcast(totals))
        .select("bg", "n_bg", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "bg")
        .limit(PMI_TOP)
    )


LM_TOP = 50  # report the 50 most-surprising (highest cross-entropy) docs


@query(
    "q_text_lm_score",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
            FROM documents
        ),
        doc_bg AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(t)),
                          i -> t[i] || ' ' || t[i+1])) AS bg
            FROM toks WHERE len(t) >= 2
        ),
        bg_c AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS c_ab
                 FROM doc_bg GROUP BY bg),
        u_c AS (
            SELECT u, CAST(COUNT(*) AS BIGINT) AS c_a FROM (
                SELECT unnest(t) AS u FROM toks
            ) GROUP BY u
        ),
        vocab AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM u_c),
        terms AS (
            SELECT d.doc_id,
                   ROUND(-ln((bg_c.c_ab + 1.0)
                             / (u_c.c_a + vocab.v)), 6) AS nll
            FROM doc_bg d
            JOIN bg_c ON bg_c.bg = d.bg
            JOIN u_c ON u_c.u = split_part(d.bg, ' ', 1)
            CROSS JOIN vocab
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               ROUND(CAST(SUM(CAST(nll AS DECIMAL(25,10))) AS DOUBLE)
                     / COUNT(*), 4) AS cross_entropy
        FROM terms GROUP BY doc_id
        ORDER BY ROUND(CAST(SUM(CAST(nll AS DECIMAL(25,10))) AS DOUBLE)
                       / COUNT(*), 4) DESC, doc_id
        LIMIT {LM_TOP}
    """,
)
def q_text_lm_score(spark, sf_dir):
    """N-gram language-model scoring — REAL perplexity-style quality
    filtering (the KenLM rung of curation pipelines), not a stub: a
    bigram LM with add-one smoothing is fit on the corpus itself, and
    each document's cross-entropy under it ranks how "surprising" the
    doc is (boilerplate scores low, garbled text scores high). Top-50
    most-surprising docs reported — the review/drop queue.

    Scale shape: ONE tokenize pass feeds doc-bigrams, bigram counts,
    and unigram counts; both count relations are vocabulary-sized and
    BROADCAST back into the per-doc term stream, the vocab size is a
    1-row broadcast, and the only corpus-wide shuffles are the two
    vocabulary-bounded counts + the final per-doc aggregate. Per-term
    -ln p is rounded 6dp (cross-engine libm ulp) then decimal-summed:
    the scoring is hash-exact, where a real KenLM would be rows-only."""
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    )
    doc_bg = toks.filter(F.size("t") >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("t", i), F.element_at("t", i + 1)
                ),
            )
        ).alias("bg"),
    )
    bg_c = doc_bg.groupBy("bg").agg(F.count("*").cast("long").alias("c_ab"))
    u_c = (
        toks.select(F.explode("t").alias("u"))
        .groupBy("u")
        .agg(F.count("*").cast("long").alias("c_a"))
    )
    vocab = u_c.agg(F.count("*").cast("double").alias("v"))
    nll = F.round(
        -F.log((F.col("c_ab") + 1.0) / (F.col("c_a") + F.col("v"))), 6
    )
    terms = (
        doc_bg.join(F.broadcast(bg_c), "bg")
        .join(
            F.broadcast(u_c),
            F.col("u") == F.split_part(F.col("bg"), F.lit(" "), F.lit(1)),
        )
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", nll.alias("nll"))
    )
    ce = F.round(
        F.sum(F.col("nll").cast("decimal(25,10)")).cast("double") / F.count("*"), 4
    )
    return (
        terms.groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_bigrams"), ce.alias("cross_entropy"))
        .orderBy(F.desc("cross_entropy"), "doc_id")
        .limit(LM_TOP)
    )


READABILITY_SQL = """
    WITH m AS (
        SELECT doc_id, lang,
               GREATEST(CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT), 1)
                   AS n_words,
               GREATEST(CAST(length(regexp_replace(text, '[.!?]+', 'S', 'g'))
                        - length(regexp_replace(text, '[.!?]+', '', 'g')) AS BIGINT), 1)
                   AS n_sents,
               GREATEST(CAST(length(regexp_replace(lower(text), '[aeiouy]+', 'V', 'g'))
                        - length(regexp_replace(lower(text), '[aeiouy]+', '', 'g')) AS BIGINT), 1)
                   AS n_syll
        FROM documents
    )
    SELECT doc_id, lang, n_words, n_sents, n_syll,
           {flesch_expr} AS flesch
    FROM m
""".replace("{flesch_expr}", rdiv_sql(
    "206835 * n_sents * n_words - 1015 * n_words * n_words"
    " - 84600 * n_syll * n_sents",
    "1000 * n_sents * n_words", 4
))


@query("q_text_readability", oracle=READABILITY_SQL)
def q_text_readability(spark, sf_dir):
    """Flesch reading-ease scoring — the readability rung of the text
    quality ladder (curation pipelines bucket corpora by audience
    level; hard-to-read boilerplate scores negative, natural prose
    ~50-70). Syllables are approximated by VOWEL GROUPS (each maximal
    [aeiouy]+ run counts once — the standard cheap proxy), sentences
    by [.!?]+ runs; both are computed with the replace-and-diff trick
    (length with each run collapsed to one char minus length with runs
    removed = run count), which is pure JVM string arithmetic — no
    Python, no explode, zero shuffle: a narrow map the optimizer can
    pipeline into any downstream filter. Floors at 1 keep the ratios
    total. Same formula verbatim in the DuckDB oracle."""
    text = F.col("text")
    low = F.lower(text)

    def runs(col, pat):
        return F.greatest(
            (
                F.length(F.regexp_replace(col, pat, "S"))
                - F.length(F.regexp_replace(col, pat, ""))
            ).cast("long"),
            F.lit(1).cast("long"),
        )

    n_words = F.greatest(
        F.size(F.split(F.trim(text), r"\s+")).cast("long"), F.lit(1).cast("long")
    )
    n_sents = runs(text, r"[.!?]+")
    n_syll = runs(low, r"[aeiouy]+")
    # Flesch rounded via the exact integer formula (rdiv): the three
    # coefficients are 3-dp rationals and w/s, syll/w are int ratios,
    # so the score TERMINATES for 2-adic denominators right at the 4dp
    # tie where double-ROUND diverges cross-engine (r18 fuzzer class).
    # Multiplied out over the common denominator 1000·s·w.
    flesch = rdiv(
        F.lit(206835) * n_sents * n_words
        - F.lit(1015) * n_words * n_words
        - F.lit(84600) * n_syll * n_sents,
        F.lit(1000) * n_sents * n_words,
        4,
    )
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        n_words.alias("n_words"),
        n_sents.alias("n_sents"),
        n_syll.alias("n_syll"),
        flesch.alias("flesch"),
    )


HASH_DIM = 64  # feature-hashed vector width

HASHING_TRICK_SQL = f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
        FROM documents
    ),
    feats AS (
        SELECT doc_id,
               ((strpos('0123456789abcdef', substring(md5('ht|' || tok), 1, 1)) - 1) * 16
                + strpos('0123456789abcdef', substring(md5('ht|' || tok), 2, 1)) - 1)
               % {HASH_DIM} AS feat
        FROM toks
    ),
    tf AS (
        SELECT doc_id, CAST(feat AS INT) AS feat, CAST(COUNT(*) AS BIGINT) AS tf
        FROM feats GROUP BY 1, 2
    ),
    lens AS (SELECT doc_id, SUM(tf) AS n FROM tf GROUP BY 1)
    SELECT t.doc_id, t.feat, t.tf, ROUND(CAST(t.tf AS DOUBLE) / n, 6) AS w
    FROM tf t JOIN lens USING (doc_id)
"""


@query("q_text_hashing_trick", oracle=HASHING_TRICK_SQL)
def q_text_hashing_trick(spark, sf_dir):
    """Feature-hashing vectorizer (the 'hashing trick'): every token
    routes to one of {HASH_DIM} feature slots via a hash — the
    fixed-width, vocabulary-free featurization that lets a 100 TB
    corpus be vectorized in ONE streaming pass with ZERO global state
    (no vocabulary build, no broadcast dictionary, no OOV problem —
    the reason Vowpal-Wabbit-style hashing is the default for
    web-scale text). Emits the sparse (doc, slot, tf, l1-weight)
    relation; collisions are the accepted trade (E[collisions] ~
    tokens²/2·dim per doc, negligible at realistic dims like 2²⁰ —
    {HASH_DIM} here keeps the fixture relation small).

    Scale shape: narrow per-row tokenize+hash in whole-stage codegen,
    one map-combined groupBy(doc, slot) — state ≤ {HASH_DIM} slots per
    doc — and a per-doc length agg joined back on the same key. First
    2 md5 hex chars -> slot keeps DuckDB bit-identical."""
    toks = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok"),
    )
    feat = (
        F.conv(F.substring(F.md5(F.concat(F.lit("ht|"), F.col("tok"))), 1, 2), 16, 10)
        .cast("int")
        % HASH_DIM
    )
    tf = (
        toks.select("doc_id", feat.cast("int").alias("feat"))
        .groupBy("doc_id", "feat")
        .agg(F.count("*").alias("tf"))
    )
    lens = tf.groupBy("doc_id").agg(F.sum("tf").alias("n"))
    return tf.join(lens, "doc_id").select(
        "doc_id",
        "feat",
        "tf",
        F.round(F.col("tf").cast("double") / F.col("n"), 6).alias("w"),
    )


# --- r19 rung: hybrid retrieval with reciprocal rank fusion ---------------
#
# REGISTERED in r19 (the staged decorator flip, per the four-rung
# schedule: r18 = q_sim_pq + q_cdc_evolve_spec, r19 = this, r20 =
# q_bm25_incremental). Cross-engine equality was law-tested while
# staged (tests/test_r17_ops.py::test_hybrid_rrf_staged_rung_matches_oracle)
# and is now driver-hash-checked like every registered row.
#
# The op: HYBRID SEARCH — the production RAG retrieval shape every
# serving stack ships (Elasticsearch/OpenSearch RRF, Vespa, Weaviate):
# a LEXICAL arm (the registered q_bm25 pipeline, fixed 3-term query)
# and a DENSE arm (cosine top-k against a fixed query embedding) each
# produce a ranked list, fused by Reciprocal Rank Fusion
# (Cormack, Clarke & Buettcher 2009): score(d) = Σ_lists 1/(K + rank_d)
# with K=60 — rank arithmetic only, so the fusion is score-scale-free
# (the reason RRF won over score interpolation in practice: BM25 and
# cosine live on incomparable scales).
#
# Determinism (hash-check contract): both arms rank on ROUNDED scores
# with id tiebreaks (the registered q_bm25 / q_sim_topk disciplines);
# RRF terms are 1/(60 + rank) — IEEE divisions of exact integers,
# identical in both engines, summed in a fixed (lex + dense) order.
# At 100 TB: the lexical arm is q_bm25's shape (one tokenize pass,
# broadcast stats), the dense arm is one broadcast of the query vector
# (the scale path swaps in the IVF/PQ index — q_sim_ivf_pq — for the
# brute-force scan without touching the fusion); the fusion itself
# joins two ≤LIST-row relations.

RRF_K = 60          # Cormack et al.'s constant; rank damping
HYBRID_DENSE_LIST = 20  # DENSE-arm list length only: the lexical
#   arm is the registered q_bm25, whose top-20 is pinned by its own
#   oracle (review finding r17: the old name promised a per-arm knob
#   this constant never controlled)
HYBRID_TOP = 10     # fused results returned
HYBRID_QVEC = 0     # vec_id of the fixed dense query embedding

HYBRID_RRF_SQL = f"""
        WITH bm AS ({BM25_SQL}),
        lex AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_lex
            FROM bm
        ),
        e AS (
            SELECT vec_id, embedding,
                   {{sqnorm}} AS sq
            FROM embeddings
        ),
        qv AS (SELECT embedding AS q, sq AS q_sq FROM e
               WHERE vec_id = {HYBRID_QVEC}),
        dsc AS (
            SELECT e.vec_id,
                   ROUND({{dot}} / sqrt(e.sq * qv.q_sq), 6) AS cos
            FROM e, qv
            WHERE e.vec_id <> {HYBRID_QVEC} AND e.sq > 0
        ),
        dense AS (
            SELECT vec_id AS doc_id,
                   row_number() OVER (ORDER BY cos DESC, vec_id) AS r_dense
            FROM dsc
            ORDER BY cos DESC, vec_id LIMIT {HYBRID_DENSE_LIST}
        ),
        fused AS (
            SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
                   l.r_lex, d.r_dense,
                   COALESCE(1.0 / ({RRF_K} + l.r_lex), 0)
                   + COALESCE(1.0 / ({RRF_K} + d.r_dense), 0) AS rrf
            FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id
        )
        SELECT doc_id, ROUND(rrf, 9) AS rrf,
               r_lex, r_dense
        FROM fused ORDER BY rrf DESC, doc_id LIMIT {HYBRID_TOP}
    """

# Formatted IMMEDIATELY (review finding r17): @query captures the
# oracle BY VALUE at decoration time, so the r19 decorator flip on
# hybrid_rrf_query below must see the final SQL, not the {sqnorm}/{dot}
# template. The deferred import is cycle-safe (similarity imports
# nothing from text) and sits here rather than the header to keep the
# registered queries above fingerprint-stable.
from .similarity import DOT_SQL, SQNORM_SQL  # noqa: E402

HYBRID_RRF_SQL = HYBRID_RRF_SQL.format(
    sqnorm=SQNORM_SQL.format(a="embedding"),
    dot=DOT_SQL.format(a="e.embedding", b="qv.q"),
)


@query("q_search_hybrid", oracle=HYBRID_RRF_SQL)
def hybrid_rrf_query(spark, sf_dir):
    """Hybrid BM25 + dense-cosine retrieval fused by RRF — see the
    module comment above. Returns the fused top-{HYBRID_TOP} as
    (doc_id, rrf, r_lex, r_dense); a doc missing from one arm simply
    contributes nothing for it (NULL rank, zero term). Registered in
    r19 per the staged four-rung schedule (SURVEY.md §2.12)."""
    from .similarity import _dot, _sqnorm

    # q_bm25's own inline persist is not trackable without editing its
    # frozen registered body, but draining here still bounds THIS
    # family's leftovers from earlier invocations (r17 advice).
    _drain_tracked_persists()
    bm = q_bm25(spark, sf_dir)
    w_lex = Window.orderBy(F.col("bm25").desc(), "doc_id")
    lex = bm.select(
        "doc_id", F.row_number().over(w_lex).cast("long").alias("r_lex")
    )

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", _sqnorm(F.col("embedding")).alias("sq")
    )
    qv = e.filter(F.col("vec_id") == HYBRID_QVEC).select(
        F.col("embedding").alias("q"), F.col("sq").alias("q_sq")
    )
    dsc = (
        e.filter((F.col("vec_id") != HYBRID_QVEC) & (F.col("sq") > 0))
        .join(F.broadcast(qv))
        .select(
            "vec_id",
            F.round(
                _dot(F.col("embedding"), F.col("q"))
                / F.sqrt(F.col("sq") * F.col("q_sq")),
                6,
            ).alias("cos"),
        )
    )
    # Distributed top-k FIRST (TakeOrderedAndProject — per-partition
    # heaps, no global sort), then rank WITHIN the bounded HYBRID_DENSE_LIST-row
    # result; a corpus-wide row_number window here would be the
    # single-partition global-sort bottleneck the plan sweep bans.
    top = dsc.orderBy(F.col("cos").desc(), "vec_id").limit(HYBRID_DENSE_LIST)
    w_dense = Window.orderBy(F.col("cos").desc(), "vec_id")
    dense = top.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number().over(w_dense).cast("long").alias("r_dense"),
    )

    fused = lex.join(dense, "doc_id", "full_outer").select(
        "doc_id", "r_lex", "r_dense",
        (
            F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("r_lex")),
                       F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("r_dense")),
                         F.lit(0.0))
        ).alias("rrf"),
    )
    return (
        fused.orderBy(F.col("rrf").desc(), "doc_id")
        .limit(HYBRID_TOP)
        .select("doc_id", F.round("rrf", 9).alias("rrf"),
                "r_lex", "r_dense")
    )




# --- r20 rung: incremental BM25 index maintenance under CDC ---------------
#
# Registered r20 (the round's single free window slot, staged since
# r17 with the oracle law-tested the whole time:
# tests/test_r17_ops.py::test_bm25_incremental_staged_rung).
#
# The op: SEARCH-INDEX IVM — the retrieval twin of the CDC mirror.
# A production lexical index (Lucene segments, warehouse BM25 marts)
# is never rebuilt per document batch; it maintains sufficient
# statistics under churn. The BM25 state here is exactly the
# sufficient-statistics relations:
#   dl (doc_id → token count, every live doc)   — N and avgdl derive;
#   tf (doc_id, term → count, query terms only) — df derives.
# A per-key-resolved CDC batch (deletes / replacements / inserts)
# maintains both with one anti-join (drop every batched key) + one
# tokenize pass over THE BATCH ONLY, so maintenance is O(batch
# tokens) with untouched documents never re-read — the same
# touched-only contract as the bucketed CDC apply, and the oracle is
# the full REBUILD over the final corpus (apply == rebuild, the IVM
# law, hash-checked end to end through the ranking).
#
# Determinism: identical to q_bm25's argument — per-doc sums have at
# most |terms| addends over identical doubles; stats are exact integer
# aggregates; ranking on the ROUNDED score with doc_id tiebreak.

# The deterministic churn batch (SQL-expressible so the rebuild oracle
# can replay it): doc_id % 7 == 0 deleted; % 5 == 0 (and not % 7)
# replaced with two extra query-term occurrences appended (shifts both
# its tf and every doc's avgdl); two brand-new docs inserted.
INC_BM25_INS = (
    (10_000_001, "vector merge stream"),
    (10_000_002, "merge stream storage vector"),
)

_INC_FINAL_SQL = f"""final AS (
            SELECT doc_id, text FROM documents
            WHERE doc_id % 7 <> 0 AND doc_id % 5 <> 0
            UNION ALL
            SELECT doc_id, text || ' vector merge vector' AS text
            FROM documents WHERE doc_id % 5 = 0 AND doc_id % 7 <> 0
            UNION ALL
            SELECT CAST(doc_id AS BIGINT) AS doc_id, text
            FROM (VALUES {", ".join(f"({i}, '{t}')" for i, t in INC_BM25_INS)})
                 AS ins(doc_id, text)
        )"""

# The rebuild oracle = the registered BM25_SQL chain verbatim, scanning
# the post-churn corpus instead of the base table (string-rewritten so
# BM25_SQL itself stays byte-identical — its registered fingerprint
# must not move).
# Surgery guard: the rewrite below redirects BM25_SQL's single corpus
# scan; if a future edit to BM25_SQL ever adds another "FROM documents",
# the 1-count replace would silently rewrite only the first and the
# rebuild oracle would mix corpora — fail loudly at import instead.
assert BM25_SQL.count("FROM documents") == 1, "INC_BM25_SQL surgery stale"
INC_BM25_SQL = (
    "\n        WITH " + _INC_FINAL_SQL + ","
    + BM25_SQL.replace("WITH toks AS", "toks AS", 1)
               .replace("FROM documents", "FROM final", 1).lstrip("\n")
)


def _bm25_rank(dl, tf):
    """BM25 top-20 from the sufficient-statistics relations — the
    serving arm shared by build and maintain paths. (A formula twin of
    the registered q_bm25 tail; not factored out of it because editing
    q_bm25's body would move its fingerprint and spend a window slot
    on a refactor.)"""
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    df = tf.groupBy("token").agg(F.count("*").cast("double").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    term_score = (
        idf
        * F.col("tf") * (BM25_K1 + 1)
        / (
            F.col("tf")
            + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        tf.join(F.broadcast(df), "token")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(term_score).alias("s"))
    )
    return (
        scored.select("doc_id", F.round("s", 4).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


# Tracked intra-query persists (r17 advice): _bm25_state's tok must
# outlive its query function — the returned relations are LAZY and the
# consumer (driver / bench / test) executes them after the function
# returns — so it cannot be unpersisted before returning. Instead each
# staged retrieval query DRAINS the previous invocation's leftovers on
# entry, bounding a long-lived session's cached partitions to one
# invocation's worth (the bench loop's clearCache already releases them
# between queries; this covers pytest sessions and future registered
# use). Draining is always safe: persist keeps lineage, so a plan that
# still references a drained relation recomputes instead of failing.
_TRACKED_PERSISTS: list = []


def _drain_tracked_persists() -> None:
    while _TRACKED_PERSISTS:
        df = _TRACKED_PERSISTS.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # already released / session gone — nothing to free


def _bm25_state(docs):
    """(dl, tf) sufficient statistics from a (doc_id, text) relation —
    one tokenize pass feeds both. tok is PERSISTED like the registered
    q_bm25's (review finding r17: lazy, the corpus explode re-ran once
    per downstream consumer — dl, tf, and _bm25_rank's double
    consumption of each); tracked so the NEXT staged-query invocation
    (or the bench loop's clearCache) releases it."""
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
    ).persist()
    _TRACKED_PERSISTS.append(tok)
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    tf = (
        tok.filter(F.col("token").isin(*BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    return dl, tf


@query("q_bm25_incremental", oracle=INC_BM25_SQL)
def bm25_incremental_query(spark, sf_dir):
    """Incremental BM25 under CDC churn — see the module comment.
    Builds the index state from the base corpus, applies the
    deterministic batch by MAINTENANCE (anti-join survivors + tokenize
    the batch only — never re-reads an untouched document), and serves
    the post-churn top-20. The oracle rebuilds from the final corpus,
    so the driver hash check IS the apply == rebuild law through the
    full ranking."""
    _drain_tracked_persists()  # release the PREVIOUS invocation's state
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    dl0, tf0 = _bm25_state(docs)

    dels = docs.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id", F.lit(None).cast("string").alias("text"),
        F.lit("d").alias("op"),
    )
    upds = docs.filter(
        (F.col("doc_id") % 5 == 0) & (F.col("doc_id") % 7 != 0)
    ).select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" vector merge vector")).alias("text"),
        F.lit("u").alias("op"),
    )
    ins = spark.createDataFrame(
        [(i, t, "u") for i, t in INC_BM25_INS],
        "doc_id long, text string, op string",
    )
    batch = dels.unionByName(upds).unionByName(ins)

    # Maintenance: O(batch). Every batched key leaves the state; the
    # upserted docs' stats come from tokenizing THE BATCH alone.
    keys = batch.select("doc_id")
    dl_b, tf_b = _bm25_state(batch.filter(F.col("op") == "u"))
    dl = dl0.join(keys, "doc_id", "left_anti").unionByName(dl_b)
    tf = tf0.join(keys, "doc_id", "left_anti").unionByName(tf_b)
    return _bm25_rank(dl, tf)
