"""EXT — multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with typed metadata;
decode / feature-extract run as Arrow-batched ``mapInPandas`` UDFs.
The actual codec step is STUBBED deterministically (this container has
no image/audio libs — see ``fake_decode``); everything Spark-side is
real and tested: schema, binary encoding, batch iteration, partition
behavior, UDF signatures.

Scale notes: mapInPandas streams Arrow batches — constant memory per
task regardless of partition size; decode parallelism = partition
count, so repartition by doc_id before heavy decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ..registry import query
from ..sources.tables import load

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic decode STUB. A real deployment would call
    PIL/ffmpeg here (NotImplementedError territory in this container);
    the fake derives metadata arithmetically from the byte length so
    the pipeline stays verifiable end-to-end."""
    n = len(payload)
    return n, n % 640, (n * 7) % 480, n % 30 + 1


def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: Arrow batch in, metadata batch out."""
    for pdf in it:
        meta = [fake_decode(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": [m[0] for m in meta],
                "fake_width": [m[1] for m in meta],
                "fake_height": [m[2] for m in meta],
                "n_frames": [m[3] for m in meta],
            }
        )


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Text bytes stand in for an image/audio blob — a real pipeline
    reads the blob column straight from parquet."""
    return docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )


@query(
    "q_multimodal_decode",
    oracle="""
        SELECT doc_id,
               CAST(strlen(text) AS INT) AS n_bytes,
               CAST(strlen(text) % 640 AS INT) AS fake_width,
               CAST((strlen(text) * 7) % 480 AS INT) AS fake_height,
               CAST(strlen(text) % 30 + 1 AS INT) AS n_frames
        FROM documents
    """,
)
def q_multimodal_decode(spark, sf_dir):
    """Binary decode pipeline: text→binary payload → mapInPandas decode
    stub → typed metadata. Oracle recomputes the deterministic stub
    arithmetically from the byte length."""
    payloads = with_binary_payload(load(spark, sf_dir, "documents"))
    return payloads.mapInPandas(decode_batches, schema=DECODE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_bytes", T.IntegerType()),
        T.StructField("frame_crc", T.LongType()),
    ]
)

FRAME_STRIDE = 4  # sample every 4th fake frame


def sample_frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: video-style frame sampling over the opaque
    payload. The codec is STUBBED (frames = fixed 64-byte windows; a
    real pipeline calls ffmpeg here) but the Spark plumbing — strided
    expansion of one blob row into N frame rows inside an Arrow batch —
    is the real shape."""
    for pdf in it:
        out: dict[str, list] = {"doc_id": [], "frame_no": [], "frame_bytes": [], "frame_crc": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = max(1, len(payload) // 64)
            for fno in range(0, n_frames, FRAME_STRIDE):
                chunk = payload[fno * 64 : (fno + 1) * 64]
                out["doc_id"].append(int(doc_id))
                out["frame_no"].append(fno)
                out["frame_bytes"].append(len(chunk))
                out["frame_crc"].append(sum(chunk))
        yield pd.DataFrame(out)


@query(
    "q_multimodal_framesample",
    oracle="""
        WITH f AS (
            SELECT doc_id,
                   unnest(range(0, greatest(1, strlen(text) // 64), 4)) AS frame_no
            FROM documents
        )
        SELECT f.doc_id, CAST(f.frame_no AS INT) AS frame_no,
               CAST(strlen(substring(d.text, 1 + f.frame_no * 64, 64)) AS INT) AS frame_bytes,
               CAST((
                   SELECT COALESCE(SUM(ord(x)), 0) FROM unnest(string_split_regex(
                       substring(d.text, 1 + f.frame_no * 64, 64), '')) AS t(x)
                   WHERE x <> ''
               ) AS BIGINT) AS frame_crc
        FROM f JOIN documents d USING (doc_id)
    """,
)
def q_multimodal_framesample(spark, sf_dir):
    """Strided frame sampling from a binary column via mapInPandas —
    1 blob row → N frame rows, Arrow-batched, constant memory per task.
    The oracle recomputes the deterministic stub (64-byte windows,
    stride 4, bytewise checksum) from the text payload; documents are
    ASCII so char ordinals == byte values."""
    payloads = with_binary_payload(load(spark, sf_dir, "documents"))
    return payloads.mapInPandas(sample_frames, schema=FRAME_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("max_byte", T.IntegerType()),
        T.StructField("n_distinct_bytes", T.IntegerType()),
    ]
)


def extract_features(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: feature extraction over the opaque payload
    (a real pipeline computes CLIP/CNN features here; the stub's byte
    statistics keep the contract verifiable)."""
    for pdf in it:
        out = {"doc_id": [], "mean_byte": [], "max_byte": [], "n_distinct_bytes": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            out["doc_id"].append(int(doc_id))
            # mean rounded to 4dp half-away in EXACT integer math
            # (r18 fuzzer class: int-sum/len ties at the 4dp grid for
            # 2-adic lengths, where SQL double-ROUND diverges)
            out["mean_byte"].append(
                ((2 * sum(b) * 10**4 + len(b)) // (2 * len(b))) / 1e4
                if b
                else 0.0
            )
            out["max_byte"].append(max(b) if b else 0)
            out["n_distinct_bytes"].append(len(set(b)))
        yield pd.DataFrame(out)


@query(
    "q_multimodal_features",
    oracle="""
        WITH chars AS (
            SELECT doc_id, unnest(string_split_regex(text, '')) AS c
            FROM documents
        ),
        by_doc AS (
            SELECT doc_id,
                   {mean_expr} AS mean_byte,
                   CAST(MAX(ord(c)) AS INT) AS max_byte,
                   CAST(COUNT(DISTINCT c) AS INT) AS n_distinct_bytes
            FROM chars WHERE c <> '' GROUP BY doc_id
        )
        SELECT * FROM by_doc
    """.replace(
        "{mean_expr}",
        # Exact integer twin of the UDF's Python bignum floordiv (r18
        # advice): HUGEINT // on all-positive operands is the same
        # floor division, so agreement is exact at any magnitude —
        # not FLOOR over doubles resting on the 2^53 bound.
        "((2 * CAST(SUM(ord(c)) AS HUGEINT) * 10000 + COUNT(*))"
        " // (2 * COUNT(*))) / 10000.0",
    ),
)
def q_multimodal_features(spark, sf_dir):
    """Feature extraction over binary payloads via mapInPandas (byte
    statistics stand in for a real embedding model; ASCII fixture text
    makes char ordinals == byte values for the oracle). The oracle's
    mean is the exact-integer twin of extract_features' floordiv."""
    payloads = with_binary_payload(load(spark, sf_dir, "documents"))
    return payloads.mapInPandas(extract_features, schema=FEATURE_SCHEMA)


RESIZE_TO = 256
RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
    ]
)


def resize_payloads(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: normalize every payload to RESIZE_TO bytes
    (truncate or zero-pad) — the resize step of an image pipeline,
    stubbed on the raw bytes."""
    for pdf in it:
        out = {"doc_id": [], "n_bytes": [], "checksum": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)[:RESIZE_TO].ljust(RESIZE_TO, b"\0")
            out["doc_id"].append(int(doc_id))
            out["n_bytes"].append(len(b))
            out["checksum"].append(sum(b))
        yield pd.DataFrame(out)


@query(
    "q_multimodal_resize",
    oracle=f"""
        SELECT doc_id, {RESIZE_TO} AS n_bytes,
               CAST((
                   SELECT COALESCE(SUM(ord(x)), 0)
                   FROM unnest(string_split_regex(
                       substring(text, 1, {RESIZE_TO}), '')) AS t(x)
                   WHERE x <> ''
               ) AS BIGINT) AS checksum
        FROM documents
    """,
)
def q_multimodal_resize(spark, sf_dir):
    """Resize/normalize step: every payload truncated or zero-padded to
    {256} bytes inside an Arrow batch (zero-pad adds 0 to the checksum,
    so the oracle is the truncated prefix's byte sum)."""
    payloads = with_binary_payload(load(spark, sf_dir, "documents"))
    return payloads.mapInPandas(resize_payloads, schema=RESIZE_SCHEMA)


@query(
    "q_multimodal_cols",
    oracle="""
        SELECT d.doc_id, d.lang, d.n_chars, e.label,
               len(e.embedding) AS dim,
               CAST(e.embedding[1] AS DOUBLE) AS first_val
        FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    """,
)
def q_multimodal_cols(spark, sf_dir):
    """Mixed-modality table: text metadata ⋈ vector column in one
    relation (doc_id ↔ vec_id), array<float> first-class."""
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        "lang",
        "n_chars",
        "label",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
    )


# --- perceptual-hash near-duplicate detection over binary payloads ---

PHASH_BYTES = 256   # payload prefix fed to the hash (the "resize")
PHASH_BLOCKS = 64   # 4-byte blocks -> 64-bit signature
PHASH_HAM_MAX = 6   # near-dup verify threshold (bits)

PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("hi", T.LongType()),
        T.StructField("lo", T.LongType()),
    ]
)


def phash_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: average-hash (aHash) signature over the
    payload — a real pipeline decodes to an 8x8 grayscale and hashes
    pixels-vs-mean; the stub hashes 4-byte block sums of the
    zero-padded 256-byte prefix vs their mean (same structure, codec
    stubbed). Output is the 64-bit signature as two 32-bit halves, each
    widened to int64 for sign-safe band joins."""
    for pdf in it:
        out = {"doc_id": [], "hi": [], "lo": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)[:PHASH_BYTES].ljust(PHASH_BYTES, b"\0")
            sums = [
                sum(b[i * 4 : (i + 1) * 4]) for i in range(PHASH_BLOCKS)
            ]
            mean = sum(sums) / PHASH_BLOCKS
            bits = [1 if s > mean else 0 for s in sums]
            hi = sum(bit << (31 - i) for i, bit in enumerate(bits[:32]))
            lo = sum(bit << (31 - i) for i, bit in enumerate(bits[32:]))
            out["doc_id"].append(int(doc_id))
            out["hi"].append(hi)
            out["lo"].append(lo)
        yield pd.DataFrame(out)


@query(
    "q_multimodal_phash",
    oracle=f"""
        WITH sigs AS (
            SELECT doc_id,
                   list_transform(range(0, {PHASH_BLOCKS}), i ->
                       coalesce(list_sum(list_transform(
                           list_filter(string_split_regex(
                               substring(text, 1 + i * 4, 4), ''), c -> c <> ''),
                           c -> ord(c))), 0)) AS sums
            FROM documents
        ),
        packed AS (
            SELECT doc_id,
                   list_transform(sums, s -> CASE WHEN s >
                       CAST(list_sum(sums) AS DOUBLE) / {PHASH_BLOCKS}
                       THEN 1 ELSE 0 END) AS bits
            FROM sigs
        ),
        halves AS (
            SELECT doc_id,
                   list_sum(list_transform(range(0, 32),
                       i -> CAST(bits[i + 1] AS BIGINT) * (CAST(1 AS BIGINT) << (31 - i)))) AS hi,
                   list_sum(list_transform(range(0, 32),
                       i -> CAST(bits[i + 33] AS BIGINT) * (CAST(1 AS BIGINT) << (31 - i)))) AS lo
            FROM packed
        ),
        cands AS (
            SELECT a.doc_id AS id1, b.doc_id AS id2
            FROM halves a JOIN halves b ON a.hi = b.hi AND a.doc_id < b.doc_id
            UNION
            SELECT a.doc_id, b.doc_id
            FROM halves a JOIN halves b ON a.lo = b.lo AND a.doc_id < b.doc_id
        )
        SELECT id1, id2,
               CAST(bit_count(xor(s1.hi, s2.hi))
                    + bit_count(xor(s1.lo, s2.lo)) AS BIGINT) AS hamming
        FROM cands
        JOIN halves s1 ON id1 = s1.doc_id
        JOIN halves s2 ON id2 = s2.doc_id
        WHERE bit_count(xor(s1.hi, s2.hi))
              + bit_count(xor(s1.lo, s2.lo)) <= {PHASH_HAM_MAX}
    """,
)
def q_multimodal_phash(spark, sf_dir):
    """Perceptual-hash near-duplicate IMAGE detection (aHash family)
    over binary payloads: mapInPandas computes the 64-bit signature
    (codec stubbed, structure real), then the dedup is pure DataFrame —
    band blocking exactly like q_dedup_simhash (ext/dedup.py): two
    EQUI-joins (one per 32-bit half) + distinct, never an OR-join that
    would degenerate to a nested loop, then exact hamming verify via
    bit_count(xor) on candidates only. The signature relation is
    persisted — it feeds both band joins and the verify."""
    payloads = with_binary_payload(load(spark, sf_dir, "documents"))
    sigs = payloads.mapInPandas(phash_batches, schema=PHASH_SCHEMA).persist()
    a = sigs.select(
        F.col("doc_id").alias("id1"), F.col("hi").alias("hi1"), F.col("lo").alias("lo1")
    )
    b = sigs.select(
        F.col("doc_id").alias("id2"), F.col("hi").alias("hi2"), F.col("lo").alias("lo2")
    )
    by_hi = a.join(b, (F.col("hi1") == F.col("hi2")) & (F.col("id1") < F.col("id2")))
    by_lo = a.join(b, (F.col("lo1") == F.col("lo2")) & (F.col("id1") < F.col("id2")))
    cands = (
        by_hi.select("id1", "id2")
        .union(by_lo.select("id1", "id2"))
        .distinct()
        .join(sigs.select(F.col("doc_id").alias("id1"), F.col("hi").alias("hi1"), F.col("lo").alias("lo1")), "id1")
        .join(sigs.select(F.col("doc_id").alias("id2"), F.col("hi").alias("hi2"), F.col("lo").alias("lo2")), "id2")
    )
    hamming = (
        F.bit_count(F.col("hi1").bitwiseXOR(F.col("hi2")))
        + F.bit_count(F.col("lo1").bitwiseXOR(F.col("lo2")))
    ).cast("long")
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= PHASH_HAM_MAX)
        .select("id1", "id2", "hamming")
    )
