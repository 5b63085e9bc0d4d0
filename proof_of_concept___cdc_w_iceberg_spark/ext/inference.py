"""EXT — batched model-inference plumbing (perplexity-style filtering).

The model-based rung of the curation ladder: score every document with
a quality model (perplexity filter, fastText-style classifier, reward
model) and keep the passing slice. No model runtime ships in this
container, so the scorer is an honestly-labeled deterministic STUB —
but the Spark shape is the real thing and is what matters at 100 TB:

- ``mapInPandas`` with Arrow batches: the model sees columnar batches,
  not rows; amortizes per-batch overhead exactly like a GPU/ONNX
  session would.
- Model handle initialized ONCE PER PYTHON WORKER (module-level
  lazy init), not per batch and never on the driver — the pattern
  that keeps a 2 GB model from being pickled into every task.
- Score-then-filter stays lazy: the filter composes into the same
  plan, so downstream consumers never materialize rejected docs.

The stub scores from md5(text), which DuckDB replicates bit-for-bit —
so unlike a real model, the WHOLE pipeline (batching, scoring, filter
threshold) is hash-checked by the oracle.
"""

from __future__ import annotations

import hashlib

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..sources.tables import load

PPL_MIN, PPL_SPAN = 2.0, 98.0   # fake perplexity range [2, 100)
PPL_KEEP = 60.0                  # keep docs scoring below this

_MODEL = None  # per-worker lazy "model" handle


def _get_model():
    """Per-worker singleton init — stands in for loading ONNX/torch
    weights once per executor python process. The stub's 'model' is
    just the md5-based scorer."""
    global _MODEL
    if _MODEL is None:
        _MODEL = lambda text: PPL_MIN + PPL_SPAN * (  # noqa: E731
            int(hashlib.md5(text.encode()).hexdigest()[:8], 16) / 2**32
        )
    return _MODEL


SCORE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("ppl", T.DoubleType()),
    ]
)


def score_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: Arrow batch of documents in, scored batch
    out. A real deployment swaps ``model(text)`` for a vectorized
    session.run over the batch; everything else is unchanged."""
    model = _get_model()
    for pdf in it:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "lang": pdf["lang"],
                "ppl": [round(model(t), 6) for t in pdf["text"]],
            }
        )


@query(
    "q_model_score",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   ROUND({PPL_MIN} + {PPL_SPAN} * (
                       (CAST(instr('0123456789abcdef', substr(md5(text), 1, 1)) AS BIGINT) - 1) * 268435456
                     + (CAST(instr('0123456789abcdef', substr(md5(text), 2, 1)) AS BIGINT) - 1) * 16777216
                     + (CAST(instr('0123456789abcdef', substr(md5(text), 3, 1)) AS BIGINT) - 1) * 1048576
                     + (CAST(instr('0123456789abcdef', substr(md5(text), 4, 1)) AS BIGINT) - 1) * 65536
                     + (CAST(instr('0123456789abcdef', substr(md5(text), 5, 1)) AS BIGINT) - 1) * 4096
                     + (CAST(instr('0123456789abcdef', substr(md5(text), 6, 1)) AS BIGINT) - 1) * 256
                     + (CAST(instr('0123456789abcdef', substr(md5(text), 7, 1)) AS BIGINT) - 1) * 16
                     + (CAST(instr('0123456789abcdef', substr(md5(text), 8, 1)) AS BIGINT) - 1)
                   ) / 4294967296.0, 6) AS ppl
            FROM documents
        )
        SELECT doc_id, lang, ppl FROM scored WHERE ppl < {PPL_KEEP}
    """,
)
def q_model_score(spark, sf_dir):
    """Model-score-and-filter (perplexity-filter shape): batched
    'inference' over Arrow via mapInPandas, per-worker model init,
    lazy threshold filter composed into the same plan.

    Scale shape: embarrassingly parallel — zero shuffle; throughput is
    |docs| / (batch_size x workers) with constant memory per task.
    Column pruning still reaches the scan (only doc_id/lang/text are
    read). The deterministic stub lets the driver hash-check the full
    batching + scoring + filtering path, which a real model would
    reduce to a rows-only check."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    scored = docs.mapInPandas(score_batches, schema=SCORE_SCHEMA)
    return scored.filter(F.col("ppl") < PPL_KEEP)
