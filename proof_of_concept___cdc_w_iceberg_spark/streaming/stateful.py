"""Custom stateful streaming operator: per-key latest-state store.

``applyInPandasWithState`` is Spark's arbitrary-stateful surface
(SURVEY.md §2.9 / the north star's "custom stateful operators"). This
operator keeps the newest (ts_ms, off) image per key across
micro-batches — the streaming-native version of the CDC compaction
that ``foreachBatch`` + MERGE does table-side: state lives in the
state store (checkpointed, partitioned by key) instead of the sink,
so the mirror is queryable *from the stream itself* with no table
round-trip per batch.

Scale: state is hash-partitioned by key across executors; each
micro-batch touches only the keys present in the batch (Arrow-batched
per group). Eviction/TTL would use ``GroupStateTimeout`` — the CDC
mirror state is by design unbounded (one row per live key), exactly
like the sink table it replaces.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "ts_ms LONG, off LONG, name STRING, bal DOUBLE, deleted BOOLEAN"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("bal", T.DoubleType()),
        T.StructField("deleted", T.BooleanType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)


def latest_state_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
                    state: GroupState) -> Iterator[pd.DataFrame]:
    """Fold this batch's events for one key into the stored latest
    image; emit the post-batch image (deleted keys emit a tombstone)."""
    cur = state.get if state.exists else None  # (ts_ms, off, name, bal, deleted)
    for pdf in pdfs:
        for r in pdf.sort_values(["ts_ms", "off"]).itertuples(index=False):
            newer = cur is None or (r.ts_ms, r.off) > (cur[0], cur[1])
            if newer:
                cur = (
                    int(r.ts_ms),
                    int(r.off),
                    None if r.op == "d" else r.name,
                    None if r.op == "d" else r.bal,
                    r.op == "d",
                )
    if cur is not None:
        state.update(cur)
        yield pd.DataFrame(
            {
                "k": [key[0]],
                "name": [cur[2]],
                "bal": [cur[3]],
                "deleted": [cur[4]],
                "ts_ms": [cur[0]],
            }
        )


def latest_state_stream(changes: DataFrame) -> DataFrame:
    """Wire the stateful operator over a (streaming) changelog frame
    with columns (k, name, bal, op, ts_ms, off)."""
    return changes.groupBy("k").applyInPandasWithState(
        latest_state_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
