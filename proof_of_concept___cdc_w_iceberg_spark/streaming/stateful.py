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

# Leaf copy of ext.similarity.KNN_K (review finding): the state fns in
# this module pickle BY REFERENCE, so every executor unpickling them
# imports this module — importing ext.similarity here would drag the
# whole query-registration chain (registry, sources.tables) into every
# worker python process just to read one int. The pairing is enforced
# at DRIVER wiring time instead: knn_cell_stream asserts equality
# against the real constant before starting the stream.
KNN_K_DEFAULT = 3

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


# --- transformWithStateInPandas twin (Spark 4 successor API) ---------
#
# Same latest-image semantics through the NEW arbitrary-stateful
# surface: a StatefulProcessor with typed ValueState instead of the
# untyped tuple blob, explicit handle lifecycle (init/close), and —
# on a real deployment — per-state TTL and timers. The state store
# layout (hash-partitioned by key, RocksDB-backed at scale) is
# unchanged, so everything in this module's scale note applies as-is.

try:  # Spark >= 4.0
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    _HAVE_TWS_API = True
except ImportError:  # pragma: no cover - pre-4.0 Spark
    _HAVE_TWS_API = False

# The TWS state-server protocol speaks protobuf between the JVM and the
# Python driver worker; without google.protobuf the pre-init worker
# crashes (observed in this container). Probe it explicitly so the gate
# names the missing dependency instead of failing mid-query.
try:
    import google.protobuf.descriptor  # noqa: F401

    _HAVE_PROTOBUF = True
except ImportError:  # pragma: no cover
    _HAVE_PROTOBUF = False

TWS_AVAILABLE = _HAVE_TWS_API and _HAVE_PROTOBUF
TWS_GATE_REASON = (
    "ok" if TWS_AVAILABLE
    else ("google.protobuf not importable (state-server protocol dep)"
          if _HAVE_TWS_API else "Spark < 4.0: no transformWithStateInPandas")
)

if _HAVE_TWS_API:

    class LatestImageProcessor(StatefulProcessor):
        """Per-key latest (ts_ms, off) image with typed ValueState."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("latest", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            cur = self._state.get() if self._state.exists() else None
            for pdf in rows:
                for r in pdf.sort_values(["ts_ms", "off"]).itertuples(index=False):
                    newer = cur is None or (r.ts_ms, r.off) > (cur[0], cur[1])
                    if newer:
                        cur = (
                            int(r.ts_ms),
                            int(r.off),
                            None if r.op == "d" else r.name,
                            None if r.op == "d" else float(r.bal),
                            r.op == "d",
                        )
            if cur is not None:
                self._state.update(cur)
                yield pd.DataFrame(
                    {
                        "k": [key[0]],
                        "name": [cur[2]],
                        "bal": [cur[3]],
                        "deleted": [cur[4]],
                        "ts_ms": [cur[0]],
                    }
                )

        def close(self) -> None:
            pass

    def latest_state_stream_tws(changes: DataFrame) -> DataFrame:
        """latest_state_stream through transformWithStateInPandas."""
        return changes.groupBy("k").transformWithStateInPandas(
            LatestImageProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )



# --- per-(event_type, user_id) running-sum state -------------------------
#
# The incremental-aggregate stateful operator: tiny FIXED state per key
# (one 64-bit micro-unit accumulator), update-mode emission per batch.
# Top-k per event_type is computed DOWNSTREAM of the state (the batch
# twin q_stream_topk does the same), so state never holds a candidate
# set — the shape that scales to any user cardinality because keys
# hash-partition across executors.
#
# Exactness contract: values accumulate as 6dp micro-units via
# Decimal(repr(v)) HALF_UP — precisely Spark's double->DECIMAL(18,6)
# cast semantics — so the streamed totals are bit-equal to the batch
# twin's exact decimal sums however the stream is batched.

CUMSUM_STATE_SCHEMA = "micros LONG"
CUMSUM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("micros", T.LongType()),
    ]
)


def cumsum_state_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
                    state: GroupState) -> Iterator[pd.DataFrame]:
    from decimal import ROUND_HALF_UP, Decimal

    total = state.get[0] if state.exists else 0
    for pdf in pdfs:
        for v in pdf["value"]:
            total += int(
                Decimal(repr(float(v))).scaleb(6).to_integral_value(ROUND_HALF_UP)
            )
    state.update((total,))
    yield pd.DataFrame(
        {"event_type": [key[0]], "user_id": [int(key[1])], "micros": [total]}
    )


def value_cumsum_stream(events: DataFrame) -> DataFrame:
    """Wire the running-sum operator over a (streaming) events frame
    with columns (event_type, user_id, value)."""
    return events.groupBy("event_type", "user_id").applyInPandasWithState(
        cumsum_state_fn,
        outputStructType=CUMSUM_OUTPUT_SCHEMA,
        stateStructType=CUMSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- TTL / eviction variant (r14 verdict item 5) -----------------------
#
# NoTimeout state grows with key cardinality FOREVER — a production
# leaderboard under key churn (users arrive, go quiet, never return)
# must bound the store. This variant evicts any key silent past an
# event-time horizon (last event + TTL, measured against the
# watermark — the same clock session_state_fn closes sessions with):
#
#   - a silent key's timeout fires once the watermark passes
#     last + TTL → state removed, ONE eviction marker emitted
#     (evicted=true, micros null) so downstream update-mode consumers
#     can drop the key from their materialized board;
#   - a key RE-ARRIVING after its horizon rebuilds from ZERO — checked
#     eagerly before folding (data arriving in the same trigger as the
#     due timeout suppresses the timeout callback, so expiry must be
#     detected state-side, not callback-side);
#   - a key re-arriving within its horizon accumulates normally and
#     re-arms the timer.
#
# State stays one (micros, last_us) pair per LIVE key — bounded by
# concurrently-active keys, not by all keys ever seen. Law test:
# tests/test_r15_ops.py::test_cumsum_ttl_evicts_and_rebuilds.

CUMSUM_TTL_US = 60 * 60 * 1_000_000  # evict after 1 h of event-time silence
CUMSUM_TTL_STATE_SCHEMA = "micros LONG, last_us LONG"
CUMSUM_TTL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("micros", T.LongType()),
        T.StructField("evicted", T.BooleanType()),
    ]
)


def cumsum_ttl_state_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
                        state: GroupState,
                        ttl_us: int = CUMSUM_TTL_US) -> Iterator[pd.DataFrame]:
    from decimal import ROUND_HALF_UP, Decimal

    def row(micros, evicted: bool) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [key[0]],
                "user_id": [int(key[1])],
                "micros": [micros],
                "evicted": [evicted],
            }
        )

    if state.hasTimedOut:
        state.remove()
        yield row(None, True)
        return
    wm_ms = state.getCurrentWatermarkMs()
    total, last_us = state.get if state.exists else (0, 0)
    if state.exists and last_us // 1_000 + ttl_us // 1_000 < wm_ms:
        # Expired BEFORE this batch, but new data in the same trigger
        # suppressed the timeout callback: rebuild from zero.
        total, last_us = 0, 0
    for pdf in pdfs:
        for v, ts in zip(pdf["value"], pdf["ts"]):
            total += int(
                Decimal(repr(float(v))).scaleb(6).to_integral_value(ROUND_HALF_UP)
            )
            last_us = max(last_us, pd.Timestamp(ts).value // 1_000)
    timeout_ms = last_us // 1_000 + ttl_us // 1_000
    if timeout_ms < wm_ms:
        # Already due (late straggler batch): emit-and-evict inline —
        # re-arming a timer behind the watermark is illegal (the same
        # clamp session_state_fn applies).
        if state.exists:
            state.remove()
        yield row(total, False)
        yield row(None, True)
        return
    state.update((total, last_us))
    state.setTimeoutTimestamp(timeout_ms)
    yield row(total, False)


def value_cumsum_stream_ttl(events: DataFrame,
                            watermark: str = "0 seconds") -> DataFrame:
    """TTL'd running-sum over a (streaming) events frame with columns
    (event_type, user_id, value, ts). Event-time timeouts require a
    watermark on ts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type", "user_id")
        .applyInPandasWithState(
            cumsum_ttl_state_fn,
            outputStructType=CUMSUM_TTL_OUTPUT_SCHEMA,
            stateStructType=CUMSUM_TTL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# --- gap sessionizer with EVENT-TIME TIMEOUT ---------------------------
#
# The third stateful shape (after latest-image and running-sum): state
# that must close ITSELF when the stream goes quiet. A session ends
# either inline (a successor event arrives past the gap) or via
# GroupStateTimeout.EventTimeTimeout when the watermark passes
# last_event + gap — the mechanism session_window uses internally,
# exposed here as arbitrary state so the operator can carry custom
# per-session accumulators (counts here; a real pipeline adds whatever
# the window API can't express). Semantics match batch q_sessionize
# bit-for-bit on closed sessions: a strict > gap starts a new session,
# equal-to-gap continues.
#
# Scale: one (start, last, n) triple per ACTIVE session per user —
# state is bounded by concurrent users, not history; closed sessions
# leave the store immediately (inline) or at watermark (timeout).

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min, mirrors q_sessionize
SESSION_STATE_SCHEMA = "start LONG, last LONG, n LONG"  # epoch micros
SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _session_row(key, start_us: int, last_us: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [int(key[0])],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us, unit="us")],
            "n_events": [int(n)],
        }
    )


def session_state_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
                     state: GroupState) -> Iterator[pd.DataFrame]:
    """Fold one user's batch events into the active session; emit every
    session CLOSED this batch (inline gap breaks, or the event-time
    timeout when the watermark passed last+gap).

    The fold is order-dependent, and a large group arrives as MULTIPLE
    Arrow chunks with no cross-chunk ordering — so drain every chunk
    and sort ONCE before folding (sorting per chunk silently merges
    sessions the moment a group exceeds arrow.maxRecordsPerBatch).

    Lateness contract: with watermark '0 seconds' closed sessions are
    bit-equal to batch q_sessionize. Under allowed lateness, a late
    event within gap of the active session's START extends it backward
    (start lowered, count bumped); later-than-gap stragglers can't
    re-open already-emitted history, so they emit immediately as
    best-effort singleton sessions."""
    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield _session_row(key, start_us, last_us, n)
        return
    cur = list(state.get) if state.exists else None
    all_ts = sorted(
        pd.Timestamp(ts).value // 1_000 for pdf in pdfs for ts in pdf["ts"]
    )
    for ts_us in all_ts:
        if cur is None:
            cur = [ts_us, ts_us, 1]
        elif ts_us - cur[1] > SESSION_GAP_US:
            yield _session_row(key, cur[0], cur[1], cur[2])
            cur = [ts_us, ts_us, 1]
        elif cur[0] - ts_us > SESSION_GAP_US:
            # Straggler older than the whole active session: history is
            # already emitted, so it can only stand alone.
            yield _session_row(key, ts_us, ts_us, 1)
        else:
            cur[0] = min(cur[0], ts_us)
            cur[1] = max(cur[1], ts_us)
            cur[2] += 1
    if cur is not None:
        # Close at watermark > last + gap (epoch MILLIS for the API).
        # Clamp guard: under allowed lateness a late event can extend a
        # session whose close is already DUE — the watermark (advanced
        # by other keys) sits at/past last+gap, and re-arming a timeout
        # not later than the watermark throws IllegalArgumentException,
        # killing the whole streaming query. The session is due, so
        # close and emit it inline instead (round-6 advice).
        # Strict <, matching Spark's actual constraint (GroupState
        # rejects only timestampMs < watermark): at equality re-arming
        # is legal, and an event with ts == watermark == last+gap is
        # NOT yet droppable by the watermark filter, so it can still
        # extend this session — closing at equality would emit one
        # microbatch early and strand that boundary event as a
        # singleton (round-7 advice).
        timeout_ms = cur[1] // 1_000 + SESSION_GAP_US // 1_000
        if timeout_ms < state.getCurrentWatermarkMs():
            if state.exists:
                state.remove()
            yield _session_row(key, cur[0], cur[1], cur[2])
        else:
            state.update(tuple(cur))
            state.setTimeoutTimestamp(timeout_ms)


def session_stream(events: DataFrame, watermark: str = "0 seconds") -> DataFrame:
    """Wire the sessionizer over a (streaming) events frame with
    columns (user_id, ts). Event-time timeouts require a watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            session_state_fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# --- durable per-cell kNN-graph state (r14, r13 verdict item 7) --------
#
# The kNN-graph IVM rung's DURABLE-state form: q_stream_knn_graph keeps
# the maintained graph in driver-side localCheckpoints (gone on
# restart); here the graph lives in the STATE STORE, keyed by cell
# (label) — checkpointed, hash-partitioned across executors, restored
# on query restart like q_stream_topk's accumulators. Because the
# blocked graph is cell-local by construction (src and dst always share
# a label), one cell's members + edges are a complete, closed state
# unit, so the per-key state is exactly "the graph rows of my cell"
# plus the member vectors the next re-rank needs.
#
# Per batch and per touched cell the transition is the SAME insert
# apply as ext/ann.knn_graph_apply, executed cell-locally: new nodes
# score against all members; old nodes re-rank carried top-k ∪ edges
# to the new members (exact — carried top-k are exact among old
# members); untouched cells never see a batch and their state is never
# deserialized. Scoring uses the identical sequential left-fold /
# IEEE chain as _dot/_sqnorm (element-cast to double, in-order
# accumulation from 0.0), so maintained cosines are BIT-EQUAL to the
# one-shot Spark build's — asserted in tests/test_r14_ops.py, along
# with state-store durability across a stop + new-files + restart.
#
# Scale: state per cell is O(|cell|·(d + k)); cells hash-partition
# across executors; a batch touching c cells deserializes exactly c
# state rows. The same law the registered q_stream_knn_graph oracle
# hash-proves, now restart-durable.

KNN_CELL_STATE_SCHEMA = (
    "ids ARRAY<BIGINT>, vecs ARRAY<ARRAY<DOUBLE>>, "
    "esrcs ARRAY<BIGINT>, edsts ARRAY<BIGINT>, ecoss ARRAY<DOUBLE>"
)
KNN_CELL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("label", T.LongType()),
        T.StructField("src", T.LongType()),
        T.StructField("dst", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
        T.StructField("rn", T.LongType()),
    ]
)


def _fold_dot(a, b) -> float:
    """Sequential left-fold dot product — bit-identical to _dot's
    aggregate chain (per-element double cast, in-order adds from 0.0)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def knn_cell_state_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
                      state: GroupState,
                      k: int = KNN_K_DEFAULT) -> Iterator[pd.DataFrame]:
    """Fold one cell's insert batch into its stored graph; emit the
    cell's full post-batch graph (update mode: downstream keeps the
    latest emission per cell).

    ``k`` is a closure-bound default (r14 advice): pickled with the
    function's ``__defaults__`` from the module-leaf KNN_K_DEFAULT, and
    asserted equal to ext.similarity.KNN_K at driver wiring time
    (knn_cell_stream) — no silent desync, no worker-side package
    import."""
    import math
    if state.exists:
        ids, vecs, esrcs, edsts, ecoss = state.get
        ids = [int(i) for i in ids]
        vecs = [list(v) for v in vecs]
        edges: dict[int, list] = {i: [] for i in ids}
        for s, d, c in zip(esrcs, edsts, ecoss):
            edges[int(s)].append((float(c), int(d)))
    else:
        ids, vecs, edges = [], [], {}

    batch = []
    for pdf in pdfs:
        for r in pdf.sort_values("vec_id").itertuples(index=False):
            batch.append((int(r.vec_id), [float(x) for x in r.embedding]))
    old_n = len(ids)
    for vid, vec in batch:
        ids.append(vid)
        vecs.append(vec)
    sq = [_fold_dot(v, v) for v in vecs]

    def topk(cands):
        cands.sort(key=lambda t: (-t[0], t[1]))
        return cands[:k]

    def cos(i: int, j: int) -> float | None:
        # Zero-norm guard (review finding): one all-zero vector must
        # not poison-pill the streaming query with ZeroDivisionError —
        # the batch would replay from the checkpoint and crash forever.
        # Degenerate pairs simply form no edge here (the relational
        # builds emit NaN-cosine edges for them — both are nonsense
        # results; the bit-equality contract is asserted on non-
        # degenerate corpora, and the fixtures contain no zero vectors).
        den = math.sqrt(sq[i] * sq[j])
        return _fold_dot(vecs[i], vecs[j]) / den if den > 0.0 else None

    # old nodes: carried top-k ∪ fresh edges to the new members
    for i in range(old_n):
        fresh = [
            (c, ids[j])
            for j in range(old_n, len(ids))
            if (c := cos(i, j)) is not None
        ]
        if fresh:
            edges[ids[i]] = topk(edges[ids[i]] + fresh)
    # new nodes: score against every member but self
    for i in range(old_n, len(ids)):
        cands = [
            (c, ids[j])
            for j in range(len(ids))
            if j != i and (c := cos(i, j)) is not None
        ]
        edges[ids[i]] = topk(cands)

    flat = [
        (s, d, c)
        for s in ids
        for c, d in edges[s]
    ]
    state.update(
        (
            ids,
            vecs,
            [s for s, _d, _c in flat],
            [d for _s, d, _c in flat],
            [c for _s, _d, c in flat],
        )
    )
    out = {
        "label": [], "src": [], "dst": [], "cosine": [], "rn": [],
    }
    for s in ids:
        for rn, (c, d) in enumerate(edges[s], start=1):
            out["label"].append(int(key[0]))
            out["src"].append(s)
            out["dst"].append(d)
            out["cosine"].append(c)
            out["rn"].append(rn)
    yield pd.DataFrame(out)


def knn_cell_stream(vectors: DataFrame) -> DataFrame:
    """Wire the durable kNN-graph maintainer over a (streaming) vector
    frame with columns (vec_id, label, embedding)."""
    from ..ext.similarity import KNN_K  # driver-side only

    assert KNN_K == KNN_K_DEFAULT, (
        "knn_cell_state_fn's leaf default desynchronized from "
        f"ext.similarity.KNN_K ({KNN_K_DEFAULT} != {KNN_K})"
    )
    return vectors.groupBy("label").applyInPandasWithState(
        knn_cell_state_fn,
        outputStructType=KNN_CELL_OUTPUT_SCHEMA,
        stateStructType=KNN_CELL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
