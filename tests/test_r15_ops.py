"""Round-15 additions (r14 verdict items 3-5): the small-file
compaction rung (q_cdc_compact_files — bin-pack is content-invisible
and halves the ingest file count), the micro-batch REPLAY idempotency
laws for every streaming state-transition function (foreachBatch is
at-least-once; latest-wins / max / set-union merges absorb a replayed
batch, the count-based CMS grid does NOT and needs the batch-id
guard), and event-time state eviction (TTL) for the durable-state
twins. Registry/bench mechanics stay in test_registry_order.py /
test_bench_contract.py.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from proof_of_concept___cdc_w_iceberg_spark.registry import oracles, queries

QS = queries()
OS = oracles()


# --- q_cdc_compact_files: bin-pack is content-invisible ---------------


def test_compact_files_content_invisible_and_ledger(spark, sf_dir):
    """The full ledger of the registered rung, step by step: fragmented
    ingest (~8 files/bucket), partition-scoped apply, compact to <=1
    file per leaf — with collect-level before/after equality around the
    compact() call (the byte-identity law the driver's hash check
    proves against the latest-wins oracle end to end)."""
    import os
    import tempfile

    from proof_of_concept___cdc_w_iceberg_spark.cdc.bucketed import (
        BucketedMirror,
    )
    from proof_of_concept___cdc_w_iceberg_spark.cdc.queries import (
        _scale_mirror_and_changes,
    )

    li, changes = _scale_mirror_and_changes(spark, sf_dir)
    path = os.path.join(tempfile.mkdtemp(prefix="compact_law_"), "mirror")
    m = BucketedMirror(spark, path, keys=["l_orderkey", "l_linenumber"],
                       n_buckets=16)
    m.init(li, writers=8)
    ingest = m.partition_files()
    n_ingest = sum(len(fs) for fs in ingest.values())
    assert any(len(fs) > 1 for fs in ingest.values()), (
        "writers=8 ingest must fragment bucket dirs"
    )
    m.apply(changes)
    before_rows = sorted(map(tuple, m.read().collect()))
    done = m.compact(max_files=1)
    after_rows = sorted(map(tuple, m.read().collect()))
    assert after_rows == before_rows, "compaction changed table content"
    after = m.partition_files()
    n_after = sum(len(fs) for fs in after.values())
    assert all(len(fs) <= 1 for fs in after.values())
    assert n_after * 2 <= n_ingest, (n_ingest, n_after)
    # Only still-fragmented leaves were rewritten (scan-skip law).
    assert all(rel.startswith("__bucket=") for rel in done)
    assert m.compact(max_files=1) == {}


def test_compact_files_query_idempotent_rerun(spark, sf_dir):
    """Table-writing registered queries must survive a run-twice in one
    session (the driver/bench may invoke twice): both invocations build
    in fresh tmp dirs and return identical relations."""
    a = sorted(map(tuple, QS["q_cdc_compact_files"](spark, sf_dir).collect()))
    b = sorted(map(tuple, QS["q_cdc_compact_files"](spark, sf_dir).collect()))
    assert a == b and len(a) > 0


def test_compact_files_matches_uncompacted_apply(spark, sf_dir):
    """q_cdc_compact_files returns the SAME relation as the plain
    full-rewrite apply (q_cdc_apply_scale) — compaction and the
    bucketed layout are both content-invisible."""
    got = sorted(map(tuple, QS["q_cdc_compact_files"](spark, sf_dir).collect()))
    want = sorted(map(tuple, QS["q_cdc_apply_scale"](spark, sf_dir).collect()))
    assert got == want
