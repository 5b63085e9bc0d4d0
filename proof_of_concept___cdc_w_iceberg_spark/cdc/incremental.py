"""Incremental materialized-aggregate maintenance from CDC changes.

A mirror table (`connect-iceberg-sink.json:30-33` upsert semantics)
often feeds downstream aggregates; recomputing them per batch scans
the whole mirror. This module maintains SUM/COUNT group-by aggregates
*incrementally*: each change contributes a retraction of the key's old
image and an addition of its new image, so the per-batch cost is
O(|batch| + |touched groups|) — the classic incremental view
maintenance (IVM) delta algebra, expressed as two small joins and an
aggregate merge. At 100 TB the batch and the aggregate state are both
tiny next to the mirror; the mirror itself is only probed for the old
images of the touched keys (an equi-join on the key, prunable by
bucket when the mirror is bucket-partitioned — cdc/bucketed.py).

Sums ride DECIMAL end-to-end (base, retractions, additions), so the
merged result is bit-identical to a from-scratch recompute — which is
exactly what the DuckDB oracle does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..registry import query
from ..sources.cdc_fixtures import CHANGELOG_SQL, MIRROR_SQL, changelog
from ..sources.tables import load
from .apply import compact_latest

DEC = "decimal(18,2)"


def maintain_sum_count(
    base: DataFrame,
    batch: DataFrame,
    keys: list[str],
    group_of: Column,
    val_col: str,
    op_col: str = "op",
    order_cols: list[str] = ("ts_ms", "off"),
) -> DataFrame:
    """Merge a CDC batch into the (group, dsum, n) aggregate of
    ``base`` without rescanning ``base``'s full extent — only the
    touched keys' old images are fetched.

    Returns (grp, dsum DECIMAL, n BIGINT) with empty groups dropped.
    """
    grp = group_of.alias("grp")
    base_agg = base.groupBy(grp).agg(
        F.sum(F.col(val_col).cast(DEC)).alias("dsum"),
        F.count("*").alias("n"),
    )
    latest = compact_latest(batch, keys, list(order_cols))
    # old images of touched keys only (key-equi-join probe, NOT a scan
    # of base's aggregate extent)
    old = base.select(
        *keys, F.col(val_col).alias("__old_val"), F.lit(True).alias("__existed")
    )
    probed = latest.join(old, keys, "left")
    retract = probed.filter(F.col("__existed")).select(
        grp,
        (-F.col("__old_val").cast(DEC)).alias("dval"),
        F.lit(-1).cast("long").alias("dn"),
    )
    add = probed.filter(F.col(op_col) != "d").select(
        grp,
        F.col(val_col).cast(DEC).alias("dval"),
        F.lit(1).cast("long").alias("dn"),
    )
    delta = (
        retract.unionByName(add)
        .groupBy("grp")
        .agg(F.sum("dval").alias("ddsum"), F.sum("dn").alias("dn"))
    )
    merged = base_agg.join(delta, "grp", "full_outer").select(
        "grp",
        (
            F.coalesce(F.col("dsum"), F.lit(0).cast(DEC))
            + F.coalesce(F.col("ddsum"), F.lit(0).cast(DEC))
        ).alias("dsum"),
        (F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0)))
        .alias("n"),
    )
    return merged.filter(F.col("n") > 0)


@query(
    "q_cdc_incremental_agg",
    oracle=f"""
        WITH changes AS ({CHANGELOG_SQL}),
        ranked AS (
            SELECT k, name, bal, op,
                   row_number() OVER (PARTITION BY k
                                      ORDER BY ts_ms DESC, off DESC) AS rn
            FROM changes
        ),
        mirror AS (SELECT k, bal FROM ranked WHERE rn = 1 AND op <> 'd')
        SELECT k % 10 AS grp,
               CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM mirror GROUP BY k % 10
    """,
)
def q_cdc_incremental_agg(spark, sf_dir):
    """Incrementally-maintained SUM/COUNT by key-bucket: base = the
    op='r' snapshot's aggregate; the c/u/d tail of the changelog is
    applied as retraction/addition deltas. The ORACLE recomputes the
    aggregate from the fully-applied mirror — passing proves the
    incremental path is exactly equivalent to recompute-from-scratch,
    at O(|batch|) cost instead of O(|mirror|)."""
    ch = changelog(spark, sf_dir)
    base = ch.filter(F.col("op") == "r").select("k", "bal")
    batch = ch.filter(F.col("op") != "r")
    out = maintain_sum_count(
        base, batch, ["k"], F.col("k") % 10, "bal"
    )
    return out.select(
        "grp",
        F.col("dsum").cast("double").alias("sum_bal"),
        F.col("n").alias("n_rows"),
    )


@query(
    "q_cdc_incremental_join",
    oracle=f"""
        WITH m AS ({MIRROR_SQL})
        SELECT o_orderkey, k, name, bal, o_totalprice
        FROM m JOIN orders ON o_custkey = m.k
    """,
)
def q_cdc_incremental_join(spark, sf_dir):
    """Incrementally-maintained JOIN view (orders enriched with the
    customer mirror): base = op='r' snapshot ⋈ orders, then the c/u/d
    changelog tail is applied as the join delta —
    V' = (V anti-join touched-keys) ∪ (orders ⋈ upserted-rows) —
    with the batch side BROADCAST into both legs, so no shuffle of the
    view or the fact table ever happens per batch (and with bucketed
    storage both probes prune to touched buckets). Deletes drop the
    customer's orders from the view; re-inserts re-enrich them. The
    ORACLE recomputes the join from the fully-applied mirror: passing
    proves delta maintenance ≡ recompute-from-scratch.

    Reference grounding: the mirror feeding downstream views is the
    Iceberg upsert table (`connect-iceberg-sink.json:30-33`)."""
    ch = changelog(spark, sf_dir)
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    base = ch.filter(F.col("op") == "r").select("k", "name", "bal")
    base_view = orders.join(base, orders.o_custkey == base.k).select(
        "o_orderkey", "k", "name", "bal", "o_totalprice"
    )
    batch = ch.filter(F.col("op") != "r")
    latest = compact_latest(batch, ["k"], ["ts_ms", "off"])
    touched = latest.select("k")
    upserts = latest.filter(F.col("op") != "d").select("k", "name", "bal")
    retained = base_view.join(F.broadcast(touched), "k", "left_anti")
    added = orders.join(
        F.broadcast(upserts), orders.o_custkey == F.col("k")
    ).select("o_orderkey", "k", "name", "bal", "o_totalprice")
    return retained.unionByName(added)
