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


TOPK_K = 3


def topk_affected_groups(base_topk, thresholds, latest, group_of):
    """Groups whose top-{TOPK_K} can change under ``latest`` (compacted
    per-key batch): a current top-k member was touched (update/delete),
    or an upserted value reaches the group's k-th threshold, or the
    group holds fewer than {TOPK_K} members (any insert can enter).
    Everything else provably keeps its exact top-k — the pruning that
    makes the maintenance O(|batch| + recompute(affected)) instead of
    a full re-rank."""
    in_topk = base_topk.select("k", F.lit(True).alias("__in_topk"))
    probed = (
        latest.withColumn("grp", group_of)
        .join(in_topk, "k", "left")
        .join(F.broadcast(thresholds), "grp", "left")
    )
    return (
        probed.filter(
            F.col("__in_topk").isNotNull()
            | (
                (F.col("op") != "d")
                & (
                    F.col("thr").isNull()          # group unseen or < K members
                    | (F.col("n_topk") < TOPK_K)
                    | (F.col("bal") >= F.col("thr"))
                )
            )
        )
        .select("grp")
        .distinct()
    )


@query(
    "q_cdc_incremental_topk",
    oracle=f"""
        WITH changes AS ({CHANGELOG_SQL}),
        ranked AS (
            SELECT k, name, bal, op,
                   row_number() OVER (PARTITION BY k
                                      ORDER BY ts_ms DESC, off DESC) AS rn
            FROM changes
        ),
        mirror AS (SELECT k, bal FROM ranked WHERE rn = 1 AND op <> 'd'),
        topk AS (
            SELECT k % 10 AS grp, k, bal,
                   row_number() OVER (PARTITION BY k % 10
                                      ORDER BY bal DESC, k) AS rnk
            FROM mirror
        )
        SELECT grp, CAST(rnk AS BIGINT) AS rnk, k, bal
        FROM topk WHERE rnk <= {TOPK_K}
    """,
)
def q_cdc_incremental_topk(spark, sf_dir):
    """Incrementally-maintained TOP-{TOPK_K} view (highest balances per
    key-bucket) — the IVM case SUM/COUNT algebra can't cover: top-k is
    NOT a retraction-friendly monoid (deleting a ranked member needs
    the runner-up, which the view no longer holds). The standard
    maintenance is therefore prune-then-recompute: keep the base
    top-k for every group the batch provably cannot affect
    (``topk_affected_groups`` — touched member, threshold-crossing
    upsert, or under-filled group) and re-rank ONLY affected groups
    against the mirror. Per-batch cost is O(|batch| +
    Σ|affected groups|); with the bucketed mirror layout the recompute
    probe prunes to those groups' partitions. The ORACLE re-ranks the
    fully-applied mirror from scratch — passing proves prune +
    recompute ≡ recompute-everything."""
    ch = changelog(spark, sf_dir)
    grp_of = (F.col("k") % 10).alias("grp")
    base = ch.filter(F.col("op") == "r").select("k", "bal")
    from pyspark.sql import Window as W

    wg = W.partitionBy("grp").orderBy(F.col("bal").desc(), F.col("k"))
    base_topk = (
        base.select(grp_of, "k", "bal")
        .withColumn("rnk", F.row_number().over(wg))
        .filter(F.col("rnk") <= TOPK_K)
    )
    thresholds = base_topk.groupBy("grp").agg(
        F.min("bal").alias("thr"), F.count("*").alias("n_topk")
    )
    batch = ch.filter(F.col("op") != "r")
    latest = compact_latest(batch, ["k"], ["ts_ms", "off"])
    affected = topk_affected_groups(
        base_topk, thresholds, latest, (F.col("k") % 10)
    )
    # Affected groups re-rank against the applied mirror (probe is
    # group-pruned under the bucketed layout); the rest keep base.
    mirror = (
        compact_latest(ch, ["k"]).filter(F.col("op") != "d").select("k", "bal")
    )
    recomputed = (
        mirror.select(grp_of, "k", "bal")
        .join(F.broadcast(affected), "grp")
        .withColumn("rnk", F.row_number().over(wg))
        .filter(F.col("rnk") <= TOPK_K)
    )
    retained = base_topk.join(F.broadcast(affected), "grp", "left_anti")
    return retained.unionByName(recomputed).select(
        "grp", F.col("rnk").cast("long").alias("rnk"), "k", "bal"
    )
