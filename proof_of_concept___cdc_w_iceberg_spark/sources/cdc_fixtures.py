"""Debezium-shaped changelog fixture (FIXTURES.md §A.3).

The reference transports change events as Debezium envelopes over
Kafka topics (SURVEY.md §1.2). For hash-checkable correctness we
derive a deterministic changelog *from the driver's ``customer``
table* with pure relational ops, so the DuckDB oracle can rebuild the
identical stream in ANSI SQL (``CHANGELOG_SQL``).

Event mix mirrors FIXTURES.md §A.3: snapshot (op='r'), updates
(incl. multi-update keys for latest-wins compaction), deletes,
inserts of new keys, and delete-then-reinsert keys. Ordering key is
(ts_ms, off) — the Spark analogue of Debezium's (commit ts, LSN)
total order that the reference gets from its single sink task
(`connect-iceberg-sink.json:5`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load

# DuckDB replica of ``changelog`` below. Keep branch-for-branch in sync.
CHANGELOG_SQL = """
    SELECT CAST(c_custkey AS BIGINT) AS k, c_name AS name, c_acctbal AS bal,
           'r' AS op, CAST(1000 AS BIGINT) AS ts_ms, CAST(c_custkey AS BIGINT) AS off
    FROM customer
    UNION ALL
    SELECT c_custkey, c_name, c_acctbal + 100.0, 'u', 2000, 1000000 + c_custkey
    FROM customer WHERE c_custkey % 10 = 0
    UNION ALL
    SELECT c_custkey, c_name, c_acctbal + 200.0, 'u', 3000, 2000000 + c_custkey
    FROM customer WHERE c_custkey % 20 = 0
    UNION ALL
    SELECT c_custkey, NULL, NULL, 'd', 4000, 3000000 + c_custkey
    FROM customer WHERE c_custkey % 7 = 0
    UNION ALL
    SELECT c_custkey + 10000000, 'new_' || c_name, c_acctbal, 'c', 2500, 4000000 + c_custkey
    FROM customer WHERE c_custkey % 13 = 0
    UNION ALL
    SELECT c_custkey, 're_' || c_name, c_acctbal + 1.0, 'c', 5000, 5000000 + c_custkey
    FROM customer WHERE c_custkey % 21 = 0
"""

def mirror_cte(src_sql: str) -> str:
    """Latest-change-wins post-image over an arbitrary changes source.

    Renders the canonical mirror query — per-key max (ts_ms, off),
    drop rows whose latest op is 'd' — with ``src_sql`` as the changes
    relation. Oracles that need the mirror over a *pre-bound* CTE
    (e.g. ``'SELECT * FROM changes'`` inside a larger WITH chain) call
    this instead of string-surgery on ``MIRROR_SQL`` (round-4 verdict
    item 3: ``.replace(CHANGELOG_SQL, ...)`` silently no-ops if either
    constant's rendering drifts)."""
    return f"""
    WITH changes AS ({src_sql}),
    ranked AS (
        SELECT k, name, bal, op,
               row_number() OVER (PARTITION BY k ORDER BY ts_ms DESC, off DESC) AS rn
        FROM changes
    )
    SELECT k, name, bal FROM ranked WHERE rn = 1 AND op <> 'd'
"""


# Latest-change-wins post-image of the changelog (the expected CDC
# mirror): per-key max (ts_ms, off), drop rows whose latest op is 'd'.
MIRROR_SQL = mirror_cte(CHANGELOG_SQL)


def changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the changelog DataFrame (columns k, name, bal, op, ts_ms, off)."""
    c = load(spark, sf_dir, "customer")

    def branch(df: DataFrame, op: str, ts_ms: int, off_base: int,
               name_col=None, bal_col=None, key_shift: int = 0) -> DataFrame:
        name_col = F.col("c_name") if name_col is None else name_col
        bal_col = F.col("c_acctbal") if bal_col is None else bal_col
        return df.select(
            (F.col("c_custkey") + F.lit(key_shift)).cast("long").alias("k"),
            name_col.cast("string").alias("name"),
            bal_col.cast("double").alias("bal"),
            F.lit(op).alias("op"),
            F.lit(ts_ms).cast("long").alias("ts_ms"),
            (F.col("c_custkey") + F.lit(off_base)).cast("long").alias("off"),
        )

    snap = branch(c, "r", 1000, 0)
    upd1 = branch(c.filter(F.col("c_custkey") % 10 == 0), "u", 2000, 1_000_000,
                  bal_col=F.col("c_acctbal") + F.lit(100.0))
    upd2 = branch(c.filter(F.col("c_custkey") % 20 == 0), "u", 3000, 2_000_000,
                  bal_col=F.col("c_acctbal") + F.lit(200.0))
    dele = branch(c.filter(F.col("c_custkey") % 7 == 0), "d", 4000, 3_000_000,
                  name_col=F.lit(None), bal_col=F.lit(None))
    ins = branch(c.filter(F.col("c_custkey") % 13 == 0), "c", 2500, 4_000_000,
                 name_col=F.concat(F.lit("new_"), F.col("c_name")), key_shift=10_000_000)
    reins = branch(c.filter(F.col("c_custkey") % 21 == 0), "c", 5000, 5_000_000,
                   name_col=F.concat(F.lit("re_"), F.col("c_name")),
                   bal_col=F.col("c_acctbal") + F.lit(1.0))
    out = snap
    for b in (upd1, upd2, dele, ins, reins):
        out = out.unionByName(b)
    return out
