"""§2.12 — sketch-driven scale operators (r04).

The reference's query layer (Trino via `init_for_test.py:66-79`)
leans on runtime filters and approximate sketches at scale; these
operators implement the two workhorses natively so the plan is
inspectable:

- ``q_join_bloom``: semi-join reduction through a Bloom bitset — the
  runtime-filter pattern that prunes a 100 TB fact scan *before* the
  shuffle join, with a filter whose size is CONSTANT (m bits) no
  matter how many dimension keys qualify.
- ``q_sketch_cms``: count-min heavy hitters — frequency estimation
  whose state is a fixed depth×width grid, map-side combinable, so
  the shuffle carries O(d·w) cells per task regardless of stream
  size.

Hashes are md5-derived via the engine-portable hex→u32 decode
(``instr`` on the hex alphabet), so DuckDB rebuilds the identical
bit positions / cells and results hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load
from ._util import dec_sum


def _hex_u32_sql(h: str) -> str:
    """First 8 hex chars of md5 string ``h`` as a 0..2^32-1 integer —
    same portable decode as ext/corpus.py."""
    nibbles = [
        f"(CAST(instr('0123456789abcdef', substr({h}, {i + 1}, 1)) AS BIGINT) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    ]
    return "(" + " + ".join(nibbles) + ")"


def _hex_slice_sql(h: str, start: int, nibbles: int) -> str:
    """Decode ``nibbles`` hex chars of ``h`` starting at 1-indexed
    ``start`` into an integer. Keeping the slice narrow matters:
    every nibble term re-references (and so re-evaluates) the hash
    expression, so a 13-bit Bloom position reads 4 nibbles and an
    8-bit CMS cell reads 2 — not a full u32 decode."""
    terms = [
        f"(CAST(instr('0123456789abcdef', substr({h}, {start + i}, 1)) AS BIGINT) - 1)"
        f" * {16 ** (nibbles - 1 - i)}"
        for i in range(nibbles)
    ]
    return "(" + " + ".join(terms) + ")"


BLOOM_M = 8192  # bits in the filter
BLOOM_K = 3     # hash functions

# Position for hash i of key k: 16-bit slice i of ONE md5 per key
# (bytes of a cryptographic hash are independent), mod m.
def _bloom_pos_sql(i: int, key: str, vc: str = "VARCHAR") -> str:
    h = "md5('bf|' || CAST(" + key + " AS " + vc + "))"
    return f"({_hex_slice_sql(h, 4 * i + 1, 4)} % {BLOOM_M})"


@query(
    "q_join_bloom",
    oracle=f"""
        WITH dim AS (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        ),
        bloom AS (
            SELECT DISTINCT pos FROM (
                {' UNION ALL '.join(
                    f"SELECT {_bloom_pos_sql(i, 'c_custkey')} AS pos FROM dim"
                    for i in range(BLOOM_K)
                )}
            )
        ),
        survived AS (
            SELECT o.* FROM orders o
            WHERE {' AND '.join(
                f"{_bloom_pos_sql(i, 'o.o_custkey')} IN (SELECT pos FROM bloom)"
                for i in range(BLOOM_K)
            )}
        )
        SELECT o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM survived o JOIN dim d ON o.o_custkey = d.c_custkey
        GROUP BY o.o_orderpriority
    """,
)
def q_join_bloom(spark, sf_dir):
    """Bloom-filter semi-join reduction (runtime-filter shape).

    Build an m=8192-bit Bloom set over the qualifying dimension keys
    (k=3 md5-derived hash positions), reduce the fact with three
    broadcast semi-joins against the occupied-position relation, THEN
    run the exact join to eliminate false positives. The occupied-
    position relation has AT MOST m distinct rows however many keys
    qualify — unlike broadcasting the key set itself, the reduction
    side stays constant-size at 100 TB. Catalyst does this internally
    (``spark.sql.optimizer.runtimeFilter.bloomFilter.enabled``); this
    is the explicit, plan-visible rendering with an exact oracle.

    Reference parity: Trino's dynamic filtering on the same join shape
    (`init_for_test.py:66-79` query surface).
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    dim = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")

    def pos(i: int, key: str):
        return F.expr(_bloom_pos_sql(i, key, "STRING")).alias("pos")

    bloom = None
    for i in range(BLOOM_K):
        part = dim.select(pos(i, "c_custkey"))
        bloom = part if bloom is None else bloom.unionByName(part)
    bloom = bloom.distinct()  # ≤ m rows: constant-size broadcast

    survived = o
    for i in range(BLOOM_K):
        survived = survived.withColumn("_p", F.expr(_bloom_pos_sql(i, "o_custkey", "STRING"))).join(
            F.broadcast(bloom), F.col("_p") == F.col("pos"), "left_semi"
        ).drop("_p")

    return (
        survived.join(F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"), dec_sum("o_totalprice").alias("sum_price"))
    )


CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_TOPN = 10


# Cell for sketch row r: byte r (two hex chars) of ONE md5 per key —
# width 256 needs exactly 8 bits, so the decode reads 2 nibbles, not 8.
def _cms_cell_sql(row: int, key: str, vc: str = "VARCHAR") -> str:
    h = "md5('cms|' || CAST(" + key + " AS " + vc + "))"
    return _hex_slice_sql(h, 2 * row + 1, 2)


@query(
    "q_sketch_cms",
    oracle=f"""
        WITH stream AS (SELECT l_suppkey AS k FROM lineitem),
        cells AS (
            {' UNION ALL '.join(
                f"SELECT {r} AS r, {_cms_cell_sql(r, 'k')} AS c, COUNT(*) AS cnt "
                f"FROM stream GROUP BY 2"
                for r in range(CMS_DEPTH)
            )}
        ),
        keys AS (SELECT k, COUNT(*) AS exact_cnt FROM stream GROUP BY k),
        est AS (
            SELECT keys.k, keys.exact_cnt,
                   MIN(cells.cnt) AS est_cnt
            FROM keys JOIN cells
              ON cells.c = CASE cells.r
                    {' '.join(f"WHEN {r} THEN {_cms_cell_sql(r, 'keys.k')}" for r in range(CMS_DEPTH))}
                 END
            GROUP BY keys.k, keys.exact_cnt
        ),
        ranked AS (
            SELECT k, CAST(est_cnt AS BIGINT) AS est_cnt,
                   CAST(exact_cnt AS BIGINT) AS exact_cnt,
                   row_number() OVER (ORDER BY est_cnt DESC, k) AS rn
            FROM est
        )
        SELECT k, est_cnt, exact_cnt FROM ranked WHERE rn <= {CMS_TOPN}
    """,
)
def q_sketch_cms(spark, sf_dir):
    """Count-min-sketch heavy hitters over the lineitem supplier stream.

    The sketch is a fixed depth×width (4×256) count grid built in ONE
    stream scan: each row posexplodes its d (row, cell) coordinates and
    a single map-combinable groupBy(r, c) accumulates them, so the
    shuffle carries at most d·w=1024 partial cells per task — CONSTANT
    state however large the stream (the point of CMS at 100 TB; exact
    per-key counting shuffles |keys| instead). Estimates (min over the
    key's d cells, the classic one-sided overestimate) are joined back
    for the top-10 report next to the exact count so the error is
    visible in-band.

    The probe posexplodes each candidate key's d cells and makes ONE
    broadcast equi-join on (r, c) against the tiny sketch relation
    (≤1024 rows), then min-aggregates per key — one sketch evaluation,
    one join, instead of a join per depth row. md5-derived cells keep
    DuckDB bit-identical.
    """
    from ..sources.tables import parallel

    li = parallel(
        load(spark, sf_dir, "lineitem").select(F.col("l_suppkey").alias("k"))
    )

    cell_exprs = [F.expr(_cms_cell_sql(r, "k", "STRING")) for r in range(CMS_DEPTH)]
    sketch = (
        li.select(F.posexplode(F.array(*cell_exprs)).alias("r", "c"))
        .groupBy("r", "c")
        .agg(F.count("*").alias("cnt"))
    )

    keys = li.groupBy("k").agg(F.count("*").alias("exact_cnt"))
    probe = keys.select(
        "k", "exact_cnt", F.posexplode(F.array(*cell_exprs)).alias("r", "c")
    )
    est = (
        probe.join(F.broadcast(sketch), ["r", "c"], "inner")
        .groupBy("k", "exact_cnt")
        .agg(F.min("cnt").alias("min_cnt"))
        .select(
            "k",
            F.col("min_cnt").cast("long").alias("est_cnt"),
            F.col("exact_cnt").cast("long").alias("exact_cnt"),
        )
    )
    # Fully-ordered top-N with a key tiebreaker -> TakeOrderedAndProject
    # (per-partition heads merged on the driver, no single-task sort).
    return est.orderBy(F.col("est_cnt").desc(), F.col("k")).limit(CMS_TOPN)


HLL_B = 8                 # 2^8 = 256 registers
HLL_M = 1 << HLL_B
HLL_VBITS = 24            # rank bits per hash


def _hll_rho_sql(v: str) -> str:
    """1-indexed position of the first 1-bit (from the MSB) of the
    {HLL_VBITS}-bit value ``v`` — a pure comparison ladder, no log2
    (libm rounding at exact powers of two differs across engines)."""
    cases = " ".join(
        f"WHEN {v} >= {1 << (HLL_VBITS - i)} THEN {i}"
        for i in range(1, HLL_VBITS + 1)
    )
    return f"(CASE {cases} ELSE {HLL_VBITS + 1} END)"


def _hll_fields_sql(key: str, vc: str) -> tuple[str, str]:
    """(bucket, rho) expressions for one key: byte 0 of md5 routes to
    a register, the next 24 bits give the rank."""
    h = "md5('hll|' || CAST(" + key + " AS " + vc + "))"
    bucket = _hex_slice_sql(h, 1, 2)
    rho = _hll_rho_sql(_hex_slice_sql(h, 3, 6))
    return bucket, rho


_HLL_ALPHA = f"(0.7213 / (1.0 + 1.079 / {HLL_M}.0))"


def _hll_oracle(stream_sql: str, key: str) -> str:
    bucket, rho = _hll_fields_sql(key, "VARCHAR")
    return f"""
        WITH stream AS ({stream_sql}),
        regs AS (
            SELECT {bucket} AS j, MAX({rho}) AS m
            FROM stream GROUP BY 1
        ),
        spine AS (SELECT CAST(t.range AS BIGINT) AS j FROM range({HLL_M}) t),
        full_regs AS (
            SELECT s.j, COALESCE(r.m, 0) AS m
            FROM spine s LEFT JOIN regs r ON r.j = s.j
        ),
        z AS (
            SELECT CAST(SUM(CAST(POWER(2.0, -m) AS DECIMAL(38,30)))
                        AS DOUBLE) AS isum
            FROM full_regs
        ),
        exact AS (SELECT COUNT(DISTINCT k) AS n_exact FROM stream)
        SELECT CAST(exact.n_exact AS BIGINT) AS n_exact,
               ROUND({_HLL_ALPHA} * {HLL_M}.0 * {HLL_M}.0 / z.isum, 4) AS est,
               ROUND(ABS({_HLL_ALPHA} * {HLL_M}.0 * {HLL_M}.0 / z.isum
                         - exact.n_exact) / exact.n_exact, 4) AS rel_err
        FROM exact, z
    """


@query(
    "q_sketch_hll",
    oracle=_hll_oracle("SELECT o_orderkey AS k FROM orders", "k"),
)
def q_sketch_hll(spark, sf_dir):
    """Portable HyperLogLog distinct-count — built from first
    principles so the sketch itself is cross-engine exact (unlike
    approx_count_distinct, whose Datasketches binary no oracle can
    replay): md5 byte 0 routes each key to one of 256 registers, the
    next 24 bits yield the first-one rank via a comparison ladder (no
    log2 — libm rounding at exact powers differs across engines), and
    the register relation is a MAX-aggregate — 256 longs of state,
    map-combinable, and MERGEABLE (max is a monoid: per-partition
    sketches union by register-wise max; asserted in tests).

    The estimate is the raw HLL harmonic mean with the 2^-M sum done
    in DECIMAL(38,30) (exact — every 2^-M, M ≤ 25, terminates within
    30 decimal places), so est and rel_err hash-match the oracle to
    the rounded digit. Output carries the exact count beside the
    estimate, making the ~1.04/√m error budget visible in-band."""
    # o_orderkey: >=1500 distinct at every SF, keeping the sketch in
    # the raw-estimate regime (n >= 2.5m; below that, production HLLs
    # switch to linear counting -- out of scope for the portability demo)
    o = load(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
    bucket, rho = _hll_fields_sql("k", "STRING")
    regs = (
        o.select(F.expr(bucket).alias("j"), F.expr(rho).alias("r"))
        .groupBy("j")
        .agg(F.max("r").alias("m"))
    )
    spine = spark.range(HLL_M).select(F.col("id").alias("j"))
    full_regs = spine.join(F.broadcast(regs), "j", "left").select(
        "j", F.coalesce("m", F.lit(0)).alias("m")
    )
    z = full_regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m")).cast("decimal(38,30)"))
        .cast("double")
        .alias("isum")
    )
    exact = o.agg(F.countDistinct("k").alias("n_exact"))
    est = F.expr(_HLL_ALPHA) * HLL_M * HLL_M / F.col("isum")
    return exact.crossJoin(F.broadcast(z)).select(
        F.col("n_exact").cast("long").alias("n_exact"),
        F.round(est, 4).alias("est"),
        F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 4).alias("rel_err"),
    )
