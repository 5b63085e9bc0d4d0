"""Randomized micro-fixture generator for cross-engine oracle fuzzing.

The driver proves Spark == DuckDB on ONE fixed dataset (seed=42,
TESTDATA.md). That leaves a blind spot: an oracle could agree with its
query on the fixture by accident — e.g. both could depend on "no ties
in o_totalprice" or "no duplicate texts", properties the fixed fixture
happens to have. This module generates schema-identical tables with a
DIFFERENT seed and deliberately hostile-but-plausible distributions
(tie clusters, exact duplicate documents, zipf-skewed keys), so
``tools/fuzz_oracle.py`` / ``tests/test_fuzz_oracle.py`` can replay
the driver compare on data the queries have never seen.

Schemas, categorical domains, value ranges, and integrity invariants
mirror /root/testdata (TESTDATA.md): TPC-H-ish star schema + events +
documents + embeddings. Literals appearing in registered predicates
('ASIA', 'BUILDING', 'Brand#…', the 1995–2001 date band, the five
event types) are preserved so fuzzed queries still select non-trivial
subsets. Row counts are randomized within sf0.001-like bands.

Determinism: everything derives from the numpy Generator seeded with
``seed`` — same seed, byte-identical parquet.

Edge tiers:
- tier="plain":  clean data, fixture-like distributions only.
- tier="hostile" (default): adds tie clusters in sort/top-k value
  columns, exact-duplicate and near-duplicate documents, zipf-skewed
  user_id/custkey hot keys — all properties a 100 TB corpus WILL have
  and the fixed fixture does NOT.
- tier="ties": the decimal-tie hunter. Every natural GROUP SIZE is
  forced to a 2-adically tie-eligible value (n with v2(n) = v2(sum)+
  round_gap, e.g. 32 events/user, 160 lineitems per (flag,status),
  8 customers/nation, 32-word documents): a mean of k-dp-quantized
  values over such a group ties at the rounding scale with
  probability ~1/2 PER GROUP, so any ROUND(double)-after-division
  site diverges cross-engine within a seed or two instead of once in
  10^3 random datasets. Random-size tiers can't separate a 1e-3/seed
  latent bug from a safe site; this tier turns the class into a
  deterministic alarm.
- tier="nulls" (r19): the NULL/degenerate-distribution hunter. A
  100 TB corpus HAS missing payloads; the fixed fixture has none, so
  no compare had ever exercised: NULL ordering in sorts/windows/top-k
  (Spark ASC = NULLS FIRST, DuckDB ASC = NULLS LAST — a silent top-k
  divergence unless the query pins it), COUNT(*) vs COUNT(col)
  asymmetries in means, NULL-key groups, NULL propagation through
  UDF kernels. Injects NULLs into every nullable PAYLOAD column
  (acctbal/totalprice/discount/tax/quantity/value/props/lang/source/
  label — never keys, never document text), plus three degenerate
  shapes: a ZERO-VARIANCE group ('5-LOW' orders all at 1000.00 and
  user 0's events all at 50.00 — var=0 makes skew/corr/z-score hit
  0/0, where Spark gives NaN and DuckDB NULL), an ALL-NEGATIVE group
  (nation-3 customer balances — sign paths through rdiv/half-away),
  and an ABSENT CLASS ('signup' events never occur — empty funnel
  legs and empty grouped subsets).
- tier="unicode" (r19): multi-byte text through the tokenizer /
  quality / fingerprint / dedup families — documents.text mixes
  accented Latin, CJK, Cyrillic, Greek, and astral-plane emoji words
  (~40%) into the fixture vocab (kept at ~60% so registered query
  terms still select non-trivial subsets). n_chars stays the
  CODEPOINT count (Python len == Spark length == DuckDB len — all
  codepoints, not UTF-16 units or bytes). Queries whose DECLARED
  contract is ASCII-only are excluded per tier in fuzz_oracle.py
  (the md5-stub multimodal codecs: payload bytes vs char ordinals
  genuinely differ on multi-byte text).
- tier="longdoc" (r20): the 1000+-word-document hunter. Fixture docs
  are 10–99 words, so chunking (CHUNK_W=32/stride 24), sequence
  packing (PACK_SEQ_LEN=256), and ExactSubstr spans had never seen a
  document spanning MANY chunks / packed sequences. ~25% of docs run
  1000–2200 words; the first docs are forced to boundary-exact sizes
  (32/33/256/257/512/2048 and stride-aligned 24k+32); three long
  docs share a planted 64-token span (the real substring-dup shape —
  spans inside otherwise-distinct docs, not whole-doc copies).
- tier="timeedge" (r20): calendar/window-boundary timestamps. Order
  dates mix leap days (1996-02-29, 2000-02-29), month ends, and
  year boundaries from the 1995–2001 band; events start EXACTLY at
  2024-01-01T00:00:00 and advance by boundary-quanta gaps (1µs, 1s,
  59s, 60s, 899s, 900s, 1799s, 1800s, 1800s+1µs, 3599s, 3600s,
  86399s, 86400s) so cumulative timestamps land exactly ON tumbling/
  sliding window edges, the 30-minute session-gap equality (strict
  `>` both engines — a 1800.000000s gap must NOT break a session),
  and ±1µs neighbors of midnight. Monotone ts preserved (gaps > 0).
- tier="magnitude" (r20): the 2^53 hunter. Monetary/value columns
  drawn log-uniformly up to ~1e8 (fixture max is 4.5e5), so SECOND-
  MOMENT accumulations (x², variance/corr numerators ~1e16–1e19
  unscaled) cross 2^53 while plain sums (~1e11) stay inside every
  declared DECIMAL precision. This drives the documented degraded-
  regime sites (rdiv exact=False, ROUND-after-quantized tails,
  native decimal→double casts below the dec2d_sql rewrite) on data
  where the degradation is ACTIVE — the class the r19 seed-4 catch
  (DuckDB's double-rounding cast at 1.76e17) proved can hide there.
  Run WITHOUT SPARK_GRAFT_RDIV_DEBUG: exact=True rdiv sites
  legitimately exceed their bound here and the claim under test is
  the degraded regime's cross-engine determinism, not true rounding
  (fuzz_oracle.py wires the env accordingly).
(Empty documents are deliberately NOT generated: several registered
tokenizer oracles divide by document length, and declaring their
empty-doc behavior is a semantics change to frozen queries. See
SCALING.md r18 addendum.)
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

_REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
_LANGS = ["de", "en", "es", "fr", "zh"]
_VOCAB = (
    "the a spark table join order sort merge filter scan hash key row "
    "column data batch stream window group agg query part line customer "
    "value vector big small fast slow dup"
).split()
_PNAME_ADJ = ["cold", "small", "large", "fast", "slow", "hot", "dim", "new"]
_PNAME_NOUN = ["widget", "gadget", "gear", "bolt", "plate", "tube"]

# unicode tier: multi-byte words mixed into documents.text (~40%).
# Deliberate coverage: Latin accents (2-byte UTF-8), CJK (3-byte),
# Cyrillic/Greek (2-byte), astral-plane emoji (4-byte, 2 UTF-16 units
# — the case where a code-unit-counting length() would diverge), and
# the German sharp s (case-mapping expands it: upper('ß') = 'SS').
_UNI_VOCAB = (
    "données zähler straße café niño "
    "数据 表格 流式 查询 合并 "
    "данные поток таблица "
    "δεδομένα ροή "
    "🚀 ✨ 日本語🎉"
).split()

_DAY_US = 86_400_000_000  # microseconds per day


def _ts_us(arr_us: np.ndarray) -> pa.Array:
    return pa.array(arr_us.astype("int64"), type=pa.timestamp("us"))


def _null_mask(rng: np.random.Generator, n: int, frac: float) -> np.ndarray:
    return rng.random(n) < frac


def _with_nulls(vals, mask) -> list:
    """Python list with None where mask — works for numeric and string
    columns alike and keeps the arrow type identical to the dense
    column (arrow infers from the non-null values)."""
    return [None if m else v for v, m in zip(vals.tolist(), mask)]


def make_tables(seed: int, tier: str = "hostile") -> dict[str, pa.Table]:
    """Build all ten tables as pyarrow Tables, deterministic in seed."""
    if tier not in (
        "plain", "hostile", "ties", "nulls", "unicode",
        "longdoc", "timeedge", "magnitude",
    ):
        raise ValueError(f"unknown tier: {tier}")
    rng = np.random.default_rng(seed)
    hostile = tier == "hostile"
    ties = tier == "ties"
    nulls = tier == "nulls"
    uni = tier == "unicode"
    longdoc = tier == "longdoc"
    timeedge = tier == "timeedge"
    magnitude = tier == "magnitude"

    if ties:
        n_cust, n_supp, n_part = 160, 10, 200
        # 40/44/48 orders per priority: 40 makes the plain mean tie
        # (v2=3 for 2-dp sums), 44 makes the 5%-trimmed count 40,
        # 48 covers integer-sum aggregates — cycle by seed.
        n_ord = (200, 220, 240)[seed % 3]
        n_evt, n_doc, n_emb, n_users = 1600, 800, 320, 50
    else:
        n_cust = int(rng.integers(100, 201))
        n_supp = int(rng.integers(8, 16))
        n_part = int(rng.integers(150, 251))
        n_ord = int(rng.integers(900, 1801))
        n_evt = int(rng.integers(700, 1301))
        n_doc = int(rng.integers(350, 551))
        n_emb = int(rng.integers(350, 551))
        n_users = int(rng.integers(12, 25))
    if longdoc:
        # long docs are token-heavy (~1600 words each): a smaller doc
        # count keeps the oracle-side token relations (~60k rows) in
        # the same cost band as the other tiers.
        n_doc = int(rng.integers(120, 181))

    out: dict[str, pa.Table] = {}

    out["region"] = pa.table(
        {
            "r_regionkey": pa.array(np.arange(5, dtype="int32"), pa.int32()),
            "r_name": _REGIONS,
        }
    )

    out["nation"] = pa.table(
        {
            "n_nationkey": pa.array(np.arange(25, dtype="int32"), pa.int32()),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": pa.array(
                rng.integers(0, 5, size=25).astype("int32"), pa.int32()
            ),
        }
    )

    cust_nations = (
        (np.arange(n_cust) % 20)  # ties: exactly 8 customers/nation
        if ties
        else rng.integers(0, 25, size=n_cust)
    )
    acctbal = np.round(rng.uniform(-999.99, 9999.99, size=n_cust), 2)
    if magnitude:
        acctbal = np.round(
            np.where(rng.random(n_cust) < 0.3, -1.0, 1.0)
            * 10 ** rng.uniform(1.0, 7.0, size=n_cust),
            2,
        )
    segments = [
        _SEGMENTS[i] for i in rng.integers(0, len(_SEGMENTS), size=n_cust)
    ]
    if nulls:
        # all-negative group: nation-3 balances strictly < 0 (sign
        # paths through rdiv/half-away and negative-sum aggregates)
        neg = cust_nations == 3
        acctbal[neg] = -np.abs(acctbal[neg]) - 0.01
        bal_mask = _null_mask(rng, n_cust, 0.15) & ~neg
        seg_mask = _null_mask(rng, n_cust, 0.05)
        acctbal_col = _with_nulls(acctbal, bal_mask)
        segments = [None if m else s for s, m in zip(segments, seg_mask)]
    else:
        acctbal_col = acctbal
    out["customer"] = pa.table(
        {
            "c_custkey": np.arange(n_cust, dtype="int64"),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": pa.array(cust_nations.astype("int32"), pa.int32()),
            "c_acctbal": pa.array(acctbal_col, pa.float64()),
            "c_mktsegment": segments,
        }
    )

    s_nat = rng.integers(0, 25, size=n_supp).astype("int32")
    s_bal = np.round(rng.uniform(-999.99, 9999.99, size=n_supp), 2)
    if magnitude:
        s_bal = np.round(
            np.where(rng.random(n_supp) < 0.3, -1.0, 1.0)
            * 10 ** rng.uniform(1.0, 7.0, size=n_supp),
            2,
        )
    out["supplier"] = pa.table(
        {
            "s_suppkey": np.arange(n_supp, dtype="int64"),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": pa.array(s_nat, pa.int32()),
            "s_acctbal": pa.array(
                _with_nulls(
                    s_bal,
                    _null_mask(rng, n_supp, 0.10) if nulls else np.zeros(n_supp, bool),
                ),
                pa.float64(),
            ),
        }
    )

    p_names = [
        f"{_PNAME_ADJ[a]} {_PNAME_NOUN[b]}"
        for a, b in zip(
            rng.integers(0, len(_PNAME_ADJ), size=n_part),
            rng.integers(0, len(_PNAME_NOUN), size=n_part),
        )
    ]
    p_brands = [f"Brand#{i}" for i in rng.integers(1, 26, size=n_part)]
    p_types = [_PTYPES[i] for i in rng.integers(0, len(_PTYPES), size=n_part)]
    p_sizes = rng.integers(1, 51, size=n_part).astype("int32")
    p_price = np.round(rng.uniform(900.0, 2100.0, size=n_part), 2)
    if magnitude:
        p_price = np.round(10 ** rng.uniform(2.0, 8.0, size=n_part), 2)
    out["part"] = pa.table(
        {
            "p_partkey": np.arange(n_part, dtype="int64"),
            "p_name": p_names,
            "p_brand": p_brands,
            "p_type": p_types,
            "p_size": pa.array(p_sizes, pa.int32()),
            "p_retailprice": pa.array(
                _with_nulls(
                    p_price,
                    _null_mask(rng, n_part, 0.10) if nulls else np.zeros(n_part, bool),
                ),
                pa.float64(),
            ),
        }
    )

    # orders: hot-key skew on custkey (hostile), tie clusters in
    # o_totalprice (hostile) — a real top-k tiebreaker workout.
    if hostile:
        zipf_w = 1.0 / np.arange(1, n_cust + 1) ** 1.2
        custkeys = rng.choice(n_cust, size=n_ord, p=zipf_w / zipf_w.sum())
    else:
        custkeys = rng.integers(0, n_cust, size=n_ord)
    totalprice = np.round(rng.uniform(800.0, 450000.0, size=n_ord), 2)
    if magnitude:
        # log-uniform up to ~1e8: first-moment sums (~1e11) stay inside
        # every declared DECIMAL precision; second-moment accumulations
        # (x^2 ~ 1e16, summed ~1e19 unscaled) cross 2^53.
        totalprice = np.round(10 ** rng.uniform(2.0, 8.0, size=n_ord), 2)
    if hostile:
        # ~10% of orders collapse onto a handful of exact price values.
        n_tie = n_ord // 10
        tie_idx = rng.choice(n_ord, size=n_tie, replace=False)
        tie_vals = np.round(rng.uniform(800.0, 450000.0, size=4), 2)
        totalprice[tie_idx] = tie_vals[rng.integers(0, 4, size=n_tie)]
    base = np.datetime64("1995-01-01", "us").astype("int64")
    span_days = (
        np.datetime64("2001-08-01", "us").astype("int64") - base
    ) // _DAY_US
    odate = base + rng.integers(0, span_days + 1, size=n_ord) * _DAY_US
    if timeedge:
        # ~50% of order dates snap to calendar edges inside the band:
        # leap days (1996/2000 — 2000 is the every-400-years leap
        # CENTURY), the day before/after each, month ends, and year
        # boundaries. date_trunc / months_between / date_add chains
        # cross these edges; l_shipdate = odate + 1..120 days then
        # crosses them again downstream.
        edge_pool = np.array(
            [
                np.datetime64(d, "us").astype("int64")
                for d in (
                    "1996-02-28", "1996-02-29", "1996-03-01",
                    "2000-02-28", "2000-02-29", "2000-03-01",
                    "1995-01-31", "1995-02-28", "1995-04-30",
                    "1995-12-31", "1996-01-01", "1997-06-30",
                    "1998-09-30", "1999-12-31", "2000-01-01",
                    "2000-12-31", "2001-01-01", "2001-07-31",
                )
            ]
        )
        snap = rng.random(n_ord) < 0.5
        odate[snap] = edge_pool[
            rng.integers(0, len(edge_pool), size=int(snap.sum()))
        ]
    # rng consumption order below (status, then priorities) matches the
    # pre-r19 inline construction — regression-pin seeds of the plain/
    # hostile/ties tiers must keep their byte-identical fixtures.
    status_idx = rng.choice(3, size=n_ord, p=[0.48, 0.48, 0.04])
    prio_idx = (
        np.arange(n_ord) % 5  # ties: exact n_ord/5 per class
        if ties
        else rng.integers(0, len(_PRIORITIES), size=n_ord)
    )
    if nulls:
        # zero-variance group: every '5-LOW' order at exactly 1000.00
        # (var_pop = 0 → skew/z-score hit 0/0: Spark NaN vs DuckDB
        # NULL unless the query guards the degenerate denominator)
        zv = prio_idx == 4
        totalprice[zv] = 1000.00
        tp_col = _with_nulls(
            totalprice, _null_mask(rng, n_ord, 0.10) & ~zv
        )
    else:
        tp_col = totalprice
    out["orders"] = pa.table(
        {
            "o_orderkey": np.arange(n_ord, dtype="int64"),
            "o_custkey": custkeys.astype("int64"),
            "o_orderstatus": ["FOP"[i] for i in status_idx],
            "o_totalprice": pa.array(tp_col, pa.float64()),
            "o_orderdate": _ts_us(odate),
            "o_orderpriority": [_PRIORITIES[i] for i in prio_idx],
        }
    )

    # lineitem: 1–12 lines per order, l_linenumber sequential within
    # the order, shipdate after orderdate (as in the fixed fixture).
    # ties: exactly 4 lines/order so (returnflag, linestatus) groups
    # assigned round-robin land at n_li/6 = tie-eligible sizes.
    lines_per = (
        np.full(n_ord, 4) if ties else rng.integers(1, 13, size=n_ord)
    )
    n_li = int(lines_per.sum())
    l_orderkey = np.repeat(np.arange(n_ord, dtype="int64"), lines_per)
    l_linenumber = np.concatenate([np.arange(1, k + 1) for k in lines_per])
    qty = rng.integers(1, 51, size=n_li).astype("float64")
    # hoisted in rng-consumption order (regression-pin seeds of the
    # earlier tiers must keep their byte-identical fixtures)
    li_part = rng.integers(0, n_part, size=n_li).astype("int64")
    li_supp = rng.integers(0, n_supp, size=n_li).astype("int64")
    qty_mask = _null_mask(rng, n_li, 0.05) if nulls else np.zeros(n_li, bool)
    extprice = np.round(qty * rng.uniform(900.0, 1100.0, size=n_li), 2)
    if magnitude:
        extprice = np.round(10 ** rng.uniform(2.0, 8.0, size=n_li), 2)
    out["lineitem"] = pa.table(
        {
            "l_orderkey": l_orderkey,
            "l_partkey": li_part,
            "l_suppkey": li_supp,
            "l_linenumber": pa.array(l_linenumber.astype("int32"), pa.int32()),
            "l_quantity": pa.array(
                _with_nulls(qty, qty_mask),
                pa.float64(),
            ),
            "l_extendedprice": extprice,
            "l_discount": pa.array(
                _with_nulls(
                    np.round(rng.uniform(0.0, 0.1, size=n_li), 2),
                    _null_mask(rng, n_li, 0.05) if nulls else np.zeros(n_li, bool),
                ),
                pa.float64(),
            ),
            "l_tax": pa.array(
                _with_nulls(
                    np.round(rng.uniform(0.0, 0.08, size=n_li), 2),
                    _null_mask(rng, n_li, 0.05) if nulls else np.zeros(n_li, bool),
                ),
                pa.float64(),
            ),
            "l_returnflag": [
                "ANR"[i]
                for i in (
                    np.arange(n_li) % 6 // 2  # ties: n_li/6 per (flag,status)
                    if ties
                    else rng.choice(3, size=n_li, p=[0.25, 0.5, 0.25])
                )
            ],
            "l_linestatus": [
                "FO"[i]
                for i in (
                    np.arange(n_li) % 2 if ties else rng.integers(0, 2, size=n_li)
                )
            ],
            "l_shipdate": _ts_us(
                np.repeat(odate, lines_per)
                + rng.integers(1, 121, size=n_li) * _DAY_US
            ),
        }
    )

    # events: ts monotone in event_id (the fixed fixture's invariant —
    # sessionize/as-of queries may rely on it), zipf-skewed users when
    # hostile.
    ts0 = np.datetime64("2024-01-01", "us").astype("int64")
    gaps = rng.exponential(2_500_000_000.0, size=n_evt)  # ~2500 s mean
    ts = ts0 + np.cumsum(gaps).astype("int64")
    if timeedge:
        # Boundary-quanta gaps from the midnight-aligned origin: the
        # cumulative timestamps land exactly ON minute/hour/day edges
        # (tumbling 1h / sliding 30min / date_trunc boundaries: window
        # start inclusive, end exclusive — both engines must agree),
        # on the 30-minute session-gap EQUALITY (1800s exactly — the
        # strict `>` must NOT break the session; 1800s+1µs must), and
        # on ±1µs/±1s neighbors of midnight. Gaps > 0 keeps the fixed
        # fixture's monotone-ts invariant.
        quanta = np.array(
            [
                1,                  # 1 µs — adjacent-timestamp edge
                999_999,            # 1 s − 1 µs
                1_000_000,          # 1 s
                59_000_000,         # 59 s
                60_000_000,         # 1 min
                899_000_000,        # 15 min − 1 s
                900_000_000,        # 15 min
                1_799_000_000,      # session gap − 1 s
                1_800_000_000,      # session gap exactly (no break)
                1_800_000_001,      # session gap + 1 µs (break)
                3_599_000_000,      # 1 h − 1 s
                3_600_000_000,      # 1 h
                86_399_000_000,     # 1 day − 1 s
                86_400_000_000,     # 1 day
            ],
            dtype="int64",
        )
        q_w = np.array(
            [.06, .05, .12, .08, .12, .08, .12, .07, .07, .06,
             .05, .08, .02, .02]
        )
        ts = ts0 + np.cumsum(
            rng.choice(quanta, size=n_evt, p=q_w / q_w.sum())
        )
    if ties:
        # Late arrivals: ~12% of events carry an event-time EARLIER
        # than something already ingested (ts pushed back 1–5000 s).
        # The fixed fixture is fully monotone, so the out-of-orderness
        # operators' late paths are otherwise NEVER exercised by any
        # compare. Hostile/plain stay monotone (regression-pin seeds
        # must keep their byte-identical fixtures).
        late_idx = np.arange(n_evt) % 8 == 5
        ts = ts - late_idx * rng.integers(1, 5_000, size=n_evt) * 1_000_000
    if ties:
        users = np.arange(n_evt) % n_users  # exactly 32 events/user
    elif hostile:
        zipf_u = 1.0 / np.arange(1, n_users + 1) ** 1.3
        users = rng.choice(n_users, size=n_evt, p=zipf_u / zipf_u.sum())
    else:
        users = rng.integers(0, n_users, size=n_evt)
    if ties:
        etype_idx = np.arange(n_evt) % 5  # ties: 320/type
    elif nulls:
        # absent class: 'signup' never occurs — empty funnel legs,
        # empty grouped subsets (aggregates over zero rows)
        present = [i for i, t in enumerate(_EVENT_TYPES) if t != "signup"]
        etype_idx = np.array(present)[rng.integers(0, len(present), size=n_evt)]
    else:
        etype_idx = rng.integers(0, len(_EVENT_TYPES), size=n_evt)
    evalue = np.round(rng.uniform(0.01, 330.0, size=n_evt), 2)
    if magnitude:
        evalue = np.round(10 ** rng.uniform(-1.0, 7.0, size=n_evt), 2)
    props = [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, size=n_evt)]
    if nulls:
        # zero-variance group: user 0's event values are constant
        zv_u = users == 0
        evalue[zv_u] = 50.00
        evalue_col = _with_nulls(evalue, _null_mask(rng, n_evt, 0.10) & ~zv_u)
        props_mask = _null_mask(rng, n_evt, 0.05)
        props = [None if m else p for p, m in zip(props, props_mask)]
    else:
        evalue_col = evalue
    out["events"] = pa.table(
        {
            "event_id": np.arange(n_evt, dtype="int64"),
            "ts": _ts_us(ts),
            "user_id": users.astype("int64"),
            "event_type": [_EVENT_TYPES[i] for i in etype_idx],
            "value": pa.array(evalue_col, pa.float64()),
            "props": props,
        }
    )

    # documents: word-salad text from the fixture vocab; hostile tier
    # plants exact duplicates (~8%) and near-duplicates (~6%, one word
    # substituted) — the dedup family's real-world input shape.
    texts: list[str] = []
    # unicode tier: ~40% multi-byte words, ~60% fixture vocab (query
    # terms like 'vector merge stream' must still match documents)
    doc_vocab = _VOCAB + _UNI_VOCAB if uni else _VOCAB
    uni_weights = None
    if uni:
        w = np.array([1.5] * len(_VOCAB) + [1.0] * len(_UNI_VOCAB))
        uni_weights = w / w.sum()
    # longdoc: boundary-exact sizes for the first docs (chunking
    # CHUNK_W=32/stride 24: 32 = one exact chunk, 33 = one word over,
    # 1016 = 24·41+32 — the last chunk ends exactly at the doc end;
    # packing PACK_SEQ_LEN=256: 255/256/257/512 straddle the pack
    # boundary; 2048 spans 8 full sequences), then ~25% long docs.
    _LD_SIZES = (32, 33, 255, 256, 257, 512, 1016, 2048)
    for di in range(n_doc):
        # ties: word counts cycle tie-eligible sizes (32 tokens; 34
        # words → 32 trigram shingles; 40 for the 2^3·5 class).
        if ties:
            n_words = (32, 34, 40)[di % 3]
        elif longdoc:
            if di < len(_LD_SIZES):
                n_words = _LD_SIZES[di]
            elif rng.random() < 0.25:
                n_words = int(rng.integers(1000, 2201))
            else:
                n_words = int(rng.integers(10, 100))
        else:
            n_words = int(rng.integers(10, 100))
        idx = (
            rng.choice(len(doc_vocab), size=n_words, p=uni_weights)
            if uni
            else rng.integers(0, len(doc_vocab), size=n_words)
        )
        texts.append(" ".join(doc_vocab[i] for i in idx))
    if hostile and n_doc >= 50:
        n_exact = n_doc * 8 // 100
        n_near = n_doc * 6 // 100
        srcs = rng.choice(n_doc // 2, size=n_exact + n_near, replace=False)
        dsts = n_doc // 2 + rng.choice(
            n_doc - n_doc // 2, size=n_exact + n_near, replace=False
        )
        for j in range(n_exact):
            texts[int(dsts[j])] = texts[int(srcs[j])]
        for j in range(n_exact, n_exact + n_near):
            words = texts[int(srcs[j])].split(" ")
            words[int(rng.integers(0, len(words)))] = _VOCAB[
                int(rng.integers(0, len(_VOCAB)))
            ]
            texts[int(dsts[j])] = " ".join(words)
    if longdoc:
        # Three long docs share a planted 64-token span (SUBSTR_W=8 →
        # 57 duplicated grams per pair) at DIFFERENT offsets — the
        # real substring-duplication shape: a quoted passage inside
        # otherwise-distinct documents, which whole-doc dup planting
        # (hostile tier) never produces. Replacement (not insertion)
        # keeps each doc's token count boundary-exact.
        longs = [i for i, t in enumerate(texts) if t.count(" ") >= 999][:3]
        if len(longs) == 3:
            span = texts[longs[0]].split(" ")[100:164]
            for d in longs[1:]:
                w2 = texts[d].split(" ")
                off = int(rng.integers(0, len(w2) - 64))
                w2[off : off + 64] = span
                texts[d] = " ".join(w2)
    langs = [
        _LANGS[i]
        for i in (
            np.arange(n_doc) % 5  # ties: 160/lang
            if ties
            else rng.integers(0, len(_LANGS), size=n_doc)
        )
    ]
    sources = [
        f"src{i}"
        for i in (
            np.arange(n_doc) % 20  # ties: 40/source
            if ties
            else rng.integers(0, 20, size=n_doc)
        )
    ]
    if nulls:
        lm = _null_mask(rng, n_doc, 0.05)
        sm = _null_mask(rng, n_doc, 0.05)
        langs = [None if m else v for v, m in zip(langs, lm)]
        sources = [None if m else v for v, m in zip(sources, sm)]
    out["documents"] = pa.table(
        {
            "doc_id": np.arange(n_doc, dtype="int64"),
            "text": texts,
            "lang": langs,
            "source": sources,
            "n_chars": np.array([len(t) for t in texts], dtype="int64"),
        }
    )

    emb = rng.normal(0.0, 0.125, size=(n_emb, 64)).astype("float32")
    if hostile and n_emb >= 40:
        # duplicate embedding rows (distinct vec_ids): exercises
        # cosine==1 ties in top-k and SemDeDup cell collapse.
        n_dup = n_emb * 5 // 100
        s = rng.choice(n_emb // 2, size=n_dup, replace=False)
        t = n_emb // 2 + rng.choice(n_emb - n_emb // 2, size=n_dup, replace=False)
        emb[t] = emb[s]
    out["embeddings"] = pa.table(
        {
            "vec_id": np.arange(n_emb, dtype="int64"),
            "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
            "label": pa.array(
                _with_nulls(
                    (
                        np.arange(n_emb) % 10  # ties: 32/label
                        if ties
                        else rng.integers(0, 10, size=n_emb)
                    ).astype("int32"),
                    _null_mask(rng, n_emb, 0.05)
                    if nulls
                    else np.zeros(n_emb, bool),
                ),
                pa.int32(),
            ),
        }
    )

    return out


def write_fixture(seed: int, out_dir: str, tier: str = "hostile") -> dict[str, int]:
    """Write all ten tables as ``{out_dir}/{table}.parquet``; returns
    row counts. Idempotent per (seed, tier)."""
    os.makedirs(out_dir, exist_ok=True)
    tables = make_tables(seed, tier=tier)
    counts = {}
    for name, tbl in tables.items():
        pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"))
        counts[name] = tbl.num_rows
    return counts


if __name__ == "__main__":
    import sys

    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/fuzzfix_{seed}"
    tier = sys.argv[3] if len(sys.argv) > 3 else "hostile"
    print(write_fixture(seed, out, tier=tier), "->", out)
