"""Cross-engine oracle fuzzer: replay the driver's Spark-vs-DuckDB
compare on RANDOMIZED micro-fixtures (tools/fuzz_fixtures.py).

The per-round driver check proves each query fn and its oracle SQL
agree on one fixed seed-42 dataset. This tool proves the agreement is
a property of the SEMANTICS, not the fixture: for every seed it
regenerates all ten tables with hostile-but-plausible distributions
(tie clusters, duplicate documents/embeddings, zipf hot keys) and
re-runs the exact drive_entry compare (sorted lowercase columns,
9-decimal float canonicalization, order-insensitive md5).

Usage:
    python tools/fuzz_oracle.py [--seeds 1,2,3] [--tier hostile]
                                [--report /tmp/fuzz_report.json]
                                [--round 19]
                                [query names...]

Defaults: seeds 1,2 · tier hostile · all oracle-backed queries (minus
the tier's declared exclusions, logged). Exit nonzero on any
mismatch/error. The JSON report maps "{seed}/{query}" ->
{"status", "rows", "detail"}.

``--round N`` additionally MERGES this sweep into the per-round
artifact ``FUZZ_r{N}.json`` at the repo root (r18 verdict item 3:
the campaign evidence was prose in SCALING.md; the artifact makes it
machine-checkable like CORRECTNESS/BENCH/PLAN_LEDGER). Keys are
"{tier}/{seed}/{query}"; repeated invocations in a round accumulate.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.fuzz_fixtures import TABLES, write_fixture

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TIERS = (
    "plain", "hostile", "ties", "nulls", "unicode",
    "longdoc", "timeedge", "magnitude",
)

# Queries excluded per tier, each with its declared-contract reason —
# the same discipline as the plan-sweep allowlist: every exclusion is
# explicit, bounded, and carries WHY (no silent caps).
TIER_EXCLUSIONS: dict[str, dict[str, str]] = {
    "unicode": {
        # The md5-stub multimodal codecs DECLARE an ASCII corpus
        # (ext/multimodal.py): the Spark side processes the utf-8 BYTE
        # payload while the oracle twin works in CHAR ordinals — on
        # multi-byte text those are genuinely different quantities, by
        # documented stub contract, not a cross-engine bug.
        n: "ASCII stub contract: payload bytes vs char ordinals"
        for n in (
            "q_multimodal_decode",
            "q_multimodal_framesample",
            "q_multimodal_features",
            "q_multimodal_resize",
            "q_multimodal_cols",
            "q_multimodal_phash",
        )
    },
}


def canon_rows(cols, rows) -> str:
    """Order-insensitive md5 over canonicalized rows — byte-identical
    semantics to tools/drive_entry.py (the committed driver-contract
    simulation)."""
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                v = repr(round(v, 9))
            elif hasattr(v, "as_tuple"):
                v = repr(round(float(v), 9))
            else:
                v = str(v)
            vals.append(v)
        out.append("|".join(vals))
    h = hashlib.md5()
    for line in sorted(out):
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def compare_one(spark, con, qfn, oracle_sql, sf_dir):
    """Run one query fn + its oracle on one fixture; return
    (status, spark_rows, detail)."""
    sdf = qfn(spark, sf_dir)
    scols = sorted(c.lower() for c in sdf.columns)
    srows = [{c.lower(): v for c, v in r.asDict().items()} for r in sdf.collect()]
    spark.catalog.clearCache()
    if oracle_sql is None:
        return "no_oracle", len(srows), ""
    od = con.sql(oracle_sql)
    ocols = sorted(c.lower() for c in od.columns)
    orows = [dict(zip([c.lower() for c in od.columns], t)) for t in od.fetchall()]
    if scols != ocols:
        return "FAIL", len(srows), f"schema {scols} != {ocols}"
    if len(srows) != len(orows):
        return "FAIL", len(srows), f"rows {len(srows)} != {len(orows)}"
    if canon_rows(scols, srows) != canon_rows(ocols, orows):
        return "FAIL", len(srows), "value hash mismatch"
    return "OK", len(srows), ""


def merge_round_artifact(round_no: int, tier: str, report: dict) -> str:
    """Merge one sweep's report into FUZZ_r{round_no}.json (keys
    "{tier}/{seed}/{query}"); returns the artifact path. Read-merge-
    write so a round's several tier/seed sweeps accumulate into one
    machine-checkable record."""
    path = os.path.join(REPO, f"FUZZ_r{round_no:02d}.json")
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    merged.update({f"{tier}/{k}": v for k, v in report.items()})
    with open(path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    return path


def run(seeds, names, tier, report_path, round_no=None):
    # rdiv exactness guard (operators/_util.py RDIV_DEBUG_ENV, r19
    # advice: the comment there promised this wiring but nothing set
    # it): every sweep on plausible-magnitude data runs with the
    # 2^53-bound assertion armed, so an exact=True rdiv site whose
    # inputs silently cross the bound ERRORs here instead of
    # degrading. The magnitude tier drives values BEYOND the bound on
    # purpose (its claim under test is degraded-regime cross-engine
    # determinism), so the guard stays off there.
    from proof_of_concept___cdc_w_iceberg_spark.operators._util import (
        RDIV_DEBUG_ENV,
    )

    if tier == "magnitude":
        os.environ.pop(RDIV_DEBUG_ENV, None)
    else:
        os.environ[RDIV_DEBUG_ENV] = "1"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("fuzz_oracle")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    orc = entrymod.oracle_sql()
    if not names:
        names = [n for n in qs if n in orc]
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    excl = TIER_EXCLUSIONS.get(tier, {})
    dropped = [n for n in names if n in excl]
    if dropped:
        print(f"tier {tier}: excluding {len(dropped)} declared-contract "
              f"queries: {dropped}")
        names = [n for n in names if n not in excl]

    report, fails = {}, []
    for seed in seeds:
        sf_dir = f"/tmp/fuzzfix_{tier}_{seed}"
        counts = write_fixture(seed, sf_dir, tier=tier)
        print(f"seed {seed} ({tier}): {counts}")
        con = duckdb.connect()
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        for name in names:
            key = f"{seed}/{name}"
            try:
                status, nrows, detail = compare_one(
                    spark, con, qs[name], orc.get(name), sf_dir
                )
            except Exception as exc:  # noqa: BLE001 — survey every query
                status, nrows, detail = "ERROR", None, f"{type(exc).__name__}: {exc}"
            report[key] = {"status": status, "rows": nrows, "detail": detail[:500]}
            if status in ("FAIL", "ERROR"):
                fails.append(key)
                print(f"  {name}: {status} {detail[:200]}")
            else:
                print(f"  {name}: {status} rows={nrows}")
        con.close()

    if report_path:
        with open(report_path, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
    if round_no is not None:
        path = merge_round_artifact(round_no, tier, report)
        print(f"merged into {path}")
    n = len(report)
    print(f"fuzz: checked={n} failed={len(fails)} {fails[:20]}")
    return fails


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seeds", default="1,2")
    p.add_argument("--tier", default="hostile", choices=list(TIERS))
    p.add_argument("--report", default="")
    p.add_argument("--round", type=int, default=None,
                   help="merge results into FUZZ_r{N}.json at repo root")
    p.add_argument("names", nargs="*")
    a = p.parse_args(argv)
    seeds = [int(s) for s in a.seeds.split(",") if s]
    fails = run(seeds, a.names, a.tier, a.report, round_no=a.round)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
