"""Central query registry.

Every operator from SURVEY.md §2 registers here as a named query
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB
oracle SQL string. ``__spark_entry__.py`` re-exports these to the
driver, which hash-compares Spark vs DuckDB at sf=0.01.

Cross-engine determinism rules used throughout (see tests):
- sums over doubles go through DECIMAL(18,2)/(20,8) casts (exact,
  order-independent addition), final-cast back to DOUBLE;
- float vector math uses *sequential left folds* (Spark ``aggregate``
  / DuckDB ``list_reduce``), which are bit-identical IEEE754 chains;
- every LIMIT/top-k is fully ordered with a unique tiebreaker;
- collected lists are sorted+joined to a canonical string.
"""

from __future__ import annotations

import functools
import json
import os
import tempfile
import zipfile

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

_pkg_zip: str | None = None
_shipped_contexts: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on Spark workers regardless of the
    driver process's cwd/sys.path.

    Module-level UDF kernels (e.g. ``ext.multimodal.decode_batches``)
    are cloudpickled *by reference*, so Python workers must be able to
    ``import proof_of_concept___cdc_w_iceberg_spark`` themselves. Zip the package once
    per process and ``addPyFile`` it once per SparkContext — a no-op
    for consumers that already run from the repo root."""
    global _pkg_zip
    sc = spark.sparkContext
    if id(sc) in _shipped_contexts:
        return
    # Session prep beyond shipping code: pin UTC so wall-clock date
    # results agree with the tz-naive DuckDB oracle even when the
    # consuming session was built without our factory (runtime-settable
    # conf, unlike most session options).
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # Unannotated fixture stamps must load as TIMESTAMP, not
        # TIMESTAMP_NTZ (epoch functions reject NTZ); runtime-settable.
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass
    if _pkg_zip is None:
        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        pkg_name = os.path.basename(pkg_dir)
        fd, path = tempfile.mkstemp(prefix=f"{pkg_name}_", suffix=".zip")
        with os.fdopen(fd, "wb") as f, zipfile.ZipFile(f, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fname in files:
                    if not fname.endswith(".py"):
                        continue
                    full = os.path.join(root, fname)
                    rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
        _pkg_zip = path
    sc.addPyFile(_pkg_zip)
    _shipped_contexts.add(id(sc))


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as query ``name`` with optional DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            return fn(spark, sf_dir)

        _QUERIES[name] = wrapped
        if oracle is not None:
            _ORACLES[name] = oracle
        wrapped.query_name = name  # type: ignore[attr-defined]
        fn.query_name = name  # type: ignore[attr-defined]
        return wrapped

    return deco


_loaded = False

# Driver-verification ordering. The external driver hash-checks only the
# first 50 entries of ``queries()`` per round, so ordering IS coverage
# policy. It is COMPUTED, not hand-maintained (round-3 verdict item 1):
# the moment a ``CORRECTNESS_r{N}.json`` artifact lands in the repo
# root, the order self-rotates --
#
#   1. oracle-backed queries with NO driver row yet (highest-risk
#      families first: CDC composites guard the reference's core
#      upsert semantics, then streaming / dedup / similarity / joins /
#      TPC-H shapes, then the rest alphabetically);
#   2. registered queries with no oracle (can only ever earn a
#      rows-only row, so they must never displace hash-checkable
#      queries from the window);
#   3. already-checked queries, oldest green round first -- once full
#      coverage is reached the driver window degrades gracefully into
#      a rolling regression sweep re-checking the stalest rows.
#
# Guarded by tests/test_registry_order.py.
_RISK_PREFIX_ORDER = ("q_cdc_", "q_stream_", "q_dedup_", "q_sim_", "q_join_", "q_tpch_")


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_checked_rounds(repo_root: str | None = None) -> dict[str, int]:
    """Map query name -> earliest round with a driver CORRECTNESS row.

    Reads the ``CORRECTNESS_r{N}.json`` artifacts the external driver
    drops in the repo root after each round. Tolerant of a missing /
    unreadable repo root (e.g. when the package runs from the shipped
    zip on a worker) -- ordering then simply falls back to group 1/2.
    """
    rounds: dict[str, int] = {}
    root = repo_root if repo_root is not None else _repo_root()
    try:
        fnames = sorted(os.listdir(root))
    except OSError:
        return rounds
    for fname in fnames:
        if not (fname.startswith("CORRECTNESS_r") and fname.endswith(".json")):
            continue
        try:
            with open(os.path.join(root, fname)) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        try:
            rnd = int(fname[len("CORRECTNESS_r") : -len(".json")])
        except ValueError:
            rnd = 0
        for name in rows:
            rounds.setdefault(name, rnd)
    return rounds


def _family_rank(name: str) -> int:
    for i, prefix in enumerate(_RISK_PREFIX_ORDER):
        if name.startswith(prefix):
            return i
    return len(_RISK_PREFIX_ORDER)


def check_order(names, oracle_names, checked_rounds) -> list[str]:
    """Pure ordering kernel (exposed for tests): see module comment."""

    def key(n: str):
        if n not in checked_rounds:
            return (0 if n in oracle_names else 1, _family_rank(n), n)
        return (2, checked_rounds[n], n)

    return sorted(names, key=key)


def _load() -> None:
    """Import every module that registers queries (idempotent)."""
    global _loaded
    if _loaded:
        return
    _loaded = True
    from .operators import aggregates, analytics, events, filters, joins, layout, quality, scans, setops, sketches, sorts, subqueries, tpch, windows  # noqa: F401
    from .functions import scalar  # noqa: F401
    from .cdc import incremental as _cdc_ivm  # noqa: F401
    from .cdc import queries as _cdc  # noqa: F401
    from .streaming import queries as _streaming  # noqa: F401
    from .ext import corpus, dedup, embeddings, graph, inference, multimodal, pipeline, similarity, text, udfs  # noqa: F401


def queries() -> dict[str, QueryFn]:
    _load()
    order = check_order(_QUERIES, set(_ORACLES), _driver_checked_rounds())
    return {name: _QUERIES[name] for name in order}


def oracles() -> dict[str, str]:
    _load()
    return dict(_ORACLES)
