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


def _load() -> None:
    """Import every module that registers queries (idempotent)."""
    global _loaded
    if _loaded:
        return
    _loaded = True
    from .operators import aggregates, filters, joins, scans, setops, sorts, tpch, windows  # noqa: F401
    from .functions import scalar  # noqa: F401
    from .cdc import queries as _cdc  # noqa: F401
    from .streaming import queries as _streaming  # noqa: F401
    from .ext import dedup, multimodal, similarity, text, udfs  # noqa: F401


def queries() -> dict[str, QueryFn]:
    _load()
    return dict(_QUERIES)


def oracles() -> dict[str, str]:
    _load()
    return dict(_ORACLES)
