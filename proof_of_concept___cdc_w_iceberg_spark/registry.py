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
- collected lists are sorted+joined to a canonical string;
- final roundings of DECIMAL-QUANTIZED values happen on the DECIMAL,
  never the double (r18 fuzzer finding): ``ROUND(double, k)`` on an
  input already quantized at k+2 places sits on a k-dp tie ~1% of
  the time per row, where Spark (HALF_UP on the exact binary) and
  DuckDB (multiply-and-rint) disagree. ``ROUND(DECIMAL, k)`` is
  half-away-from-zero in both engines (verified, negatives
  included); decimal→decimal CAST is NOT safe (DuckDB truncates).
"""

from __future__ import annotations

import functools
import hashlib
import inspect
import json
import os
import tempfile
import zipfile

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}
_RAW_FNS: dict[str, Callable] = {}

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
        _RAW_FNS[name] = fn
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
#   0. oracle-backed queries that NEED a (re)check: no driver row yet,
#      or their LATEST row failed (hash/rows/schema mismatch, or an
#      err) -- a failed row must re-enter the window the very next
#      round so its fix re-earns the hash (round-5 verdict item 1).
#      Highest-risk families first: CDC composites guard the
#      reference's core upsert semantics, then streaming / dedup /
#      similarity / joins / TPC-H shapes, then the rest alphabetically;
#   1. no-oracle queries with NO row yet: they can earn a one-time
#      rows-only row, but never displace hash-checkable queries that
#      still need a slot;
#   2. green oracle-backed queries, stalest round first -- once full
#      coverage is reached the driver window degrades gracefully into
#      a rolling regression sweep re-checking the stalest rows;
#   3. no-oracle queries that already earned their rows-only row:
#      a re-check can never upgrade them, so they sort behind every
#      oracle-backed query forever (round-5 verdict item 2).
#
# Guarded by tests/test_registry_order.py.
_RISK_PREFIX_ORDER = ("q_cdc_", "q_stream_", "q_dedup_", "q_sim_", "q_join_", "q_tpch_")

# Behavior-modified-since-last-check pins (r12 verdict): a green ledger
# row earned by OLD code is not evidence about the current code. Map a
# query name to the round its registered behavior last changed; any
# ledger row from an EARLIER round is treated as "needs re-check"
# (group 0) until the driver re-hashes it. Self-clearing: once a
# CORRECTNESS_r{N}.json with N >= the pinned round lands, the normal
# rolling order resumes — entries here never need manual removal, only
# addition whenever a registered query's output or routing changes.
#
# Since r14 this dict is only the MANUAL OVERRIDE (r13 verdict item 2):
# direct edits to a query function's source or its oracle SQL are
# detected mechanically by per-query fingerprints (below) and re-front
# on their own. Add an entry here only for changes a fingerprint cannot
# see — a behavior change confined to a HELPER the query calls, with
# the query body and oracle text untouched (e.g. the r13 shared-helper
# refactor of the sketch builders). The r12/r13 pins all cleared when
# CORRECTNESS_r13 landed green rows for them.
_MODIFIED_IN_ROUND: dict[str, int] = {}
# r16 note — considered and rejected: a pin for q_cdc_wap_publish after
# fast_forward (cdc/branches.py) gained the ancestry check + ref CAS on
# its publish path. The map's contract is OUTPUT-or-ROUTING changes; the
# new guards are pure refusal paths that do not fire in its flow (its
# publish IS a fast-forward), its output is proven byte-unchanged by the
# /tmp driver simulation (hash-green in the r16 pre-commit window
# rehearsal), and the changed helpers are hash-checked far more
# aggressively by the NEW q_cdc_wap_race row (refusal arm + cherry-pick
# + sequential-apply oracle). Pinning it would burn a sweep slot the
# r15 verdict ordered spent on the 42-row r9-stale block.

# --- per-query source fingerprints (r13 verdict item 2) ----------------
#
# QUERY_FINGERPRINTS.json (repo root, committed next to the ledger)
# maps each registered query to {"fp": sha256(source + oracle SQL),
# "since": R} — "this fingerprint has been current since round R". On
# registry load, a query whose live fingerprint differs from the
# recorded one gets re-stamped with since = latest_artifact_round + 1
# (the next round the driver will check), and check_order treats any
# green ledger row OLDER than `since` as stale evidence, exactly like a
# manual pin. Bootstrap: a query with no record yet is stamped
# since = 0 (its existing greens are trusted — we cannot retroactively
# know what code earned them; from then on every edit is caught).
# Degrades safely where the repo root is unreadable/unwritable (worker
# zip): no file -> bootstrap stamps -> empty modified map.

_FINGERPRINT_FILE = "QUERY_FINGERPRINTS.json"


def _fingerprint(fn: Callable, oracle: str | None) -> str | None:
    """sha256 over the query function's source text plus its oracle
    SQL, or None when the source cannot be read RELIABLY. Source text
    (not bytecode) so the hash is stable across Python versions and
    unaffected by line-number shifts elsewhere in the file; it DOES
    move on comment/docstring edits inside the function — conservative
    by design (re-earning a hash is cheap, a stale green is not).

    Stale-process guard (found live in r14): getsource reads the
    CURRENT file at the code object's IMPORT-TIME line number, so a
    long-running process whose module was edited on disk underneath it
    reads the wrong text block for every function below the edit and
    would persist bogus fingerprints (spuriously re-fronting them).
    The block must actually define this function; otherwise return
    None and let fingerprint_modified keep the recorded entry for a
    fresh process to reconcile."""
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):  # e.g. source not on disk (REPL-defined)
        return None
    # "(" included: a bare name check is defeated by prefix-named
    # functions (q_sketch_cms vs q_sketch_cms_rollup — "def q_sketch_cms"
    # IS a substring of the rollup's def line), which is exactly the
    # shifted-block scenario this guard exists for (review finding r14).
    if f"def {getattr(fn, '__name__', '')}(" not in src:
        return None  # shifted/foreign block: this process can't see truth
    # The block must also START at a decorator or def line (r19: a
    # +6-line shift above q_funnel made getsource return a block that
    # STILL CONTAINED "def q_funnel(" but started mid-string — the
    # containment check passed, a bogus fingerprint was persisted, and
    # the unchanged query spuriously re-fronted with since=19).
    first = src.lstrip().splitlines()[0].lstrip() if src.strip() else ""
    if not (first.startswith("@") or first.startswith("def ")
            or first.startswith("async def ")):
        return None  # shifted block: starts mid-expression, not at the fn
    h = hashlib.sha256()
    h.update(src.encode())
    h.update(b"\x00")
    h.update((oracle or "").encode())
    return h.hexdigest()


def _latest_artifact_round(repo_root: str) -> int:
    """Highest N over CORRECTNESS_r{N}.json filenames (0 if none)."""
    best = 0
    try:
        fnames = os.listdir(repo_root)
    except OSError:
        return best
    for fname in fnames:
        if fname.startswith("CORRECTNESS_r") and fname.endswith(".json"):
            try:
                best = max(best, int(fname[len("CORRECTNESS_r") : -len(".json")]))
            except ValueError:
                continue
    return best


def fingerprint_modified(
    current: dict[str, str], recorded: dict[str, dict], next_round: int
) -> tuple[dict[str, int], dict[str, dict], bool]:
    """Pure kernel (exposed for tests): diff live fingerprints against
    the recorded ones. Returns ``(modified_map, updated_records,
    changed)`` — ``modified_map`` feeds check_order like
    ``_MODIFIED_IN_ROUND``; ``updated_records`` is what to persist;
    ``changed`` says whether persisting is needed (new/edited/deleted
    queries)."""
    modified: dict[str, int] = {}
    updated: dict[str, dict] = {}
    changed = bool(set(recorded) - set(current))  # dropped/renamed queries
    for name, fp in current.items():
        rec = recorded.get(name)
        if fp is None:
            # This process cannot read the source reliably (stale
            # module vs on-disk edit, worker zip, REPL): never write a
            # guess. Keep the recorded entry verbatim — its pending pin
            # still applies — and let a fresh process reconcile.
            if isinstance(rec, dict) and rec.get("fp") is not None:
                updated[name] = dict(rec)
                if int(rec.get("since", 0)) > 0:
                    modified[name] = int(rec["since"])
            continue
        if not isinstance(rec, dict) or rec.get("fp") is None:
            updated[name] = {"fp": fp, "since": 0}  # bootstrap: trust greens
            changed = True
        elif rec["fp"] != fp:
            updated[name] = {"fp": fp, "since": next_round}
            modified[name] = next_round
            changed = True
        else:
            updated[name] = {"fp": fp, "since": int(rec.get("since", 0))}
            if updated[name]["since"] > 0:
                modified[name] = updated[name]["since"]
    return modified, updated, changed


def _auto_modified(repo_root: str | None = None) -> dict[str, int]:
    """Compute the fingerprint-derived modified map and keep the
    persisted record current. Every call recomputes live fingerprints
    (cheap: linecache-backed getsource over ~300 functions) so an
    in-memory mutation is caught without a process restart."""
    root = repo_root if repo_root is not None else _repo_root()
    path = os.path.join(root, _FINGERPRINT_FILE)
    try:
        with open(path) as f:
            recorded = json.load(f)
        if not isinstance(recorded, dict):
            recorded = {}
    except (OSError, ValueError):
        recorded = {}
    current = {
        name: _fingerprint(fn, _ORACLES.get(name)) for name, fn in _RAW_FNS.items()
    }
    modified, updated, changed = fingerprint_modified(
        current, recorded, _latest_artifact_round(root) + 1
    )
    if changed:
        # Atomic replace: tests, the bench, and the driver can all
        # load the registry concurrently — a torn in-place write would
        # corrupt the file for every other reader (it degrades to
        # bootstrap, losing pending pins).
        tmp = None
        try:
            fd, tmp = tempfile.mkstemp(
                prefix=_FINGERPRINT_FILE + ".", dir=root
            )
            with os.fdopen(fd, "w") as f:
                json.dump(updated, f, indent=1, sort_keys=True)
            os.replace(tmp, path)
        except OSError:
            # Read-only checkout / worker zip: the map still applies
            # in-process; drop any half-written temp file.
            if tmp is not None:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
    return modified


def modified_map(repo_root: str | None = None) -> dict[str, int]:
    """Combined behavior-modified map: mechanical source fingerprints
    plus the manual helper-change override, max round per query."""
    _load()
    out = _auto_modified(repo_root)
    for name, rnd in _MODIFIED_IN_ROUND.items():
        out[name] = max(rnd, out.get(name, 0))
    return out


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _row_passed(row) -> bool:
    """Whether one driver CORRECTNESS row counts as a success.

    Rows-only rows (``err == 'no_oracle'``) pass when the query ran and
    produced a row count. Oracle-backed rows pass only when every match
    flag is true and there was no error -- ``hash_match=false`` (the
    q_herfindahl r05 failure) is a FAIL even though rows/schema matched.
    Unknown shapes count as passed so a format change can't loop a
    query into the window forever.
    """
    if not isinstance(row, dict):
        return True
    if not ({"rows_match", "schema_match", "hash_match", "err", "spark_rows"} & set(row)):
        # A dict in a future/renamed format is just as "unknown" as a
        # non-dict — counting it failed would re-front every query
        # forever the day the driver changes its row shape.
        return True
    if row.get("err") == "no_oracle":
        return row.get("spark_rows") is not None
    return (
        row.get("err") is None
        and row.get("rows_match") is True
        and row.get("schema_match") is True
        and row.get("hash_match") is not False
    )


def _driver_ledger(repo_root: str | None = None) -> dict[str, dict]:
    """Map query name -> ``{"first": int, "last": int, "ok": bool}``.

    ``first``/``last`` are the earliest/latest rounds with a driver
    CORRECTNESS row for the query; ``ok`` reflects the LATEST row only,
    so a failure re-fronts the query even if an older round was green.
    Reads the ``CORRECTNESS_r{N}.json`` artifacts the external driver
    drops in the repo root after each round. Tolerant of a missing /
    unreadable repo root (e.g. when the package runs from the shipped
    zip on a worker) -- ordering then simply falls back to group 0/1.
    """
    ledger: dict[str, dict] = {}
    root = repo_root if repo_root is not None else _repo_root()
    try:
        fnames = os.listdir(root)
    except OSError:
        return ledger
    artifacts: list[tuple[int, dict]] = []
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
        artifacts.append((rnd, rows))
    for rnd, rows in sorted(artifacts, key=lambda t: t[0]):
        for name, row in rows.items():
            entry = ledger.setdefault(name, {"first": rnd, "last": rnd, "ok": True})
            entry["last"] = rnd
            entry["ok"] = _row_passed(row)
    return ledger


def _family_rank(name: str) -> int:
    for i, prefix in enumerate(_RISK_PREFIX_ORDER):
        if name.startswith(prefix):
            return i
    return len(_RISK_PREFIX_ORDER)


def promoted_no_oracle(names, oracle_names, ledger, modified=None) -> str | None:
    """The single stalest EARNED no-oracle row (r13 verdict item 4):
    rows-only rows can never be upgraded by a re-check, but they ARE
    liveness evidence ("ran with rows as declared"), and q_ddl_create /
    q_catalog_list hadn't executed under the driver since r1. One slot
    per round rotates the stalest of them back through the window; the
    rest keep sorting behind every oracle-backed query.

    ``modified`` (r14 advice): a candidate whose last green row predates
    its last behavior change already re-fronts via check_order's group-1
    stale path — promoting it too would burn the round's single rotation
    slot on a query that was going to run anyway. Skip it so the slot
    falls to the next-stalest eligible row."""
    if modified is None:
        modified = {}
    cands = []
    for n in names:
        if n in oracle_names:
            continue
        entry = ledger.get(n)
        if isinstance(entry, int):
            entry = {"last": entry, "ok": True}
        if entry is None or not entry.get("ok", True):
            continue
        if entry.get("last", 0) < modified.get(n, 0):
            continue  # fingerprint-stale: re-fronts on its own
        cands.append((entry.get("last", 0), n))
    return min(cands)[1] if cands else None


def check_order(names, oracle_names, ledger, modified=None) -> list[str]:
    """Pure ordering kernel (exposed for tests): see module comment.

    ``ledger`` maps name -> ``{"first", "last", "ok"}`` (from
    ``_driver_ledger``); a bare int value is accepted as shorthand for
    a green row earned that round. ``modified`` maps name -> round of
    last behavior change (defaults to ``modified_map()``'s manual
    component, ``_MODIFIED_IN_ROUND``; ``queries()`` passes the full
    fingerprint-derived map): a green row OLDER than that round is
    stale evidence and re-fronts the query exactly like a missing row.
    The single stalest earned no-oracle row is promoted into the green
    rolling sweep (group 2) so rows-only liveness evidence also
    refreshes, one slot per round.
    """
    if modified is None:
        modified = _MODIFIED_IN_ROUND
    promoted = promoted_no_oracle(names, oracle_names, ledger, modified=modified)

    def key(n: str):
        entry = ledger.get(n)
        if isinstance(entry, int):
            entry = {"first": entry, "last": entry, "ok": True}
        stale = entry is not None and entry.get("last", 0) < modified.get(n, 0)
        if entry is None or stale or not entry.get("ok", True):
            # Never checked, checked before the last behavior change,
            # or latest row failed: needs (re)verification.
            return (0 if n in oracle_names else 1, _family_rank(n), n)
        if n not in oracle_names:
            if n == promoted:
                # Guaranteed HEAD of the rolling sweep (r16): sorting
                # the promoted row by its ledger round let a deep
                # oracle-stale backlog (42 r9 rows in r16) starve the
                # rotation slot indefinitely — the docstring's "one
                # slot per round" only held when the backlog was
                # thinner than the window. -1 sorts before any real
                # round, so the slot survives any backlog that leaves
                # the window a single free row.
                return (2, -1, n)
            return (3, entry["last"], n)
        return (2, entry["last"], n)

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
    from .ext import ann, corpus, dedup, embeddings, graph, inference, multimodal, pipeline, similarity, text, udfs  # noqa: F401


def queries() -> dict[str, QueryFn]:
    _load()
    order = check_order(
        _QUERIES, set(_ORACLES), _driver_ledger(), modified=modified_map()
    )
    return {name: _QUERIES[name] for name in order}


def oracles() -> dict[str, str]:
    _load()
    return dict(_ORACLES)
