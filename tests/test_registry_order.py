"""Guards the driver-verification ordering policy in registry.py.

The external driver hash-checks only ``list(queries())[:50]`` per
round, so registration order IS coverage policy. Since round 4 the
order is COMPUTED from the ``CORRECTNESS_r*.json`` artifacts on disk
(round-3 verdict item 1); since round 6 the ledger tracks the LATEST
row per query so a failed row (hash mismatch / err) re-enters the
window immediately (round-5 verdict items 1-2): queries needing a
(re)check fill the window first, no-oracle queries may take a slot
only while they have no row at all, and once coverage is complete the
window becomes a rolling regression sweep re-checking the stalest
green rows. These tests stay green no matter which round's artifacts
are present — landing a new CORRECTNESS file rotates the order
automatically instead of breaking the suite.
"""

from __future__ import annotations

import json
import os

from proof_of_concept___cdc_w_iceberg_spark import registry

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER_WINDOW = 50


def _scan_artifacts() -> dict[int, dict]:
    out: dict[int, dict] = {}
    for fname in os.listdir(_REPO):
        if fname.startswith("CORRECTNESS_r") and fname.endswith(".json"):
            try:
                rnd = int(fname[len("CORRECTNESS_r") : -len(".json")])
            except ValueError:
                rnd = 0  # mirror registry._driver_ledger's tolerance
            with open(os.path.join(_REPO, fname)) as f:
                out[rnd] = json.load(f)
    return out


import functools


@functools.lru_cache(maxsize=1)
def _modified() -> dict:
    """One fingerprint sweep per test session — the map is only read
    here, never mutated, and recomputing it per query made this module
    ~100x slower for nothing."""
    return dict(registry.modified_map())


def _needs_check(name: str, ledger: dict) -> bool:
    entry = ledger.get(name)
    if entry is None or not entry["ok"]:
        return True
    # r12 verdict: a green row earned BEFORE the query's last behavior
    # change is stale evidence — the registry re-fronts it. Since r14
    # the map is fingerprint-derived (manual dict = override only).
    return entry["last"] < _modified().get(name, 0)


def _promoted() -> str | None:
    """The one earned no-oracle row the live order re-fronts (r13
    verdict item 4) — tests that assert earned rows-only rows sort
    last must carve out this single rotating slot."""
    registry._load()
    return registry.promoted_no_oracle(
        list(registry._QUERIES), set(registry._ORACLES),
        registry._driver_ledger(_REPO),
    )


def test_ledger_reads_artifacts() -> None:
    """registry's artifact reader agrees with an independent scan:
    every name present, earliest-round attribution, latest-row ok."""
    ledger = registry._driver_ledger(_REPO)
    arts = _scan_artifacts()
    every_name = {n for rows in arts.values() for n in rows}
    assert set(ledger) == every_name
    for name, entry in ledger.items():
        rounds_with = sorted(r for r, rows in arts.items() if name in rows)
        assert entry["first"] == rounds_with[0]
        assert entry["last"] == rounds_with[-1]
        assert entry["ok"] == registry._row_passed(arts[rounds_with[-1]][name])


def test_row_passed_semantics() -> None:
    green = {"rows_match": True, "schema_match": True, "hash_match": True,
             "spark_rows": 5, "oracle_rows": 5, "err": None}
    hash_fail = dict(green, hash_match=False)  # the q_herfindahl r05 shape
    errored = dict(green, err="boom", rows_match=None)
    rows_only = {"rows_match": None, "schema_match": None, "hash_match": None,
                 "spark_rows": 2, "oracle_rows": None, "err": "no_oracle"}
    rows_only_dead = dict(rows_only, spark_rows=None)
    assert registry._row_passed(green)
    assert not registry._row_passed(hash_fail)
    assert not registry._row_passed(errored)
    assert registry._row_passed(rows_only)
    assert not registry._row_passed(rows_only_dead)


def test_front_window_no_oracle_only_while_rowless() -> None:
    """No-oracle queries can only ever earn a one-time rows-only row:
    they may hold a front-window slot ONLY while they have no driver
    row at all; once earned, they sort behind every oracle-backed
    query forever."""
    qs = list(registry.queries())
    oracles = registry.oracles()
    ledger = registry._driver_ledger(_REPO)
    promoted = _promoted()
    front = qs[:DRIVER_WINDOW]
    bad = [
        q for q in front
        if q not in oracles and q in ledger and ledger[q]["ok"] and q != promoted
    ]
    assert not bad, f"earned rows-only queries holding front slots: {bad}"
    # And behind the front window they must never precede an
    # oracle-backed query anywhere in the tail (the single promoted
    # liveness slot excepted — it re-fronts by design).
    tail = qs[DRIVER_WINDOW:]
    earned_seen = False
    for q in tail:
        if q not in oracles and q in ledger and ledger[q]["ok"] and q != promoted:
            earned_seen = True
        elif q in oracles and earned_seen:
            raise AssertionError(
                f"oracle-backed {q} sorts behind an earned rows-only query"
            )


def test_front_window_prioritizes_needy() -> None:
    """While any oracle-backed query needs a (re)check — no row yet OR
    latest row failed — the front window must not waste slots
    re-checking green ones."""
    qs = list(registry.queries())
    oracles = registry.oracles()
    ledger = registry._driver_ledger(_REPO)
    needy = [q for q in qs if q in oracles and _needs_check(q, ledger)]
    if not needy:
        return  # full coverage achieved — rolling-regression order applies
    front = qs[:DRIVER_WINDOW]
    wasted = [q for q in front if not _needs_check(q, ledger)]
    assert len(wasted) <= max(0, DRIVER_WINDOW - len(needy)), (
        f"front window re-checks {wasted} while {len(needy)} queries "
        "need driver (re)verification"
    )


def test_failed_rows_refront() -> None:
    """A query whose LATEST driver row failed re-enters the front of
    the order even though an older round may have been green — with
    the real artifacts, q_herfindahl's r05 hash failure must put it in
    the next round's window."""
    ledger = registry._driver_ledger(_REPO)
    if "q_herfindahl" in ledger and not ledger["q_herfindahl"]["ok"]:
        qs = list(registry.queries())
        assert "q_herfindahl" in qs[:DRIVER_WINDOW], (
            "failed q_herfindahl row did not re-enter the driver window"
        )
    # Synthetic: green-then-failed sorts into group 0, ahead of green.
    names = ["a_green", "b_failed", "c_new"]
    oracle_names = set(names)
    ledger = {
        "a_green": {"first": 1, "last": 1, "ok": True},
        "b_failed": {"first": 1, "last": 5, "ok": False},
    }
    got = registry.check_order(names, oracle_names, ledger)
    assert got == ["b_failed", "c_new", "a_green"]


def test_green_oracle_queries_stalest_first() -> None:
    """Within the green oracle-backed group, stalest LATEST round comes
    first so full-coverage mode degrades into a rolling regression
    sweep."""
    qs = list(registry.queries())
    oracles = registry.oracles()
    ledger = registry._driver_ledger(_REPO)
    green_rounds = [
        ledger[q]["last"]
        for q in qs
        if q in oracles and q in ledger and not _needs_check(q, ledger)
    ]
    assert green_rounds == sorted(green_rounds)


def test_modified_since_check_refronts() -> None:
    """A green row earned before the query's last behavior change must
    re-front it (r12 verdict item 1): the three r12-modified queries
    sort into the driver window until a newer CORRECTNESS row lands,
    then drop back into the rolling order automatically."""
    # Synthetic kernel check: modified round > last green round → group
    # 0; a re-check at/after the modified round clears the pin.
    names = ["a_modified", "b_green", "c_recleared"]
    ledger = {
        "a_modified": {"first": 5, "last": 11, "ok": True},
        "b_green": {"first": 5, "last": 10, "ok": True},
        "c_recleared": {"first": 5, "last": 13, "ok": True},
    }
    modified = {"a_modified": 12, "c_recleared": 12}
    got = registry.check_order(names, set(names), ledger, modified=modified)
    assert got == ["a_modified", "b_green", "c_recleared"]
    # Live: every pinned query (fingerprint-derived or manual) whose
    # latest row predates its pin round must hold a front-window slot
    # right now.
    qs = list(registry.queries())
    live_ledger = registry._driver_ledger(_REPO)
    for name, rnd in registry.modified_map().items():
        entry = live_ledger.get(name)
        if entry is not None and entry["ok"] and entry["last"] >= rnd:
            continue  # pin already cleared by a newer driver row
        assert name in qs[:DRIVER_WINDOW], (
            f"behavior-modified {name} (pinned r{rnd}) missing from window"
        )


def test_needy_risk_families_first() -> None:
    """CDC composites guard the reference's core upsert semantics —
    they must be the first needy names to reach the driver."""
    qs = list(registry.queries())
    oracles = registry.oracles()
    ledger = registry._driver_ledger(_REPO)
    needy = [q for q in qs if q in oracles and _needs_check(q, ledger)]
    if not needy:
        return
    cdc = [q for q in needy if q.startswith("q_cdc_")]
    assert needy[: len(cdc)] == cdc, (
        "needy CDC queries must lead the driver window"
    )


def test_order_kernel_synthetic() -> None:
    """Pure-kernel check against a synthetic ledger: group order is
    needy-oracle < rowless-no-oracle < green-oracle(stalest first) <
    earned-rows-only(last). Bare-int ledger values mean green."""
    names = [
        "a_checked_r2", "b_checked_r1", "q_cdc_x", "q_text_y",
        "no_oracle_z", "no_oracle_earned", "q_failed_r3",
    ]
    oracle_names = {"a_checked_r2", "b_checked_r1", "q_cdc_x", "q_text_y",
                    "q_failed_r3"}
    ledger = {
        "a_checked_r2": 2,  # legacy int shorthand
        "b_checked_r1": {"first": 1, "last": 1, "ok": True},
        "no_oracle_earned": {"first": 2, "last": 2, "ok": True},
        "q_failed_r3": {"first": 3, "last": 3, "ok": False},
    }
    got = registry.check_order(names, oracle_names, ledger)
    # no_oracle_earned is the promoted liveness slot: key (2, -1, name)
    # — guaranteed HEAD of group 2 (r16: sorting it by its own round
    # let a deep oracle-stale backlog starve the rotation slot).
    assert got == [
        "q_cdc_x", "q_failed_r3", "q_text_y",  # group 0 (family rank, name)
        "no_oracle_z",                          # group 1
        "no_oracle_earned",                     # promoted: head of group 2
        "b_checked_r1", "a_checked_r2",         # group 2 stalest-first
    ]
    # With a second, staler earned no-oracle row, only the stalest one
    # is promoted; the other keeps sorting behind everything.
    names2 = names + ["no_oracle_stale"]
    ledger2 = dict(ledger, no_oracle_stale={"first": 1, "last": 1, "ok": True})
    got2 = registry.check_order(names2, oracle_names, ledger2)
    assert got2 == [
        "q_cdc_x", "q_failed_r3", "q_text_y",
        "no_oracle_z",
        "no_oracle_stale",                      # promoted (stalest earned)
        "b_checked_r1", "a_checked_r2",
        "no_oracle_earned",
    ]


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _names = st.lists(
        st.text(alphabet="abcdefgh_", min_size=1, max_size=8).map(lambda s: "q_" + s),
        min_size=1,
        max_size=30,
        unique=True,
    )

    @st.composite
    def _ledgers(draw):
        names = draw(_names)
        oracle_names = {n for n in names if draw(st.booleans())}
        ledger = {}
        for n in names:
            if draw(st.booleans()):
                first = draw(st.integers(min_value=1, max_value=5))
                last = draw(st.integers(min_value=first, max_value=6))
                ledger[n] = {"first": first, "last": last, "ok": draw(st.booleans())}
        return names, oracle_names, ledger

    @given(_ledgers())
    @settings(max_examples=200, deadline=None)
    def test_order_kernel_properties(case) -> None:
        """For ANY ledger shape: the order is a permutation; every query
        needing a (re)check precedes every green one; earned rows-only
        queries come after all oracle-backed queries; green oracle-backed
        queries are stalest-first."""
        from proof_of_concept___cdc_w_iceberg_spark.registry import (
            check_order,
            promoted_no_oracle,
        )

        names, oracle_names, ledger = case
        order = check_order(names, oracle_names, ledger)
        assert sorted(order) == sorted(names)
        promoted = promoted_no_oracle(names, oracle_names, ledger)

        def group(n):
            e = ledger.get(n)
            if e is None or not e["ok"]:
                return 0 if n in oracle_names else 1
            if n == promoted:
                return 2  # the one rotating rows-only liveness slot
            return 2 if n in oracle_names else 3

        groups = [group(n) for n in order]
        assert groups == sorted(groups), f"group order violated: {order}"
        # The promoted liveness row is the guaranteed HEAD of group 2
        # (r16: age-interleaving let a deep stale backlog starve the
        # slot); the oracle-backed remainder is stalest-first.
        g2 = [n for n in order if group(n) == 2]
        if promoted is not None:
            assert g2 and g2[0] == promoted
        green_rounds = [ledger[n]["last"] for n in g2 if n != promoted]
        assert green_rounds == sorted(green_rounds)
        # At most ONE earned no-oracle row ever escapes group 3, and it
        # is the stalest of them.
        if promoted is not None:
            earned = [
                (ledger[n]["last"], n)
                for n in names
                if n not in oracle_names and ledger.get(n, {"ok": False})["ok"]
            ]
            assert (ledger[promoted]["last"], promoted) == min(earned)

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_r07_rolling_sweep_fronts_round1_rows() -> None:
    """The coverage→regression transition (round-5 verdict item 10):
    simulate full coverage — every query green, with a synthetic r06
    greening everything still needy today — and assert the next window
    fronts the stalest (round-1) rows."""
    qs = registry.queries()
    oracles = registry.oracles()
    ledger = {
        n: dict(e) for n, e in registry._driver_ledger(_REPO).items()
    }
    for q in qs:
        if _needs_check(q, ledger):
            ledger[q] = {"first": 6, "last": 6, "ok": True}
        else:
            ledger[q]["ok"] = True
    order = registry.check_order(list(qs), set(oracles), ledger)
    r1 = sorted(
        q for q in qs
        if q in oracles and ledger[q]["last"] == 1
    )
    if not r1:
        return
    # The stalest oracle-backed rows lead the oracle-backed order (the
    # promoted rows-only liveness slot may interleave by its own round).
    front_oracle = [q for q in order if q in oracles][: len(r1)]
    assert sorted(front_oracle) == r1, (
        "full-coverage window must front the round-1 (stalest) rows"
    )
    # Earned rows-only queries sit at the very back — except the single
    # promoted liveness slot, which re-fronts by design.
    promoted = registry.promoted_no_oracle(list(qs), set(oracles), ledger)
    rows_only = [q for q in qs if q not in oracles and q != promoted]
    if rows_only:
        assert order[-len(rows_only):] == sorted(
            rows_only, key=lambda n: (ledger[n]["last"], n)
        )


def test_promoted_slot_skips_fingerprint_stale_candidate() -> None:
    """r14 advice: if the stalest earned rows-only query is ALSO
    fingerprint-stale it re-fronts through check_order's group-1 path on
    its own — promoting it would waste the round's single rotation slot.
    The slot must fall to the next-stalest eligible rows-only query."""
    names = ["q_or1", "q_no1", "q_no2"]
    oracle_names = {"q_or1"}
    ledger = {
        "q_or1": {"first": 1, "last": 5, "ok": True},
        "q_no1": {"first": 1, "last": 1, "ok": True},  # stalest, but edited in r6
        "q_no2": {"first": 2, "last": 2, "ok": True},
    }
    modified = {"q_no1": 6}
    promoted = registry.promoted_no_oracle(
        names, oracle_names, ledger, modified=modified
    )
    assert promoted == "q_no2", "slot must fall to the next-stalest eligible row"
    order = registry.check_order(names, oracle_names, ledger, modified=modified)
    # q_no1 re-fronts as group-1 stale evidence; q_no2 takes the promoted
    # group-2 slot and therefore precedes nothing it shouldn't — the full
    # order is: stale rows-only, then green oracle + promoted by round.
    assert order[0] == "q_no1"
    assert set(order[1:]) == {"q_or1", "q_no2"}
    # Without the modified map, the old behavior (q_no1 promoted) holds.
    assert (
        registry.promoted_no_oracle(names, oracle_names, ledger) == "q_no1"
    )


def test_modified_pins_name_real_queries() -> None:
    """Typo guard: every _MODIFIED_IN_ROUND pin must name a registered
    query — a misspelled pin would silently protect nothing."""
    qs = registry.queries()
    unknown = [n for n in registry._MODIFIED_IN_ROUND if n not in qs]
    assert not unknown, f"pins for unregistered queries: {unknown}"


# --- per-query source fingerprints (r13 verdict item 2) ----------------


def test_fingerprint_kernel() -> None:
    """Pure kernel: bootstrap stamps since=0 (trust existing greens);
    a changed fingerprint stamps since=next_round and enters the
    modified map; an unchanged one keeps its recorded since; a dropped
    query marks the file dirty."""
    cur = {"a": "fp_a1", "b": "fp_b", "c": "fp_c"}
    rec = {
        "a": {"fp": "fp_a0", "since": 3},   # edited since last record
        "b": {"fp": "fp_b", "since": 9},    # unchanged, pin still pending
        "gone": {"fp": "fp_g", "since": 0}, # renamed/deleted query
    }
    mod, upd, changed = registry.fingerprint_modified(cur, rec, 14)
    assert mod == {"a": 14, "b": 9}
    assert upd["a"] == {"fp": "fp_a1", "since": 14}
    assert upd["b"] == {"fp": "fp_b", "since": 9}
    assert upd["c"] == {"fp": "fp_c", "since": 0}  # bootstrap
    assert "gone" not in upd and changed

    # Steady state: nothing edited, nothing pending -> no write needed.
    mod2, upd2, changed2 = registry.fingerprint_modified(
        {"c": "fp_c"}, {"c": {"fp": "fp_c", "since": 0}}, 14
    )
    assert mod2 == {} and upd2 == {"c": {"fp": "fp_c", "since": 0}}
    assert not changed2


def test_fingerprint_in_memory_mutation_refronts(tmp_path, monkeypatch) -> None:
    """The r13 verdict's done-criterion: mutate a query body in memory
    and assert it re-fronts with NO manual dict entry. Uses an isolated
    repo root so the real QUERY_FINGERPRINTS.json is untouched."""
    registry._load()
    green = {"rows_match": True, "schema_match": True, "hash_match": True,
             "spark_rows": 5, "oracle_rows": 5, "err": None}
    with open(tmp_path / "CORRECTNESS_r07.json", "w") as f:
        json.dump({n: dict(green) for n in registry._QUERIES}, f)
    monkeypatch.setattr(registry, "_repo_root", lambda: str(tmp_path))
    # Neutralize any legitimate manual override entries for the round
    # in flight — this test proves the MECHANISM re-fronts on its own.
    monkeypatch.setattr(registry, "_MODIFIED_IN_ROUND", {})

    # First load records the current fingerprints (bootstrap): all
    # green at r7, nothing modified -> nothing fronts.
    assert registry.modified_map() == {}
    ledger = registry._driver_ledger(str(tmp_path))

    def impostor(spark, sf_dir):  # a different body => different source
        return None

    monkeypatch.setitem(registry._RAW_FNS, "q_filter_eq", impostor)
    mod = registry.modified_map()
    assert mod == {"q_filter_eq": 8}  # latest artifact r7 -> next round
    order = registry.check_order(
        registry._QUERIES, set(registry._ORACLES), ledger, modified=mod
    )
    assert order[0] == "q_filter_eq", (
        "edited query body must re-front without a manual pin"
    )
    # Self-clearing: a green row at/after the stamped round ends it.
    ledger2 = dict(ledger, q_filter_eq={"first": 7, "last": 8, "ok": True})
    order2 = registry.check_order(
        registry._QUERIES, set(registry._ORACLES), ledger2, modified=mod
    )
    assert order2[0] != "q_filter_eq"
    assert order2.index("q_filter_eq") > order2.index(order[1])


def test_fingerprint_stale_process_guard() -> None:
    """Found live in r14: a long-running process whose module was
    edited on disk reads the WRONG source block (import-time line
    numbers against the new file) and would persist bogus fingerprints
    for every function below the edit — six sketch queries spuriously
    re-fronted. The guard: a block that doesn't define the function
    yields fp=None, and the kernel preserves the recorded entry
    verbatim instead of writing a guess."""
    registry._load()
    fn = registry._RAW_FNS["q_filter_eq"]
    assert registry._fingerprint(fn, None) is not None
    # A function whose source block does not contain its own def is
    # exactly what the stale process sees after an upstream edit:
    # getsource succeeds but returns a foreign block.
    renamed = type(fn)(
        fn.__code__, fn.__globals__, "not_the_real_name",
        fn.__defaults__, fn.__closure__,
    )
    assert registry._fingerprint(renamed, None) is None

    # Kernel: fp=None + existing record -> record preserved, pin kept,
    # nothing marked changed; fp=None + no record -> left unrecorded.
    rec = {"a": {"fp": "fp_a", "since": 12}}
    mod, upd, changed = registry.fingerprint_modified(
        {"a": None, "b": None}, rec, 14
    )
    assert upd == {"a": {"fp": "fp_a", "since": 12}}
    assert mod == {"a": 12}
    assert not changed


try:
    from hypothesis import given as _fp_given
    from hypothesis import settings as _fp_settings
    from hypothesis import strategies as _fp_st

    _fp_names = _fp_st.lists(
        _fp_st.text(alphabet="abcxyz_", min_size=1, max_size=6),
        min_size=0, max_size=12, unique=True,
    )

    @_fp_st.composite
    def _fp_cases(draw):
        names = draw(_fp_names)
        current = {
            n: draw(_fp_st.sampled_from([None, "fp_" + n, "fp2_" + n]))
            for n in names
        }
        recorded = {}
        for n in names:
            if draw(_fp_st.booleans()):
                recorded[n] = {
                    "fp": draw(_fp_st.sampled_from(["fp_" + n, "old_" + n])),
                    "since": draw(_fp_st.integers(min_value=0, max_value=13)),
                }
        # plus a dropped/renamed query record
        if draw(_fp_st.booleans()):
            recorded["gone_query"] = {"fp": "fp_gone", "since": 2}
        return current, recorded

    @_fp_given(_fp_cases())
    @_fp_settings(max_examples=200, deadline=None)
    def test_fingerprint_kernel_properties(case) -> None:
        """For ANY (current, recorded) shape: (a) every non-None
        current fingerprint is recorded verbatim in the output; (b) a
        None fingerprint never creates or alters a record; (c) the
        modified map stamps exactly the changed names with next_round
        and otherwise carries recorded pending pins; (d) the kernel is
        IDEMPOTENT — feeding its own output back produces no change
        and the same map."""
        current, recorded = case
        mod, upd, _changed = registry.fingerprint_modified(current, recorded, 14)
        for n, fp in current.items():
            if fp is None:
                if isinstance(recorded.get(n), dict) and recorded[n].get("fp"):
                    assert upd[n] == recorded[n]
                else:
                    assert n not in upd
            else:
                assert upd[n]["fp"] == fp
                rec = recorded.get(n)
                if not isinstance(rec, dict) or rec.get("fp") is None:
                    assert upd[n]["since"] == 0 and n not in mod
                elif rec["fp"] != fp:
                    assert upd[n]["since"] == 14 and mod[n] == 14
                else:
                    assert upd[n]["since"] == rec["since"]
                    assert mod.get(n, 0) == rec["since"] or rec["since"] == 0
        assert "gone_query" not in upd
        # Idempotence over the persisted output.
        mod2, upd2, changed2 = registry.fingerprint_modified(current, upd, 14)
        assert upd2 == upd and mod2 == mod and not changed2

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_fingerprint_file_matches_live_registry() -> None:
    """The committed QUERY_FINGERPRINTS.json must cover every
    registered query and agree with the live source — a drifted record
    here means a query was edited without the registry ever loading
    (e.g. a hand-edit committed without running tests), which would
    defeat the mechanism at the driver."""
    registry._load()
    with open(os.path.join(_REPO, registry._FINGERPRINT_FILE)) as f:
        recorded = json.load(f)
    assert set(recorded) == set(registry._QUERIES)
    latest = registry._latest_artifact_round(_REPO)
    for name, rec in recorded.items():
        live = registry._fingerprint(
            registry._RAW_FNS[name], registry._ORACLES.get(name)
        )
        assert rec["fp"] == live, f"{name}: stale fingerprint record"
        assert 0 <= rec["since"] <= latest + 1
