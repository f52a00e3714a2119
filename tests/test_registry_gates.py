"""Structural registration gates — no Spark session, sub-second.

The r04 incident: a query was registered in the final commit without
re-running the plan sweep, so ``tests/shuffle_ledger.json`` went stale and
the suite shipped red. These gates fail AT REGISTRATION TIME (cheap, run
by ``tools/preflight.py`` and every pytest invocation) instead of
plan-sweep time (2-minute Spark job), making that failure mode impossible
to miss even on a hurried commit.
"""

from __future__ import annotations

import json
from pathlib import Path

from analytics_data_platform_spark.queries import all_queries

LEDGER = Path(__file__).parent / "shuffle_ledger.json"


def test_registry_matches_shuffle_ledger():
    """set(all_queries()) == set(shuffle_ledger) — registering a query
    without regenerating the ledger (or vice versa) fails HERE in
    milliseconds, not two minutes into the plan sweep."""
    ledger = json.loads(LEDGER.read_text())
    names = set(all_queries())
    missing = sorted(names - set(ledger))
    stale = sorted(set(ledger) - names)
    assert not missing, (
        f"queries registered but missing from tests/shuffle_ledger.json: {missing} — "
        "run SPARK_GRAFT_REGEN_LEDGER=1 python -m pytest tests/test_plan_audit.py -k sweep"
    )
    assert not stale, f"stale shuffle-ledger entries (query no longer registered): {stale}"


def test_every_query_has_oracle_or_documented_weak():
    """Every registered query must carry an oracle SQL, or be explicitly
    tagged weak (rows-only driver check) so the gap is a decision, not an
    accident."""
    offenders = [
        name
        for name, spec in all_queries().items()
        if not (spec.oracle and spec.oracle.strip()) and "weak" not in spec.tags
    ]
    assert not offenders, f"queries with no oracle SQL and no 'weak' tag: {offenders}"


def test_registry_count_is_documented():
    """One authoritative count: the number in REGISTRY_COUNT.txt is written
    by tools/preflight.py and referenced by STATUS.md/SCALE.md instead of
    hand-maintained numbers (the r04 docs drift: 259 vs 250 vs 261)."""
    path = Path(__file__).parent.parent / "REGISTRY_COUNT.txt"
    assert path.exists(), "run tools/preflight.py to write REGISTRY_COUNT.txt"
    assert int(path.read_text().strip()) == len(all_queries()), (
        f"REGISTRY_COUNT.txt says {path.read_text().strip()} but the registry has "
        f"{len(all_queries())} — run tools/preflight.py"
    )


def test_multi_tick_queries_have_internal_plans_and_sentinel_ledger():
    """Multi-tick queries return materialized literal frames, whose final
    plan shows 0 exchanges — a ledger blind spot. The gate: every query
    tagged ``multi_tick`` must carry an ``internal_plan`` (the sweep
    audits the representative tick plans), its ledger entry must be the
    ``materialized:<n>`` sentinel (a bare 0 means the sweep audited the
    empty literal plan and saw nothing), and vice versa — an internal
    plan without the tag would silently skip the showcase/backfill
    bookkeeping that keys off tags."""
    ledger = json.loads(LEDGER.read_text())
    for name, spec in all_queries().items():
        tagged = "multi_tick" in spec.tags
        assert tagged == (spec.internal_plan is not None), (
            f"{name}: multi_tick tag and internal_plan must come together"
        )
        if tagged:
            v = ledger.get(name)
            assert isinstance(v, str) and v.startswith("materialized:"), (
                f"{name}: multi-tick ledger entry must be the "
                f"'materialized:<n>' sentinel, got {v!r} — regen the ledger"
            )


def _previously_passed() -> set[str]:
    """Queries that PASSED some driver correctness window up to r07 —
    rows_match AND schema_match AND hash_match with no error. Mere
    *appearance* in a window does not count (the r2 lesson: event_runs_rle
    appeared and FAILED, yet the old union-of-keys definition counted it
    as gated). Hardcoded round range: the rotation contract below is
    pinned against THESE rounds; when a new window lands, the next round's
    rotation extends this list with it."""
    root = Path(__file__).parent.parent
    passed: set[str] = set()
    for r in (1, 2, 3, 4, 5, 6, 7):
        path = root / f"CORRECTNESS_r0{r}.json"
        if not path.exists():
            continue
        for name, rec in json.loads(path.read_text()).items():
            if (
                rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
                and not rec.get("err")
            ):
                passed.add(name)
    return passed


def test_driver_showcase_round8_rotation():
    """Round-8 rotation contract — external gating means PASSING:

    1. every registry query that has never PASSED an r01-r07 window must
       be in the showcase (this is also the 'gated the round it lands'
       rule: a newly registered query immediately becomes never-passed,
       so registering one without adding it to the showcase fails HERE,
       structurally, instead of being noticed a round later);
    2. the only previously-passed queries allowed in the window are the
       pinned scale-critical re-confirmation slots (SHOWCASE_BACKFILL).
    """
    from analytics_data_platform_spark.queries import (
        DRIVER_SHOWCASE,
        SHOWCASE_BACKFILL,
        all_queries,
    )

    assert len(DRIVER_SHOWCASE) == 50
    assert len(set(DRIVER_SHOWCASE)) == 50
    passed = _previously_passed()
    never = set(all_queries()) - passed
    missing = sorted(never - set(DRIVER_SHOWCASE))
    assert not missing, (
        f"queries never PASSED a driver window (r01-r07) and not in the round-8 "
        f"showcase: {missing} — every new registration must enter DRIVER_SHOWCASE "
        "the round it lands"
    )
    stray = sorted((set(DRIVER_SHOWCASE) & passed) - set(SHOWCASE_BACKFILL))
    assert not stray, (
        f"previously-passed showcase entries outside the pinned backfill list: {stray}"
    )
    assert set(SHOWCASE_BACKFILL) <= passed, "backfill entries must be previously PASSED"
