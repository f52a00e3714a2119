#!/usr/bin/env python
"""Compute the driver-showcase window by VERIFICATION AGE.

With every registry query externally green at least once (round-8
verdict), the rotation rule becomes structural: the 50-slot window holds
(1) every query that has never PASSED a driver correctness window —
newly registered queries enter the round they land — then (2)
previously-passed queries OLDEST-external-confirmation-first (tie-break:
name), so no query's external verification goes stale longer than the
registry/50 rotation period (~5 rounds). tests/test_registry_gates.py
recomputes this exact set; this script prints the tuple to paste into
analytics_data_platform_spark/queries/__init__.py when the window moves.

Usage: python tools/rotate_showcase.py [max_round]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROOT = Path(__file__).resolve().parent.parent
WINDOW = 50
# the newest committed CORRECTNESS round the current window was computed
# from — bump when a new round's artifact lands and the window rotates
ROTATION_MAX_ROUND = 9


def last_passed_round(max_round: int) -> dict[str, int]:
    """query -> latest round whose driver window PASSED it (rows+schema+
    hash, no error). Mere appearance in a window does not count."""
    last: dict[str, int] = {}
    for r in range(1, max_round + 1):
        path = ROOT / f"CORRECTNESS_r{r:02d}.json"
        if not path.exists():
            continue
        for name, rec in json.loads(path.read_text()).items():
            if (
                rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
                and not rec.get("err")
            ):
                last[name] = r
    return last


def rotation(max_round: int) -> tuple[list[str], list[str]]:
    """(never_passed, oldest_first_backfill) for the next round's window."""
    from analytics_data_platform_spark.queries import all_queries

    names = set(all_queries())
    last = {n: r for n, r in last_passed_round(max_round).items() if n in names}
    never = sorted(names - set(last))
    backfill = sorted(last, key=lambda n: (last[n], n))[: WINDOW - len(never)]
    return never, backfill


def main() -> None:
    max_round = int(sys.argv[1]) if len(sys.argv) > 1 else ROTATION_MAX_ROUND
    never, backfill = rotation(max_round)
    print(f"# showcase window from CORRECTNESS_r01..r{max_round:02d}")
    print(f"# {len(never)} never-passed + {len(backfill)} oldest-verified")
    print("DRIVER_SHOWCASE: tuple[str, ...] = (")
    print("    # never PASSED a driver window (new registrations land here)")
    for n in never:
        print(f'    "{n}",')
    print("    # oldest external confirmation first (staleness-bounded rotation)")
    for n in backfill:
        print(f'    "{n}",')
    print(")")


if __name__ == "__main__":
    main()
