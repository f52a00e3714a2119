#!/usr/bin/env python
"""Per-query wall-clock sweep over the full registry — the profiling loop.

Usage:
    python tools/time_sweep.py [sf_dir] [name_substring ...]

Prints one line per query (slowest first) and a total. Each query is
materialized with the noop sink (full plan execution, no driver collect),
mirroring bench.py. Single run per query — this is a profiler, not the
benchmark; rerun a suspect query to separate plan-compile cost from
steady-state.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from analytics_data_platform_spark.queries import all_queries
from analytics_data_platform_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and args[0].startswith("/") else "/root/testdata/sf0.1"
    frags = [a for a in args if not a.startswith("/")]
    spark = get_spark(app_name="adps-sweep")
    specs = all_queries()
    if frags:
        specs = {n: s for n, s in specs.items() if any(f in n for f in frags)}
    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name, spec in specs.items():
        t0 = time.perf_counter()
        try:
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = time.perf_counter() - t0
        except Exception as e:  # keep sweeping; report at the end
            failures[name] = f"{type(e).__name__}: {e}"[:200]
        print(f"{timings.get(name, -1.0):8.3f}  {name}", flush=True)
    print("\n=== slowest first ===")
    for name, t in sorted(timings.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{t:8.3f}  {name}")
    print(f"\ntotal {sum(timings.values()):.1f} s over {len(timings)} queries")
    for name, err in failures.items():
        print(f"FAIL {name}: {err}")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
