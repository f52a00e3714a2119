#!/usr/bin/env python
"""Benchmark harness: runs the headline query set and prints ONE JSON line.

Env:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default all cores)

Each query is materialized with the noop DataSourceV2 sink — full plan
execution (scan → shuffle → compute) without driver-side collect, which is
how the query would behave feeding a real table write.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from analytics_data_platform_spark.queries import all_queries
from analytics_data_platform_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)
    spark = get_spark(app_name="adps-bench")
    specs = {n: s for n, s in all_queries().items() if s.bench}

    timings: dict[str, float] = {}
    # one warmup pass on the smallest query to absorb JVM/codegen startup
    warm = specs.get("q6_forecast_revenue") or next(iter(specs.values()))
    warm.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # per-query time = min of 2 runs (steady state: the first run carries
    # one-off plan-compile/codegen cost, and local[32] wall-clock jitters
    # ±15% run-to-run); total = sum of the reported per-query times
    for name, spec in sorted(specs.items()):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    total = round(sum(timings.values()), 3)

    # non-gating breadth section: the engine's real heavyweights (pipeline,
    # streaming, ANN, incremental refresh) under-represented by the r1
    # headline set — recorded per round so regressions in the heavy
    # families are visible without moving the 2x-envelope goalposts
    # (`value` stays the original 12-query total). One run each: these are
    # multi-stage executions with their own internal writes, where a min-of-2
    # mostly measures page-cache warmth.
    heavy: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_HEAVY", "1") != "0":
        registry = all_queries()
        for name in (
            "training_pipeline_manifest",
            "incremental_pipeline_refresh",
            "streaming_interval_join_stats",
            "ivf_pq_adc_topk",
        ):
            t0 = time.perf_counter()
            registry[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            heavy[name] = round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "heavy": heavy,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
