#!/usr/bin/env python
"""Capture .explain('formatted') for registry queries into plans/<round>/.

Usage: python tools/capture_plan.py <suffix> <query> [<query> ...]
Writes plans/r10/<query>_<suffix>.txt for each named query.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = Path(__file__).resolve().parent.parent / "plans" / os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r11")


def main() -> None:
    suffix, names = sys.argv[1], sys.argv[2:]
    from analytics_data_platform_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark(app_name="adps-capture-plan")
    qs = E.queries()
    OUT.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = OUT / f"{name}_{suffix}.txt"
        path.write_text(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
