#!/usr/bin/env python
"""Dump .explain("formatted") for registry queries to plans/r10/<q>_<tag>.txt.

Usage: python tools/dump_plans.py <before|after> name1,name2,...

For a query with ``internal_plan`` (multi-tick executions that return
literal frames), every internal plan is dumped under its stage label;
otherwise the query frame's own plan is dumped."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from analytics_data_platform_spark.queries import all_queries
from analytics_data_platform_spark.session import get_spark

OUT = Path(__file__).resolve().parent.parent / "plans" / "r10"


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="adps-dump-plans")
    OUT.mkdir(parents=True, exist_ok=True)
    registry = all_queries()
    for name in names:
        spec = registry[name]
        chunks: list[str] = []
        if spec.internal_plan is not None:
            for stage, df in spec.internal_plan(spark, sf_dir):
                chunks.append(
                    f"== internal stage: {stage} ==\n"
                    + df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                            "formatted"
                        )
                    )
                )
        else:
            df = spec.fn(spark, sf_dir)
            chunks.append(
                df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
            )
        p = OUT / f"{name}_{tag}.txt"
        p.write_text("\n\n".join(chunks))
        print(f"wrote {p}")


if __name__ == "__main__":
    main()
