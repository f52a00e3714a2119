"""``elt`` command-line interface (reference: elt-common/src/elt_common/cli.py:50-75).

Subcommands:
  elt list <project-root>          discovered jobs
  elt run  <project-root> <job>    run one ingestion job end-to-end
  elt maintain <namespace...>      table maintenance over namespaces
      [--snapshot-warehouse D]     + snapshot procedures per table
      [--indexes D]                + serving-index fleet maintenance
                                   (heal/resume/apply-deletes/compact)
  elt query <name|list> [--sf-dir D] [--explain] [--limit N]
                                   run/inspect a registry query ad hoc

``elt run`` wires: manifest discovery → dynamic import → Extract
instantiation from ``{JOB}__*`` env config → incremental runner against
the job's ``{domain}_{job}`` namespace.
"""

from __future__ import annotations

import argparse
import sys

from analytics_data_platform_spark.elt.pipeline import (
    discover_jobs,
    find_job,
    job_env_config,
    load_extract_class,
)
from analytics_data_platform_spark.elt.runner import run_ingest
from analytics_data_platform_spark.session import get_spark


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="elt", description="PySpark ELT runner")
    sub = p.add_subparsers(dest="command", required=True)

    p_list = sub.add_parser("list", help="list discovered ingestion jobs")
    p_list.add_argument("project_root")

    p_run = sub.add_parser("run", help="run one ingestion job")
    p_run.add_argument("project_root")
    p_run.add_argument("job")
    p_run.add_argument("--namespace", help="override target namespace")

    p_m = sub.add_parser("maintain", help="run table maintenance")
    p_m.add_argument("namespaces", nargs="*", default=[])
    p_m.add_argument("--retention-days", type=int, default=7)
    p_m.add_argument("--target-file-mb", type=int, default=128)
    p_m.add_argument(
        "--snapshot-warehouse",
        default=None,
        help="also run the four snapshot procedures (binpack/manifests/"
        "expire/orphans) over every snapshot table under this directory",
    )
    p_m.add_argument("--keep-last", type=int, default=3,
                     help="snapshots to retain per table (snapshot warehouse)")
    p_m.add_argument(
        "--indexes",
        default=None,
        help="also maintain every serving index (SearchIndex/VectorIndex) "
        "discovered under this root: heal torn swaps, resume torn segment "
        "merges, materialize pending deletes, compact small files",
    )
    p_m.add_argument("--index-min-files", type=int, default=2,
                     help="compact an index bucket/cell at this many files")
    p_m.add_argument(
        "--grow-target-mb", type=int, default=None,
        help="grow index capacity when the average bucket/cell exceeds "
        "this size: reshard/retrain to the smallest power-of-two multiple "
        "that brings it back under (sq8 vector tiers are reported and "
        "skipped)",
    )

    p_q = sub.add_parser("query", help="run a registry query (or 'list')")
    p_q.add_argument("name", help="query name from the registry, or 'list'")
    p_q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p_q.add_argument("--limit", type=int, default=20)
    p_q.add_argument("--explain", action="store_true", help="print the formatted physical plan instead of rows")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    if args.command == "list":
        for j in discover_jobs(args.project_root):
            print(f"{j.warehouse}\t{j.domain}\t{j.name}\t{j.namespace}")
        return 0

    if args.command == "run":
        manifest = find_job(args.project_root, args.job)
        extract_cls = load_extract_class(manifest)
        config = job_env_config(manifest.name)
        spark = get_spark(app_name=f"elt-{manifest.namespace}", persistent_catalog=True)
        extract = extract_cls(**config) if config else extract_cls()
        stats = run_ingest(spark, extract, args.namespace or manifest.namespace)
        for table, r in stats.resources.items():
            wm = f" watermark={r.watermark.to_json()}" if r.watermark else ""
            print(f"{table}: {r.rows} rows in {r.chunks} chunks{wm}")
        return 0

    if args.command == "maintain":
        from analytics_data_platform_spark.tables.maintenance import run_maintenance

        spark = get_spark(app_name="elt-maintenance", persistent_catalog=True)
        if args.namespaces:
            for line in run_maintenance(
                spark,
                namespaces=args.namespaces,
                retention_days=args.retention_days,
                target_file_mb=args.target_file_mb,
            ):
                print(line)
        if args.snapshot_warehouse:
            from analytics_data_platform_spark.tables.snapshot_io import (
                maintain_snapshot_warehouse,
            )

            for line in maintain_snapshot_warehouse(
                spark,
                args.snapshot_warehouse,
                keep_last=args.keep_last,
                target_file_mb=args.target_file_mb,
            ):
                print(line)
        if args.indexes:
            from analytics_data_platform_spark.tables.maintenance import (
                maintain_index_fleet,
            )

            for line in maintain_index_fleet(
                spark,
                args.indexes,
                min_files=args.index_min_files,
                grow_target_mb=args.grow_target_mb,
            ):
                print(line)
        return 0

    if args.command == "query":
        from analytics_data_platform_spark.queries import all_queries

        qs = all_queries()
        if args.name == "list":
            for n, spec in qs.items():
                print(f"{n}\t{spec.doc}")
            return 0
        if args.name not in qs:
            print(f"unknown query {args.name!r}; try 'elt query list'", file=sys.stderr)
            return 1
        spark = get_spark(app_name=f"query-{args.name}")
        df = qs[args.name].fn(spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        else:
            df.show(args.limit, truncate=False)
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
