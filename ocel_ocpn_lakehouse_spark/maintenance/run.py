"""T11 — maintenance orchestration CLI (the spark-submit surface).

    spark-submit --py-files ocel_ocpn_lakehouse_spark.zip \
        -m ocel_ocpn_lakehouse_spark.maintenance.run \
        --warehouse /path/wh --table ocel.images --op full

or locally: ``python -m ocel_ocpn_lakehouse_spark.maintenance.run ...``.

Flow per table (reference: ops/maintenance_system.py:231-290,364-440):
analyze (metadata-only) → plan → execute (compact / cluster / expire) →
verify (quality gate) → lineage metrics. ``--op synth`` bootstraps a
deterministic fragmented image table for demos/benchmarks.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="lakehouse-maintain")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--table", default="ocel.images")
    ap.add_argument(
        "--op",
        default="full",
        choices=["health", "compact", "cluster", "expire", "quality", "full", "synth", "orphans"],
    )
    ap.add_argument("--curve", default="zorder", choices=["zorder", "hilbert"])
    ap.add_argument("--rows", type=int, default=5000, help="synth rows")
    ap.add_argument("--files", type=int, default=64, help="synth fragment files")
    ap.add_argument("--retention-days", type=float, default=None)
    ap.add_argument("--keep-last", type=int, default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from ..core import Catalog, PartitionSpec, SortOrder, TableSpec
    from ..session import get_spark
    from .checkpoint import SystemTables
    from .cluster import execute_cluster
    from .compact import execute_compaction, plan_compaction
    from .expire import expire_snapshots, retention_analysis, sweep_orphans
    from .health import analyze_table_health, maintenance_schedule
    from .quality import quality_report

    spark = get_spark("lakehouse-maintain", master=args.master)
    cat = Catalog(args.warehouse)
    sys_tables = SystemTables(cat.warehouse)
    report: dict = {"table": args.table, "op": args.op}

    if args.op == "synth":
        from ..images.synth import IMAGE_SCHEMA, synth_images_df

        if not cat.table_exists(args.table):
            cat.create_table(
                args.table,
                IMAGE_SCHEMA,
                TableSpec(
                    partition_spec=PartitionSpec.bucket("image_id", 16),
                    sort_order=SortOrder.by("phash"),
                    properties={
                        # scaled-down thresholds for local demo data
                        "write.target-file-size-bytes": str(8 * 1024 * 1024),
                        "compact.small-file-bytes": str(2 * 1024 * 1024),
                    },
                ),
            )
        t = cat.load_table(args.table)
        df = synth_images_df(spark, n_rows=args.rows)
        t.append(df, num_files=args.files, distribution="fragment")
        report["rows"] = args.rows
        report["files"] = len(t.live_entries())
        print(json.dumps(report))
        return 0

    t = cat.load_table(args.table)

    if args.op in ("health", "full"):
        h = analyze_table_health(spark, t, args.table)
        report["health"] = h.to_dict()
        report["schedule"] = maintenance_schedule(h.health_score)
        report["retention"] = retention_analysis(t)

    if args.op in ("compact", "full"):
        plan = plan_compaction(t)
        report["compaction_plan_groups"] = len(plan)
        report["compaction"] = execute_compaction(
            spark, t, sys_tables, args.table, groups=plan
        )

    if args.op in ("cluster", "full"):
        report["cluster"] = execute_cluster(
            spark, t.refresh(), sys_tables, args.table, curve=args.curve
        )

    if args.op == "expire":
        report["expire"] = expire_snapshots(
            spark,
            t,
            sys_tables,
            args.table,
            retention_days=args.retention_days,
            keep_last=args.keep_last,
        )

    if args.op == "orphans":
        report["orphans"] = sweep_orphans(t)

    if args.op in ("quality", "full"):
        report["quality"] = quality_report(t.refresh().scan(spark))

    print(json.dumps(report, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
