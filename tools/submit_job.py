"""Production maintenance job entrypoint for ``spark-submit --py-files``.

The north rule requires the engine to ship as a spark-submit job runnable
on a multi-executor cluster. This is that job: it imports the package from
the ``--py-files`` zip (NOT from a checkout — the test runs it from a
neutral cwd with no PYTHONPATH to prove it), builds or opens a table, runs
the requested maintenance op through the same entrypoints the CLI uses,
and prints ONE JSON line for the orchestrator.

  spark-submit --master <cluster> \
    --py-files ocel_ocpn_lakehouse_spark.zip \
    tools/submit_job.py --warehouse s3://wh --op rewrite [--rows N]

On a cluster, omit --master here and let spark-submit supply it; every
setting the session factory applies is cluster-safe (session.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--op", default="rewrite", choices=["rewrite", "compact", "full"])
    ap.add_argument("--rows", type=int, default=0, help="synth a fragmented table first")
    ap.add_argument("--files", type=int, default=0)
    args = ap.parse_args()

    # resolved from the --py-files zip
    from pyspark.sql import SparkSession

    from ocel_ocpn_lakehouse_spark.core import Catalog, PartitionSpec, SortOrder, TableSpec
    from ocel_ocpn_lakehouse_spark.images.synth import IMAGE_SCHEMA, synth_images_df
    from ocel_ocpn_lakehouse_spark.maintenance.checkpoint import SystemTables
    from ocel_ocpn_lakehouse_spark.maintenance.cluster import execute_cluster
    from ocel_ocpn_lakehouse_spark.maintenance.compact import execute_compaction

    spark = SparkSession.builder.appName("lakehouse-maintenance").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    cat = Catalog(args.warehouse)
    name = "ocel.images"
    if args.rows:
        t = cat.create_table(
            name,
            IMAGE_SCHEMA,
            TableSpec(
                partition_spec=PartitionSpec.bucket("image_id", 4),
                sort_order=SortOrder.by("phash"),
                properties={
                    "write.target-file-size-bytes": str(8 * 1024 * 1024),
                    "compact.small-file-bytes": str(2 * 1024 * 1024),
                },
            ),
        )
        t.append(
            synth_images_df(spark, n_rows=args.rows, seed=7),
            num_files=args.files or max(8, args.rows // 50),
            distribution="fragment",
        )
    else:
        t = cat.load_table(name)

    st = SystemTables(cat.warehouse)
    files_before = len(t.live_entries())
    base = t.scan(spark).selectExpr(
        "count(*) AS n",
        "sum(cast(xxhash64(md5(bytes)) AS decimal(38,0))) AS b",
        "sum(cast(xxhash64(caption) AS decimal(38,0))) AS c"
    ).first()

    t0 = time.time()
    if args.op in ("compact", "full"):
        res = execute_compaction(spark, t, st, name)
        t.refresh()
    if args.op in ("rewrite", "full"):
        res = execute_cluster(spark, t, st, name, curve="zorder")
        t.refresh()
    dt = time.time() - t0

    after = t.scan(spark).selectExpr(
        "count(*) AS n",
        "sum(cast(xxhash64(md5(bytes)) AS decimal(38,0))) AS b",
        "sum(cast(xxhash64(caption) AS decimal(38,0))) AS c"
    ).first()
    out = {
        "status": res["status"],
        "op": args.op,
        "files_before": files_before,
        "files_after": len(t.live_entries()),
        "rows": after["n"],
        "scan_equivalence": bool(tuple(base) == tuple(after)),
        "maintenance_sec": round(dt, 3),
        "package_origin": __import__("ocel_ocpn_lakehouse_spark").__file__,
    }
    print(json.dumps(out))
    return 0 if out["scan_equivalence"] else 1


if __name__ == "__main__":
    sys.exit(main())
