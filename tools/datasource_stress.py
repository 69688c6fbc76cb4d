"""Quantify the Python data-source read path vs the native scan.

The `format("lakehouse")` source exists for COMPATIBILITY (Spark's four
verbs, SQL views, stream offsets); the native `Table.scan` remains the
performance path (JVM parquet reader, whole-stage codegen). This tool
measures both on the same table so the tradeoff is documented with a
number instead of a guess:

    python tools/datasource_stress.py [rows] [cpus]

Prints one JSON line: full-scan aggregate + pruned point-ish query via
both paths, warm best-of-3 each.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def best_of(fn, n=3):
    times = []
    for _ in range(n):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return round(min(times), 3)


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from pyspark.sql import functions as F

    from ocel_ocpn_lakehouse_spark.core import Catalog
    from ocel_ocpn_lakehouse_spark.session import get_spark
    from ocel_ocpn_lakehouse_spark.sources import register_lakehouse_source

    spark = get_spark("ds-stress", master=f"local[{cpus}]")
    register_lakehouse_source(spark)
    tmp = tempfile.mkdtemp(prefix="ds_stress_")
    cat = Catalog(os.path.join(tmp, "wh"))
    df = spark.range(rows).select(
        F.col("id"),
        (F.col("id") % 1000).alias("k"),
        F.md5(F.col("id").cast("string")).alias("payload"),
        (F.rand(seed=7) * 100).alias("x"),
    )
    t = cat.create_table("ns.stress", df.schema)
    t.append(df, num_files=cpus * 4)

    native_full = best_of(
        lambda: t.scan(spark).agg(F.sum("x"), F.count("*")).collect()
    )
    ds = spark.read.format("lakehouse").load(t.root)
    source_full = best_of(lambda: ds.agg(F.sum("x"), F.count("*")).collect())

    from ocel_ocpn_lakehouse_spark.core.table import PrunePredicate

    native_pruned = best_of(
        lambda: t.scan(spark, prune=[PrunePredicate("id", "<", 1000)])
        .filter(F.col("id") < 1000)
        .agg(F.count("*"))
        .collect()
    )
    source_pruned = best_of(
        lambda: spark.read.format("lakehouse")
        .load(t.root)
        .filter(F.col("id") < 1000)
        .agg(F.count("*"))
        .collect()
    )

    out = {
        "rows": rows,
        "cpus": cpus,
        "files": len(t.live_entries()),
        "native_full_scan_sec": native_full,
        "datasource_full_scan_sec": source_full,
        "full_scan_ratio": round(source_full / native_full, 2),
        "native_pruned_sec": native_pruned,
        "datasource_pruned_sec": source_pruned,
        "pruned_ratio": round(source_pruned / native_pruned, 2),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
