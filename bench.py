"""Benchmark harness (driver-run per round; see BASELINE.md).

Headline metric: compaction+cluster throughput (images/sec and GB/sec
rewritten) on the synthetic fragmented image table — the BASELINE.json
north metric — plus per-query latencies over $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line. Env knobs:
  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    (default 32)
  BENCH_IMG_ROWS      (default scaled to the sf dir)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from ocel_ocpn_lakehouse_spark.core import Catalog, PartitionSpec, SortOrder, TableSpec
from ocel_ocpn_lakehouse_spark.images.synth import IMAGE_SCHEMA, synth_images_df
from ocel_ocpn_lakehouse_spark.maintenance.checkpoint import SystemTables
from ocel_ocpn_lakehouse_spark.maintenance.cluster import execute_cluster
from ocel_ocpn_lakehouse_spark.maintenance.compact import execute_compaction
from ocel_ocpn_lakehouse_spark.queries import QUERIES
from ocel_ocpn_lakehouse_spark.session import get_spark

BENCH_QUERIES = [
    "q01_pricing_summary",
    "q06_join_orders_lineitem",
    "q08_three_way_join",
    "q12_dfg_transitions",
    "q16_variants",
    "q24_ngram_jaccard",
    "q25_minhash_lsh",
    "q27_ann_cosine_topk",
    "q29_text_quality",
    "q36_conformance",
    "q38_ocpn_arcs",
    "q39_embedding_neardup",
]


def image_maintenance_bench(spark, n_rows: int, n_files: int) -> dict:
    wh = tempfile.mkdtemp(prefix="bench_wh_")
    try:
        cat = Catalog(wh)
        t = cat.create_table(
            "bench.images",
            IMAGE_SCHEMA,
            TableSpec(
                partition_spec=PartitionSpec.bucket("image_id", 16),
                sort_order=SortOrder.by("phash"),
                properties={
                    "write.target-file-size-bytes": str(32 * 1024 * 1024),
                    "compact.small-file-bytes": str(8 * 1024 * 1024),
                },
            ),
        )
        t.append(
            synth_images_df(spark, n_rows=n_rows, seed=42),
            num_files=n_files,
            distribution="fragment",
        )
        st = SystemTables(cat.warehouse)

        def checksum():
            return (
                t.scan(spark)
                .agg(
                    F.sum(F.xxhash64(F.md5("bytes")).cast("decimal(38,0)")).alias("b"),
                    F.sum(F.xxhash64("caption").cast("decimal(38,0)")).alias("c"),
                    F.count("*").alias("n"),
                )
                .first()
            )

        base = checksum()
        total_bytes = sum(e.size_bytes for e in t.live_entries())

        t0 = time.time()
        execute_compaction(spark, t, st, "bench.images")
        t.refresh()
        execute_cluster(spark, t, st, "bench.images", curve="zorder")
        t.refresh()
        dt = time.time() - t0

        equivalent = checksum() == base
        return {
            "rows": n_rows,
            "bytes": total_bytes,
            "maintenance_sec": round(dt, 3),
            "images_per_sec": round(n_rows / dt, 1),
            "gb_per_sec": round(total_bytes / dt / 1e9, 4),
            "scan_equivalence": 1.0 if equivalent else 0.0,
        }
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    default_rows = {"0.001": 400, "0.01": 1500, "0.1": 8000}.get(sf, 4000)
    n_rows = int(os.environ.get("BENCH_IMG_ROWS", default_rows))

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    maint = image_maintenance_bench(spark, n_rows, n_files=max(16, n_rows // 125))

    queries = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).count()
        queries[name] = round(time.time() - t0, 3)

    out = {
        "metric": "compact+cluster throughput (images/sec) with scan-equivalence",
        "value": maint["images_per_sec"],
        "unit": "images/sec",
        "queries": queries,
        "sf": sf,
        "maintenance": maint,
        "cpus": cpus,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
