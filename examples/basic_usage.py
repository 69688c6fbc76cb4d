"""Basic usage tour of the engine — the reference's examples/basic_usage.py
re-expressed on this package (bootstrap → load → analytics → NL queries),
extended with the surfaces the reference lacks: maintenance, training
export, and the replica mirror.

Run:  python examples/basic_usage.py   (local[*], writes under /tmp)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocel_ocpn_lakehouse_spark.core import Catalog, PartitionSpec, SortOrder, TableSpec
from ocel_ocpn_lakehouse_spark.session import get_spark


def main() -> int:
    spark = get_spark("basic-usage")
    base = tempfile.mkdtemp(prefix="lakehouse_demo_")

    # 1. bootstrap: a bucketed, sort-ordered image+caption table
    print("=" * 70, "\n1. Bootstrap")
    from ocel_ocpn_lakehouse_spark.images.synth import IMAGE_SCHEMA, synth_images_df

    cat = Catalog(os.path.join(base, "wh"))
    t = cat.create_table(
        "ocel.images",
        IMAGE_SCHEMA,
        TableSpec(
            partition_spec=PartitionSpec.bucket("image_id", 4),
            sort_order=SortOrder.by("phash"),
        ),
    )
    t.append(synth_images_df(spark, 400, seed=1), num_files=8, distribution="fragment")
    print(f"table at {t.root}: {t.scan(spark).count()} rows,", len(t.live_entries()), "files")

    # 2. maintenance: compact + Z-order cluster, scan-equivalent
    print("=" * 70, "\n2. Maintenance (compact + cluster)")
    from ocel_ocpn_lakehouse_spark.maintenance.checkpoint import SystemTables
    from ocel_ocpn_lakehouse_spark.maintenance.cluster import execute_cluster
    from ocel_ocpn_lakehouse_spark.maintenance.compact import execute_compaction

    st = SystemTables(cat.warehouse)
    execute_compaction(spark, t.refresh(), st, "ocel.images")
    execute_cluster(spark, t.refresh(), st, "ocel.images", curve="zorder")
    print("files after:", len(t.refresh().live_entries()))

    # 3. analytics over the events table (any parquet source works)
    print("=" * 70, "\n3. Analytics + NL queries")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    from ocel_ocpn_lakehouse_spark.agent import ask

    for q in (
        "What are the most common process variants?",
        "Can you identify bottlenecks in the process?",
    ):
        intent, params, df = ask(spark, events, q)
        print(f"  {q!r} -> {intent}{params}: {df.count()} rows")

    from ocel_ocpn_lakehouse_spark.analytics.dashboard import executive_summary

    summary = executive_summary(events)
    print("  executive summary keys:", sorted(summary)[:5], "...")

    # 4. training export: aspect buckets -> batches -> WebDataset tars
    print("=" * 70, "\n4. Training export")
    from ocel_ocpn_lakehouse_spark.images.export import export_webdataset_job

    out = os.path.join(base, "export")
    # batches_per_shard sizes tars independently of the training batch:
    # 4 consecutive same-bucket 32-image batches per tar, batch ids in
    # the member names
    rep = export_webdataset_job(
        spark, cat, "ocel.images", out, batch_size=32, batches_per_shard=4
    )
    print(f"  {rep['exported']} tars ({rep['items']} items, "
          f"4 batches of 32 per tar) -> {out}")
    print(f"  manifest table: {rep['manifest_table']}")

    # 5. replica mirror via the row-level changelog
    print("=" * 70, "\n5. Replica mirror")
    from ocel_ocpn_lakehouse_spark.maintenance.replicate import sync_replica

    rep = sync_replica(spark, t.refresh(), cat, "ocel.images_mirror")
    print("  replica:", rep["status"], "-",
          cat.load_table("ocel.images_mirror").scan(spark).count(), "rows")

    # 6. Spark-native verbs: MoR upsert through the vanilla writer
    print("=" * 70, "\n6. Data source: merge-keys upsert")
    from pyspark.sql import functions as F

    from ocel_ocpn_lakehouse_spark.sources import register_lakehouse_source

    register_lakehouse_source(spark)
    # (the writer computes identity/date partitions pandas-side; a
    # bucket-partitioned table like ocel.images upserts via merge_into —
    # here a flat captions table takes the Spark-native verb)
    caps = t.refresh().scan(spark).select("image_id", "caption")
    ct = cat.create_table("ocel.captions", caps.schema)
    ct.append(caps)
    patch = caps.limit(16).withColumn(
        "caption", F.concat(F.lit("[edited] "), F.col("caption"))
    )
    patch.write.format("lakehouse").option("merge-keys", "image_id").mode(
        "append"
    ).save(ct.root)
    snap = ct.refresh().current_snapshot()
    print(f"  merge snapshot: tombstoned {snap.summary['tombstoned-rows']} rows, "
          f"upserted {snap.summary['upserted-rows']} -- zero data files rewritten")

    print("=" * 70, "\nDemo artifacts under", base)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
