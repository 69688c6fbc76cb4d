"""Capstone: the whole engine composed as a user would run it.

One table travels the full pipeline — streaming exactly-once deduplicated
ingest → perceptual dedup maintenance (MoR tombstones) → fused
compact+cluster rewrite (scan-equivalent) → resumable WebDataset export →
append → INCREMENTAL export → changelog replica mirror → snapshot expiry —
with each stage's invariant checked against the previous stage's state.
Every call is the public library/CLI surface; nothing reaches into
internals except to assert.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocel_ocpn_lakehouse_spark.core import Catalog, PartitionSpec, SortOrder, TableSpec
from ocel_ocpn_lakehouse_spark.functions import hamming_index as HI
from ocel_ocpn_lakehouse_spark.images.export import export_webdataset_job
from ocel_ocpn_lakehouse_spark.images.synth import IMAGE_SCHEMA, synth_images_df
from ocel_ocpn_lakehouse_spark.maintenance.checkpoint import SystemTables
from ocel_ocpn_lakehouse_spark.maintenance.cluster import execute_cluster
from ocel_ocpn_lakehouse_spark.maintenance.compact import execute_compaction
from ocel_ocpn_lakehouse_spark.maintenance.expire import expire_snapshots
from ocel_ocpn_lakehouse_spark.maintenance.image_dedup import dedup_images
from ocel_ocpn_lakehouse_spark.maintenance.replicate import sync_replica
from ocel_ocpn_lakehouse_spark.streaming.ingest import stream_image_ingest

MAXD = 6
_M = (1 << 64) - 1


def _ham(a, b):
    return bin((a ^ b) & _M).count("1")


def _scan_sig(spark, t):
    """Order-insensitive content signature of the live rows."""
    return sorted(
        (r["image_id"], r["phash"], r["caption"])
        for r in t.scan(spark, columns=["image_id", "phash", "caption"]).collect()
    )


def test_full_image_lifecycle(spark, tmp_path):
    wh = str(tmp_path / "wh")
    cat = Catalog(wh)
    sys_tables = SystemTables(wh)
    t = cat.create_table(
        "ocel.images",
        IMAGE_SCHEMA,
        TableSpec(
            partition_spec=PartitionSpec.bucket("image_id", 2),
            sort_order=SortOrder.by("phash"),
            properties={
                "write.target-file-size-bytes": str(4 * 1024 * 1024),
                "compact.small-file-bytes": str(1024 * 1024),
            },
        ),
    )

    # 1. seed with deliberate near-dups, fragmented small files
    t.append(
        synth_images_df(spark, 160, seed=7, hot_key_fraction=0.3, n_hot_bases=3),
        num_files=8,
        distribution="fragment",
    )
    idx = HI.hamming_index_table(
        spark, cat, "ocel.images_idx", t, max_dist=MAXD, key_buckets=8
    )

    # 2. streaming exactly-once deduplicated ingest of a dropped batch
    src = tmp_path / "drop"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    synth_images_df(spark, 200, seed=7, hot_key_fraction=0.3, n_hot_bases=3).filter(
        F.col("image_id") >= "img_000000000160"
    ).write.parquet(str(src / "b1"))
    n_batches = stream_image_ingest(
        spark, t, idx, str(src / "*"), IMAGE_SCHEMA, ckpt, quality_col="w", max_dist=MAXD
    )
    assert n_batches == 1
    t.refresh()
    n_after_ingest = t.scan(spark).count()
    assert 160 < n_after_ingest <= 200  # accepted the far rows, dropped dups

    # replaying the same drop directory must be a no-op (exactly-once)
    assert stream_image_ingest(
        spark, t, idx, str(src / "*"), IMAGE_SCHEMA, ckpt, quality_col="w", max_dist=MAXD
    ) == 0
    assert t.refresh().scan(spark).count() == n_after_ingest

    # 3. perceptual dedup maintenance: after it, no close pair survives
    rep = dedup_images(
        spark, t.refresh(), max_dist=MAXD, sys_tables=sys_tables, table_name="ocel.images"
    )
    t.refresh()
    live = {r["image_id"]: r["phash"] for r in t.scan(spark).collect()}
    assert rep["losers"] == n_after_ingest - len(live)
    fps = list(live.values())
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            assert _ham(fps[i], fps[j]) > MAXD
    # rerun converges
    assert dedup_images(spark, t.refresh(), max_dist=MAXD)["losers"] == 0

    # 4. fused-equivalent maintenance: compact then cluster, scans unchanged
    before = _scan_sig(spark, t.refresh())
    files_before = len(t.live_entries())
    execute_compaction(spark, t.refresh(), sys_tables, "ocel.images")
    execute_cluster(spark, t.refresh(), sys_tables, "ocel.images", curve="zorder")
    t.refresh()
    assert _scan_sig(spark, t) == before
    assert len(t.live_entries()) < files_before

    # 5. resumable export, then append + INCREMENTAL export
    out = str(tmp_path / "export")
    r1 = export_webdataset_job(spark, cat, "ocel.images", out, batch_size=8)
    assert r1["items"] == len(live)
    t.refresh().append(
        synth_images_df(spark, 24, seed=91).selectExpr(
            "concat('z_', image_id) AS image_id",
            "bytes", "w", "h", "fmt", "caption", "phash",
        ),
        num_files=2,
    )
    r2 = export_webdataset_job(spark, cat, "ocel.images", out, batch_size=8)
    assert r2["mode"] == "incremental"
    mt = cat.load_table("ocel.images_export").refresh()
    total_exported = sum(r["n_items"] for r in mt.scan(spark).collect())
    assert total_exported == len(live) + 24

    # 6. replica mirror equals the source, and stays fresh on resync
    rep1 = sync_replica(spark, t.refresh(), cat, "ocel.images_mirror")
    mirror = cat.load_table("ocel.images_mirror")
    assert _scan_sig(spark, mirror) == _scan_sig(spark, t.refresh())
    rep2 = sync_replica(spark, t.refresh(), cat, "ocel.images_mirror")
    assert rep2["status"] in ("fresh", "synced")

    # 7. snapshot expiry keeps the head readable and the history bounded
    n_snaps_before = len(t.refresh().snapshots())
    expire_snapshots(
        spark, t.refresh(), sys_tables, "ocel.images", retention_days=0, keep_last=2
    )
    t.refresh()
    assert len(t.snapshots()) < n_snaps_before
    assert _scan_sig(spark, t) == _scan_sig(spark, mirror.refresh())
