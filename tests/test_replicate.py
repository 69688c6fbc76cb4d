"""Changelog-driven replica sync: a downstream mirror follows the source
table at delta cost through appends, MoR deletes, CoW merges, rollbacks
and maintenance, with the source-snapshot stamp riding atomically in
each apply commit."""

import time

from pyspark.sql import functions as F

from ocel_ocpn_lakehouse_spark.core import Catalog, PartitionSpec, SortOrder, TableSpec
from ocel_ocpn_lakehouse_spark.images.synth import (
    IMAGE_SCHEMA,
    synth_images_df,
    synth_merge_source_df,
)
from ocel_ocpn_lakehouse_spark.maintenance.checkpoint import SystemTables
from ocel_ocpn_lakehouse_spark.maintenance.compact import execute_compaction
from ocel_ocpn_lakehouse_spark.maintenance.deletes import delete_where
from ocel_ocpn_lakehouse_spark.maintenance.expire import expire_snapshots
from ocel_ocpn_lakehouse_spark.maintenance.merge import merge_into
from ocel_ocpn_lakehouse_spark.maintenance.replicate import (
    replica_is_fresh,
    sync_replica,
)

PROPS = {
    "write.target-file-size-bytes": str(16 * 1024 * 1024),
    "compact.small-file-bytes": str(8 * 1024 * 1024),
    "snapshot.retention-days": "0",
}


def _source(spark, warehouse, n_rows=150):
    cat = Catalog(warehouse)
    t = cat.create_table(
        "ocel.images",
        IMAGE_SCHEMA,
        TableSpec(
            partition_spec=PartitionSpec.bucket("image_id", 2),
            sort_order=SortOrder.by("phash"),
            properties=PROPS,
        ),
    )
    t.append(
        synth_images_df(spark, n_rows=n_rows, seed=11),
        num_files=6,
        distribution="fragment",
    )
    return cat, t


def _assert_mirror(spark, cat, t):
    src = t.refresh().scan(spark)
    rep = cat.load_table("ocel.images_replica").scan(spark)
    assert rep.exceptAll(src).count() == 0
    assert src.exceptAll(rep).count() == 0


def test_replica_follows_source_through_mutations(spark, warehouse):
    cat, t = _source(spark, warehouse)
    st = SystemTables(cat.warehouse)

    r = sync_replica(spark, t, cat, "ocel.images_replica", sys_tables=st)
    assert r["status"] == "bootstrap" and r["upserts"] == 150
    _assert_mirror(spark, cat, t)
    assert sync_replica(spark, t, cat, "ocel.images_replica")["status"] == "fresh"
    assert replica_is_fresh(t, cat.load_table("ocel.images_replica"))

    # append + MoR delete in one range
    t.append(
        synth_images_df(spark, n_rows=40, seed=22).withColumn(
            "image_id", F.concat(F.lit("b2_"), "image_id")
        ),
        num_files=2,
    )
    delete_where(spark, t.refresh(), "w = 32")
    r = sync_replica(spark, t.refresh(), cat, "ocel.images_replica", sys_tables=st)
    assert r["status"] == "synced" and r["upserts"] > 0 and r["deletes"] > 0
    _assert_mirror(spark, cat, t)

    # CoW merge upsert on the source
    src = synth_merge_source_df(spark, 150, seed=5)
    merge_into(spark, t.refresh(), src, sys_tables=st, table_name="ocel.images")
    r = sync_replica(spark, t.refresh(), cat, "ocel.images_replica", sys_tables=st)
    assert r["status"] == "synced"
    _assert_mirror(spark, cat, t)

    # rollback the merge: replica follows backwards too
    t = t.refresh()
    t.rollback_to(t.snapshots()[-2].snapshot_id)
    r = sync_replica(spark, t, cat, "ocel.images_replica", sys_tables=st)
    assert r["status"] == "synced"
    _assert_mirror(spark, cat, t)


def test_replica_restamps_on_maintenance_only_range(spark, warehouse):
    cat, t = _source(spark, warehouse)
    st = SystemTables(cat.warehouse)
    sync_replica(spark, t, cat, "ocel.images_replica", sys_tables=st)

    execute_compaction(spark, t.refresh(), st, "ocel.images")
    r = sync_replica(spark, t.refresh(), cat, "ocel.images_replica", sys_tables=st)
    assert r["status"] == "restamped"
    assert replica_is_fresh(t.refresh(), cat.load_table("ocel.images_replica"))
    _assert_mirror(spark, cat, t)


def test_replica_full_resync_when_stamp_expired(spark, warehouse):
    cat, t = _source(spark, warehouse)
    st = SystemTables(cat.warehouse)
    sync_replica(spark, t, cat, "ocel.images_replica", sys_tables=st)

    # mutate, then expire source history past the replica's stamp
    delete_where(spark, t, "h = 64")
    t.append(synth_images_df(spark, n_rows=20, seed=3), num_files=1)
    future = int(time.time() * 1000) + 10**9
    expire_snapshots(spark, t.refresh(), older_than_ms=future, keep_last=1)
    r = sync_replica(spark, t.refresh(), cat, "ocel.images_replica", sys_tables=st)
    assert r["status"] == "resync"
    _assert_mirror(spark, cat, t)
    assert sync_replica(spark, t.refresh(), cat, "ocel.images_replica")["status"] == "fresh"


def test_stream_replica_continuous_mirror(spark, warehouse, tmp_path):
    """stream_replica: the CDC-stream-driven mirror bootstraps from the
    offset-0 batch, follows MoR deletes and upserts exactly-once, ignores
    maintenance commits, and a replayed drain commits nothing."""
    from ocel_ocpn_lakehouse_spark.maintenance.replicate import stream_replica

    cat, t = _source(spark, warehouse)
    ckpt = str(tmp_path / "repl_ckpt")

    n = stream_replica(spark, t, cat, "ocel.images_replica", ckpt)
    assert n == 1  # bootstrap = the initial-offset batch, one MERGE
    _assert_mirror(spark, cat, t)
    rep = cat.load_table("ocel.images_replica")
    n_snaps = len(rep.snapshots())

    # idle drain: no source change -> no batch, no commit
    assert stream_replica(spark, t, cat, "ocel.images_replica", ckpt) == 0
    assert len(cat.load_table("ocel.images_replica").snapshots()) == n_snaps

    # mutate: MoR delete + upsert batch + maintenance replace
    delete_where(spark, t.refresh(), "w = 32")
    merge_into(
        spark, t.refresh(), synth_merge_source_df(spark, 150, seed=12), strategy="mor"
    )
    execute_compaction(spark, t.refresh(), SystemTables(warehouse), "ocel.images")
    t.refresh()

    n2 = stream_replica(spark, t, cat, "ocel.images_replica", ckpt)
    assert n2 >= 1
    _assert_mirror(spark, cat, t)
    # stamp advanced to the source head atomically with the last apply
    assert replica_is_fresh(t, cat.load_table("ocel.images_replica"))
