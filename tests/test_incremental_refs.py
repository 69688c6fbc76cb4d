"""Refs (tags) + rollback + incremental scan + incremental MV refresh.

The incremental contract under test is Iceberg's: appends between two
snapshots are readable as a delta; REPLACE (maintenance) snapshots are
row-preserving and contribute nothing; any overwrite/merge/rollback in
the range forces the caller back to a full recompute. Tags pin
snapshots against expiry (Iceberg ref-retention).
"""

import time
import zlib

import pytest
from pyspark.sql import functions as F

from ocel_ocpn_lakehouse_spark.core import Catalog, PartitionSpec, SortOrder, TableSpec
from ocel_ocpn_lakehouse_spark.core.table import IncrementalScanError
from ocel_ocpn_lakehouse_spark.images.synth import (
    IMAGE_SCHEMA,
    synth_images_df,
    synth_merge_source_df,
)
from ocel_ocpn_lakehouse_spark.maintenance.checkpoint import SystemTables
from ocel_ocpn_lakehouse_spark.maintenance.compact import execute_compaction
from ocel_ocpn_lakehouse_spark.maintenance.expire import expire_snapshots
from ocel_ocpn_lakehouse_spark.maintenance.merge import merge_into
from ocel_ocpn_lakehouse_spark.mviews import MaterializedViewManager, MVDefinition

PROPS = {
    # everything counts as small at this toy scale so compaction always fires
    "write.target-file-size-bytes": str(16 * 1024 * 1024),
    "compact.small-file-bytes": str(8 * 1024 * 1024),
    "snapshot.retention-days": "0",
}


def _table(spark, warehouse, name="ocel.images"):
    cat = Catalog(warehouse)
    t = cat.create_table(
        name,
        IMAGE_SCHEMA,
        TableSpec(
            partition_spec=PartitionSpec.bucket("image_id", 2),
            sort_order=SortOrder.by("phash"),
            properties=PROPS,
        ),
    )
    return cat, t


def _batch(spark, n, prefix):
    df = synth_images_df(spark, n_rows=n, seed=zlib.crc32(prefix.encode()) % 10_000)
    return df.withColumn("image_id", F.concat(F.lit(prefix + "_"), "image_id"))


def _ids(df):
    return {r["image_id"] for r in df.select("image_id").collect()}


def test_tag_scan_and_expiry_protection(spark, warehouse):
    _, t = _table(spark, warehouse)
    t.append(_batch(spark, 40, "b1"), num_files=2)
    s1 = t.current_snapshot().snapshot_id
    t.create_tag("prod-cut")
    assert t.refs == {"prod-cut": s1}
    t.append(_batch(spark, 30, "b2"), num_files=2)

    by_ref = t.scan(spark, ref="prod-cut")
    by_id = t.scan(spark, snapshot_id=s1)
    assert _ids(by_ref) == _ids(by_id)
    assert by_ref.count() == 40
    with pytest.raises(KeyError):
        t.scan(spark, ref="nope")

    # aggressive expiry (future cutoff, keep only the head): the tag pins s1
    future = int(time.time() * 1000) + 10**9
    expire_snapshots(spark, t, older_than_ms=future, keep_last=1)
    t = t.refresh()
    assert t.scan(spark, ref="prod-cut").count() == 40  # files intact too

    # dropping the tag releases the pin; the next expiry removes s1
    t.drop_tag("prod-cut")
    expire_snapshots(spark, t, older_than_ms=future, keep_last=1)
    t = t.refresh()
    assert s1 not in {s.snapshot_id for s in t.snapshots()}
    with pytest.raises(KeyError):
        t.scan(spark, ref="prod-cut")
    # head unaffected
    assert t.scan(spark).count() == 70


def test_metadata_tables(spark, warehouse):
    """history_df / refs_df / entries_df — the Iceberg metadata-table
    surface (table.history, table.refs, table.files)."""
    _, t = _table(spark, warehouse)
    t.append(_batch(spark, 20, "b1"), num_files=2)
    t.create_tag("v1")
    t.append(_batch(spark, 10, "b2"), num_files=2)

    h = t.history_df(spark).orderBy("sequence_number").collect()
    assert [r["operation"] for r in h] == ["append", "append"]
    assert h[-1]["is_current"] and not h[0]["is_current"]
    assert h[1]["parent_id"] == h[0]["snapshot_id"]

    refs = {r["name"]: r["snapshot_id"] for r in t.refs_df(spark).collect()}
    assert refs == {"v1": h[0]["snapshot_id"]}

    files = t.entries_df(spark)
    assert files.count() == len(t.live_entries())
    assert {"path", "partition", "record_count", "deletes"} <= set(files.columns)


def test_rollback_restores_rows_and_keeps_history(spark, warehouse):
    _, t = _table(spark, warehouse)
    b1 = _batch(spark, 40, "b1")
    t.append(b1, num_files=2)
    s1 = t.current_snapshot().snapshot_id
    t.append(_batch(spark, 30, "bad"), num_files=2)
    s2 = t.current_snapshot().snapshot_id

    snap = t.rollback_to(s1)
    assert snap.operation == "rollback"
    assert _ids(t.scan(spark)) == _ids(b1)
    # history-preserving: the bad commit stays time-travelable
    assert t.scan(spark, snapshot_id=s2).count() == 70
    assert len(t.snapshots()) == 3


def test_incremental_scan_is_exactly_the_appended_rows(spark, warehouse):
    cat, t = _table(spark, warehouse)
    sys_tables = SystemTables(cat.warehouse)
    t.append(_batch(spark, 40, "b1"), num_files=4)
    s1 = t.current_snapshot().snapshot_id

    b2 = _batch(spark, 30, "b2")
    t.append(b2, num_files=4)
    # a row-preserving maintenance rewrite mid-range must be transparent
    execute_compaction(spark, t, sys_tables, "ocel.images")
    t = t.refresh()
    assert t.current_snapshot().operation == "replace"
    b3 = _batch(spark, 20, "b3")
    t.append(b3, num_files=2)

    delta = t.incremental_scan(spark, from_snapshot_id=s1)
    assert _ids(delta) == _ids(b2) | _ids(b3)
    assert delta.count() == 50
    # from == to → empty delta with the table schema
    head = t.current_snapshot().snapshot_id
    empty = t.incremental_scan(spark, from_snapshot_id=head)
    assert empty.count() == 0
    assert empty.schema == t.schema
    # projection applies on the empty delta too (unionByName-safe)
    empty_proj = t.incremental_scan(spark, from_snapshot_id=head, columns=["image_id"])
    assert empty_proj.columns == ["image_id"] and empty_proj.count() == 0

    # unknown / expired start snapshot → not incrementally readable
    with pytest.raises(IncrementalScanError):
        t.incremental_entries(from_snapshot_id=999_999)

    # a merge in the range breaks append-only-ness
    src = synth_merge_source_df(spark, 20)
    merge_into(spark, t, src, sys_tables=sys_tables, table_name="ocel.images")
    t = t.refresh()
    with pytest.raises(IncrementalScanError):
        t.incremental_entries(from_snapshot_id=s1)


def test_incremental_mv_refresh_matches_full_rebuild(spark, warehouse):
    cat, t = _table(spark, warehouse)
    sys_tables = SystemTables(cat.warehouse)
    t.append(_batch(spark, 40, "b1"), num_files=4)

    def build(s, base):
        return base.groupBy("fmt").agg(
            F.count("*").alias("n"),
            F.sum("w").alias("sum_w"),
            F.min("phash").alias("min_phash"),
            F.max("phash").alias("max_phash"),
        )

    def incr_merge(s, mv_rows, delta):
        return (
            mv_rows.unionByName(build(s, delta))
            .groupBy("fmt")
            .agg(
                F.sum("n").alias("n"),
                F.sum("sum_w").alias("sum_w"),
                F.min("min_phash").alias("min_phash"),
                F.max("max_phash").alias("max_phash"),
            )
        )

    mgr = MaterializedViewManager(cat)
    mgr.register(
        MVDefinition(
            name="ocel.fmt_stats", base="ocel.images", build=build, incr_merge=incr_merge
        )
    )

    r0 = mgr.refresh(spark, "ocel.fmt_stats")
    assert r0["status"] == "refreshed"  # first build is always full

    # append + compaction in the range: incremental path must still be exact
    t.append(_batch(spark, 30, "b2"), num_files=4)
    execute_compaction(spark, t.refresh(), sys_tables, "ocel.images")
    t.append(_batch(spark, 20, "b3"), num_files=2)
    r1 = mgr.refresh(spark, "ocel.fmt_stats")
    assert r1["status"] == "refreshed-incremental"

    expected = build(spark, cat.load_table("ocel.images").scan(spark))
    got = cat.load_table("ocel.fmt_stats").scan(spark)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))

    # fresh MV: no-op
    assert mgr.refresh(spark, "ocel.fmt_stats")["status"] == "fresh"

    # a merge commit breaks append-only-ness → automatic full-rebuild fallback
    base = cat.load_table("ocel.images")
    src = synth_merge_source_df(spark, 20)
    merge_into(spark, base, src, sys_tables=sys_tables, table_name="ocel.images")
    r2 = mgr.refresh(spark, "ocel.fmt_stats")
    assert r2["status"] == "refreshed"
    expected2 = build(spark, cat.load_table("ocel.images").scan(spark))
    got2 = cat.load_table("ocel.fmt_stats").scan(spark)
    assert sorted(map(tuple, got2.collect())) == sorted(map(tuple, expected2.collect()))
