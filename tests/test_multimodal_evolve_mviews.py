import numpy as np
import pytest
from pyspark.sql import functions as F

from ocel_ocpn_lakehouse_spark.core import Catalog, PartitionSpec, SortOrder, TableSpec
from ocel_ocpn_lakehouse_spark.core.spec import PartitionField
from ocel_ocpn_lakehouse_spark.images.codec import decode_image, png_encode
from ocel_ocpn_lakehouse_spark.images.multimodal import (
    extract_features,
    frame_sample,
    pack_frames,
    resize_images,
)
from ocel_ocpn_lakehouse_spark.images.synth import IMAGE_SCHEMA, synth_images_df
from ocel_ocpn_lakehouse_spark.maintenance.checkpoint import SystemTables
from ocel_ocpn_lakehouse_spark.maintenance.evolve import (
    evolve_partition_spec,
    suggest_bucket_count,
)
from ocel_ocpn_lakehouse_spark.mviews import MaterializedViewManager, MVDefinition


def test_extract_features(spark):
    df = synth_images_df(spark, n_rows=40, seed=7)
    feats = extract_features(df)
    rows = feats.collect()
    assert len(rows) == 40
    for r in rows:
        assert 0 <= r["brightness"] <= 255
        assert r["w"] in (16, 32, 64, 128) and r["h"] in (16, 32, 64, 128)


def test_resize_roundtrip(spark):
    df = synth_images_df(spark, n_rows=10, seed=7)
    out = resize_images(df, 8, 8).collect()
    assert len(out) == 10
    for r in out:
        arr = decode_image(bytes(r["bytes"]))
        assert arr.shape == (8, 8, 3)


def test_frame_sample(spark):
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(6)]
    vid = pack_frames(frames)
    df = spark.createDataFrame([("v0", bytearray(vid))], "video_id string, bytes binary")
    out = frame_sample(df, every_k=2).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in out] == [0, 2, 4]
    assert all(decode_image(bytes(r["bytes"])).shape == (16, 16, 3) for r in out)


def test_frame_sample_rejects_unknown_container(spark):
    df = spark.createDataFrame([("v0", bytearray(b"nope"))], "video_id string, bytes binary")
    with pytest.raises(Exception) as ei:
        frame_sample(df).collect()
    assert "NotImplementedError" in str(ei.value) or "FSEQ" in str(ei.value) or "ffmpeg" in str(
        ei.value
    )


def test_partition_evolution_rebucket(spark, warehouse):
    cat = Catalog(warehouse)
    t = cat.create_table(
        "ns.imgs",
        IMAGE_SCHEMA,
        TableSpec(partition_spec=PartitionSpec.bucket("image_id", 2)),
    )
    t.append(synth_images_df(spark, n_rows=80, seed=1), num_files=4, distribution="fragment")
    before = t.scan(spark).agg(F.sum(F.xxhash64("image_id").cast("decimal(38,0)"))).first()[0]
    old_snap = t.current_snapshot().snapshot_id

    new_spec = PartitionSpec.bucket("image_id", 8)
    res = evolve_partition_spec(spark, t, new_spec, SystemTables(cat.warehouse), "ns.imgs")
    assert res["status"] == "rewritten"
    t.refresh()
    # new layout live, data identical, time travel to old layout intact
    parts = {frozenset(e.partition.items()) for e in t.live_entries()}
    assert all("_p_image_id_bucket" in dict(p) for p in parts)
    assert len({dict(p)["_p_image_id_bucket"] for p in parts}) > 2
    after = t.scan(spark).agg(F.sum(F.xxhash64("image_id").cast("decimal(38,0)"))).first()[0]
    assert after == before
    assert t.scan(spark, snapshot_id=old_snap).count() == 80
    assert suggest_bucket_count(1300) == 128 and suggest_bucket_count(10) == 32


def test_mview_refresh_staleness_routing(spark, warehouse):
    cat = Catalog(warehouse)
    t = cat.create_table(
        "ocel.images", IMAGE_SCHEMA, TableSpec(partition_spec=PartitionSpec.bucket("image_id", 2))
    )
    t.append(synth_images_df(spark, n_rows=60, seed=3), num_files=2)

    def build_stats(spark_, base_df):
        return base_df.groupBy("fmt").agg(
            F.count("*").alias("n"), F.round(F.avg("w"), 2).alias("avg_w")
        )

    mgr = MaterializedViewManager(cat)
    mgr.register(MVDefinition(name="ocel.fmt_stats", base="ocel.images", build=build_stats))

    r1 = mgr.refresh(spark, "ocel.fmt_stats")
    assert r1["status"] == "refreshed"
    assert not mgr.is_stale("ocel.fmt_stats")
    r2 = mgr.refresh(spark, "ocel.fmt_stats")
    assert r2["status"] == "fresh"

    n_before = mgr.read_or_build(spark, "ocel.fmt_stats").agg(F.sum("n")).first()[0]
    assert n_before == 60

    # base append → stale → routing recomputes, refresh catches up
    t.append(synth_images_df(spark, n_rows=20, seed=4), num_files=1)
    assert mgr.is_stale("ocel.fmt_stats")
    assert mgr.read_or_build(spark, "ocel.fmt_stats").agg(F.sum("n")).first()[0] == 80
    r3 = mgr.refresh(spark, "ocel.fmt_stats")
    assert r3["status"] == "refreshed"
    assert not mgr.is_stale("ocel.fmt_stats")
    mv_rows = cat.load_table("ocel.fmt_stats").scan(spark).agg(F.sum("n")).first()[0]
    assert mv_rows == 80


def test_mview_scheduler_tick(spark, warehouse):
    """One scheduler pass refreshes stale MVs, skips fresh ones, and
    forces an age-based refresh when the interval has elapsed
    (reference daemon loop, ops/view_refresh_scheduler.py:77-128)."""
    cat = Catalog(warehouse)
    t = cat.create_table(
        "ocel.images", IMAGE_SCHEMA, TableSpec(partition_spec=PartitionSpec.bucket("image_id", 2))
    )
    t.append(synth_images_df(spark, n_rows=40, seed=5), num_files=2)

    def build(spark_, base_df):
        return base_df.groupBy("fmt").agg(F.count("*").alias("n"))

    mgr = MaterializedViewManager(cat)
    mgr.register(MVDefinition(name="ocel.fmt_counts", base="ocel.images", build=build))

    s1 = mgr.scheduler_tick(spark, interval_s=3600)
    assert s1["refreshed"] == 1 and s1["fresh"] == 0

    s2 = mgr.scheduler_tick(spark, interval_s=3600)
    assert s2["refreshed"] == 0 and s2["fresh"] == 1
    assert mgr.last_refresh_age_s("ocel.fmt_counts") >= 0

    # base moved → stale → next tick refreshes
    t.append(synth_images_df(spark, n_rows=10, seed=6), num_files=1)
    s3 = mgr.scheduler_tick(spark, interval_s=3600)
    assert s3["refreshed"] == 1

    # interval 0 → age-based refresh even when not stale
    s4 = mgr.scheduler_tick(spark, interval_s=0.0)
    assert s4["refreshed"] == 1

    # bounded daemon loop runs the requested number of ticks
    stats = mgr.run_scheduler(spark, interval_s=0.0, max_ticks=2)
    assert len(stats) == 2
