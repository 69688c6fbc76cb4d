"""Incremental clustering (maintenance/cluster_incremental.py): scan
equivalence, untouched base files stay in place, non-overlap invariant
across passes, DV absorption, and the full-rewrite fallbacks."""

import json
import os

from pyspark.sql import functions as F

from ocel_ocpn_lakehouse_spark.core import (
    Catalog,
    PartitionSpec,
    SortOrder,
    TableSpec,
)
from ocel_ocpn_lakehouse_spark.core.spec import PartitionField
from ocel_ocpn_lakehouse_spark.images.synth import IMAGE_SCHEMA, synth_images_df
from ocel_ocpn_lakehouse_spark.maintenance.checkpoint import SystemTables
from ocel_ocpn_lakehouse_spark.maintenance.cluster import ZKEY_COL, execute_cluster
from ocel_ocpn_lakehouse_spark.maintenance.cluster_incremental import (
    execute_cluster_incremental,
)
from ocel_ocpn_lakehouse_spark.maintenance.deletes import delete_where

from test_maintenance import TEST_PROPS, column_checksums

N_ROWS = 400
N_FILES = 16
BUCKETS = 4


def _clustered_table(spark, warehouse, n_rows=N_ROWS):
    cat = Catalog(warehouse)
    t = cat.create_table(
        "ocel.images",
        IMAGE_SCHEMA,
        TableSpec(
            partition_spec=PartitionSpec.bucket("image_id", BUCKETS),
            sort_order=SortOrder.by("phash"),
            properties=TEST_PROPS,
        ),
    )
    t.append(synth_images_df(spark, n_rows=n_rows, seed=42), num_files=N_FILES,
             distribution="fragment")
    st = SystemTables(cat.warehouse)
    res = execute_cluster(spark, t, st, "ocel.images", curve="zorder")
    assert res["status"] == "committed"
    return cat, t.refresh(), st


def _stamped_intervals(t):
    """{partition-json: sorted [(lo, hi)] of stamped files} + the unstamped
    entry count."""
    by_part, unstamped = {}, 0
    for e in t.live_entries():
        lo = e.lower_bounds.get(ZKEY_COL)
        if lo is None:
            unstamped += 1
            continue
        by_part.setdefault(json.dumps(e.partition, sort_keys=True), []).append(
            (int(lo), int(e.upper_bounds[ZKEY_COL]))
        )
    return {k: sorted(v) for k, v in by_part.items()}, unstamped


def _assert_nonoverlapping(t):
    by_part, _ = _stamped_intervals(t)
    for iv in by_part.values():
        for (lo1, hi1), (lo2, _hi2) in zip(iv, iv[1:]):
            assert hi1 < lo2, f"overlapping stamped intervals: {(lo1, hi1)} {(lo2, _hi2)}"


def test_incremental_touches_only_overlapped_files(spark, warehouse):
    cat, t, st = _clustered_table(spark, warehouse)
    base_entries = t.live_entries()
    assert all(e.lower_bounds.get(ZKEY_COL) is not None for e in base_entries)

    # delta = the rows of exactly ONE clustered file (same image_ids → same
    # partition, same curve keys) — only that file's range receives keys
    e0 = max(base_entries, key=lambda e: e.record_count)
    delta_df = spark.read.parquet(os.path.join(t.root, e0.path)).select(
        *[f.name for f in IMAGE_SCHEMA.fields]
    )
    n_delta = delta_df.count()
    t.append(delta_df, num_files=2)
    t = t.refresh()
    expected = column_checksums(t.scan(spark))

    res = execute_cluster_incremental(spark, t, st, "ocel.images", curve="zorder")
    assert res["status"] == "committed" and res["mode"] == "incremental"
    assert res["files_delta"] >= 1
    assert res["files_base_touched"] == 1
    assert res["files_base_untouched"] == len(base_entries) - 1
    assert res["rows"] == n_delta + e0.live_count

    t = t.refresh()
    after_paths = {e.path for e in t.live_entries()}
    untouched = {e.path for e in base_entries if e.path != e0.path}
    assert untouched <= after_paths  # untouched files never moved
    assert e0.path not in after_paths
    assert column_checksums(t.scan(spark)) == expected
    # every output is a valid base file for the next pass
    _, unstamped = _stamped_intervals(t)
    assert unstamped == 0
    _assert_nonoverlapping(t)

    # idempotent replay: same job_id short-circuits
    again = execute_cluster_incremental(
        spark, t, st, "ocel.images", curve="zorder", job_id=res["job_id"]
    )
    assert again["status"] == "already-committed"
    # and with no new delta the op is a no-op
    assert execute_cluster_incremental(spark, t, st, "ocel.images")["status"] == "no-op"


def test_fresh_partition_appends_touch_nothing(spark, warehouse):
    """Delta landing in a partition with no clustered files forms its own
    groups; zero base files are rewritten."""
    cat = Catalog(warehouse)
    t = cat.create_table(
        "ocel.images",
        IMAGE_SCHEMA,
        TableSpec(
            partition_spec=PartitionSpec((PartitionField("fmt", "identity", "fmt"),)),
            sort_order=SortOrder.by("phash"),
            properties=TEST_PROPS,
        ),
    )
    base_df = synth_images_df(spark, n_rows=200, seed=1).withColumn("fmt", F.lit("png"))
    t.append(base_df, num_files=8, distribution="fragment")
    st = SystemTables(cat.warehouse)
    execute_cluster(spark, t, st, "ocel.images", curve="zorder")
    t = t.refresh()
    base_paths = {e.path for e in t.live_entries()}

    delta_df = synth_images_df(spark, n_rows=30, seed=2).withColumn("fmt", F.lit("jpeg"))
    t.append(delta_df, num_files=2)
    t = t.refresh()
    expected = column_checksums(t.scan(spark))

    res = execute_cluster_incremental(spark, t, st, "ocel.images", curve="zorder")
    assert res["status"] == "committed" and res["files_base_touched"] == 0
    t = t.refresh()
    assert base_paths <= {e.path for e in t.live_entries()}
    assert column_checksums(t.scan(spark)) == expected
    _assert_nonoverlapping(t)


def test_incremental_absorbs_delete_vectors(spark, warehouse):
    cat, t, st = _clustered_table(spark, warehouse)
    e0 = max(t.live_entries(), key=lambda e: e.record_count)
    delta_df = spark.read.parquet(os.path.join(t.root, e0.path)).select(
        *[f.name for f in IMAGE_SCHEMA.fields]
    )
    t.append(delta_df, num_files=1)
    t = t.refresh()
    delete_where(spark, t, "w = 32")
    t = t.refresh()
    expected = column_checksums(t.scan(spark))
    n_before = t.scan(spark).count()

    res = execute_cluster_incremental(spark, t, st, "ocel.images", curve="zorder")
    assert res["status"] == "committed"
    t = t.refresh()
    assert column_checksums(t.scan(spark)) == expected
    assert t.scan(spark).count() == n_before
    # rewritten outputs are clean (their DVs were absorbed)
    rewritten = [e for e in t.live_entries() if "-i" in os.path.basename(e.path)]
    assert rewritten and all(not e.deletes for e in rewritten)


def test_fallbacks_route_to_full_rewrite(spark, warehouse):
    # never clustered → full
    cat = Catalog(warehouse)
    t = cat.create_table(
        "ocel.images",
        IMAGE_SCHEMA,
        TableSpec(
            partition_spec=PartitionSpec.bucket("image_id", BUCKETS),
            sort_order=SortOrder.by("phash"),
            properties=TEST_PROPS,
        ),
    )
    t.append(synth_images_df(spark, n_rows=120, seed=3), num_files=6,
             distribution="fragment")
    st = SystemTables(cat.warehouse)
    res = execute_cluster_incremental(spark, t, st, "ocel.images", curve="zorder")
    assert res["status"] == "committed"
    assert res["mode"] == "full-fallback:no-clustered-layout"
    t = t.refresh()
    _assert_nonoverlapping(t)

    # big delta (> max_delta_frac of bytes) → full
    t.append(synth_images_df(spark, n_rows=120, seed=4), num_files=6)
    t = t.refresh()
    res = execute_cluster_incremental(
        spark, t, st, "ocel.images", curve="zorder", max_delta_frac=0.10
    )
    assert res["mode"].startswith("full-fallback:delta-frac")

    # curve change invalidates the stamps → full
    t = t.refresh()
    t.append(synth_images_df(spark, n_rows=10, seed=5), num_files=1)
    t = t.refresh()
    res = execute_cluster_incremental(spark, t, st, "ocel.images", curve="hilbert")
    assert res["mode"].startswith("full-fallback:curve-changed")


def test_cli_auto_routes_small_appends_incremental(spark, warehouse, capsys):
    """--op auto pays the cheapest sufficient rewrite: a fragmented fresh
    table gets the full fused rewrite; a small append onto a clustered
    layout gets the incremental merge (untouched base files stay put)."""
    from ocel_ocpn_lakehouse_spark.maintenance.run import main as cli_main

    wh = str(warehouse)
    cli_main(["--warehouse", wh, "--op", "synth", "--rows", "400", "--files", "32"])
    capsys.readouterr()
    cli_main(["--warehouse", wh, "--op", "auto"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["actions"] == ["rewrite"]
    assert rep["rewrite"]["mode"].startswith("full-fallback")

    cat = Catalog(wh)
    t = cat.load_table("ocel.images")
    base_entries = t.live_entries()
    base_paths = {e.path for e in base_entries}
    # narrow-range delta (one file's keys) so distant base files stay put
    e0 = max(base_entries, key=lambda e: e.record_count)
    delta_df = spark.read.parquet(os.path.join(t.root, e0.path)).select(
        *[f.name for f in IMAGE_SCHEMA.fields]
    )
    t.append(delta_df, num_files=4)
    cli_main(["--warehouse", wh, "--op", "auto"])
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "rewrite-incremental" in rep2["actions"]
    assert rep2["rewrite"]["mode"] == "incremental"
    t = t.refresh()
    after = {e.path for e in t.live_entries()}
    assert rep2["rewrite"]["files_base_untouched"] > 0
    assert base_paths & after  # some base files never moved
    _assert_nonoverlapping(t)


def test_duplicate_keys_never_straddle_outputs(spark, warehouse):
    """Equal curve keys (duplicated (phash, w, h, image_id) rows) must not
    be split across output files at the target-size row cuts: touching
    _zkey bounds would make the NEXT pass misread its own outputs as a
    foreign writer's overlap and full-rewrite forever."""
    cat, t, st = _clustered_table(spark, warehouse)
    e0 = max(t.live_entries(), key=lambda e: e.record_count)
    delta_df = spark.read.parquet(os.path.join(t.root, e0.path)).select(
        *[f.name for f in IMAGE_SCHEMA.fields]
    )
    # every key in e0's range now appears 3x -> the merge group spans
    # multiple target-size outputs with equal-key runs at every cut
    t.append(delta_df, num_files=1)
    t.refresh().append(delta_df, num_files=1)
    t = t.refresh()
    expected = column_checksums(t.scan(spark))
    res = execute_cluster_incremental(
        spark, t, st, "ocel.images", curve="zorder", max_delta_frac=0.6
    )
    assert res["status"] == "committed" and res["mode"] == "incremental"
    t = t.refresh()
    assert column_checksums(t.scan(spark)) == expected
    _assert_nonoverlapping(t)  # strict: touching bounds fail too
    # the next pass still classifies against these outputs incrementally
    e1 = max(t.live_entries(), key=lambda e: e.record_count)
    d2 = (
        spark.read.parquet(os.path.join(t.root, e1.path))
        .select(*[f.name for f in IMAGE_SCHEMA.fields])
        .limit(5)
    )
    t.append(d2, num_files=1)
    t = t.refresh()
    res2 = execute_cluster_incremental(spark, t, st, "ocel.images", curve="zorder")
    assert res2["status"] == "committed" and res2["mode"] == "incremental"


def test_second_pass_stays_incremental(spark, warehouse):
    """The invariant survives passes: outputs of pass 1 are base files for
    pass 2, and pass 2 still leaves distant files untouched."""
    cat, t, st = _clustered_table(spark, warehouse)
    for seed in (7, 8):
        e0 = max(t.live_entries(), key=lambda e: e.record_count)
        delta_df = spark.read.parquet(os.path.join(t.root, e0.path)).select(
            *[f.name for f in IMAGE_SCHEMA.fields]
        )
        t.append(delta_df, num_files=1)
        t = t.refresh()
        expected = column_checksums(t.scan(spark))
        res = execute_cluster_incremental(spark, t, st, "ocel.images", curve="zorder")
        assert res["status"] == "committed" and res["mode"] == "incremental"
        assert res["files_base_untouched"] > 0
        t = t.refresh()
        assert column_checksums(t.scan(spark)) == expected
        _assert_nonoverlapping(t)
