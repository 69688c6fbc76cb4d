"""Branches (write-audit-publish): isolation of branch commits from main,
atomic fast-forward publish, conflict refusal + cherry-pick, expiry
protection, and the CLI staging flow (--branch / --op publish).

Iceberg parity: branch refs + fastForwardBranch + cherrypick_snapshot —
the spark.wap.branch staging pattern, here applied to BOTH data writes
and maintenance rewrites (stage a risky compaction/cluster on a branch,
audit scan-equivalence, publish atomically)."""

import json

from pyspark.sql import functions as F

from ocel_ocpn_lakehouse_spark.core import Catalog, PartitionSpec, SortOrder, TableSpec
from ocel_ocpn_lakehouse_spark.core.metadata import ConflictError
from ocel_ocpn_lakehouse_spark.images.synth import IMAGE_SCHEMA, synth_images_df
from ocel_ocpn_lakehouse_spark.maintenance.checkpoint import SystemTables
from ocel_ocpn_lakehouse_spark.maintenance.cluster import execute_cluster
from ocel_ocpn_lakehouse_spark.maintenance.expire import expire_snapshots

from test_maintenance import TEST_PROPS, column_checksums


def _table(spark, warehouse, n_rows=200, n_files=8):
    cat = Catalog(warehouse)
    t = cat.create_table(
        "ocel.images",
        IMAGE_SCHEMA,
        TableSpec(
            partition_spec=PartitionSpec.bucket("image_id", 4),
            sort_order=SortOrder.by("phash"),
            properties=TEST_PROPS,
        ),
    )
    t.append(synth_images_df(spark, n_rows=n_rows, seed=1), num_files=n_files,
             distribution="fragment")
    return cat, t


def test_branch_write_isolation_and_publish(spark, warehouse):
    cat, t = _table(spark, warehouse)
    base_rows = t.scan(spark).count()
    main_head = t.current_snapshot().snapshot_id

    t.create_branch("audit")
    bt = t.branch("audit")
    bt.append(synth_images_df(spark, n_rows=40, seed=2), num_files=2)

    # main is blind to the staged append; the branch view sees it
    t.refresh()
    assert t.scan(spark).count() == base_rows
    assert t.current_snapshot().snapshot_id == main_head
    assert bt.refresh().scan(spark).count() == base_rows + 40
    # explicit ref addressing from the main handle reads the same state
    assert t.scan(spark, ref="audit").count() == base_rows + 40
    refs = {r["name"]: r["type"] for r in t.refs_df(spark).collect()}
    assert refs["audit"] == "branch"

    # publish: one atomic metadata edit moves main to the branch head
    snap = t.fast_forward("audit", drop=True)
    assert t.scan(spark).count() == base_rows + 40
    assert snap.snapshot_id == t.current_snapshot().snapshot_id
    assert "audit" not in t.refs
    # time travel to the pre-publish head still answers
    assert t.scan(spark, snapshot_id=main_head).count() == base_rows


def test_maintenance_staged_on_branch_then_published(spark, warehouse):
    """The WAP case this engine exists for: a full clustering rewrite runs
    against a branch, main keeps serving the fragmented layout untouched,
    and the rewritten layout reaches readers in one fast-forward."""
    cat, t = _table(spark, warehouse, n_rows=300, n_files=24)
    st = SystemTables(cat.warehouse)
    expected = column_checksums(t.scan(spark))
    files_before = len(t.live_entries())
    main_head = t.current_snapshot().snapshot_id

    t.create_branch("maint")
    bt = t.branch("maint")
    res = execute_cluster(spark, bt, st, "ocel.images", curve="zorder")
    assert res["status"] == "committed"

    # main: same head, same files, same rows; branch: rewritten
    t.refresh()
    assert t.current_snapshot().snapshot_id == main_head
    assert len(t.live_entries()) == files_before
    bt.refresh()
    assert len(bt.live_entries()) < files_before
    assert column_checksums(bt.scan(spark)) == expected  # audit passes

    t.fast_forward("maint", drop=True)
    assert len(t.live_entries()) < files_before
    assert column_checksums(t.scan(spark)) == expected


def test_fast_forward_refuses_diverged_main_then_cherry_pick(spark, warehouse):
    cat, t = _table(spark, warehouse)
    t.create_branch("wap")
    bt = t.branch("wap")
    bt.append(synth_images_df(spark, n_rows=25, seed=3), num_files=1)
    staged = bt.refresh().current_snapshot().snapshot_id

    # main moves concurrently → fast-forward must refuse, not clobber
    t.append(synth_images_df(spark, n_rows=10, seed=4), num_files=1)
    base_plus_main = t.scan(spark).count()
    try:
        t.fast_forward("wap")
        raise AssertionError("fast-forward should refuse a diverged main")
    except ConflictError:
        pass

    # cherry-pick replays the staged APPEND onto the moved main
    t.cherry_pick(staged)
    assert t.scan(spark).count() == base_plus_main + 25
    # replay is refused (manifests already on the head)
    try:
        t.cherry_pick(staged)
        raise AssertionError("double cherry-pick should be refused")
    except ValueError:
        pass
    # non-append snapshots refuse cherry-pick
    t.create_branch("other")
    ot = t.branch("other")
    ot.overwrite(synth_images_df(spark, n_rows=5, seed=5))
    try:
        t.cherry_pick(ot.refresh().current_snapshot().snapshot_id)
        raise AssertionError("overwrite cherry-pick should be refused")
    except ValueError:
        pass


def test_branch_head_survives_expiry(spark, warehouse):
    cat, t = _table(spark, warehouse, n_rows=100, n_files=4)
    t.create_branch("keepme")
    bt = t.branch("keepme")
    bt.append(synth_images_df(spark, n_rows=20, seed=6), num_files=1)
    branch_rows = bt.refresh().scan(spark).count()
    for seed in (7, 8, 9):
        t.append(synth_images_df(spark, n_rows=5, seed=seed), num_files=1)
    expire_snapshots(
        spark, t.refresh(), SystemTables(cat.warehouse), "ocel.images",
        retention_days=0, keep_last=1,
    )
    t.refresh()
    assert t.scan(spark, ref="keepme").count() == branch_rows


def test_cli_branch_stage_audit_publish(spark, warehouse, capsys):
    """CLI flow: stage a rewrite on a branch, verify main untouched,
    publish with the quality-gate audit, verify main advanced."""
    from ocel_ocpn_lakehouse_spark.maintenance.run import main as cli_main

    wh = str(warehouse)
    cli_main(["--warehouse", wh, "--op", "synth", "--rows", "300", "--files", "32"])
    capsys.readouterr()
    cat = Catalog(wh)
    files_before = len(cat.load_table("ocel.images").live_entries())

    cli_main(["--warehouse", wh, "--op", "rewrite", "--branch", "stage"])
    capsys.readouterr()
    t = cat.load_table("ocel.images")
    assert len(t.live_entries()) == files_before  # main untouched
    assert len(t.live_entries(ref="stage")) < files_before

    cli_main(["--warehouse", wh, "--op", "publish", "--name", "stage"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["published"] is True and rep["audit"]["score"] == 100
    t = t.refresh()
    assert len(t.live_entries()) < files_before
    assert "stage" not in t.refs


def test_cli_publish_blocks_on_failed_audit(spark, warehouse, capsys):
    from ocel_ocpn_lakehouse_spark.maintenance.run import main as cli_main

    wh = str(warehouse)
    cli_main(["--warehouse", wh, "--op", "synth", "--rows", "60", "--files", "4"])
    capsys.readouterr()
    cat = Catalog(wh)
    t = cat.load_table("ocel.images")
    main_head = t.current_snapshot().snapshot_id

    t.create_branch("bad")
    bt = t.branch("bad")
    bad = synth_images_df(spark, n_rows=10, seed=10).withColumn(
        "caption", F.lit(None).cast("string")
    )
    bt.append(bad, num_files=1)

    cli_main(["--warehouse", wh, "--op", "publish", "--name", "bad"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["published"] is False
    assert "null_caption" in rep["audit"]["issues"]
    t = t.refresh()
    assert t.current_snapshot().snapshot_id == main_head  # nothing leaked
    assert "bad" in t.refs  # branch kept for repair
