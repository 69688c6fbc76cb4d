"""DV consolidation (Iceberg rewrite_position_delete_files parity):
tombstone-only rewrite preserves scan results exactly, collapses K DV
references per file to 1, contributes nothing to the changelog, keeps
time travel reading the old DV files, and lets snapshot expiry reclaim
them."""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ocel_ocpn_lakehouse_spark.core import Catalog
from ocel_ocpn_lakehouse_spark.maintenance.deletes import delete_where
from ocel_ocpn_lakehouse_spark.maintenance.rewrite_deletes import (
    plan_rewrite_deletes,
    rewrite_deletes,
)

SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
)


def _table_with_dv_debt(spark, tmp_path, n_deletes=3, props=None):
    """300 rows over 6 files, then n_deletes MoR delete commits each
    touching EVERY file → every live entry references n_deletes DVs."""
    from ocel_ocpn_lakehouse_spark.core import TableSpec

    cat = Catalog(str(tmp_path / "wh"))
    t = cat.create_table(
        "ns.dvdebt", SCHEMA, TableSpec(properties=props) if props else None
    )
    for lo in range(0, 300, 50):  # 6 files with disjoint 50-id ranges
        t.append(
            spark.range(lo, lo + 50).select(
                "id", F.concat(F.lit("v"), F.col("id")).alias("v")
            ),
            num_files=1,
        )
    for k in range(n_deletes):
        # ids ≡ k (mod 50): hits rows in every one of the 6 range-files
        res = delete_where(spark, t.refresh(), f"id % 50 = {k}")
        assert res["deleted_rows"] == 6
    return t.refresh()


def test_rewrite_deletes_consolidates_and_preserves_scans(spark, tmp_path):
    t = _table_with_dv_debt(spark, tmp_path)
    entries = t.live_entries()
    assert all(len(e.deletes) == 3 for e in entries)
    before = {r["id"] for r in t.scan(spark).collect()}
    assert len(before) == 300 - 18
    pre_snap = t.current_snapshot().snapshot_id

    plan = plan_rewrite_deletes(t)
    assert sum(len(g["paths"]) for g in plan) == 6

    res = rewrite_deletes(spark, t)
    assert res["status"] == "ok"
    assert res["dv_files_consolidated"] == 3
    assert res["dv_files_written"] == 1
    assert res["files_retargeted"] == 6

    t.refresh()
    after_entries = t.live_entries()
    # every data file untouched, now referencing exactly ONE DV file
    assert {e.path for e in after_entries} == {e.path for e in entries}
    assert all(len(e.deletes) == 1 for e in after_entries)
    dv_paths = {e.deletes[0]["path"] for e in after_entries}
    assert len(dv_paths) == 1
    # tombstone counts preserved per file
    old_counts = {e.path: sum(d["count"] for d in e.deletes) for e in entries}
    new_counts = {e.path: e.deletes[0]["count"] for e in after_entries}
    assert new_counts == old_counts
    # scans identical
    after = {r["id"] for r in t.scan(spark).collect()}
    assert after == before
    # time travel reads the pre-consolidation snapshot through the OLD DVs
    assert {r["id"] for r in t.scan(spark, snapshot_id=pre_snap).collect()} == before
    # row-preserving: replaying the changelog over the commit sees nothing
    chg = t.changelog_scan(spark, pre_snap)
    assert chg.count() == 0

    # idempotence: a second pass finds nothing above the min_refs floor
    assert rewrite_deletes(spark, t)["status"] == "no-candidates"


def test_rewrite_deletes_grouping_bound(spark, tmp_path):
    t = _table_with_dv_debt(spark, tmp_path)
    # force one output group per ~2 files via a tiny positions budget
    res = rewrite_deletes(spark, t, max_positions=6)
    assert res["status"] == "ok"
    assert res["dv_files_written"] == 3  # 18 positions / 6-per-group
    t.refresh()
    assert all(len(e.deletes) == 1 for e in t.live_entries())
    assert {r["id"] for r in t.scan(spark).collect()} == {
        i for i in range(300) if i % 50 > 2
    }


def test_expiry_reclaims_old_dv_files(spark, tmp_path):
    from ocel_ocpn_lakehouse_spark.maintenance.expire import expire_snapshots

    t = _table_with_dv_debt(spark, tmp_path)
    old_dvs = {d["path"] for e in t.live_entries() for d in e.deletes}
    rewrite_deletes(spark, t)
    t.refresh()
    new_dv = next(iter({e.deletes[0]["path"] for e in t.live_entries()}))
    import time

    res = expire_snapshots(
        spark, t, keep_last=1, older_than_ms=int(time.time() * 1000) + 60_000
    )
    assert res["status"] == "expired"
    t.refresh()
    for p in old_dvs:
        assert not os.path.exists(os.path.join(t.root, p)), p
    assert os.path.exists(os.path.join(t.root, new_dv))
    assert t.scan(spark).count() == 300 - 18


def test_concurrent_delete_conflicts_not_dropped(spark, tmp_path):
    """A delete committed between planning and commit must CONFLICT (the
    expected_dv_counts guard), never be silently consolidated away."""
    import pytest

    from ocel_ocpn_lakehouse_spark.core import metadata as meta
    from ocel_ocpn_lakehouse_spark.core.table import Table

    t = _table_with_dv_debt(spark, tmp_path)

    orig = Table.commit_replace
    raced = {"done": False}

    def racing_commit(self, *a, **kw):
        if not raced["done"]:
            raced["done"] = True
            other = Table(self.root, meta.load_metadata(self.root))
            delete_where(spark, other, "id % 50 = 40")
        return orig(self, *a, **kw)

    Table.commit_replace = racing_commit
    try:
        with pytest.raises(meta.ConflictError):
            rewrite_deletes(spark, t)
    finally:
        Table.commit_replace = orig
    # the racing delete survived intact
    t.refresh()
    assert t.scan(spark).filter("id % 50 = 40").count() == 0
    assert t.scan(spark).count() == 300 - 24


def test_cli_and_auto_route_consolidation(spark, tmp_path, capsys):
    """--op rewrite-deletes works standalone, and --op auto picks DV
    consolidation (not a payload rewrite) when files are healthy-sized but
    reference multiple DV files with a dead-row ratio below the absorb
    threshold."""
    import json as _json

    from ocel_ocpn_lakehouse_spark.maintenance.run import main as cli_main

    # no small-file debt (floor at 1 byte) and a dead ratio (6%) below the
    # raised absorb threshold: the ONLY maintenance auto may pick is the
    # tombstone-side consolidation
    t = _table_with_dv_debt(
        spark,
        tmp_path,
        props={
            "compact.small-file-bytes": "1",
            "compact.dead-row-absorb-ratio": "0.10",
        },
    )
    wh = str(tmp_path / "wh")

    cli_main(["--warehouse", wh, "--table", "ns.dvdebt", "--op", "auto"])
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "rewrite-deletes" in rep["actions"]
    assert "rewrite" not in rep["actions"]
    t.refresh()
    assert all(len(e.deletes) == 1 for e in t.live_entries())
    assert t.scan(spark).count() == 300 - 18

    # standalone op on an already-consolidated table: no-op
    cli_main(["--warehouse", wh, "--table", "ns.dvdebt", "--op", "rewrite-deletes"])
    rep2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["rewrite_deletes"]["status"] == "no-candidates"
