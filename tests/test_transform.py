"""T20 predicate-localized transform (UPDATE as maintenance):
maintenance/transform.py transform_where + CLI --op update."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from ocel_ocpn_lakehouse_spark.core import Catalog, PartitionSpec, TableSpec
from ocel_ocpn_lakehouse_spark.images.synth import IMAGE_SCHEMA, synth_images_df
from ocel_ocpn_lakehouse_spark.maintenance.transform import transform_where


def _table(spark, tmp_path, n=120, files=6):
    cat = Catalog(str(tmp_path / "wh"))
    t = cat.create_table(
        "ocel.images",
        IMAGE_SCHEMA,
        TableSpec(partition_spec=PartitionSpec.bucket("image_id", 2)),
    )
    t.append(synth_images_df(spark, n, seed=13), num_files=files)
    return cat, t


def _rowmap(spark, t):
    return {
        r["image_id"]: (r["caption"], r["w"], r["phash"], bytes(r["bytes"]))
        for r in t.scan(spark).collect()
    }


def test_transform_where_matches_dataframe_oracle(spark, tmp_path):
    cat, t = _table(spark, tmp_path)
    before = _rowmap(spark, t)
    files_before = {e.path for e in t.live_entries()}

    rep = transform_where(
        spark,
        t,
        "w = 32",
        {"caption": "concat('[small] ', caption)", "phash": "phash + 1"},
    )
    assert rep["status"] == "ok" and rep["updated_rows"] > 0
    t.refresh()
    after = _rowmap(spark, t)
    assert set(after) == set(before)
    for k, (cap, w, ph, raw) in before.items():
        cap2, w2, ph2, raw2 = after[k]
        if w == 32:
            assert cap2 == f"[small] {cap}" and ph2 == ph + 1
        else:
            assert (cap2, ph2) == (cap, ph)
        assert w2 == w and raw2 == raw  # untouched columns byte-equal

    # only files containing matches were rewritten
    files_after = {e.path for e in t.live_entries()}
    assert len(files_before & files_after) == rep["untouched_files"]
    assert rep["rewritten_files"] == len(files_after - files_before)

    # time travel still shows the pre-update rows
    old = {
        r["image_id"]: r["caption"]
        for r in t.scan(spark, snapshot_id=rep["snapshot_id"] - 1).collect()
    }
    assert old[next(k for k, v in before.items() if v[1] == 32)].startswith("[small]") is False


def test_transform_set_sees_original_row_and_changelog(spark, tmp_path):
    cat, t = _table(spark, tmp_path, n=60, files=3)
    base = t.current_snapshot().snapshot_id
    before = {
        r["image_id"]: (r["w"], r["h"]) for r in t.scan(spark).collect()
    }
    n_square = sum(1 for w, h in before.values() if w == h)
    assert 0 < n_square < len(before)
    # swap-style update: both SET expressions must read the ORIGINAL row
    rep = transform_where(spark, t, "w = h", {"w": "h + 1", "h": "w + 2"})
    assert rep["status"] == "ok" and rep["updated_rows"] == n_square
    t.refresh()
    for r in t.scan(spark).collect():
        w0, h0 = before[r["image_id"]]
        if w0 == h0:
            assert (r["w"], r["h"]) == (h0 + 1, w0 + 2)
        else:
            assert (r["w"], r["h"]) == (w0, h0)
    # changelog: delete pre-images + insert post-images over the REWRITTEN
    # files' rows (non-matching rows of untouched files contribute nothing)
    ch = t.changelog_scan(spark, base).select("_change_type").groupBy(
        "_change_type"
    ).count().collect()
    kinds = {r["_change_type"]: r["count"] for r in ch}
    assert kinds.get("delete", 0) == kinds.get("insert", 0) >= n_square


def test_transform_skips_tombstoned_rows_and_guards(spark, tmp_path):
    from ocel_ocpn_lakehouse_spark.maintenance.deletes import delete_where

    cat, t = _table(spark, tmp_path, n=80, files=4)
    dead = {r["image_id"] for r in t.scan(spark).filter("w = 16").collect()}
    delete_where(spark, t, "w = 16")
    t.refresh()
    n_live = t.scan(spark).count()
    rep = transform_where(spark, t, "true", {"caption": "upper(caption)"})
    t.refresh()
    rows = t.scan(spark).collect()
    assert len(rows) == n_live  # tombstoned rows did not resurrect
    assert all(r["caption"] == r["caption"].upper() for r in rows)
    assert not dead & {r["image_id"] for r in rows}
    # the rewrite absorbed the DVs on touched files
    assert all(not e.deletes for e in t.live_entries())


def test_transform_no_match_and_cli(spark, tmp_path, capsys):
    from ocel_ocpn_lakehouse_spark.maintenance.run import main as cli_main

    cat, t = _table(spark, tmp_path, n=40, files=2)
    rep = transform_where(spark, t, "w = -1", {"caption": "'x'"})
    # bounds exclude -1 everywhere -> pruned before any scan; a predicate
    # pruning can't decide (e.g. on a function) reports no-matching-rows
    assert rep["status"] == "no-candidate-files" and rep["updated_rows"] == 0
    rep = transform_where(spark, t, "w * 0 = -1", {"caption": "'x'"})
    assert rep["status"] == "no-matching-rows" and rep["updated_rows"] == 0

    rc = cli_main([
        "--warehouse", str(tmp_path / "wh"), "--table", "ocel.images",
        "--op", "update", "--where", "fmt = 'png'",
        "--set", "caption=concat(caption, '!')",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["update"]["status"] == "ok"
    t.refresh()
    assert all(
        r["caption"].endswith("!") == (r["fmt"] == "png")
        for r in t.scan(spark).collect()
    )


def test_derive_prune_predicates_grammar():
    from pyspark.sql import types as T

    from ocel_ocpn_lakehouse_spark.maintenance.predicates import (
        derive_prune_predicates,
    )

    schema = T.StructType(
        list(IMAGE_SCHEMA.fields)
        + [
            T.StructField("score", T.DoubleType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )

    def d(cond):
        return derive_prune_predicates(cond, schema)

    assert [(p.column, p.op, p.value) for p in d("w = 32")] == [("w", "=", 32)]
    assert [(p.column, p.op, p.value) for p in d("w == 32 AND fmt = 'png'")] == [
        ("w", "=", 32),
        ("fmt", "=", "png"),
    ]
    assert [(p.column, p.op, p.value) for p in d("score >= 1.5")] == [
        ("score", ">=", 1.5)
    ]
    assert [(p.column, p.op, p.value) for p in d("fmt in ('png', 'jpeg')")] == [
        ("fmt", "in", ["png", "jpeg"])
    ]
    # anything non-trivial derives NOTHING (conservative whole-or-nothing)
    for cond in (
        "w = 32 OR h = 16",
        "w != 32",
        "upper(fmt) = 'PNG'",
        "w = h",
        "not w = 32",
        "caption = 'fish and chips'",
        "w = 32 AND (h = 16 OR h = 32)",
        "image_id in (select 1)",
        # strict literal/column typing: float literal on int column, int on
        # double, int on string, and ANY temporal column (isoformat bounds
        # vs space-separated SQL literals) poison the derivation
        "w = 32.0",
        "score = 1",
        "fmt = 1",
        "ts = '2024-03-05 12:00:00'",
        "w = 32 AND ts > '2024-01-01 00:00:00'",
        "nosuchcol = 1",
    ):
        assert d(cond) == [], cond
    assert derive_prune_predicates("w = 32", None) == []


def test_update_and_delete_prune_candidates_from_condition(spark, tmp_path):
    from ocel_ocpn_lakehouse_spark.maintenance.deletes import delete_where

    cat = Catalog(str(tmp_path / "wh"))
    t = cat.create_table("ocel.images", IMAGE_SCHEMA, TableSpec())
    src = synth_images_df(spark, 200, seed=5)
    # two appends with disjoint w ranges -> tight per-file bounds
    t.append(src.filter("w <= 32"), num_files=2)
    t.append(src.filter("w > 32"), num_files=2)
    total = len(t.live_entries())
    rep = transform_where(spark, t, "w = 16", {"caption": "upper(caption)"})
    assert rep["status"] == "ok"
    assert rep["candidate_files"] < total  # manifest bounds pruned candidates
    t.refresh()
    rep2 = delete_where(spark, t, "w = 128")
    assert rep2["candidate_files"] < len(t.live_entries()) + 1
    t.refresh()
    assert t.scan(spark).filter("w = 128").count() == 0
    assert t.scan(spark).filter("w = 16").count() > 0


def test_transform_rejects_partition_source_set(spark, tmp_path):
    import pytest as _pytest

    cat, t = _table(spark, tmp_path, n=20, files=1)
    with _pytest.raises(ValueError, match="partition-source"):
        transform_where(spark, t, "w = 16", {"image_id": "concat('x', image_id)"})


def test_transform_dv_only_matches_touch_nothing(spark, tmp_path):
    """A file whose only predicate matches are already-tombstoned rows is
    NOT rewritten (no wasted I/O, no phantom changelog churn)."""
    from ocel_ocpn_lakehouse_spark.maintenance.deletes import delete_where

    cat, t = _table(spark, tmp_path, n=80, files=4)
    delete_where(spark, t, "w = 16")
    t.refresh()
    base = t.current_snapshot().snapshot_id
    rep = transform_where(spark, t, "w = 16", {"caption": "'gone'"})
    assert rep["updated_rows"] == 0
    assert rep["status"] in ("no-matching-rows", "no-candidate-files")
    t.refresh()
    assert t.current_snapshot().snapshot_id == base  # no commit at all


def test_transform_preserves_huge_bigints_next_to_nulls(spark, tmp_path):
    """Arrow-native writer: an int64 column holding a null must not send
    the file through pandas float64 (which rounds values above 2^53)."""
    from pyspark.sql import types as T

    cat = Catalog(str(tmp_path / "wh"))
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("big", T.LongType(), True),
            T.StructField("txt", T.StringType(), True),
        ]
    )
    t = cat.create_table("ocel.bigs", schema, TableSpec())
    huge = (1 << 62) + 12345  # far beyond float64's 2^53 integer range
    t.append(
        spark.createDataFrame(
            [(1, huge, "a"), (2, None, "b"), (3, huge + 1, "c")], schema
        ),
        num_files=1,
    )
    rep = transform_where(spark, t, "id = 2", {"txt": "'B'"})
    assert rep["status"] == "ok" and rep["updated_rows"] == 1
    t.refresh()
    got = {r["id"]: (r["big"], r["txt"]) for r in t.scan(spark).collect()}
    assert got == {1: (huge, "a"), 2: (None, "B"), 3: (huge + 1, "c")}
