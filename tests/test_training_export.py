"""Training-export surface: grouped shard packing, aspect bucketing,
WebDataset tar export (images/export.py, functions/pack.py group_cols)."""

import hashlib
import math
import tarfile

import pytest

from ocel_ocpn_lakehouse_spark.functions.pack import assign_shards
from ocel_ocpn_lakehouse_spark.images.export import (
    DEFAULT_BUCKETS,
    assign_aspect_buckets,
    export_webdataset,
    pack_training_batches,
)
from ocel_ocpn_lakehouse_spark.images.synth import synth_images_df


def _rows(seed: int, n: int):
    """Deterministic (id, group, tokens) rows with ragged group sizes."""
    rows = []
    x = seed
    for i in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        rows.append((i, (x >> 5) % 4, 1 + (x >> 13) % 50))
    return rows


def test_grouped_assign_shards_matches_per_group_cumsum(spark):
    rows = _rows(7, 400)
    df = spark.createDataFrame(rows, "doc_id long, grp int, n_tokens long")
    got = {
        (r["doc_id"]): (r["grp"], r["shard"])
        for r in assign_shards(
            df, budget=100, group_cols=["grp"], num_partitions=7
        ).collect()
    }
    # oracle: python per-group running sum in doc_id order
    expect = {}
    run = {}
    for doc_id, grp, tok in sorted(rows):
        before = run.get(grp, 0)
        expect[doc_id] = (grp, before // 100)
        run[grp] = before + tok
    assert got == expect


def test_grouped_assign_shards_layout_invariant(spark):
    rows = _rows(11, 300)
    df = spark.createDataFrame(rows, "doc_id long, grp int, n_tokens long")
    a = assign_shards(df, budget=64, group_cols=["grp"], num_partitions=3)
    b = assign_shards(
        df.repartition(13, "n_tokens"), budget=64, group_cols=["grp"], num_partitions=9
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_ungrouped_assign_shards_unchanged(spark):
    rows = [(i, 10) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = dict(
        (r["doc_id"], r["shard"])
        for r in assign_shards(df, budget=25, num_partitions=4).collect()
    )
    assert got == {i: (i * 10) // 25 for i in range(100)}


def test_aspect_buckets_match_python_argmin(spark):
    dims = [(w, h) for w in (16, 24, 32, 48, 64, 96, 128, 200) for h in (16, 24, 32, 48, 64, 96, 128, 200)]
    df = spark.createDataFrame(
        [(i, w, h) for i, (w, h) in enumerate(dims)], "id int, w int, h int"
    )
    out = {
        r["id"]: (r["bucket_id"], r["bucket_w"], r["bucket_h"])
        for r in assign_aspect_buckets(df).collect()
    }
    for i, (w, h) in enumerate(dims):
        best = min(
            range(len(DEFAULT_BUCKETS)),
            key=lambda j: (
                abs(math.log(w / h) - math.log(DEFAULT_BUCKETS[j][0] / DEFAULT_BUCKETS[j][1])),
                j,
            ),
        )
        assert out[i] == (best, *DEFAULT_BUCKETS[best]), (w, h)


def test_aspect_buckets_reject_duplicate_aspects(spark):
    df = spark.createDataFrame([(1, 2, 2)], "id int, w int, h int")
    with pytest.raises(ValueError, match="share aspect ratio"):
        assign_aspect_buckets(df, buckets=[(64, 32), (128, 64)])


def test_pack_training_batches_exact_sizes(spark):
    df = assign_aspect_buckets(
        synth_images_df(spark, n_rows=300, seed=3, parallelism=6)
    )
    packed = pack_training_batches(df, batch_size=16, num_partitions=5)
    sizes = (
        packed.groupBy("bucket_id", "shard").count().collect()
    )
    per_bucket = {}
    for r in sizes:
        per_bucket.setdefault(r["bucket_id"], {})[r["shard"]] = r["count"]
    assert per_bucket, "no batches produced"
    for b, shards in per_bucket.items():
        assert set(shards) == set(range(len(shards))), "shard ids not dense"
        for s, n in shards.items():
            if s < len(shards) - 1:
                assert n == 16, (b, s, n)
            else:
                assert 1 <= n <= 16
    # batches never mix buckets and cover every row exactly once
    assert packed.count() == 300
    assert sum(sum(s.values()) for s in per_bucket.values()) == 300


def test_webdataset_roundtrip_and_determinism(spark, tmp_path):
    imgs = assign_aspect_buckets(
        synth_images_df(spark, n_rows=60, seed=9, parallelism=4)
    )
    packed = pack_training_batches(imgs, batch_size=8, order_col="image_id")
    out1 = tmp_path / "wds1"
    members = [("bytes", "@fmt"), ("caption", "txt")]
    m1 = export_webdataset(packed, str(out1), members).collect()
    assert sum(r["n_items"] for r in m1) == 60
    # round-trip one shard: members sorted by key, payloads byte-equal
    src = {
        r["image_id"]: (bytes(r["bytes"]), r["fmt"], r["caption"])
        for r in packed.collect()
    }
    checked = 0
    for r in m1:
        with tarfile.open(r["path"]) as tf:
            names = tf.getnames()
            assert names == sorted(names)
            for nm in names:
                key, ext = nm.rsplit(".", 1)
                blob = tf.extractfile(nm).read()
                raw, fmt, caption = src[key]
                if ext == "txt":
                    assert blob.decode() == caption
                else:
                    assert ext == fmt and blob == raw
                checked += 1
        with open(r["path"], "rb") as f:
            assert hashlib.sha256(f.read()).hexdigest() == r["sha256"]
    assert checked == 2 * 60
    # determinism: different layout, different output dir -> same hashes
    out2 = tmp_path / "wds2"
    m2 = export_webdataset(
        packed.repartition(11, "phash"), str(out2), members
    ).collect()
    h1 = {r["shard_name"]: r["sha256"] for r in m1}
    h2 = {r["shard_name"]: r["sha256"] for r in m2}
    assert h1 == h2


def test_export_job_resume_restamp_and_cli(spark, tmp_path, capsys):
    import json

    from ocel_ocpn_lakehouse_spark.core import Catalog, TableSpec
    from ocel_ocpn_lakehouse_spark.images.export import (
        _MANIFEST_SCHEMA,
        export_webdataset_job,
    )
    from ocel_ocpn_lakehouse_spark.images.synth import IMAGE_SCHEMA
    from ocel_ocpn_lakehouse_spark.maintenance.run import main as cli_main

    wh, out = str(tmp_path / "wh"), str(tmp_path / "out")
    cat = Catalog(wh)
    t = cat.create_table("ocel.images", IMAGE_SCHEMA, TableSpec())
    t.append(synth_images_df(spark, 80, seed=2), num_files=4)

    r1 = export_webdataset_job(spark, cat, "ocel.images", out, batch_size=8)
    assert r1["skipped"] == 0 and r1["items"] == 80 and r1["exported"] > 0
    mt = cat.load_table(r1["manifest_table"])
    full = {r["shard_name"]: r["sha256"] for r in mt.scan(spark).collect()}
    assert len(full) == r1["exported"]

    # same snapshot, same manifest -> pure no-op resume
    r2 = export_webdataset_job(spark, cat, "ocel.images", out, batch_size=8)
    assert r2["exported"] == 0 and r2["skipped"] == r1["exported"]

    # crash sim: manifest only recorded half the shards (tars all on disk)
    rows = mt.scan(spark).collect()
    half = rows[: len(rows) // 2]
    mt.overwrite(
        spark.createDataFrame(half, _MANIFEST_SCHEMA),
        set_properties={"export-source-snapshot-id": r1["snapshot_id"]},
    )
    r3 = export_webdataset_job(spark, cat, "ocel.images", out, batch_size=8)
    assert r3["skipped"] == len(half)
    assert r3["exported"] == len(rows) - len(half)
    after = {
        r["shard_name"]: r["sha256"]
        for r in cat.load_table(r1["manifest_table"]).refresh().scan(spark).collect()
    }
    assert after == full  # re-exported shards byte-identical to originals

    # source moved by a monotone append ('x_' sorts after 'img_') -> the
    # incremental path re-exports only the delta + touched partial tails,
    # and the manifest restamps to the new head covering all 104 rows
    t.refresh().append(synth_images_df(spark, 24, seed=77).selectExpr(
        "concat('x_', image_id) AS image_id", "bytes", "w", "h", "fmt", "caption", "phash"
    ), num_files=2)
    r4 = export_webdataset_job(spark, cat, "ocel.images", out, batch_size=8)
    assert r4["mode"] == "incremental" and r4["items"] >= 24
    mt2 = cat.load_table(r1["manifest_table"]).refresh()
    assert mt2.properties["export-source-snapshot-id"] == str(r4["snapshot_id"])
    assert sum(r["n_items"] for r in mt2.scan(spark).collect()) == 104

    # CLI surface: resume through --op export reports a no-op
    rc = cli_main([
        "--warehouse", wh, "--table", "ocel.images", "--op", "export",
        "--export-dir", out, "--batch-size", "8",
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["export"]["exported"] == 0
    assert rep["export"]["skipped"] == len(
        cat.load_table(r1["manifest_table"]).refresh().scan(spark).collect()
    )


def test_grouped_assign_shards_null_group_raises(spark):
    df = spark.createDataFrame(
        [(1, 0, 5), (2, None, 5)], "doc_id long, grp int, n_tokens long"
    )
    with pytest.raises(ValueError, match="null group key"):
        assign_shards(df, budget=10, group_cols=["grp"], num_partitions=2).collect()


def test_export_job_config_change_resweeps(spark, tmp_path):
    from ocel_ocpn_lakehouse_spark.core import Catalog, TableSpec
    from ocel_ocpn_lakehouse_spark.images.export import export_webdataset_job
    from ocel_ocpn_lakehouse_spark.images.synth import IMAGE_SCHEMA

    wh, out = str(tmp_path / "wh"), str(tmp_path / "out")
    cat = Catalog(wh)
    t = cat.create_table("ocel.images", IMAGE_SCHEMA, TableSpec())
    t.append(synth_images_df(spark, 64, seed=4), num_files=4)

    r1 = export_webdataset_job(spark, cat, "ocel.images", out, batch_size=4)
    # same snapshot, different batch_size -> config fingerprint mismatch:
    # full re-export, and tars of the retired packing are swept
    r2 = export_webdataset_job(spark, cat, "ocel.images", out, batch_size=32)
    assert r2["skipped"] == 0 and r2["items"] == 64
    assert r2["exported"] < r1["exported"]  # coarser packing -> fewer shards
    assert r2["swept"] > 0
    import os

    on_disk = {f for f in os.listdir(out) if f.endswith(".tar")}
    mt = cat.load_table(r2["manifest_table"]).refresh()
    manifest_names = {r["shard_name"] for r in mt.scan(spark).collect()}
    assert on_disk == manifest_names  # directory == manifest, no strays
    assert all(n.startswith("ocel_images-shard-") for n in on_disk)


def test_export_job_branch_head(spark, tmp_path):
    from ocel_ocpn_lakehouse_spark.core import Catalog, TableSpec
    from ocel_ocpn_lakehouse_spark.images.export import export_webdataset_job
    from ocel_ocpn_lakehouse_spark.images.synth import IMAGE_SCHEMA

    wh, out = str(tmp_path / "wh"), str(tmp_path / "out")
    cat = Catalog(wh)
    t = cat.create_table("ocel.images", IMAGE_SCHEMA, TableSpec())
    t.append(synth_images_df(spark, 40, seed=6), num_files=2)
    t.create_branch("staging")
    tb = t.branch("staging")
    tb.append(
        synth_images_df(spark, 16, seed=99).selectExpr(
            "concat('b_', image_id) AS image_id",
            "bytes", "w", "h", "fmt", "caption", "phash",
        ),
        num_files=1,
    )
    # main head: 40 rows; branch head: 56 — the bound handle must win
    r = export_webdataset_job(
        spark, cat, "ocel.images", out, batch_size=8, table=tb.refresh()
    )
    assert r["items"] == 56
    assert r["snapshot_id"] == tb.refresh().current_snapshot().snapshot_id


def _mk_images_table(spark, tmp_path, n=60, seed=11, files=3):
    from ocel_ocpn_lakehouse_spark.core import Catalog, TableSpec
    from ocel_ocpn_lakehouse_spark.images.synth import IMAGE_SCHEMA

    cat = Catalog(str(tmp_path / "wh"))
    t = cat.create_table("ocel.images", IMAGE_SCHEMA, TableSpec())
    t.append(synth_images_df(spark, n, seed=seed), num_files=files)
    return cat, t


def _append_prefixed(spark, t, prefix, n, seed):
    t.refresh().append(
        synth_images_df(spark, n, seed=seed).selectExpr(
            f"concat('{prefix}', image_id) AS image_id",
            "bytes", "w", "h", "fmt", "caption", "phash",
        ),
        num_files=2,
    )


def test_export_job_incremental_equals_full(spark, tmp_path):
    from ocel_ocpn_lakehouse_spark.images.export import export_webdataset_job

    cat, t = _mk_images_table(spark, tmp_path)
    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    r1 = export_webdataset_job(spark, cat, "ocel.images", out1, batch_size=8)
    # append rows whose keys sort AFTER everything recorded ('z_' > 'img_')
    _append_prefixed(spark, t, "z_", 28, 12)
    r2 = export_webdataset_job(spark, cat, "ocel.images", out1, batch_size=8)
    assert r2["mode"] == "incremental"
    assert r2["items"] >= 28  # delta + touched partial tails only
    assert r2["skipped"] > 0  # full shards of untouched packing kept
    # oracle: a from-scratch export of the same head is byte-identical
    r3 = export_webdataset_job(
        spark, cat, "ocel.images", out2, batch_size=8,
        manifest_table="ocel.images_export_oracle",
    )
    inc = {
        (r["shard_name"]): (r["n_items"], r["sha256"])
        for r in cat.load_table("ocel.images_export").refresh().scan(spark).collect()
    }
    full = {
        (r["shard_name"]): (r["n_items"], r["sha256"])
        for r in cat.load_table("ocel.images_export_oracle").refresh().scan(spark).collect()
    }
    assert inc == full
    assert sum(n for n, _ in inc.values()) == 88
    # and the incremental directory's bytes match its manifest
    import hashlib as _h
    import os as _os

    for r in cat.load_table("ocel.images_export").refresh().scan(spark).collect():
        with open(_os.path.join(out1, r["shard_name"]), "rb") as f:
            assert _h.sha256(f.read()).hexdigest() == r["sha256"]


def test_export_job_incremental_fallbacks(spark, tmp_path):
    from ocel_ocpn_lakehouse_spark.images.export import export_webdataset_job
    from ocel_ocpn_lakehouse_spark.maintenance.deletes import delete_where

    cat, t = _mk_images_table(spark, tmp_path)
    out = str(tmp_path / "o")
    export_webdataset_job(spark, cat, "ocel.images", out, batch_size=8)
    # keys sorting BEFORE recorded ones ('a_' < 'img_') shift shard
    # contents -> monotonicity violated -> silent full re-export
    _append_prefixed(spark, t, "a_", 12, 13)
    r = export_webdataset_job(spark, cat, "ocel.images", out, batch_size=8)
    assert "mode" not in r and r["skipped"] == 0 and r["items"] == 72
    # a non-append commit (MoR delete) -> IncrementalScanError -> full
    delete_where(spark, t.refresh(), "w = 32")
    r2 = export_webdataset_job(spark, cat, "ocel.images", out, batch_size=8)
    assert "mode" not in r2 and r2["skipped"] == 0
    left = t.refresh().scan(spark).count()
    assert r2["items"] == left


def test_export_job_legacy_manifest_upgrades_and_falls_back(spark, tmp_path):
    """A manifest written before packing coordinates existed (5-column
    schema) must not crash the incremental branch: the job adds the
    columns additively, sees null coordinates, declines incrementally and
    re-exports in full — after which the manifest carries coordinates."""
    from pyspark.sql import types as T

    from ocel_ocpn_lakehouse_spark.core import TableSpec
    from ocel_ocpn_lakehouse_spark.images.export import export_webdataset_job

    cat, t = _mk_images_table(spark, tmp_path, n=40, seed=21, files=2)
    out = str(tmp_path / "o")
    # probe run (same out_dir + args, separate manifest) only to learn the
    # exact config fingerprint, so the legacy manifest takes the
    # incremental branch rather than the config-change branch
    export_webdataset_job(
        spark, cat, "ocel.images", out, batch_size=8,
        manifest_table="ocel.probe_manifest",
    )
    fp = cat.load_table("ocel.probe_manifest").properties["export-config-fingerprint"]
    legacy_schema = T.StructType(
        [
            T.StructField("shard_name", T.StringType(), False),
            T.StructField("path", T.StringType(), False),
            T.StructField("n_items", T.LongType(), False),
            T.StructField("n_bytes", T.LongType(), False),
            T.StructField("sha256", T.StringType(), False),
        ]
    )
    lt = cat.create_table("ocel.images_export", legacy_schema, TableSpec())
    entries = lt.write_data_files(
        spark.createDataFrame(
            [("old.tar", "/nowhere/old.tar", 8, 100, "00")], legacy_schema
        )
    )
    lt.commit_append(
        entries,
        set_properties={
            "export-source-snapshot-id": 1,
            "export-config-fingerprint": fp,  # same args, different out_dir
        },
    )
    # source moves so the stamp is stale; job must upgrade + fall back
    _append_prefixed(spark, t, "z_", 8, 33)
    r = export_webdataset_job(spark, cat, "ocel.images", out, batch_size=8)
    assert "mode" not in r and r["items"] == 48
    mt = cat.load_table("ocel.images_export").refresh()
    rows = mt.scan(spark).collect()
    assert sum(x["n_items"] for x in rows) == 48
    assert all(x["bucket_id"] is not None and x["last_key"] is not None for x in rows)


def test_auto_pass_refreshes_stale_export(spark, tmp_path, capsys):
    import json

    from ocel_ocpn_lakehouse_spark.images.export import export_webdataset_job
    from ocel_ocpn_lakehouse_spark.maintenance.run import main as cli_main

    cat, t = _mk_images_table(spark, tmp_path, n=48, seed=31, files=2)
    wh, out = str(tmp_path / "wh"), str(tmp_path / "o")
    export_webdataset_job(spark, cat, "ocel.images", out, batch_size=8)
    _append_prefixed(spark, t, "z_", 8, 41)

    # auto WITHOUT --export-dir only surfaces staleness
    rc = cli_main(["--warehouse", wh, "--table", "ocel.images", "--op", "auto"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["export_stale"] is True and "export" not in rep

    # auto WITH --export-dir refreshes (incremental) and restamps
    rc = cli_main([
        "--warehouse", wh, "--table", "ocel.images", "--op", "auto",
        "--export-dir", out, "--batch-size", "8",
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "export" in rep["actions"]
    assert rep["export"]["mode"] == "incremental"

    rc = cli_main([
        "--warehouse", wh, "--table", "ocel.images", "--op", "auto",
        "--export-dir", out, "--batch-size", "8",
    ])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["export_stale"] is False and "export" not in rep["actions"]


def test_export_job_batches_per_shard_grouping(spark, tmp_path):
    """batches_per_shard decouples tar size from training batch size: tars
    hold batch_size*bps rows (only a bucket's last tar runs short), member
    names carry the batch id as a directory prefix, the batches inside are
    EXACTLY the batches bps=1 packing assigns, and a from-scratch rerun is
    byte-identical."""
    import collections
    import os

    from ocel_ocpn_lakehouse_spark.images.export import export_webdataset_job

    cat, t = _mk_images_table(spark, tmp_path, n=120, seed=13, files=4)
    out = str(tmp_path / "o")
    r1 = export_webdataset_job(
        spark, cat, "ocel.images", out, batch_size=4, batches_per_shard=3
    )
    man = {
        r["shard_name"]: r
        for r in cat.load_table("ocel.images_export").scan(spark).collect()
    }
    assert r1["exported"] == len(man) and r1["items"] == 120

    per_bucket = collections.defaultdict(list)
    for r in man.values():
        per_bucket[r["bucket_id"]].append((r["shard"], r["n_items"]))
    for lst in per_bucket.values():
        lst.sort()
        assert [s for s, _ in lst] == list(range(len(lst)))  # dense tar ids
        assert all(n == 12 for _, n in lst[:-1])  # full tars = 3 batches of 4
        assert 0 < lst[-1][1] <= 12

    got = collections.defaultdict(set)
    for name, r in man.items():
        with tarfile.open(os.path.join(out, name)) as tf:
            for m in tf.getmembers():
                bid, rest = m.name.split("/", 1)
                got[(r["bucket_id"], int(bid))].add(rest.split(".")[0])
                assert int(bid) // 3 == r["shard"]  # batch lands in its tar
    packed = pack_training_batches(
        assign_aspect_buckets(t.scan(spark)), batch_size=4
    )
    expect = collections.defaultdict(set)
    for r in packed.select("bucket_id", "shard", "image_id").collect():
        expect[(r["bucket_id"], r["shard"])].add(r["image_id"])
    assert got == expect

    out2 = str(tmp_path / "o2")
    export_webdataset_job(
        spark, cat, "ocel.images", out2, batch_size=4, batches_per_shard=3,
        manifest_table="ocel.images_export2",
    )
    man2 = {
        r["shard_name"]: (r["n_items"], r["sha256"])
        for r in cat.load_table("ocel.images_export2").scan(spark).collect()
    }
    assert {k: (v["n_items"], v["sha256"]) for k, v in man.items()} == man2


def test_export_job_incremental_batches_per_shard_no_driver_manifest(
    spark, tmp_path, monkeypatch
):
    """Incremental export with batches_per_shard>1 stays byte-identical to
    from-scratch, and NOTHING O(#shards) is ever collected: every driver
    collect during both jobs must stay under the shard count (the round-4
    implementation collected one Row per tar and fails this)."""
    import os

    try:  # the concrete class overriding collect() (PySpark 4 split)
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pragma: no cover
        from pyspark.sql import DataFrame
    from ocel_ocpn_lakehouse_spark.images.export import export_webdataset_job

    cat, t = _mk_images_table(spark, tmp_path, n=600, seed=17, files=4)
    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")

    biggest = {"n": 0}
    orig = DataFrame.collect

    def capped(self):
        rows = orig(self)
        biggest["n"] = max(biggest["n"], len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", capped)
    r1 = export_webdataset_job(
        spark, cat, "ocel.images", out1, batch_size=4, batches_per_shard=2
    )
    _append_prefixed(spark, t, "z_", 40, 19)
    r2 = export_webdataset_job(
        spark, cat, "ocel.images", out1, batch_size=4, batches_per_shard=2
    )
    monkeypatch.setattr(DataFrame, "collect", orig)
    assert r2["mode"] == "incremental" and r2["skipped"] > 0
    n_shards = r1["exported"] + r2["exported"]
    assert n_shards > 70  # the cap below is only meaningful if shards >> it
    assert 0 < biggest["n"] < 70, (
        f"driver collected {biggest['n']} rows during export of {n_shards} shards"
    )

    r3 = export_webdataset_job(
        spark, cat, "ocel.images", out2, batch_size=4, batches_per_shard=2,
        manifest_table="ocel.images_export_oracle",
    )
    inc = {
        r["shard_name"]: (r["n_items"], r["sha256"])
        for r in cat.load_table("ocel.images_export").refresh().scan(spark).collect()
    }
    full = {
        r["shard_name"]: (r["n_items"], r["sha256"])
        for r in
        cat.load_table("ocel.images_export_oracle").refresh().scan(spark).collect()
    }
    assert inc == full and sum(n for n, _ in inc.values()) == 640
    for name in inc:  # directory contents match the manifest bytes exactly
        with open(os.path.join(out1, name), "rb") as f:
            assert hashlib.sha256(f.read()).hexdigest() == inc[name][1]


def test_export_job_zero_row_table(spark, tmp_path):
    """A table with a snapshot but no rows exports cleanly: empty manifest
    overwrite, empty sweep listing (the binaryFile path on an empty
    out_dir), zeros in the report — and a no-snapshot table raises."""
    from ocel_ocpn_lakehouse_spark.core import Catalog, TableSpec
    from ocel_ocpn_lakehouse_spark.images.export import export_webdataset_job
    from ocel_ocpn_lakehouse_spark.images.synth import IMAGE_SCHEMA

    cat = Catalog(str(tmp_path / "wh"))
    t = cat.create_table("ocel.images", IMAGE_SCHEMA, TableSpec())
    out = str(tmp_path / "o")
    with pytest.raises(ValueError, match="no snapshot"):
        export_webdataset_job(spark, cat, "ocel.images", out, batch_size=8)
    t.append(spark.createDataFrame([], IMAGE_SCHEMA), num_files=1)
    r = export_webdataset_job(spark, cat, "ocel.images", out, batch_size=8)
    assert r["exported"] == 0 and r["items"] == 0 and r["swept"] == 0
    assert cat.load_table("ocel.images_export").scan(spark).count() == 0
