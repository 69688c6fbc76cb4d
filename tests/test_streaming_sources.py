import json
import os

from pyspark.sql import functions as F

from ocel_ocpn_lakehouse_spark.core import Catalog, PartitionSpec, TableSpec
from ocel_ocpn_lakehouse_spark.sources import load_ocel_json
from ocel_ocpn_lakehouse_spark.streaming import stream_append


def test_stream_append_exactly_once(spark, tmp_path):
    src = tmp_path / "drop"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    cat = Catalog(str(tmp_path / "wh"))
    schema = "id long, v string"
    from pyspark.sql import types as T

    st = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    t = cat.create_table("ns.stream", st)

    spark.range(0, 50).select("id", F.lit("a").alias("v")).write.mode("overwrite").parquet(
        str(src / "batch1")
    )
    n1 = stream_append(spark, t, str(src / "*"), st, ckpt, stream_id="s1")
    assert n1 >= 1
    assert t.refresh().scan(spark).count() == 50

    # drain again with nothing new → no new snapshots
    snaps = len(t.snapshots())
    stream_append(spark, t, str(src / "*"), st, ckpt, stream_id="s1")
    assert len(t.refresh().snapshots()) == snaps

    # second batch arrives → only the delta is appended
    spark.range(100, 130).select("id", F.lit("b").alias("v")).write.mode("overwrite").parquet(
        str(src / "batch2")
    )
    stream_append(spark, t, str(src / "*"), st, ckpt, stream_id="s1")
    assert t.refresh().scan(spark).count() == 80
    # epoch guard: every committed snapshot has a distinct epoch
    epochs = [s.summary.get("stream-epoch") for s in t.snapshots() if "stream-epoch" in s.summary]
    assert len(epochs) == len(set(epochs))


def test_ocel_json_source(spark, tmp_path):
    doc = {
        "events": [
            {
                "id": "e1",
                "type": "create_order",
                "time": "2024-01-05T10:00:00",
                "attributes": [
                    {"name": "amount", "value": 12.5},
                    {"name": "priority", "value": "high"},
                    {"name": "items", "value": 3},
                    {"name": "express", "value": True},
                ],
                "relationships": [
                    {"objectId": "o1", "qualifier": "order"},
                    {"objectId": "o2", "qualifier": "customer"},
                ],
            },
            {"id": "e2", "type": "ship_order", "time": "2024-02-01T08:30:00"},
        ],
        "objects": [
            {"id": "o1", "type": "order"},
            {"id": "o2", "type": "customer"},
        ],
    }
    p = tmp_path / "log.json"
    p.write_text(json.dumps(doc))
    tables = load_ocel_json(spark, str(p))

    ev = {r["id"]: r for r in tables["events"].collect()}
    assert set(ev) == {"e1", "e2"}
    assert ev["e1"]["event_month"] == "2024-01"
    assert tables["event_objects"].count() == 2
    attrs = {r["name"]: r for r in tables["event_attributes"].collect()}
    # EAV dispatch: double / string / long / boolean (bool-before-long)
    assert attrs["amount"]["val_type"] == "double" and attrs["amount"]["val_double"] == 12.5
    assert attrs["priority"]["val_type"] == "string"
    assert attrs["items"]["val_type"] == "long" and attrs["items"]["val_long"] == 3
    assert attrs["express"]["val_type"] == "boolean" and attrs["express"]["val_boolean"] is True
    assert tables["objects"].count() == 2


def test_streaming_ingest_then_maintenance_e2e(spark, tmp_path):
    """The production loop: micro-batched image ingest fragments the table;
    compaction + clustering heal it; scans stay equivalent and time travel
    reproduces every ingest epoch (SURVEY §2.11 + north-rule resume)."""
    from ocel_ocpn_lakehouse_spark.core import SortOrder
    from ocel_ocpn_lakehouse_spark.images.synth import IMAGE_SCHEMA, synth_images_df
    from ocel_ocpn_lakehouse_spark.maintenance.checkpoint import SystemTables
    from ocel_ocpn_lakehouse_spark.maintenance.cluster import execute_cluster
    from ocel_ocpn_lakehouse_spark.maintenance.compact import execute_compaction
    from ocel_ocpn_lakehouse_spark.maintenance.verify import verify_checksum_equivalence

    src = tmp_path / "drop"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    cat = Catalog(str(tmp_path / "wh"))
    t = cat.create_table(
        "ns.images",
        IMAGE_SCHEMA,
        TableSpec(
            partition_spec=PartitionSpec.bucket("image_id", 2),
            sort_order=SortOrder.by("phash"),
            properties={
                "write.target-file-size-bytes": str(512 * 1024),
                "compact.small-file-bytes": str(128 * 1024),
            },
        ),
    )
    # three micro-batch drops → three epochs of small files
    for lo, hi in ((0, 60), (60, 110), (110, 150)):
        synth_images_df(spark, n_rows=hi, seed=9).filter(
            F.col("image_id") >= f"img_{lo:012d}"
        ).repartition(3).write.mode("overwrite").parquet(str(src / f"b{lo}"))
        stream_append(spark, t, str(src / "*"), IMAGE_SCHEMA, ckpt, stream_id="img")
        t.refresh()
    assert t.scan(spark).count() == 150
    pre_snap = t.current_snapshot().snapshot_id
    files_before = len(t.live_entries())

    st = SystemTables(cat.warehouse)
    execute_compaction(spark, t, st, "ns.images")
    t.refresh()
    execute_cluster(spark, t, st, "ns.images", curve="zorder")
    t.refresh()
    assert len(t.live_entries()) < files_before
    v = verify_checksum_equivalence(spark, t, pre_snap)
    assert v["passed"] and v["rows"] == 150
    # every ingest epoch remains reproducible
    for s in t.snapshots():
        if "stream-epoch" in s.summary:
            assert t.scan(spark, snapshot_id=s.snapshot_id).count() > 0


def test_stream_upserts_cdc_exactly_once_mor(spark, tmp_path):
    """Streaming CDC apply: each micro-batch is a MoR MERGE (tombstones +
    upsert appends in one snapshot carrying the stream epoch), replays are
    skipped whole, and pre-merge data files are never rewritten."""
    from pyspark.sql import types as T

    from ocel_ocpn_lakehouse_spark.streaming import stream_upserts

    src = tmp_path / "cdc"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_cdc")
    cat = Catalog(str(tmp_path / "wh_cdc"))
    st = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    cdc_schema = T.StructType(list(st.fields) + [T.StructField("_op", T.StringType())])
    t = cat.create_table("ns.cdc", st, TableSpec(partition_spec=PartitionSpec.bucket("id", 2)))
    t.append(spark.range(0, 100).select("id", F.lit("a").alias("v")), num_files=4)
    base_files = {e.path for e in t.live_entries()}

    # batch: update ids 0-9 to 'b', delete ids 90-94, insert 200-204
    upd = spark.range(0, 10).select("id", F.lit("b").alias("v"), F.lit("upsert").alias("_op"))
    dele = spark.range(90, 95).select("id", F.lit("").alias("v"), F.lit("delete").alias("_op"))
    ins = spark.range(200, 205).select("id", F.lit("n").alias("v"), F.lit("upsert").alias("_op"))
    upd.unionByName(dele).unionByName(ins).coalesce(1).write.mode("overwrite").parquet(
        str(src / "b1")
    )

    n = stream_upserts(spark, t, str(src / "*"), cdc_schema, ckpt, key="id", stream_id="cdc1")
    assert n == 1
    t = t.refresh()
    got = {r["id"]: r["v"] for r in t.scan(spark).collect()}
    assert len(got) == 100 - 5 + 5
    assert all(got[i] == "b" for i in range(10))
    assert all(i not in got for i in range(90, 95))
    assert all(got[i] == "n" for i in range(200, 205))
    # MoR: every pre-merge file still live (tombstoned, not rewritten)
    assert base_files <= {e.path for e in t.live_entries()}
    snap = t.current_snapshot()
    assert snap.operation == "merge" and snap.summary["stream-id"] == "cdc1"

    # replay the same drain: epoch guard skips it, no new snapshot
    n_snaps = len(t.snapshots())
    n2 = stream_upserts(spark, t, str(src / "*"), cdc_schema, ckpt, key="id", stream_id="cdc1")
    assert n2 == 0 and len(t.refresh().snapshots()) == n_snaps

    # a second CDC batch arrives → one more merge, applied on top
    spark.range(0, 5).select(
        "id", F.lit("c").alias("v"), F.lit("delete").alias("_op")
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "b2"))
    n3 = stream_upserts(spark, t, str(src / "*"), cdc_schema, ckpt, key="id", stream_id="cdc1")
    assert n3 == 1
    t = t.refresh()
    got2 = {r["id"]: r["v"] for r in t.scan(spark).collect()}
    assert all(i not in got2 for i in range(5)) and got2[5] == "b"
    assert len(got2) == len(got) - 5


def test_stream_dedup_ingest_exactly_once(spark, tmp_path):
    """Streaming deduplicated ingest: each micro-batch lands only
    fingerprint-new docs (in-batch survivor + anti-join vs the corpus,
    whose fp column IS the seen-set), atomically with the epoch marker;
    replays and re-drains are no-ops."""
    from pyspark.sql import types as T

    from ocel_ocpn_lakehouse_spark.streaming import stream_dedup_ingest

    src = tmp_path / "drop"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    cat = Catalog(str(tmp_path / "wh"))
    st = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    out_schema = T.StructType(list(st.fields) + [T.StructField("fp", T.StringType())])
    t = cat.create_table("ns.docs", out_schema)

    spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta"), (3, "alpha beta gamma")],
        st,
    ).write.mode("overwrite").parquet(str(src / "b1"))
    n = stream_dedup_ingest(spark, t, str(src / "*"), st, ckpt)
    assert n >= 1
    t = t.refresh()
    assert {r["doc_id"] for r in t.scan(spark).collect()} == {1, 2}  # 3 is in-batch dup

    # second drop: one corpus dup (same text as doc 1), one new
    spark.createDataFrame(
        [(10, "alpha beta gamma"), (11, "brand new text here")], st
    ).write.mode("overwrite").parquet(str(src / "b2"))
    stream_dedup_ingest(spark, t, str(src / "*"), st, ckpt)
    t = t.refresh()
    assert {r["doc_id"] for r in t.scan(spark).collect()} == {1, 2, 11}
    assert int(t.current_snapshot().summary["dedup-accepted"]) == 1

    # re-drain with nothing new: no snapshots added
    snaps = len(t.snapshots())
    stream_dedup_ingest(spark, t, str(src / "*"), st, ckpt)
    assert len(t.refresh().snapshots()) == snaps


def test_stream_dedup_ingest_pruned_seen_probe(spark, tmp_path, monkeypatch):
    """The seen-set anti-join must NOT rescan the corpus: with
    'write.bloom-columns: fp' on the table, the batch's fingerprints become
    a PrunePredicate('fp','in',...) and only Bloom-surviving files are
    read. Asserted by recording every _read_paths call during the drain —
    the probe scan must touch strictly fewer files than the corpus holds
    (bounds never prune uniform md5 fps; the Bloom filters do)."""
    from pyspark.sql import types as T

    from ocel_ocpn_lakehouse_spark.core.table import Table
    from ocel_ocpn_lakehouse_spark.streaming import stream_dedup_ingest

    src = tmp_path / "drop"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    cat = Catalog(str(tmp_path / "wh"))
    st = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    out_schema = T.StructType(list(st.fields) + [T.StructField("fp", T.StringType())])
    t = cat.create_table(
        "ns.docs_bloom",
        out_schema,
        TableSpec(properties={"write.bloom-columns": "fp"}),
    )

    # seed the corpus across ≥4 COMMITS (8 source files, 2 per micro-batch)
    # so the table holds ≥4 bloom-stamped files — a single-batch seed can
    # legally land as one file, which would make the pruning assert vacuous
    seed = spark.range(0, 64).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("seed text number "), F.col("id")).alias("text"),
    )
    spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in seed.collect()], st
    ).repartition(8).write.mode("overwrite").parquet(str(src / "b1"))
    stream_dedup_ingest(spark, t, str(src / "*"), st, ckpt, max_files_per_trigger=2)
    t = t.refresh()
    n_corpus_files = len(t.live_entries())
    assert n_corpus_files >= 4  # multi-file corpus, else pruning is vacuous
    assert all(e.blooms.get("fp") for e in t.live_entries())

    # second drop: one corpus dup (same text as doc 3) + one brand-new doc
    spark.createDataFrame(
        [(1000, "seed text number 3"), (1001, "never seen before")], st
    ).write.mode("overwrite").parquet(str(src / "b2"))

    read_sizes = []
    orig = Table._read_paths

    def record(self, spark_, schema_, rel_paths):
        read_sizes.append(len(rel_paths))
        return orig(self, spark_, schema_, rel_paths)

    monkeypatch.setattr(Table, "_read_paths", record)
    stream_dedup_ingest(spark, t, str(src / "*"), st, ckpt)
    monkeypatch.undo()

    t = t.refresh()
    ids = {r["doc_id"] for r in t.scan(spark).collect()}
    assert 1001 in ids and 1000 not in ids  # dup rejected, new doc landed
    # the seen probe is the only corpus read during the batch; it must have
    # been pruned to (far) fewer files than the corpus holds
    assert read_sizes, "seen probe never went through the scan path"
    assert max(read_sizes) < n_corpus_files


def test_stream_epoch_guard_uses_property_not_snapshot_walk(spark, tmp_path, monkeypatch):
    """The per-stream max committed epoch lives in table PROPERTIES, set
    atomically with each batch commit: the replay guard is one dict lookup
    on already-loaded metadata (and survives snapshot expiry), never a
    per-batch walk of snapshot summaries. Enforced by making the fallback
    walk raise and replaying epoch 0 (fresh checkpoint, same stream-id)."""
    from pyspark.sql import types as T

    from ocel_ocpn_lakehouse_spark.streaming import ingest as ing

    src = tmp_path / "drop"
    src.mkdir()
    cat = Catalog(str(tmp_path / "wh"))
    st = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    t = cat.create_table("ns.stream_prop", st)

    spark.range(0, 20).select("id", F.lit("a").alias("v")).write.mode("overwrite").parquet(
        str(src / "batch1")
    )
    n = ing.stream_append(spark, t, str(src / "*"), st, str(tmp_path / "ck1"), stream_id="s1")
    assert n == 1
    t = t.refresh()
    assert int(t.properties["stream.s1.max-epoch"]) == 0
    snaps = len(t.snapshots())

    def boom(table, stream_id):
        raise AssertionError("epoch guard fell back to the snapshot-summary walk")

    monkeypatch.setattr(ing, "_committed_epochs", boom)
    # fresh checkpoint → Structured Streaming restarts at epoch 0 and
    # redelivers every source file: the property guard must skip it whole
    ing.stream_append(spark, t, str(src / "*"), st, str(tmp_path / "ck2"), stream_id="s1")
    monkeypatch.undo()
    t = t.refresh()
    assert len(t.snapshots()) == snaps
    assert t.scan(spark).count() == 20
