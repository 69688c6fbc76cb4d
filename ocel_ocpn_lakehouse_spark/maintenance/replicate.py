"""Changelog-driven table replication: keep a downstream replica of an
engine table in sync at DELTA cost.

The reference has no replication surface; this composes two primitives
this engine already proves correct — ``Table.changelog_scan`` (row-level
CDC across any commit sequence) and ``merge_into`` (bucket/Bloom-pruned
upsert+delete) — into the standard lakehouse mirror pattern (Iceberg
changelog view → MERGE INTO on the target).

Sync cost ∝ |changelog| + touched replica files, never O(table): the
changelog reads only changed source files (manifest-diff planning), the
net-effect reduction is one shuffle over delta rows, and the MERGE probe
prunes replica files by bucket + manifest bounds/Bloom. The source
snapshot id rides IN the replica's merge commit (``set_properties``), so
a crash between apply and stamp is impossible — the same atomicity
pattern as the IVF index freshness stamp and streaming epoch markers.

Requires ``key`` to be unique in the source table (the replica mirrors
one row per key; merge_into's contract). Expired changelog start (source
history GC'd past the stamp) falls back to a full overwrite re-sync.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from ..core.catalog import Catalog
from ..core.spec import TableSpec
from ..core.table import IncrementalScanError, Table
from .checkpoint import SystemTables
from .merge import merge_into

SOURCE_SNAPSHOT_PROP = "replica.source-snapshot-id"


def _stamp_only(replica: Table, snapshot_id: int) -> None:
    """Advance the stamp with no data commit (maintenance-only source
    range): a CAS metadata edit, same machinery as ref updates."""

    def edit(md) -> None:
        md.properties[SOURCE_SNAPSHOT_PROP] = str(snapshot_id)

    replica._commit_metadata_edit(edit)
    replica.refresh()


def sync_replica(
    spark: SparkSession,
    source: Table,
    catalog: Catalog,
    replica_name: str,
    key: str = "image_id",
    sys_tables: SystemTables | None = None,
    strategy: str | None = None,
) -> dict:
    """One sync pass: bootstrap (full copy) on first call, then per-call
    apply of the source changelog since the replica's recorded source
    snapshot. Net-effect reduction first — per key, the highest-ordinal
    change wins, insert beating delete within an ordinal (a CoW update
    emits delete+insert at one ordinal; the insert is the post-image; a
    carryover row upserts its own identical payload, idempotent) — then
    one MERGE INTO with upsert/delete ops. Returns the action taken plus
    delta row counts."""
    cur = source.current_snapshot()
    if cur is None:
        return {"status": "empty-source", "upserts": 0, "deletes": 0}

    if not catalog.table_exists(replica_name):
        catalog.create_table(
            replica_name,
            source.schema,
            TableSpec(
                partition_spec=source.partition_spec,
                sort_order=source.sort_order,
            ),
        )
        replica = catalog.load_table(replica_name)
        n = replica.overwrite(
            source.scan(spark),
            set_properties={SOURCE_SNAPSHOT_PROP: cur.snapshot_id},
        ).summary["added-records"]
        return {
            "status": "bootstrap",
            "to_snapshot": cur.snapshot_id,
            "upserts": int(n),
            "deletes": 0,
        }

    replica = catalog.load_table(replica_name)
    recorded = replica.properties.get(SOURCE_SNAPSHOT_PROP)
    if recorded is None:
        # pre-existing table never synced: treat as bootstrap-into-existing
        n = replica.overwrite(
            source.scan(spark),
            set_properties={SOURCE_SNAPSHOT_PROP: cur.snapshot_id},
        ).summary["added-records"]
        return {
            "status": "resync",
            "to_snapshot": cur.snapshot_id,
            "upserts": int(n),
            "deletes": 0,
        }
    recorded = int(recorded)
    if recorded == cur.snapshot_id:
        return {"status": "fresh", "to_snapshot": cur.snapshot_id, "upserts": 0, "deletes": 0}

    try:
        ch = source.changelog_scan(spark, recorded, cur.snapshot_id)
    except IncrementalScanError:
        # the stamp expired out of source history — full re-sync, stamped
        # atomically with the overwrite
        n = replica.overwrite(
            source.scan(spark),
            set_properties={SOURCE_SNAPSHOT_PROP: cur.snapshot_id},
        ).summary["added-records"]
        return {
            "status": "resync",
            "from_snapshot": recorded,
            "to_snapshot": cur.snapshot_id,
            "upserts": int(n),
            "deletes": 0,
        }

    data_cols = source.schema.fieldNames()
    win = Window.partitionBy(key).orderBy(
        F.col("_change_ordinal").desc(),
        (F.col("_change_type") == "insert").cast("int").desc(),
    )
    # persist the net effect: the changelog read (changed-file scan + one
    # window shuffle) must run ONCE, not once for the counts and again
    # inside the merge — on the hot sync loop that doubles delta cost
    net = (
        ch.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") == 1)
        .select(
            *data_cols,
            F.when(F.col("_change_type") == "insert", F.lit("upsert"))
            .otherwise(F.lit("delete"))
            .alias("_op"),
        )
    ).persist()
    try:
        counts = {
            r["_op"]: r["n"]
            for r in net.groupBy("_op").agg(F.count("*").alias("n")).collect()
        }
        upserts, deletes = counts.get("upsert", 0), counts.get("delete", 0)
        if not upserts and not deletes:
            # maintenance-only range (replace snapshots): nothing to apply,
            # just advance the stamp
            _stamp_only(replica, cur.snapshot_id)
            return {
                "status": "restamped",
                "from_snapshot": recorded,
                "to_snapshot": cur.snapshot_id,
                "upserts": 0,
                "deletes": 0,
            }

        merge_into(
            spark,
            replica,
            net,
            key=key,
            sys_tables=sys_tables,
            table_name=replica_name,
            strategy=strategy,
            extra_summary={"replica-sync-from": recorded},
            set_properties={SOURCE_SNAPSHOT_PROP: cur.snapshot_id},
        )
    finally:
        net.unpersist()
    return {
        "status": "synced",
        "from_snapshot": recorded,
        "to_snapshot": cur.snapshot_id,
        "upserts": int(upserts),
        "deletes": int(deletes),
    }


def replica_is_fresh(source: Table, replica: Table) -> bool:
    """True iff the replica's stamp matches the source head."""
    cur = source.current_snapshot()
    rec = replica.properties.get(SOURCE_SNAPSHOT_PROP)
    return cur is not None and rec is not None and int(rec) == cur.snapshot_id


def stream_replica(
    spark: SparkSession,
    source: Table,
    catalog: Catalog,
    replica_name: str,
    checkpoint_dir: str,
    key: str = "image_id",
    strategy: str | None = None,
    stream_id: str | None = None,
) -> int:
    """Continuous mirror: drain the source's row-level CDC STREAM
    (``readStream.format("lakehouse")`` with ``streaming.mode=changelog``)
    into the replica, one MERGE INTO per micro-batch, exactly-once.

    Composition of three already-proven pieces: the changelog stream
    source (offset 0 boots with the live rows as inserts, so the first
    batch IS the bootstrap copy and no separate path exists), the
    net-effect collapse from :func:`sync_replica` (per key, the
    highest-(commit, ordinal) change wins, insert beating delete within
    a commit), and the stream-epoch guard from streaming.ingest — the
    epoch marker, the max-epoch property, and the replica's
    source-snapshot stamp all ride in the SAME merge commit, so a
    replayed batch after restart is skipped whole and a crash can never
    leave the stamp ahead of (or behind) the applied rows.

    Per-drain cost ∝ changed source files + touched replica files (the
    stream reads manifest diffs; the MERGE probes bucket/Bloom-pruned
    candidates) — never O(table) on either side. Returns the number of
    micro-batches committed this run."""
    from ..sources.table_source import register_lakehouse_source
    from ..streaming.ingest import _epoch_committed, _max_epoch_prop

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    register_lakehouse_source(spark)
    if not catalog.table_exists(replica_name):
        catalog.create_table(
            replica_name,
            source.schema,
            TableSpec(
                partition_spec=source.partition_spec,
                sort_order=source.sort_order,
            ),
        )
    replica = catalog.load_table(replica_name)
    sid = stream_id or f"replica:{replica_name}"
    data_cols = source.schema.fieldNames()
    committed = {"n": 0}

    def apply(batch_df, epoch_id: int) -> None:
        replica.refresh()
        if _epoch_committed(replica, sid, int(epoch_id)):
            return  # replayed batch after restart
        # pin the micro-batch: the changelog source plan (manifest diff +
        # changed-file reads through the Python data source) is the
        # expensive part, and three separate actions (empty-check, max-id,
        # merge) would each re-execute it
        batch_df = batch_df.persist()
        try:
            stats = batch_df.agg(
                F.count(F.lit(1)).alias("n"),
                F.max("_commit_snapshot_id").alias("hi"),
            ).first()
            if not stats["n"]:
                return
            win = Window.partitionBy(key).orderBy(
                F.col("_commit_snapshot_id").desc(),
                F.col("_change_ordinal").desc(),
                (F.col("_change_type") == "insert").cast("int").desc(),
            )
            net = (
                batch_df.withColumn("_rn", F.row_number().over(win))
                .filter(F.col("_rn") == 1)
                .select(
                    *data_cols,
                    F.when(F.col("_change_type") == "insert", F.lit("upsert"))
                    .otherwise(F.lit("delete"))
                    .alias("_op"),
                )
            )
            merge_into(
                spark,
                replica,
                net,
                key=key,
                strategy=strategy,
                table_name=replica_name,
                extra_summary={"stream-id": sid, "stream-epoch": int(epoch_id)},
                set_properties={
                    _max_epoch_prop(sid): int(epoch_id),
                    SOURCE_SNAPSHOT_PROP: int(stats["hi"]),
                },
            )
        finally:
            batch_df.unpersist()
        committed["n"] += 1

    q = (
        spark.readStream.format("lakehouse")
        .option("streaming.mode", "changelog")
        .load(source.root)
        .writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # maintenance-only tail: replace commits emit no changelog rows, so the
    # per-batch stamp (max applied commit id) can lag the source head even
    # though the replica is byte-identical. If everything between the stamp
    # and the head is row-preserving, advance the stamp (the batch path's
    # 'restamped' outcome). A lagging stamp is always SAFE (net-effect
    # re-apply is idempotent) — this only avoids wasted future work.
    source.refresh()
    replica.refresh()
    cur = source.current_snapshot()
    rec = replica.properties.get(SOURCE_SNAPSHOT_PROP)
    if cur is not None and rec is not None and int(rec) != cur.snapshot_id:
        from ..core.table import ROW_PRESERVING_OPS

        try:
            chain = source._lineage_chain(int(rec), cur.snapshot_id)
        except IncrementalScanError:
            chain = None  # stamp expired out of history; next drain resyncs
        if chain is not None and all(
            s.operation in ROW_PRESERVING_OPS for s in chain
        ):
            _stamp_only(replica, cur.snapshot_id)
    return committed["n"]
