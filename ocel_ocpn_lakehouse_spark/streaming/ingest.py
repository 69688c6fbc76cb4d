"""Exactly-once streaming append into an engine table.

``foreachBatch`` may replay a batch after a crash (Structured Streaming
guarantees at-least-once delivery to the sink); idempotence comes from
recording the stream epoch id in the snapshot summary and skipping
epochs that already committed — the same guard the maintenance engine
uses for file groups (north rule: resume without re-committing
snapshots).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ..core.table import Table


def _committed_epochs(table: Table, stream_id: str) -> set[int]:
    out = set()
    for s in table.snapshots():
        if s.summary.get("stream-id") == stream_id and "stream-epoch" in s.summary:
            out.add(int(s.summary["stream-epoch"]))
    return out


def _drain_exactly_once(
    spark: SparkSession,
    table: Table,
    source_dir: str,
    schema: T.StructType,
    checkpoint_dir: str,
    stream_id: str,
    max_files_per_trigger: int | None,
    apply_batch,
) -> int:
    """Shared exactly-once scaffold: readStream → foreachBatch with the
    epoch guard → availableNow drain. ``apply_batch(batch_df, epoch_id)``
    must COMMIT the batch with the stream-id/epoch markers riding in the
    snapshot summary (atomic with the row changes). Returns the number of
    batches committed this run."""
    committed = {"n": 0}

    def sink(batch_df, epoch_id: int) -> None:
        table.refresh()
        if epoch_id in _committed_epochs(table, stream_id):
            return  # replayed batch after restart — already committed
        if batch_df.isEmpty():
            return
        apply_batch(batch_df, int(epoch_id))
        committed["n"] += 1

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.parquet(source_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return committed["n"]


def stream_append(
    spark: SparkSession,
    table: Table,
    source_dir: str,
    schema: T.StructType,
    checkpoint_dir: str,
    stream_id: str = "default",
    max_files_per_trigger: int | None = None,
) -> int:
    """Drain all available files from source_dir into the table
    (trigger=availableNow), one snapshot per micro-batch, exactly-once.
    Returns the number of batches committed this run."""

    def apply_batch(batch_df, epoch_id: int) -> None:
        entries = table.write_data_files(batch_df)
        table.commit_append(
            entries, extra_summary={"stream-id": stream_id, "stream-epoch": epoch_id}
        )

    return _drain_exactly_once(
        spark, table, source_dir, schema, checkpoint_dir, stream_id,
        max_files_per_trigger, apply_batch,
    )


def stream_upserts(
    spark: SparkSession,
    table: Table,
    source_dir: str,
    schema: T.StructType,
    checkpoint_dir: str,
    key: str = "image_id",
    op_col: str = "_op",
    stream_id: str = "cdc",
    strategy: str = "mor",
    max_files_per_trigger: int | None = None,
) -> int:
    """Streaming CDC apply: every micro-batch is a MERGE INTO (rows carry
    ``op_col ∈ {'upsert','delete'}``), exactly-once via the same epoch
    guard as :func:`stream_append` — the stream epoch rides INSIDE the
    merge's snapshot summary, so the marker and the row changes commit
    atomically and a replayed batch is skipped whole.

    Default ``strategy='mor'`` is the CDC shape at warehouse scale: a
    stream lands thousands of point-ish merges per day, and copy-on-write
    would rewrite touched data files every batch; merge-on-read commits
    one delete-vector + the upsert files per batch (zero rewrite), and
    routine compaction absorbs the accumulated tombstones (health's
    dead-row ratio says when). Returns the number of merges committed."""
    from ..maintenance.merge import merge_into

    def apply_batch(batch_df, epoch_id: int) -> None:
        merge_into(
            spark,
            table,
            batch_df,
            key=key,
            op_col=op_col,
            strategy=strategy,
            extra_summary={"stream-id": stream_id, "stream-epoch": epoch_id},
        )

    return _drain_exactly_once(
        spark, table, source_dir, schema, checkpoint_dir, stream_id,
        max_files_per_trigger, apply_batch,
    )


def stream_dedup_ingest(
    spark: SparkSession,
    table: Table,
    source_dir: str,
    schema: T.StructType,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    stream_id: str = "dedup-ingest",
    max_files_per_trigger: int | None = None,
) -> int:
    """Streaming DEDUPLICATED ingest: each micro-batch lands only
    fingerprint-new documents (functions/dedup.py dedup_incremental —
    in-batch min-id survivor, then anti-join against the corpus), with
    the SAME exactly-once epoch guard as stream_append.

    The seen-set IS the corpus table: accepted rows persist their ``fp``
    column, so the anti-join side is one column-pruned scan of the table
    and the rows + the seen-set update are ONE atomic snapshot — there is
    no second bookkeeping table to drift from the data (a separate
    seen-table would need a cross-table transaction the format doesn't
    have). Cost per batch ∝ batch + corpus fp column; the replay path
    is doubly safe: the epoch guard skips committed batches, and even a
    forced re-run would find every fingerprint already present."""
    from ..functions.dedup import dedup_incremental

    out_cols = schema.fieldNames() + ["fp"]

    def apply_batch(batch_df, epoch_id: int) -> None:
        if table.current_snapshot() is None:
            seen = spark.createDataFrame([], "fp string")
        else:
            seen = table.scan(spark, columns=["fp"])
        accepted = dedup_incremental(
            batch_df, seen, text_col=text_col, id_col=id_col
        ).select(*out_cols)
        entries = table.write_data_files(accepted)
        table.commit_append(
            entries,
            extra_summary={
                "stream-id": stream_id,
                "stream-epoch": epoch_id,
                # from the written footers — never a second anti-join run
                "dedup-accepted": sum(e.record_count for e in entries),
            },
        )

    return _drain_exactly_once(
        spark, table, source_dir, schema, checkpoint_dir, stream_id,
        max_files_per_trigger, apply_batch,
    )
