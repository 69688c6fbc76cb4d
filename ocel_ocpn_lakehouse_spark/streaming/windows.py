"""Watermarked windowed aggregation + stateful streaming sessionization
(SURVEY §2.11 beyond-reference: the Structured Streaming surface the
brief calls for — watermarks + windowed aggs for late data, and
``applyInPandasWithState`` for custom stateful operators).

- ``stream_activity_counts``: tumbling event-time windows per event_type
  with a watermark, in APPEND output mode — a window row is delivered to
  the sink exactly once, when the watermark passes the window end. This
  is the incremental form of the activity-metrics MV (M3): the batch
  layer recomputes the whole table, this finalizes windows as event time
  advances; events later than the watermark are dropped by the engine,
  which is what bounds state at 10^12-row scale (state size tracks
  open-windows × groups, never history).
- ``sessionize_stream``: gap-based sessions per user as a CUSTOM STATEFUL
  operator via ``applyInPandasWithState`` — state is the one open session
  per key (start, last, count — three scalars), carried across
  micro-batches in the state store; a session closes (and is emitted,
  once) when a later event arrives more than ``gap`` after its last
  event. Semantics mirror the batch q17 sessionization
  (queries/relational.py q17: gap > 30 min ⇒ new session), so closed
  streaming sessions are asserted equal to batch-computed sessions in
  tests.

Both drain with ``trigger(availableNow=True)`` and commit to engine
tables through the same epoch-guarded ``foreachBatch`` sink as
``stream_append`` (streaming/ingest.py): replayed batches after a crash
skip their already-committed snapshot — exactly-once end to end.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..core.table import Table


def _epoch_guarded_sink(table: Table, stream_id: str):
    """foreachBatch sink: append the batch as one snapshot unless this
    epoch already committed (same idempotence rule as stream_append)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        table.refresh()
        for s in table.snapshots():
            if (
                s.summary.get("stream-id") == stream_id
                and "stream-epoch" in s.summary
                and int(s.summary["stream-epoch"]) == int(epoch_id)
            ):
                return
        if batch_df.isEmpty():
            return
        entries = table.write_data_files(batch_df)
        table.commit_append(
            entries, extra_summary={"stream-id": stream_id, "stream-epoch": int(epoch_id)}
        )

    return sink


def stream_activity_counts(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    checkpoint_dir: str,
    table: Table,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str | None = "value",
    stream_id: str = "activity-counts",
) -> None:
    """Drain available files; append FINALIZED window rows (window_start,
    window_end, group, n[, sum_value]) to ``table``. Append mode + watermark
    means each window commits exactly once; re-running after more files
    arrive emits only newly-finalized windows. ``value_col`` names the
    column summed alongside the count; pass None (or a name absent from
    ``schema``) to emit counts only."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    if value_col is not None and value_col not in schema.fieldNames():
        value_col = None
    aggs = [F.count("*").alias("n")]
    cols = ["grp", "n"]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
        cols.append("sum_value")
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col(group_col).alias("grp"))
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *cols,
        )
    )
    q = (
        agg.writeStream.foreachBatch(_epoch_guarded_sink(table, stream_id))
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


SESSION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# open session per key: (start_us, last_us, n_events)
SESSION_STATE = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _session_fn(gap_us: int, timeout_ms: int | None):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # long-idle key: flush the open session and drop the state
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "session_start_us": [start],
                 "session_end_us": [last], "n_events": [n]}
            )
            return
        ts = []
        for pdf in pdfs:
            ts.extend(pdf["ts"].astype("int64") // 1000)  # ns -> us
        ts.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start = last = ts[0]
            n = 0
        closed = []
        for t in ts:
            if n > 0 and t - last > gap_us:
                closed.append((user_id, start, last, n))
                start = t
                n = 0
            n += 1
            last = t
        state.update((int(start), int(last), int(n)))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            closed, columns=["user_id", "session_start_us", "session_end_us", "n_events"]
        )

    return fn


def sessionize_stream(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    checkpoint_dir: str,
    table: Table,
    gap_s: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    idle_timeout_ms: int | None = None,
    stream_id: str = "sessions",
) -> None:
    """Drain available files; emit CLOSED sessions (user_id,
    session_start_us, session_end_us, n_events) into ``table``. The open
    session per user persists in the state store across drains; a later
    drain whose first event for that user exceeds the gap closes and
    emits it. With ``idle_timeout_ms`` set (long-running streams), idle
    keys flush via processing-time timeout instead of waiting for a
    closing event."""
    stream = spark.readStream.schema(schema).parquet(source_dir).select(
        F.col(key_col).alias("user_id"), F.col(ts_col).alias("ts")
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_s * 1_000_000, idle_timeout_ms),
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=timeout,
    )
    q = (
        sessions.writeStream.foreachBatch(_epoch_guarded_sink(table, stream_id))
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
