"""Watermarked windowed aggregation + stateful sessionization streams
(streaming/windows.py): append-mode window finalization, late-data drop,
cross-drain session state, and batch↔stream semantic parity."""

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ocel_ocpn_lakehouse_spark.core import Catalog
from ocel_ocpn_lakehouse_spark.streaming.windows import (
    sessionize_stream,
    stream_activity_counts,
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("window_start", T.TimestampType()),
        T.StructField("window_end", T.TimestampType()),
        T.StructField("grp", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _ts(h, m=0):
    return dt.datetime(2024, 3, 1, h, m)


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode("overwrite").parquet(path)


def test_stream_windowed_counts_finalize_and_drop_late(spark, tmp_path):
    """Hour windows finalize exactly once as the watermark (2 h) passes
    their end; an event older than the watermark is dropped, never
    mutating an already-committed window row."""
    src = tmp_path / "drop"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    cat = Catalog(str(tmp_path / "wh"))
    t = cat.create_table("ns.win_counts", WINDOW_SCHEMA)

    _write_events(
        spark,
        str(src / "b1"),
        [
            (0, _ts(0, 10), 1, "click", 1.0),
            (1, _ts(0, 40), 1, "click", 2.0),
            (2, _ts(0, 50), 2, "buy", 5.0),
            (3, _ts(1, 15), 1, "click", 1.0),
            (4, _ts(3, 30), 2, "click", 1.0),  # advances watermark to 01:30
        ],
    )
    stream_activity_counts(
        spark, str(src / "*"), EVENT_SCHEMA, ckpt, t, window="1 hour", watermark="2 hours"
    )
    got = {
        (r["window_start"], r["grp"]): (r["n"], r["sum_value"])
        for r in t.refresh().scan(spark).collect()
    }
    # watermark 01:30 → only hour-0 windows (end 01:00 ≤ wm) finalized
    assert got == {(_ts(0), "click"): (2, 3.0), (_ts(0), "buy"): (1, 5.0)}

    _write_events(
        spark,
        str(src / "b2"),
        [
            (5, _ts(6, 0), 1, "click", 1.0),  # watermark → 04:00
            (6, _ts(0, 59), 2, "click", 9.0),  # LATE: before wm 01:30 → dropped
        ],
    )
    stream_activity_counts(
        spark, str(src / "*"), EVENT_SCHEMA, ckpt, t, window="1 hour", watermark="2 hours"
    )
    got2 = {
        (r["window_start"], r["grp"]): (r["n"], r["sum_value"])
        for r in t.refresh().scan(spark).collect()
    }
    # hour-1 and hour-3 windows finalized; hour-0 rows unchanged (late
    # event dropped); hour-6 still open
    assert got2 == {
        (_ts(0), "click"): (2, 3.0),
        (_ts(0), "buy"): (1, 5.0),
        (_ts(1), "click"): (1, 1.0),
        (_ts(3), "click"): (1, 1.0),
    }
    # append-mode exactly-once: no window row committed twice
    all_rows = t.scan(spark).groupBy("window_start", "grp").count().collect()
    assert all(r["count"] == 1 for r in all_rows)


def test_sessionize_stream_state_across_drains_batch_parity(spark, tmp_path):
    """The open session per user lives in the state store across drains:
    a later drain's event past the gap closes and emits it exactly once.
    Closed sessions equal the batch q17-style sessionization minus each
    user's final (still-open) session."""
    src = tmp_path / "drop"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    cat = Catalog(str(tmp_path / "wh"))
    t = cat.create_table("ns.sessions", SESSION_SCHEMA)

    b1 = [
        (0, _ts(10, 0), 1, "a", 0.0),
        (1, _ts(10, 10), 1, "a", 0.0),  # user 1: open session
        (2, _ts(9, 0), 2, "a", 0.0),
        (3, _ts(9, 5), 2, "a", 0.0),
        (4, _ts(11, 0), 2, "a", 0.0),  # gap > 30 min → closes 09:00-09:05 in-batch
    ]
    _write_events(spark, str(src / "b1"), b1)
    sessionize_stream(spark, str(src / "*"), EVENT_SCHEMA, ckpt, t, gap_s=1800)
    rows1 = {
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in t.refresh().scan(spark).collect()
    }
    import pandas as pd

    # wall-time→us the same way the stateful fn does (datetime64[ns]//1000),
    # so the assertion is independent of the container timezone
    us = lambda d: int(pd.Timestamp(d).value // 1000)
    assert rows1 == {(2, us(_ts(9, 0)), us(_ts(9, 5)), 2)}

    b2 = [
        (5, _ts(12, 0), 1, "a", 0.0),  # closes user 1's 10:00-10:10 (state from drain 1)
        (6, _ts(11, 10), 2, "a", 0.0),  # extends user 2's open session
    ]
    _write_events(spark, str(src / "b2"), b2)
    sessionize_stream(spark, str(src / "*"), EVENT_SCHEMA, ckpt, t, gap_s=1800)
    rows2 = {
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in t.refresh().scan(spark).collect()
    }
    assert rows2 == {
        (2, us(_ts(9, 0)), us(_ts(9, 5)), 2),
        (1, us(_ts(10, 0)), us(_ts(10, 10)), 2),
    }

    # batch parity: q17-style sessionization over ALL events; closed
    # streaming sessions == batch sessions minus each user's last one
    all_ev = spark.createDataFrame(b1 + b2, EVENT_SCHEMA)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    batch = (
        all_ev.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            (F.col("prev").isNull())
            | (F.col("ts").cast("long") - F.col("prev").cast("long") > 1800),
        )
        .withColumn("sess", F.sum(F.col("new_sess").cast("long")).over(w))
        .groupBy("user_id", "sess")
        .agg(
            F.min("ts").alias("s"),
            F.max("ts").alias("e"),
            F.count("*").alias("n"),
            F.max("sess").alias("ord"),
        )
    )
    closed_batch = set()
    by_user = {}
    for r in batch.collect():
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, rs in by_user.items():
        rs.sort(key=lambda r: r["ord"])
        for r in rs[:-1]:  # drop the final (open) session
            closed_batch.add((uid, us(r["s"]), us(r["e"]), r["n"]))
    assert rows2 == closed_batch
