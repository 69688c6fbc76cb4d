"""Reference-parity layer: the OCEL-shaped tables and derived views the
reference validates against, over OUR table format.

Fixtures follow FIXTURES.md §3 (deterministic, seeded); the pipelines are
the reference's four MV/validation shapes re-expressed as single Catalyst
plans:

  dfg_matrix        ops/materialized_views.py:200-299 (join → sort →
                    group-collect → Python pairing → re-agg) → here:
                    window lead + groupBy, one plan (SURVEY §3.2)
  activity_metrics  ops/materialized_views.py:301-357
  process_variants  ops/materialized_views.py:359-439 (with the strict
                    sort_array(collect_list(struct)) ordering the
                    reference silently assumes — SURVEY §7.3(2))
  validation set    queries/production_validation.py:144,158,176,191
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("time", T.TimestampType(), False),
        T.StructField("event_date", T.DateType(), True),
        T.StructField("event_month", T.StringType(), True),
        T.StructField("vendor_code", T.StringType(), True),
        T.StructField("request_id", T.StringType(), True),
    ]
)

EVENT_OBJECTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType(), False),
        T.StructField("object_id", T.StringType(), False),
        T.StructField("qualifier", T.StringType(), True),
    ]
)

ACTIVITIES = [
    "create_order",
    "approve_order",
    "pick_items",
    "pack_items",
    "ship_order",
    "send_invoice",
    "receive_payment",
    "close_order",
]


def synth_ocel_events(spark: SparkSession, n_events: int = 2000, seed: int = 42) -> DataFrame:
    """Deterministic OCEL-shaped events: ~5 events per request_id instance
    over a fixed 2-year range (FIXTURES.md §3.1) — generated as one
    column-expression plan over spark.range (no driver rows)."""
    base = spark.range(n_events).select(
        F.format_string("evt_%08d", F.col("id")).alias("id"),
        F.col("id").alias("i"),
    )
    rnd = F.xxhash64(F.lit(seed), F.col("i"))
    inst = (F.col("i") / 5).cast("long")
    seq_in_inst = F.col("i") % 5
    act_idx = F.pmod(F.abs(rnd) + seq_in_inst, F.lit(len(ACTIVITIES))).cast("int")
    acts = F.array(*[F.lit(a) for a in ACTIVITIES])
    start_2023 = F.lit(1672531200)  # 2023-01-01 UTC epoch secs
    tsec = start_2023 + F.pmod(F.abs(rnd), F.lit(730 * 86400 - 1)) + seq_in_inst * 3600
    time_col = F.timestamp_seconds(tsec)
    return base.select(
        "id",
        F.element_at(acts, act_idx + 1).alias("type"),
        time_col.alias("time"),
        F.to_date(time_col).alias("event_date"),
        F.date_format(time_col, "yyyy-MM").alias("event_month"),
        F.when(F.pmod(F.abs(rnd), 10) < 3, F.lit(None).cast("string"))
        .otherwise(F.format_string("vendor_%02d", F.pmod(F.abs(rnd), 20)))
        .alias("vendor_code"),
        F.format_string("req_%06d", inst).alias("request_id"),
    )


def synth_event_objects(spark: SparkSession, events: DataFrame, seed: int = 42) -> DataFrame:
    """1-3 objects per event, seeded (FIXTURES.md §3.2)."""
    rnd = F.xxhash64(F.lit(seed + 1), F.col("id"))
    n_obj = (F.pmod(F.abs(rnd), 3) + 1).cast("int")
    return (
        events.select("id", F.explode(F.sequence(F.lit(1), n_obj)).alias("k"))
        .select(
            F.col("id").alias("event_id"),
            F.format_string(
                "obj_%05d", F.pmod(F.abs(F.xxhash64(F.col("id"), F.col("k"))), 500)
            ).alias("object_id"),
            F.when(F.col("k") == 1, F.lit("primary")).otherwise(F.lit("secondary")).alias(
                "qualifier"
            ),
        )
    )


# ---- the reference's derived tables, as single plans ---------------------------


def build_dfg_matrix(events: DataFrame) -> DataFrame:
    w = Window.partitionBy("request_id").orderBy("time", "id")
    pairs = events.select(
        F.col("type").alias("from_activity"),
        F.lead("type").over(w).alias("to_activity"),
        (F.unix_micros(F.lead("time").over(w)) - F.unix_micros("time")).alias("gap_us"),
    ).filter(F.col("to_activity").isNotNull())
    return pairs.groupBy("from_activity", "to_activity").agg(
        F.count("*").alias("frequency"),
        F.round(F.avg("gap_us") / 1e6, 3).alias("avg_time_seconds"),
    )


def build_activity_metrics(events: DataFrame) -> DataFrame:
    return events.groupBy("type").agg(
        F.count("*").alias("event_count"),
        F.min("time").alias("first_seen"),
        F.max("time").alias("last_seen"),
        F.countDistinct("request_id").alias("instance_count"),
    )


def build_process_variants(events: DataFrame, sample_ids: int = 10) -> DataFrame:
    per_inst = events.groupBy("request_id").agg(
        F.concat_ws(
            "->",
            F.transform(
                F.sort_array(F.collect_list(F.struct("time", "id", "type"))),
                lambda s: s["type"],
            ),
        ).alias("variant_pattern")
    )
    return per_inst.groupBy("variant_pattern").agg(
        F.count("*").alias("frequency"),
        F.slice(F.sort_array(F.collect_list("request_id")), 1, sample_ids).alias("instance_ids"),
        F.xxhash64("variant_pattern").alias("variant_id"),
    )


def build_conformance(events: DataFrame) -> DataFrame:
    """Conformance per process instance over the OCEL-shaped log
    (reference analytics/conformance_checking.py, driven per-instance in
    Python there; one Catalyst plan here via queries/conformance.py).
    Case = request_id, activity = type, order = (time, id)."""
    from .conformance import conformance_per_case

    ev = events.withColumn("ts_us", F.unix_micros(F.col("time")))
    return conformance_per_case(
        ev, case_col="request_id", act_col="type", order_cols=("ts_us", "id")
    )


# ---- the reference's validation checks (production_validation.py) ---------------


def validation_queries(events: DataFrame, event_objects: DataFrame) -> dict[str, DataFrame]:
    return {
        # :144 group-count by type
        "group_count": events.groupBy("type").agg(F.count("id").alias("n")),
        # :158 range filter on event_date
        "range_filter": events.filter(F.col("event_date") >= "2024-01-01").agg(
            F.count("*").alias("n")
        ),
        # :176 inner join events ⋈ event_objects
        "join": events.join(
            event_objects, events.id == event_objects.event_id, "inner"
        ).agg(F.count("*").alias("n")),
        # :191 group-by on a value column
        "group_by_value": event_objects.groupBy("qualifier").agg(F.count("*").alias("n")),
    }
