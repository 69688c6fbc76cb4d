"""OCEL 2.0 JSON source (S4 — reference ingest/complete_ocel_loader.py).

The reference parses OCEL JSON with driver-side Python loops
(:107-110,149-214) building list-of-dict rows; here the whole parse is
``spark.read.json`` + explode — distributed, no driver materialization.

Produces the reference's relational decomposition:
  events(id, type, time, event_date, event_month)
  event_objects(event_id, object_id, qualifier)
  event_attributes(event_id, name, val_* EAV columns, val_type)
  objects(id, type)

EAV typed-value dispatch mirrors ingest/complete_ocel_loader.py:47-96
(bool before long — ``isinstance(True, int)`` hazard noted in SURVEY
§1.2; here the dispatch is a when() chain on the JSON literal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _classify(value):
    """val_type dispatch: boolean before long (reference ordering)."""
    is_bool = value.isin("true", "false")
    is_long = value.rlike(r"^-?\d+$")
    is_double = value.rlike(r"^-?\d+\.\d+([eE][+-]?\d+)?$")
    return (
        F.when(value.isNull(), F.lit("null"))
        .when(is_bool, F.lit("boolean"))
        .when(is_long, F.lit("long"))
        .when(is_double, F.lit("double"))
        .otherwise(F.lit("string"))
    )


def load_ocel_json(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    raw = spark.read.option("multiLine", "true").json(path)

    ev = raw.select(F.explode("events").alias("e")).select(
        F.col("e.id").alias("id"),
        F.col("e.type").alias("type"),
        F.to_timestamp("e.time").alias("time"),
    )
    events = ev.withColumn("event_date", F.to_date("time")).withColumn(
        "event_month", F.date_format("time", "yyyy-MM")
    )

    event_objects = (
        raw.select(F.explode("events").alias("e"))
        .select(F.col("e.id").alias("event_id"), F.explode_outer("e.relationships").alias("r"))
        .select(
            "event_id",
            F.col("r.objectId").alias("object_id"),
            F.col("r.qualifier").alias("qualifier"),
        )
        .filter(F.col("object_id").isNotNull())
    )

    attrs = (
        raw.select(F.explode("events").alias("e"))
        .select(F.col("e.id").alias("event_id"), F.explode_outer("e.attributes").alias("a"))
        .select(
            "event_id",
            F.col("a.name").alias("name"),
            F.col("a.value").cast("string").alias("value"),
        )
        .filter(F.col("name").isNotNull())
    )
    vt = _classify(F.col("value"))
    event_attributes = attrs.select(
        "event_id",
        "name",
        F.when(vt == "string", F.col("value")).alias("val_string"),
        F.when(vt == "double", F.col("value").cast("double")).alias("val_double"),
        F.when(vt == "boolean", F.col("value") == "true").alias("val_boolean"),
        F.when(vt == "long", F.col("value").cast("long")).alias("val_long"),
        vt.alias("val_type"),
    )

    objects = raw.select(F.explode("objects").alias("o")).select(
        F.col("o.id").alias("id"), F.col("o.type").alias("type")
    )

    return {
        "events": events,
        "event_objects": event_objects,
        "event_attributes": event_attributes,
        "objects": objects,
    }
