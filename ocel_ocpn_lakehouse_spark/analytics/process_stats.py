"""Object-centric process statistics — the pm4py-wrapper surface, native.

The reference delegates these to pm4py after pulling every OCEL table into
driver pandas (analytics/pm4py_analytics_wrapper.py:24-75 loads events /
objects / relations with ``.to_pandas()``, then :77-332 calls pm4py).
Variants, DFG and conformance already have native oracle-checked homes
(queries/ocel_parity.py, queries/conformance.py q12/q16/q36/q37); this
module covers the REST of that wrapper's API — activity, object-centric,
case and co-occurrence statistics — as distributed aggregations over the
OCEL tables (sources/ocel_json.py shapes: events(id,type,time),
event_objects(event_id,object_id,qualifier), objects(id,type)).

Scale shapes: every per-object computation windows by object_id (shuffle
partitioned on the object key, never a global window); interactions
self-join event_objects on event_id, so output is Σ k_e·(k_e−1)/2 over
events — quadratic only in each event's own object count, which OCEL logs
keep small (an event relates to a handful of objects). All summary
outputs are O(#activities) / O(#object types) rows; per-object outputs
(lifecycle, case durations) stay DataFrames and are never collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def activity_frequency(events: DataFrame) -> DataFrame:
    """(activity, n_events) — wrapper get_activity_statistics
    (pm4py_analytics_wrapper.py:211 ocel_get_activity_frequency)."""
    return (
        events.groupBy(F.col("type").alias("activity"))
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.desc("n_events"), "activity")
    )


def _object_sojourns(events: DataFrame, event_objects: DataFrame) -> DataFrame:
    """Per (object, event): seconds since the object's previous event.
    The flattened pm4py semantics — an event touching k objects carries k
    sojourn observations, one per object timeline it advances."""
    timeline = event_objects.join(
        events.select(F.col("id").alias("event_id"), "type", "time"), "event_id"
    )
    w = Window.partitionBy("object_id").orderBy("time", "event_id")
    return timeline.withColumn(
        "sojourn_s",
        (F.col("time").cast("double") - F.lag("time").over(w).cast("double")),
    )


def activity_performance(events: DataFrame, event_objects: DataFrame) -> DataFrame:
    """(activity, n, avg/min/max/p50 sojourn seconds) — wrapper :127/:214
    (ocel activity performance): time each activity makes its objects wait,
    measured from the object's previous event."""
    soj = _object_sojourns(events, event_objects).filter(F.col("sojourn_s").isNotNull())
    return (
        soj.groupBy(F.col("type").alias("activity"))
        .agg(
            F.count("*").alias("n"),
            F.avg("sojourn_s").alias("avg_sojourn_s"),
            F.min("sojourn_s").alias("min_sojourn_s"),
            F.max("sojourn_s").alias("max_sojourn_s"),
            F.median("sojourn_s").alias("p50_sojourn_s"),
        )
        .orderBy("activity")
    )


def activity_cooccurrence(events: DataFrame, event_objects: DataFrame) -> DataFrame:
    """(activity_a < activity_b, n_objects sharing both) — wrapper :217.
    Distinct (object, activity) first, so an object doing 'ship' 50 times
    still counts once per pair."""
    oa = (
        event_objects.join(
            events.select(F.col("id").alias("event_id"), "type"), "event_id"
        )
        .select("object_id", F.col("type").alias("activity"))
        .distinct()
    )
    a = oa.select("object_id", F.col("activity").alias("activity_a"))
    b = oa.select("object_id", F.col("activity").alias("activity_b"))
    return (
        a.join(b, "object_id")
        .filter(F.col("activity_a") < F.col("activity_b"))
        .groupBy("activity_a", "activity_b")
        .agg(F.countDistinct("object_id").alias("n_objects"))
        .orderBy(F.desc("n_objects"), "activity_a", "activity_b")
    )


def object_type_activities(
    events: DataFrame, event_objects: DataFrame, objects: DataFrame
) -> DataFrame:
    """(object_type, sorted activity array, n_activities) — wrapper :179
    (pm4py.ocel_object_type_activities)."""
    typed = event_objects.join(
        objects.select(F.col("id").alias("object_id"), F.col("type").alias("object_type")),
        "object_id",
    ).join(events.select(F.col("id").alias("event_id"), F.col("type").alias("activity")), "event_id")
    return (
        typed.groupBy("object_type")
        .agg(F.sort_array(F.collect_set("activity")).alias("activities"))
        .withColumn("n_activities", F.size("activities"))
        .orderBy("object_type")
    )


def object_interactions(event_objects: DataFrame, objects: DataFrame) -> DataFrame:
    """(type_a <= type_b, n interacting object pairs) — wrapper :182
    (objects_interactions_summary): two objects interact when one event
    relates to both. Pairs are distinct object pairs per event; the
    canonical (lesser type, lesser id) ordering avoids double counts."""
    typed = event_objects.join(
        objects.select(F.col("id").alias("object_id"), F.col("type").alias("otype")),
        "object_id",
    ).select("event_id", "object_id", "otype")
    l = typed.select("event_id", F.col("object_id").alias("id_a"), F.col("otype").alias("ta"))
    r = typed.select("event_id", F.col("object_id").alias("id_b"), F.col("otype").alias("tb"))
    pairs = l.join(r, "event_id").filter(F.col("id_a") < F.col("id_b"))
    canon_a = F.when(F.col("ta") <= F.col("tb"), F.col("ta")).otherwise(F.col("tb"))
    canon_b = F.when(F.col("ta") <= F.col("tb"), F.col("tb")).otherwise(F.col("ta"))
    return (
        pairs.select(canon_a.alias("type_a"), canon_b.alias("type_b"), "id_a", "id_b")
        .distinct()
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), "type_a", "type_b")
    )


def object_lifecycle(
    events: DataFrame, event_objects: DataFrame, objects: DataFrame | None = None
) -> DataFrame:
    """Per-object lifecycle — wrapper :185 (ocel_objects_lifecycle): first/
    last event time + activity, event count, wall duration. One aggregation
    partitioned on the object key; min/max over (time, activity) structs
    give the boundary activities without a second window pass."""
    timeline = event_objects.join(
        events.select(F.col("id").alias("event_id"), "type", "time"), "event_id"
    )
    life = timeline.groupBy("object_id").agg(
        F.count("*").alias("n_events"),
        F.min("time").alias("first_time"),
        F.max("time").alias("last_time"),
        F.min(F.struct("time", F.col("event_id").alias("e"), F.col("type").alias("a")))[
            "a"
        ].alias("first_activity"),
        F.max(F.struct("time", F.col("event_id").alias("e"), F.col("type").alias("a")))[
            "a"
        ].alias("last_activity"),
    )
    life = life.withColumn(
        "duration_s", F.col("last_time").cast("double") - F.col("first_time").cast("double")
    )
    if objects is not None:
        life = life.join(
            objects.select(
                F.col("id").alias("object_id"), F.col("type").alias("object_type")
            ),
            "object_id",
            "left",
        )
    return life


def case_duration_summary(
    events: DataFrame, event_objects: DataFrame, objects: DataFrame
) -> DataFrame:
    """Case statistics with the OCEL case notion = one object — wrapper
    :228-254 (ocel_get_case_duration/frequency/performance): per object
    type, how many cases, how long they run, how many events they carry."""
    life = object_lifecycle(events, event_objects, objects)
    return (
        life.groupBy("object_type")
        .agg(
            F.count("*").alias("n_cases"),
            F.avg("duration_s").alias("avg_duration_s"),
            F.median("duration_s").alias("p50_duration_s"),
            F.max("duration_s").alias("max_duration_s"),
            F.avg("n_events").alias("avg_events_per_case"),
        )
        .orderBy("object_type")
    )


def comprehensive_analysis(tables: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Wrapper get_comprehensive_analysis (:312-332): every statistic this
    module owns, keyed like the wrapper's result dict. Variants/DFG/
    conformance intentionally absent — they live in queries/ocel_parity.py
    and queries/conformance.py with DuckDB oracles."""
    ev, eo, ob = tables["events"], tables["event_objects"], tables["objects"]
    return {
        "activity_frequency": activity_frequency(ev),
        "activity_performance": activity_performance(ev, eo),
        "activity_cooccurrence": activity_cooccurrence(ev, eo),
        "object_type_activities": object_type_activities(ev, eo, ob),
        "object_interactions": object_interactions(eo, ob),
        "object_lifecycle": object_lifecycle(ev, eo, ob),
        "case_duration_summary": case_duration_summary(ev, eo, ob),
    }
