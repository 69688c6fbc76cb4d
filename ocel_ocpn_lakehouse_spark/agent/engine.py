"""Intent → single-Catalyst-plan query builders over the events table.

Each function mirrors one dispatch target of the reference's query engine
(agent/nl_query_agent.py:266-338 → agent/process_mining_queries.py), with
the per-instance Python loops replaced by window functions, joins and
aggregations — one distributed plan per question.

Event-table mapping: case/object = ``user_id``, activity =
``event_type``, ordering = (epoch micros, event_id). The same builders
work for any log by renaming columns before the call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

CASE, ACT = "user_id", "event_type"


def _ordered(events: DataFrame) -> DataFrame:
    return events.withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))


def _variants(events: DataFrame) -> DataFrame:
    """(case_id, variant) — strict (ts, event_id) ordering."""
    ev = _ordered(events)
    return (
        ev.groupBy(CASE)
        .agg(
            F.concat_ws(
                "→",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("ts_us", "event_id", ACT))),
                    lambda s: s[ACT],
                ),
            ).alias("variant")
        )
        .withColumnRenamed(CASE, "case_id")
    )


def process_variants(spark: SparkSession, events: DataFrame, params: dict) -> DataFrame:
    top_n = params.get("top_n", 10)
    min_freq = params.get("min_frequency", 1)
    return (
        _variants(events)
        .groupBy("variant")
        .agg(F.count("*").alias("n_cases"))
        .filter(F.col("n_cases") >= min_freq)
        .orderBy(F.desc("n_cases"), "variant")
        .limit(top_n)
    )


def case_duration(spark: SparkSession, events: DataFrame, params: dict) -> DataFrame:
    ev = _ordered(events)
    per_case = ev.groupBy(CASE).agg(
        ((F.max("ts_us") - F.min("ts_us")) / 1e6).alias("duration_s")
    )
    return per_case.agg(
        F.count("*").alias("n_cases"),
        F.round(F.avg("duration_s"), 3).alias("avg_s"),
        F.round(F.expr("percentile_approx(duration_s, 0.5)"), 3).alias("p50_s"),
        F.round(F.expr("percentile_approx(duration_s, 0.95)"), 3).alias("p95_s"),
        F.round(F.max("duration_s"), 3).alias("max_s"),
    )


def similar_cases(spark: SparkSession, events: DataFrame, params: dict) -> DataFrame:
    """Cases ranked by variant edit distance to the anchor case."""
    v = _variants(events)
    case_id = params.get("case_id")
    anchor = (
        v.filter(F.col("case_id").cast("string") == str(case_id))
        if case_id is not None
        else v.orderBy("case_id").limit(1)
    ).select(F.col("case_id").alias("anchor_id"), F.col("variant").alias("anchor_variant"))
    return (
        v.crossJoin(F.broadcast(anchor))
        .filter(F.col("case_id") != F.col("anchor_id"))
        .withColumn("distance", F.levenshtein("variant", "anchor_variant"))
        .orderBy("distance", "case_id")
        .select("case_id", "variant", "distance")
        .limit(10)
    )


def activity_frequencies(spark: SparkSession, events: DataFrame, params: dict) -> DataFrame:
    return (
        events.groupBy(ACT)
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct(CASE).alias("n_cases"),
        )
        .orderBy(F.desc("n_events"), ACT)
    )


def bottlenecks(spark: SparkSession, events: DataFrame, params: dict) -> DataFrame:
    """Transitions ranked by mean inter-activity wait (the reference's
    'which activities take longest' proxy)."""
    ev = _ordered(events)
    w = Window.partitionBy(CASE).orderBy("ts_us", "event_id")
    gaps = (
        ev.withColumn("next_act", F.lead(ACT).over(w))
        .withColumn("gap_s", (F.lead("ts_us").over(w) - F.col("ts_us")) / 1e6)
        .filter(F.col("next_act").isNotNull())
    )
    return (
        gaps.groupBy(F.col(ACT).alias("src"), F.col("next_act").alias("dst"))
        .agg(F.count("*").alias("n"), F.round(F.avg("gap_s"), 3).alias("avg_wait_s"))
        .orderBy(F.desc("avg_wait_s"))
        .limit(10)
    )


def resource_utilization(spark: SparkSession, events: DataFrame, params: dict) -> DataFrame:
    return (
        events.groupBy(F.col(CASE).alias("resource"))
        .agg(F.count("*").alias("n_events"), F.countDistinct(ACT).alias("n_activities"))
        .orderBy(F.desc("n_events"), "resource")
        .limit(10)
    )


def object_lifecycle(spark: SparkSession, events: DataFrame, params: dict) -> DataFrame:
    ev = _ordered(events)
    oid = params.get("object_id")
    if oid is not None:
        ev = ev.filter(F.col(CASE).cast("string") == str(oid))
    w = Window.partitionBy(CASE).orderBy("ts_us", "event_id")
    return ev.select(
        F.col(CASE).alias("object_id"),
        F.row_number().over(w).alias("seq"),
        F.col(ACT).alias("activity"),
        "ts",
    ).orderBy("object_id", "seq")


def object_interactions(spark: SparkSession, events: DataFrame, params: dict) -> DataFrame:
    """Directly-follows interaction graph between activity types (the
    closest analog of the reference's object-interaction graph on a
    single-object-type log)."""
    ev = _ordered(events)
    w = Window.partitionBy(CASE).orderBy("ts_us", "event_id")
    return (
        ev.withColumn("next_act", F.lead(ACT).over(w))
        .filter(F.col("next_act").isNotNull())
        .groupBy(F.col(ACT).alias("src"), F.col("next_act").alias("dst"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "src", "dst")
    )


def conformance(spark: SparkSession, events: DataFrame, params: dict) -> DataFrame:
    from ..queries.conformance import conformance_per_case, conformance_summary

    ev = _ordered(events)
    per_case = conformance_per_case(ev)
    case_id = params.get("case_id")
    if case_id is not None:
        return per_case.filter(F.col("case_id").cast("string") == str(case_id))
    return conformance_summary(per_case)


def predict_next_activity(spark: SparkSession, events: DataFrame, params: dict) -> DataFrame:
    """Most likely next activity per case from the log's DFG edge
    frequencies conditioned on each case's current last activity."""
    ev = _ordered(events)
    w = Window.partitionBy(CASE).orderBy("ts_us", "event_id")
    edges = (
        ev.withColumn("next_act", F.lead(ACT).over(w))
        .filter(F.col("next_act").isNotNull())
        .groupBy(F.col(ACT).alias("src"), F.col("next_act").alias("dst"))
        .agg(F.count("*").alias("n"))
    )
    totals = edges.groupBy("src").agg(F.sum("n").alias("total"))
    probs = edges.join(totals, "src").withColumn(
        "p", F.round(F.col("n") / F.col("total"), 4)
    )
    best = probs.withColumn(
        "rk", F.row_number().over(Window.partitionBy("src").orderBy(F.desc("p"), "dst"))
    ).filter(F.col("rk") == 1)
    last = (
        ev.withColumn("rk", F.row_number().over(w.orderBy(F.desc("ts_us"), F.desc("event_id"))))
        .filter(F.col("rk") == 1)
        .select(F.col(CASE).alias("case_id"), F.col(ACT).alias("last_activity"))
    )
    case_id = params.get("case_id")
    if case_id is not None:
        last = last.filter(F.col("case_id").cast("string") == str(case_id))
    return last.join(
        F.broadcast(best.select(F.col("src").alias("last_activity"),
                                F.col("dst").alias("predicted_next"), "p")),
        "last_activity",
        "left",
    ).select("case_id", "last_activity", "predicted_next", "p")


def case_outcome(spark: SparkSession, events: DataFrame, params: dict) -> DataFrame:
    """P(case eventually ends at the log's modal terminal activity),
    conditioned on the case's FIRST activity — the deterministic analog
    of the reference's outcome predictor (conditioning on the last
    activity of a finished log would be a degenerate 0/1)."""
    ev = _ordered(events)
    per_case = ev.groupBy(F.col(CASE).alias("case_id")).agg(
        F.min_by(ACT, F.struct("ts_us", "event_id")).alias("first_activity"),
        F.max_by(ACT, F.struct("ts_us", "event_id")).alias("last_activity"),
    )
    modal = (
        per_case.groupBy("last_activity")
        .count()
        .orderBy(F.desc("count"), "last_activity")
        .limit(1)
        .select(F.col("last_activity").alias("target"))
    )
    scored = per_case.crossJoin(F.broadcast(modal)).withColumn(
        "hit", (F.col("last_activity") == F.col("target")).cast("double")
    )
    rates = scored.groupBy("first_activity", "target").agg(
        F.count("*").alias("n_cases"), F.round(F.avg("hit"), 4).alias("p_outcome")
    )
    case_id = params.get("case_id")
    if case_id is not None:
        anchor = scored.filter(F.col("case_id").cast("string") == str(case_id)).select(
            "case_id", "first_activity"
        )
        return anchor.join(rates, "first_activity", "left")
    return rates.orderBy(F.desc("n_cases"), "first_activity")
