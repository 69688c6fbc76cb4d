"""Cost-analytics queries (reference analytics/cost_analysis.py, rebuilt
Spark-first in ``analytics/cost.py``) — oracle-checked over `events`.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..analytics.cost import (
    DEFAULT_COST_MODEL,
    DEFAULT_EVENT_COST,
    cost_expr,
    event_cost_breakdown,
)


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def q47_cost_breakdown(spark, sf_dir):
    """Per-event-type cost breakdown (reference cost_by_event_type,
    cost_analysis.py:66-76) — map-side-combined aggregation, CASE-priced
    rows, no UDF, O(#types) output."""
    return event_cost_breakdown(_events(spark, sf_dir))


def _case_sql() -> str:
    whens = " ".join(
        f"WHEN '{k}' THEN {DEFAULT_COST_MODEL[k]}" for k in sorted(DEFAULT_COST_MODEL)
    )
    return f"CASE event_type {whens} ELSE {DEFAULT_EVENT_COST} END"


# CASTs: DuckDB types the CASE/SUM as DECIMAL and renders 10 where Spark's
# double renders 10.0 — the driver's value-hash compares rendered strings
Q47_SQL = f"""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST({_case_sql()} AS DOUBLE) AS cost_per_event,
       CAST(ROUND(SUM({_case_sql()}), 2) AS DOUBLE) AS total_cost
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def q48_hourly_cost_utilization(spark, sf_dir):
    """Hourly utilization + cost with the peak-vs-average ratio that drives
    the reference's load-balancing heuristic (cost_analysis.py:98-109,
    :287) — two chained aggregations, 24 final rows, all JVM-side."""
    c = cost_expr()
    hourly = _events(spark, sf_dir).groupBy(F.hour("ts").alias("hour")).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(c), 2).alias("total_cost"),
    )
    return hourly.select(
        "hour",
        "n_events",
        "total_cost",
        F.round(
            F.col("total_cost") / F.avg("total_cost").over(Window.partitionBy()),
            4,
        ).alias("vs_avg_ratio"),
    ).orderBy("hour")


Q48_SQL = f"""
WITH hourly AS (
  SELECT EXTRACT(hour FROM ts) AS hour,
         COUNT(*) AS n_events,
         CAST(ROUND(SUM({_case_sql()}), 2) AS DOUBLE) AS total_cost
  FROM events GROUP BY 1
)
SELECT hour, n_events, total_cost,
       CAST(ROUND(total_cost / AVG(total_cost) OVER (), 4) AS DOUBLE) AS vs_avg_ratio
FROM hourly
ORDER BY hour
"""


QUERIES = {
    "q47_cost_breakdown": q47_cost_breakdown,
    "q48_hourly_cost_utilization": q48_hourly_cost_utilization,
}

ORACLES = {
    "q47_cost_breakdown": Q47_SQL,
    "q48_hourly_cost_utilization": Q48_SQL,
}
