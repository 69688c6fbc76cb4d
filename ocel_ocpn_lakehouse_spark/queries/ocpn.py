"""q38 — OCPN DFG-discovery over the events table (S6 surface).

The reference discovers its net with per-instance driver loops
(ingest/simple_ocpn_generator.py:161-270); here the whole net derives
from two window functions and three groupBys in one Catalyst plan, and —
unlike the reference — the result is cross-engine checkable: the oracle
rebuilds the identical arc table in DuckDB SQL.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.pnml import discover_ocpn


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return ev.withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))


def q38_ocpn_arcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    nets = discover_ocpn(_events(spark, sf_dir))
    return nets["arcs"].select(
        "arc_id", "src_type", "src_id", "dst_type", "dst_id", "weight"
    )


Q38_SQL = """
WITH seq AS (
  SELECT user_id, event_type AS act,
         lead(event_type) OVER w AS next_act,
         row_number() OVER w AS rn,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn_desc
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
edges AS (
  SELECT act AS src, next_act AS dst, count(*) AS freq
  FROM seq WHERE next_act IS NOT NULL GROUP BY 1, 2
),
starts AS (SELECT act, count(*) AS freq FROM seq WHERE rn = 1 GROUP BY 1),
ends AS (SELECT act, count(*) AS freq FROM seq WHERE rn_desc = 1 GROUP BY 1)
SELECT 'a_in_' || src || '__' || dst AS arc_id,
       'transition' AS src_type, 't_' || src AS src_id,
       'place' AS dst_type, 'p_' || src || '__' || dst AS dst_id,
       CAST(freq AS BIGINT) AS weight
FROM edges
UNION ALL
SELECT 'a_out_' || src || '__' || dst, 'place', 'p_' || src || '__' || dst,
       'transition', 't_' || dst, CAST(freq AS BIGINT)
FROM edges
UNION ALL
SELECT 'a_src_' || act, 'place', '__SOURCE__', 'transition', 't_' || act,
       CAST(freq AS BIGINT)
FROM starts
UNION ALL
SELECT 'a_snk_' || act, 'transition', 't_' || act, 'place', '__SINK__',
       CAST(freq AS BIGINT)
FROM ends
"""

QUERIES = {"q38_ocpn_arcs": q38_ocpn_arcs}
ORACLES = {"q38_ocpn_arcs": Q38_SQL}
