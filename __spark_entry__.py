"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship DFG-transition query (window-lead pipeline that
               replaces the reference's engine→Python pairing loop,
               ops/materialized_views.py:234-267) on sf0.001.
queries()    — one entry per implemented operator family from SURVEY.md §2
               plus the training-data pipeline ops (dedup / similarity /
               text analysis / image maintenance).
oracle_sql() — DuckDB-equivalent SQL for every cross-engine-expressible
               query; MinHash/SimHash/LSH/image-maintenance are
               engine-native (xxhash64 / own table format) → rows-only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ocel_ocpn_lakehouse_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q12_dfg_transitions"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
