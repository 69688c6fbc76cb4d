"""Cost/ROI analytics (reference analytics/cost_analysis.py, rebuilt as
bounded distributed aggregations — no driver pandas, no per-group lambdas).
"""

import duckdb
from pyspark.sql import functions as F

from ocel_ocpn_lakehouse_spark.analytics import cost as C
from ocel_ocpn_lakehouse_spark.queries.costs import Q47_SQL, Q48_SQL, QUERIES

SF = "/root/testdata/sf0.001"


def _events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_cost_breakdown_matches_duckdb(spark):
    got = {
        (r["event_type"], r["n_events"], r["cost_per_event"], r["total_cost"])
        for r in QUERIES["q47_cost_breakdown"](spark, SF).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    want = set(map(tuple, con.execute(Q47_SQL).fetchall()))
    assert got == want and len(got) == 5


def test_hourly_profile_matches_duckdb(spark):
    got = {
        (r["hour"], r["n_events"], r["total_cost"], r["vs_avg_ratio"])
        for r in QUERIES["q48_hourly_cost_utilization"](spark, SF).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    want = set(map(tuple, con.execute(Q48_SQL).fetchall()))
    assert got == want and len(got) == 24


def test_roi_and_report_shape(spark):
    ev = _events(spark)
    roi = C.roi_metrics(ev)
    # reconcile the one-row aggregate against the breakdown sum
    breakdown_total = sum(
        r["total_cost"] for r in C.event_cost_breakdown(ev).collect()
    )
    assert abs(roi["total_investment"] - breakdown_total) < 0.01
    assert roi["total_events"] == ev.count()
    assert roi["business_value"] >= 0 and "roi_percentage" in roi

    rep = C.cost_optimization_report(spark, ev)
    assert rep["total_cost"] == round(breakdown_total, 2)
    assert len(rep["cost_by_event_type"]) == 5
    assert 0 <= rep["resource_utilization"]["peak_hour"] <= 23
    assert len(rep["top_resources"]) == 5
    assert isinstance(rep["optimization_opportunities"], list)
    # every opportunity follows the reference record shape
    for opp in rep["optimization_opportunities"]:
        assert {"type", "description", "potential_savings", "priority"} <= set(opp)


def test_cost_expr_is_codegen_no_udf(spark):
    """The pricing must be a foldable CASE inside WholeStageCodegen — the
    reference's per-row Python lambda (cost_analysis.py:85-96) is exactly
    what this module exists to avoid."""
    ev = _events(spark)
    plan = ev.select(C.cost_expr().alias("c"))._jdf.queryExecution().executedPlan().toString()
    # '*(n)' marks a WholeStageCodegen stage in the simple plan format
    assert "*(1)" in plan or "WholeStageCodegen" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # pricing needs only the type column: projection must reach the scan
    assert "ReadSchema: struct<event_type:string>" in plan
