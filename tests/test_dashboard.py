"""Executive dashboard (analytics/dashboard.py) vs a driver-pandas oracle.

The oracle re-implements the reference's logic the reference's way —
full-table pandas (dashboards/executive_dashboard.py pulls the whole
events table to the driver per section) — and every Spark-side figure
must match it exactly. That is the parity claim: same numbers, two
bounded aggregations instead of five full-table driver scans.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ocel_ocpn_lakehouse_spark.analytics import dashboard as D
from ocel_ocpn_lakehouse_spark.analytics.cost import DEFAULT_COST_MODEL, DEFAULT_EVENT_COST

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").cache()


@pytest.fixture(scope="module")
def events_pd(events):
    return events.toPandas()


def test_event_cube_matches_pandas(events, events_pd):
    got = D.event_cube(events).toPandas()
    p = events_pd.assign(
        event_date=events_pd["ts"].dt.date,
        hour=events_pd["ts"].dt.hour,
        weekday=events_pd["ts"].dt.dayofweek,
    )
    want = (
        p.groupby(["event_date", "hour", "weekday", "event_type"], dropna=False)
        .size()
        .reset_index(name="n")
    )
    key = ["event_date", "hour", "weekday", "event_type"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    assert int(got["n"].sum()) == len(events_pd)
    assert got_s[key + ["n"]].astype(str).equals(want_s[key + ["n"]].astype(str))


def test_executive_kpis_match_reference_pandas(events, events_pd):
    kpis = D.executive_kpis(events)
    p = events_pd
    assert kpis["process_metrics"]["total_events"] == len(p)
    assert kpis["process_metrics"]["unique_event_types"] == p["event_type"].nunique()

    hourly = p.groupby(p["ts"].dt.hour).size()
    peak = kpis["performance_metrics"]["peak_analysis"]
    assert peak["peak_hour"] == int(hourly.idxmax())
    assert peak["peak_activity"] == int(hourly.max())
    assert peak["avg_activity"] == pytest.approx(float(hourly.mean()))
    assert peak["utilization_ratio"] == pytest.approx(float(hourly.max() / hourly.mean()))

    n_res = p["user_id"].nunique()
    assert kpis["performance_metrics"]["total_resources"] == n_res
    assert kpis["performance_metrics"]["avg_events_per_resource"] == pytest.approx(
        len(p) / n_res
    )

    want_cost = sum(DEFAULT_COST_MODEL.get(t, DEFAULT_EVENT_COST) for t in p["event_type"])
    assert kpis["cost_metrics"]["total_cost"] == pytest.approx(want_cost)
    assert kpis["cost_metrics"]["avg_cost_per_event"] == pytest.approx(want_cost / len(p))
    assert kpis["quality_metrics"]["null_events"] == int(p["event_type"].isnull().sum())
    assert kpis["quality_metrics"]["data_quality_score"] == pytest.approx(100.0)


def test_process_health_matches_reference_pandas(events, events_pd):
    health = D.process_health(events)
    daily = events_pd.groupby(events_pd["ts"].dt.date).size()
    hi = health["health_indicators"]
    assert hi["avg_daily_events"] == pytest.approx(float(daily.mean()))
    assert hi["daily_volatility"] == pytest.approx(float(daily.std()))
    assert hi["stability_score"] == pytest.approx(float(1 - daily.std() / daily.mean()))
    if len(daily) > 7:
        ta = health["trend_analysis"]
        assert ta["recent_avg"] == pytest.approx(float(daily.sort_index().tail(7).mean()))
        assert ta["historical_avg"] == pytest.approx(float(daily.mean()))


def test_performance_analytics_matches_reference_pandas(events, events_pd):
    perf = D.performance_analytics(events)
    p = events_pd
    by_type = p.groupby("event_type").size()
    want_bn = by_type[by_type > len(p) * 0.1]
    bn = perf["bottleneck_analysis"]
    assert bn["bottleneck_count"] == len(want_bn)
    assert bn["bottleneck_events"] == {str(k): int(v) for k, v in want_bn.items()}

    per_res = p.groupby("user_id").size()
    eff = perf["efficiency_metrics"]
    assert eff["resource_count"] == len(per_res)
    assert eff["resource_throughput_variance"] == pytest.approx(float(per_res.std()))
    assert eff["resource_efficiency_score"] == pytest.approx(
        float(1 - per_res.std() / per_res.mean())
    )
    # argmax ties break to the larger key (documented); the oracle mirrors it
    top = per_res[per_res == per_res.max()].index.map(str).max()
    assert eff["top_performing_resource"] == top


def test_dashboard_charts_match_reference_pandas(events, events_pd):
    charts = D.dashboard_charts(events)["charts"]
    p = events_pd
    daily = p.groupby(p["ts"].dt.date).size().sort_index()
    assert charts["daily_trends"]["dates"] == [str(d) for d in daily.index]
    assert charts["daily_trends"]["values"] == [int(v) for v in daily.values]

    by_type = p.groupby("event_type").size().sort_values(ascending=False)
    assert charts["event_distribution"]["labels"][0] == by_type.index[0]
    assert sorted(charts["event_distribution"]["values"], reverse=True) == list(
        charts["event_distribution"]["values"]
    )

    heat = charts["hourly_heatmap"]["data"]
    assert len(heat) == 7 and all(len(r) == 24 for r in heat)
    want = (
        p.groupby([p["ts"].dt.dayofweek, p["ts"].dt.hour])
        .size()
        .unstack(fill_value=0)
        .reindex(index=range(7), columns=range(24), fill_value=0)
    )
    assert heat == want.values.astype(int).tolist()


def test_executive_summary_composes_and_bands(events):
    s = D.executive_summary(events)
    for k in (
        "kpi_metrics",
        "health_dashboard",
        "performance_analytics",
        "charts",
        "executive_overview",
        "key_insights",
        "strategic_recommendations",
    ):
        assert k in s
    ov = s["executive_overview"]
    assert ov["process_volume"] in ("High", "Medium", "Low")
    assert ov["overall_health"] in ("Excellent", "Good", "Needs Attention")
    # sf0.001 events: clean types -> quality Excellent band must agree with kpis
    q = s["kpi_metrics"]["quality_metrics"]["data_quality_score"]
    assert (ov["data_quality"] == "Excellent") == (q > 95)


def test_null_types_degrade_quality(spark):
    rows = [(i, f"2024-01-0{1 + i % 3} 0{i % 10}:00:00", i % 5, None if i % 4 == 0 else "view", 1.0)
            for i in range(40)]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, value double"
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "user_id", "event_type", "value")
    kpis = D.executive_kpis(df)
    assert kpis["quality_metrics"]["null_events"] == 10
    assert kpis["quality_metrics"]["data_quality_score"] == pytest.approx(75.0)
    assert kpis["quality_metrics"]["quality_status"] == "Needs Improvement"
    # null-typed rows price at the default cost, never crash the model
    assert kpis["cost_metrics"]["total_cost"] == pytest.approx(
        30 * DEFAULT_COST_MODEL["view"] + 10 * DEFAULT_EVENT_COST
    )


def test_empty_events_no_crash(spark):
    df = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    s = D.executive_summary(df)
    assert s["kpi_metrics"]["process_metrics"]["total_events"] == 0
    assert s["health_dashboard"]["health_indicators"]["stability_score"] == 0.0
    assert s["charts"]["charts"]["daily_trends"]["values"] == []
