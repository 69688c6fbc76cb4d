"""Object-centric process statistics (analytics/process_stats.py) vs
driver-pandas oracles.

Two fixtures: a handcrafted 4-event OCEL log with answers worked out by
hand, and the seeded synthetic OCEL fixture (queries/ocel_parity.py)
checked against a full pandas re-computation of the pm4py-style
semantics — same flattened per-object timelines, same pair canonicalization.
"""

from __future__ import annotations

import itertools

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ocel_ocpn_lakehouse_spark.analytics import process_stats as PS
from ocel_ocpn_lakehouse_spark.queries.ocel_parity import synth_event_objects, synth_ocel_events


@pytest.fixture(scope="module")
def tiny(spark):
    events = spark.createDataFrame(
        [
            ("e1", "create", "2024-01-01 10:00:00"),
            ("e2", "pack", "2024-01-01 11:00:00"),
            ("e3", "ship", "2024-01-01 13:00:00"),
            ("e4", "create", "2024-01-02 09:00:00"),
        ],
        "id string, type string, time_s string",
    ).select("id", "type", F.to_timestamp("time_s").alias("time"))
    event_objects = spark.createDataFrame(
        [
            ("e1", "o1", "order"),
            ("e1", "c1", "customer"),
            ("e2", "o1", "order"),
            ("e3", "o1", "order"),
            ("e3", "c1", "customer"),
            ("e4", "o2", "order"),
        ],
        "event_id string, object_id string, qualifier string",
    )
    objects = spark.createDataFrame(
        [("o1", "order"), ("o2", "order"), ("c1", "customer")], "id string, type string"
    )
    return events, event_objects, objects


def test_tiny_activity_frequency(tiny):
    ev, _, _ = tiny
    rows = {(r.activity, r.n_events) for r in PS.activity_frequency(ev).collect()}
    assert rows == {("create", 2), ("pack", 1), ("ship", 1)}


def test_tiny_activity_performance(tiny):
    ev, eo, _ = tiny
    # o1: e1→e2 3600s (pack), e2→e3 7200s (ship); c1: e1→e3 10800s (ship)
    got = {r.activity: r for r in PS.activity_performance(ev, eo).collect()}
    assert set(got) == {"pack", "ship"}
    assert got["pack"].n == 1 and got["pack"].avg_sojourn_s == 3600.0
    assert got["ship"].n == 2
    assert got["ship"].avg_sojourn_s == pytest.approx((7200 + 10800) / 2)
    assert got["ship"].min_sojourn_s == 7200.0 and got["ship"].max_sojourn_s == 10800.0


def test_tiny_cooccurrence_interactions_lifecycle(tiny):
    ev, eo, ob = tiny
    co = {(r.activity_a, r.activity_b, r.n_objects) for r in PS.activity_cooccurrence(ev, eo).collect()}
    assert co == {("create", "pack", 1), ("create", "ship", 2), ("pack", "ship", 1)}

    inter = {(r.type_a, r.type_b, r.n_pairs) for r in PS.object_interactions(eo, ob).collect()}
    assert inter == {("customer", "order", 1)}  # (c1,o1) interacts in e1 AND e3 → 1 pair

    ota = {r.object_type: list(r.activities) for r in PS.object_type_activities(ev, eo, ob).collect()}
    assert ota == {"customer": ["create", "ship"], "order": ["create", "pack", "ship"]}

    life = {r.object_id: r for r in PS.object_lifecycle(ev, eo, ob).collect()}
    assert life["o1"].n_events == 3 and life["o1"].duration_s == 10800.0
    assert life["o1"].first_activity == "create" and life["o1"].last_activity == "ship"
    assert life["o2"].n_events == 1 and life["o2"].duration_s == 0.0
    assert life["c1"].object_type == "customer"

    summ = {r.object_type: r for r in PS.case_duration_summary(ev, eo, ob).collect()}
    assert summ["order"].n_cases == 2
    assert summ["order"].avg_duration_s == pytest.approx(10800 / 2)
    assert summ["customer"].avg_events_per_case == pytest.approx(2.0)


@pytest.fixture(scope="module")
def synth(spark):
    ev = synth_ocel_events(spark, n_events=400, seed=9).cache()
    eo = synth_event_objects(spark, ev, seed=9).distinct().cache()
    ob = eo.select(F.col("object_id").alias("id")).distinct().select(
        "id",
        F.element_at(
            F.array(F.lit("order"), F.lit("item"), F.lit("customer")),
            (F.pmod(F.xxhash64("id"), 3) + 1).cast("int"),
        ).alias("type"),
    ).cache()
    return ev, eo, ob


def _pd_tables(synth):
    ev, eo, ob = synth
    return ev.toPandas(), eo.toPandas(), ob.toPandas()


def test_synth_activity_performance_matches_pandas(synth):
    ev, eo, ob = synth
    got = {r.activity: r for r in PS.activity_performance(ev, eo).collect()}
    pev, peo, _ = _pd_tables(synth)
    tl = peo.merge(pev.rename(columns={"id": "event_id"}), on="event_id")
    tl = tl.sort_values(["object_id", "time", "event_id"])
    tl["soj"] = tl.groupby("object_id")["time"].diff().dt.total_seconds()
    want = tl.dropna(subset=["soj"]).groupby("type")["soj"].agg(["count", "mean", "min", "max", "median"])
    assert set(got) == set(want.index)
    for act, row in want.iterrows():
        assert got[act].n == row["count"]
        assert got[act].avg_sojourn_s == pytest.approx(row["mean"])
        assert got[act].min_sojourn_s == pytest.approx(row["min"])
        assert got[act].max_sojourn_s == pytest.approx(row["max"])
        assert got[act].p50_sojourn_s == pytest.approx(row["median"])


def test_synth_interactions_match_pandas(synth):
    ev, eo, ob = synth
    got = {(r.type_a, r.type_b): r.n_pairs for r in PS.object_interactions(eo, ob).collect()}
    pev, peo, pob = _pd_tables(synth)
    typed = peo.merge(pob.rename(columns={"id": "object_id", "type": "otype"}), on="object_id")
    pairs = set()
    for _, grp in typed.groupby("event_id"):
        rows = list(grp[["object_id", "otype"]].itertuples(index=False))
        for a, b in itertools.combinations(sorted(rows), 2):
            if a.object_id == b.object_id:
                continue
            ta, tb = sorted([a.otype, b.otype])
            pairs.add((ta, tb, a.object_id, b.object_id))
    want: dict = {}
    for ta, tb, *_ in pairs:
        want[(ta, tb)] = want.get((ta, tb), 0) + 1
    assert got == want


def test_synth_lifecycle_and_case_summary_match_pandas(synth):
    ev, eo, ob = synth
    life = PS.object_lifecycle(ev, eo, ob).toPandas().set_index("object_id")
    pev, peo, pob = _pd_tables(synth)
    tl = peo.merge(pev.rename(columns={"id": "event_id"}), on="event_id")
    tl = tl.sort_values(["object_id", "time", "event_id"])
    g = tl.groupby("object_id")
    assert (life["n_events"].sort_index() == g.size().sort_index()).all()
    want_dur = (g["time"].max() - g["time"].min()).dt.total_seconds()
    assert life["duration_s"].sort_index().values == pytest.approx(want_dur.sort_index().values)
    first_act = g.first()["type"]
    last_act = g.last()["type"]
    assert (life["first_activity"].sort_index() == first_act.sort_index()).all()
    assert (life["last_activity"].sort_index() == last_act.sort_index()).all()

    summ = {r.object_type: r for r in PS.case_duration_summary(ev, eo, ob).collect()}
    typed = want_dur.to_frame("dur").merge(
        pob.rename(columns={"id": "object_id"}).set_index("object_id"),
        left_index=True,
        right_index=True,
    )
    for ot, grp in typed.groupby("type"):
        assert summ[ot].n_cases == len(grp)
        assert summ[ot].avg_duration_s == pytest.approx(float(grp["dur"].mean()))


def test_comprehensive_analysis_keys(synth):
    ev, eo, ob = synth
    out = PS.comprehensive_analysis({"events": ev, "event_objects": eo, "objects": ob})
    assert set(out) == {
        "activity_frequency",
        "activity_performance",
        "activity_cooccurrence",
        "object_type_activities",
        "object_interactions",
        "object_lifecycle",
        "case_duration_summary",
    }
    for df in out.values():
        assert df.count() > 0
