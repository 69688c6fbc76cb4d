"""Reference-parity tests: OCEL-shaped tables in our format, the
reference's validation query set, and its three MVs via the MV manager —
the pipeline shapes from queries/production_validation.py and
ops/materialized_views.py reproduced end-to-end."""

from pyspark.sql import functions as F

from ocel_ocpn_lakehouse_spark.core import Catalog, PartitionSpec, SortOrder, TableSpec
from ocel_ocpn_lakehouse_spark.core.spec import PartitionField
from ocel_ocpn_lakehouse_spark.mviews import MaterializedViewManager, MVDefinition
from ocel_ocpn_lakehouse_spark.queries.ocel_parity import (
    EVENT_OBJECTS_SCHEMA,
    EVENTS_SCHEMA,
    build_activity_metrics,
    build_dfg_matrix,
    build_process_variants,
    synth_event_objects,
    synth_ocel_events,
    validation_queries,
)

N = 1000


def setup_tables(spark, warehouse):
    cat = Catalog(warehouse)
    # events: YEAR/MONTH partition + (type,time,id) sort — the reference
    # layout contract (production_bootstrap.py:220-241)
    ev_spec = TableSpec(
        partition_spec=PartitionSpec(
            (PartitionField("event_date", "month", "event_month_p"),)
        ),
        sort_order=SortOrder.by("type", "time", "id"),
    )
    t_ev = cat.create_table("ocel.events", EVENTS_SCHEMA, ev_spec)
    events = synth_ocel_events(spark, N)
    t_ev.append(events, num_files=4)

    eo_spec = TableSpec(
        partition_spec=PartitionSpec.bucket("event_id", 8),
        sort_order=SortOrder.by("event_id", "object_id"),
    )
    t_eo = cat.create_table("ocel.event_objects", EVENT_OBJECTS_SCHEMA, eo_spec)
    t_eo.append(synth_event_objects(spark, events), num_files=4)
    return cat, t_ev, t_eo


def test_validation_query_set(spark, warehouse):
    cat, t_ev, t_eo = setup_tables(spark, warehouse)
    ev = t_ev.scan(spark)
    eo = t_eo.scan(spark)
    v = validation_queries(ev, eo)
    gc = {r["type"]: r["n"] for r in v["group_count"].collect()}
    assert sum(gc.values()) == N and len(gc) == 8
    assert 0 < v["range_filter"].first()["n"] < N
    n_join = v["join"].first()["n"]
    assert n_join == eo.count()  # every relationship row joins to an event
    q = {r["qualifier"]: r["n"] for r in v["group_by_value"].collect()}
    assert q["primary"] == N  # one primary object per event


def test_monthly_partition_layout(spark, warehouse):
    cat, t_ev, _ = setup_tables(spark, warehouse)
    months = {e.partition.get("_p_event_month_p") for e in t_ev.live_entries()}
    assert len(months) > 12  # two-year range → many monthly partitions


def test_reference_mvs_over_engine_tables(spark, warehouse):
    cat, t_ev, t_eo = setup_tables(spark, warehouse)
    mgr = MaterializedViewManager(cat)
    mgr.register(
        MVDefinition("ocel.dfg_matrix", "ocel.events", lambda s, df: build_dfg_matrix(df))
    )
    mgr.register(
        MVDefinition(
            "ocel.activity_metrics", "ocel.events", lambda s, df: build_activity_metrics(df)
        )
    )
    mgr.register(
        MVDefinition(
            "ocel.process_variants", "ocel.events", lambda s, df: build_process_variants(df)
        )
    )
    results = mgr.refresh_all(spark)
    assert all(r["status"] == "refreshed" for r in results)

    dfg = cat.load_table("ocel.dfg_matrix").scan(spark)
    ev = t_ev.scan(spark)
    # DFG total transitions = events - instances (each instance of k events
    # contributes k-1 pairs)
    n_inst = ev.select("request_id").distinct().count()
    assert dfg.agg(F.sum("frequency")).first()[0] == N - n_inst

    am = cat.load_table("ocel.activity_metrics").scan(spark)
    assert am.agg(F.sum("event_count")).first()[0] == N

    pv = cat.load_table("ocel.process_variants").scan(spark)
    assert pv.agg(F.sum("frequency")).first()[0] == n_inst
    # top variant's sample ids bounded at 10 (reference samples first 10,
    # ops/materialized_views.py:408)
    assert pv.select(F.max(F.size("instance_ids"))).first()[0] <= 10

    # MV routing serves the fresh MV (M6)
    routed = mgr.read_or_build(spark, "ocel.activity_metrics")
    assert routed.count() == am.count()


def test_conformance_over_ocel_fixture(spark, warehouse):
    """Conformance runs over the OCEL-shaped fixture: ~5-step order flow
    instances mostly follow the common DFG, so the summary should show a
    high conformance rate and sensible fitness bounds."""
    from ocel_ocpn_lakehouse_spark.queries.conformance import conformance_summary
    from ocel_ocpn_lakehouse_spark.queries.ocel_parity import build_conformance, synth_ocel_events

    ev = synth_ocel_events(spark, n_events=1500, seed=11)
    per_case = build_conformance(ev)
    rows = per_case.collect()
    assert rows and all(0.0 <= r["fitness"] <= 1.0 for r in rows)
    assert all(0.0 <= r["score"] <= 1.0 for r in rows)
    s = conformance_summary(per_case).first()
    assert s["total_instances"] == len(rows)
    assert s["avg_fitness"] > 0.5  # the fixture's flow is mostly regular
