"""NL intent layer: classification table parity + dispatch results
(reference agent/nl_query_agent.py:41-119 patterns, :166-254 parsing)."""

from pyspark.sql import functions as F

from ocel_ocpn_lakehouse_spark.agent import ask, classify_intent, extract_parameters


CLASSIFY_CASES = {
    "What are the most common process variants?": "process_variants",
    "show me the top 5 variants please": "process_variants",
    "How long do cases take on average?": "case_duration",
    "find cases similar to case_id: 3": "similar_cases",
    "Which activities happen most often?": "activity_frequencies",
    "Can you identify bottlenecks in the process?": "bottlenecks",
    "who is busiest this month": "resource_utilization",
    "show the object lifecycle for object_id: 7": "object_lifecycle",
    "how objects interact with each other": "object_interactions",
    "run a conformance check over the log": "conformance",
    "predict next activity for case_id: 3": "predictions",
    "what is the completion probability here": "case_outcome",
    "tell me a joke": None,
}


def _events(spark):
    sf = "/root/testdata/sf0.001"
    return spark.read.parquet(f"{sf}/events.parquet")


def test_intent_classification_table():
    for q, want in CLASSIFY_CASES.items():
        assert classify_intent(q) == want, q


def test_parameter_extraction():
    p = extract_parameters("show me the top 7 variants with minimum frequency 3", "process_variants")
    assert p == {"top_n": 7, "min_frequency": 3}
    p = extract_parameters("find cases similar to case_id: 3", "similar_cases")
    assert p == {"case_id": "3"}
    p = extract_parameters("object lifecycle for object_id: 9", "object_lifecycle")
    assert p == {"object_id": "9"}


def test_dispatch_all_intents(spark):
    ev = _events(spark)
    questions = [q for q, want in CLASSIFY_CASES.items() if want]
    for q in questions:
        intent, params, df = ask(spark, ev, q)
        assert intent is not None and df is not None, q
        rows = df.collect()
        assert rows, f"{q} → empty result"

    # spot-check semantics
    _, _, freq = ask(spark, ev, "Which activities happen most often?")
    rows = freq.collect()
    total = sum(r["n_events"] for r in rows)
    assert total == ev.count()
    assert rows == sorted(rows, key=lambda r: (-r["n_events"], r["event_type"]))

    _, _, var = ask(spark, ev, "show me the top 3 variants")
    assert len(var.collect()) <= 3

    _, _, pred = ask(spark, ev, "predict next activity for case_id: 3")
    r = pred.collect()
    assert len(r) == 1 and r[0]["case_id"] == 3 and r[0]["predicted_next"] is not None

    _, _, out = ask(spark, ev, "what is the completion probability here")
    for r in out.collect():
        assert 0.0 <= r["p_outcome"] <= 1.0

    unknown, params, df = ask(spark, ev, "tell me a joke")
    assert unknown is None and df is None


def test_result_cache_ttl(spark, tmp_path):
    """TTL result cache: hit within ttl, recompute after expiry, shared
    across sessions via the warehouse (reference query_optimizer.py:84-156
    keeps it in-process only)."""
    import time

    from ocel_ocpn_lakehouse_spark.agent.result_cache import ResultCache, cache_key

    wh = str(tmp_path / "wh")
    rc = ResultCache(wh, ttl_s=3600)
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(5).withColumnRenamed("id", "v")

    r1 = rc.get_or_compute(spark, "range5", {"k": 1}, build)
    assert r1.count() == 5 and calls["n"] == 1
    r2 = rc.get_or_compute(spark, "range5", {"k": 1}, build)
    assert r2.count() == 5 and calls["n"] == 1  # cache hit, no recompute
    assert rc.stats["hits"] == 1

    # different params → different key → recompute
    rc.get_or_compute(spark, "range5", {"k": 2}, build)
    assert calls["n"] == 2

    # a new cache object over the same warehouse shares the hit
    rc2 = ResultCache(wh, ttl_s=3600)
    rc2.get_or_compute(spark, "range5", {"k": 1}, build)
    assert calls["n"] == 2

    # expiry: zero ttl forces recompute + sweep removes the entry
    rc3 = ResultCache(wh, ttl_s=0.0)
    time.sleep(0.01)
    rc3.get_or_compute(spark, "range5", {"k": 1}, build)
    assert calls["n"] == 3
    assert rc3.sweep_expired() >= 1

    assert cache_key("a", {"x": 1}) != cache_key("a", {"x": 2})
    assert cache_key("a", {"x": 1}) == cache_key("a", {"x": 1})


def test_query_pattern_tracker_recommendations(spark, tmp_path):
    """QueryPatternTracker mirrors the reference's thresholds
    (query_optimizer.py:387-414): recommend after >5 slow runs, 'high'
    above 20; performance_analysis aggregates; ask_tracked records real
    latencies and cache hits through the shared TTL cache."""
    from ocel_ocpn_lakehouse_spark.agent.intent import ask_tracked
    from ocel_ocpn_lakehouse_spark.agent.result_cache import (
        QueryPatternTracker,
        ResultCache,
    )

    events_df = _events(spark)
    tr = QueryPatternTracker(slow_query_threshold_s=0.001)
    cache = ResultCache(str(tmp_path / "wh"), ttl_s=600)
    i1, _, rows1 = ask_tracked(
        spark, events_df, "What are the most common process variants?", tr, cache=cache
    )
    assert i1 == "process_variants" and rows1
    i2, _, rows2 = ask_tracked(
        spark, events_df, "What are the most common process variants?", tr, cache=cache
    )
    assert rows2 == rows1 and tr.metrics[-1]["cached"] is True

    # drive one type over both thresholds with synthetic latencies
    for _ in range(25):
        tr.record("bottlenecks", 9.0)
    for _ in range(6):
        tr.record("case_duration", 7.0)
    tr.record("fast_one", 0.0000001)
    recs = tr.recommend_materialized_views()
    by_type = {r["query_type"]: r for r in recs}
    assert by_type["bottlenecks"]["priority"] == "high"
    assert by_type["case_duration"]["priority"] == "medium"
    assert by_type["bottlenecks"]["recommended_view"] == "ocel.bottlenecks_optimized"
    assert "fast_one" not in by_type
    assert recs[0]["query_type"] == "bottlenecks"  # worst first

    pa = tr.performance_analysis()
    assert pa["total_queries"] == len(tr.metrics)
    assert pa["by_type"]["bottlenecks"]["n"] == 25
    assert 0 < pa["cache_hit_rate"] < 1
