"""NL query intent layer — the reference's front door, re-expressed.

Reference: agent/nl_query_agent.py:41-119 defines 11 regex-classified
intent classes; :166-181 parses intent + parameters; :266-338 dispatches
to the query engine. The reference's optional LLM fallback (:258-262 is a
stub that returns None even there) is intentionally absent — this layer
is the deterministic pattern table + dispatch, which is everything the
reference actually executes.

Differences by design: the reference dispatches to per-instance Python
loops over Daft frames; here every intent maps to ONE Catalyst plan over
the events table (builders in ``agent.engine``), so the same question
scales from the 60k-row testdata to the 10^12-row design point.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from . import engine

# Reference pattern table (agent/nl_query_agent.py:41-119), one entry per
# intent class. Order matters: first match wins (same as the reference).
INTENT_PATTERNS: dict[str, list[str]] = {
    "process_variants": [
        r"most common process variants",
        r"show me process variants",
        r"top (?:\d+ )?variants",
        r"most frequent process patterns",
        r"common process flows",
    ],
    "case_duration": [
        r"how long do cases take",
        r"case duration distribution",
        r"average case duration",
        r"how long are processes",
        r"case timing analysis",
    ],
    "similar_cases": [
        r"find similar cases",
        r"cases like this",
        r"similar instances",
        r"comparable processes",
        r"find cases similar to",
    ],
    "activity_frequencies": [
        r"activity frequencies",
        r"most common activities",
        r"which activities happen most",
        r"activity distribution",
        r"activity usage",
    ],
    "bottlenecks": [
        r"identify bottlenecks",
        r"find bottlenecks",
        r"which activities take longest",
        r"slow activities",
        r"process bottlenecks",
        r"performance issues",
    ],
    "resource_utilization": [
        r"resource utilization",
        r"resource workload",
        r"who is busiest",
        r"resource analysis",
        r"workload distribution",
    ],
    "object_lifecycle": [
        r"object lifecycle",
        r"lifecycle of object",
        r"object history",
        r"object events",
        r"object timeline",
    ],
    "object_interactions": [
        r"object interactions",
        r"how objects interact",
        r"object relationships",
        r"object connections",
    ],
    "conformance": [
        r"conformance check",
        r"does this conform",
        r"conformance analysis",
        r"process compliance",
        r"check conformance",
    ],
    "predictions": [
        r"predict next activity",
        r"what will happen next",
        r"next step prediction",
        r"forecast next activity",
    ],
    "case_outcome": [
        r"will this case complete",
        r"case outcome prediction",
        r"completion probability",
        r"case success prediction",
    ],
}


def classify_intent(question: str) -> str | None:
    q = question.lower()
    for intent, patterns in INTENT_PATTERNS.items():
        for p in patterns:
            if re.search(p, q):
                return intent
    return None


def extract_parameters(question: str, intent: str) -> dict:
    """Parameter extraction mirroring the reference (:183-254): top-N,
    minimum frequency, and case/object ids."""
    q = question.lower()
    params: dict = {}
    if intent == "process_variants":
        m = re.search(r"top (\d+)", q)
        params["top_n"] = int(m.group(1)) if m else 10
        m = re.search(r"minimum frequency (\d+)", q)
        params["min_frequency"] = int(m.group(1)) if m else 1
    elif intent in ("similar_cases", "predictions", "case_outcome", "conformance"):
        m = re.search(r"(?:case|instance)[_\s]*id[:\s]*([a-zA-Z0-9_-]+)", question, re.IGNORECASE)
        if m:
            params["case_id"] = m.group(1)
    elif intent == "object_lifecycle":
        m = re.search(r"object[_\s]*id[:\s]*([a-zA-Z0-9_-]+)", question, re.IGNORECASE)
        if m:
            params["object_id"] = m.group(1)
        else:
            m = re.search(r"(?:case|user)[_\s]*id[:\s]*([a-zA-Z0-9_-]+)", question, re.IGNORECASE)
            if m:
                params["object_id"] = m.group(1)
    return params


# intent → builder(spark, events_df, params) (agent/engine.py). Every
# builder returns a DataFrame (one plan, not collected).
DISPATCH = {
    "process_variants": engine.process_variants,
    "case_duration": engine.case_duration,
    "similar_cases": engine.similar_cases,
    "activity_frequencies": engine.activity_frequencies,
    "bottlenecks": engine.bottlenecks,
    "resource_utilization": engine.resource_utilization,
    "object_lifecycle": engine.object_lifecycle,
    "object_interactions": engine.object_interactions,
    "conformance": engine.conformance,
    "predictions": engine.predict_next_activity,
    "case_outcome": engine.case_outcome,
}


def ask(
    spark: SparkSession, events: DataFrame, question: str
) -> tuple[str | None, dict, DataFrame | None]:
    """(intent, parameters, result DataFrame) — None intent when the
    question matches no pattern (the reference returns an error dict;
    callers decide how to surface it)."""
    intent = classify_intent(question)
    if intent is None:
        return None, {}, None
    params = extract_parameters(question, intent)
    return intent, params, DISPATCH[intent](spark, events, params)


def ask_tracked(
    spark: SparkSession,
    events: DataFrame,
    question: str,
    tracker,
    cache=None,
) -> tuple[str | None, dict, list]:
    """``ask`` plus the reference's execute_optimized_query bookkeeping
    (agent/query_optimizer.py:296-341): materializes the answer, times it,
    records the (query_type, latency, cache-hit) pattern on ``tracker`` (a
    ``QueryPatternTracker``), and routes through the warehouse-shared TTL
    ``ResultCache`` when given. Returns (intent, params, rows) — rows, not
    a lazy frame, because the recorded latency must cover execution."""
    import time as _time

    intent = classify_intent(question)
    if intent is None:
        return None, {}, []
    params = extract_parameters(question, intent)
    t0 = _time.time()
    cached = False
    if cache is not None:
        df, cached = cache.get_or_compute_tracked(
            spark, intent, params, lambda: DISPATCH[intent](spark, events, params)
        )
    else:
        df = DISPATCH[intent](spark, events, params)
    rows = df.collect()
    tracker.record(intent, _time.time() - t0, cached=cached)
    return intent, params, rows
