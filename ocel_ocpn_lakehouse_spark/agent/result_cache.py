"""TTL result cache — the reference's query-optimizer cache, upgraded.

Reference: agent/query_optimizer.py:84-156 keeps an in-process dict of
query results keyed by md5(query_type, sorted params) with a TTL check
(:147-156) — the cache dies with the process and never serves a second
driver. Here the cached result is a parquet table under the warehouse's
``_system/result_cache`` with a sidecar meta file (key, created_at, ttl,
row count), so any session against the warehouse shares hits, expiry is
by file mtime + recorded ttl, and reading a hit is a normal distributed
scan (a cached result bigger than driver memory still works).

The reference's other optimizer duties are intentionally NOT mirrored:
cost estimation, join-strategy choice and partition pruning are
Catalyst/AQE's job (SURVEY §4.1); MV routing lives in ``mviews.py`` (M6).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


def cache_key(query_type: str, parameters: dict | None = None) -> str:
    """Deterministic key: md5 over (type, sorted params) — reference
    :138-146 exactly."""
    key_data = {
        "query_type": query_type,
        "parameters": sorted(parameters.items()) if parameters else [],
    }
    return hashlib.md5(json.dumps(key_data, sort_keys=True, default=str).encode()).hexdigest()


class ResultCache:
    def __init__(self, warehouse: str, ttl_s: float = 3600.0):
        self.root = os.path.join(warehouse, "_system", "result_cache")
        self.ttl_s = ttl_s
        self.stats = {"hits": 0, "misses": 0, "expired": 0}
        os.makedirs(self.root, exist_ok=True)

    def _paths(self, key: str) -> tuple[str, str]:
        return os.path.join(self.root, key), os.path.join(self.root, f"{key}.meta.json")

    def lookup(self, spark: SparkSession, key: str) -> DataFrame | None:
        ddir, meta = self._paths(key)
        # meta without data = a crash between invalidate's rmtree and the
        # meta unlink (or a concurrent expiry) → treat as a miss, clean up
        if not os.path.isfile(meta) or not os.path.isdir(ddir):
            if os.path.isfile(meta):
                self.invalidate(key)
            self.stats["misses"] += 1
            return None
        with open(meta) as f:
            m = json.load(f)
        # effective TTL = the stricter of writer-recorded and reader policy
        ttl = min(m.get("ttl_s", self.ttl_s), self.ttl_s)
        if time.time() - m["created_at"] > ttl:
            self.stats["expired"] += 1
            self.invalidate(key)
            return None
        self.stats["hits"] += 1
        return spark.read.parquet(ddir)

    def store(self, df: DataFrame, key: str, ttl_s: float | None = None) -> DataFrame:
        ddir, meta = self._paths(key)
        tmp = ddir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        df.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(ddir, ignore_errors=True)
        os.rename(tmp, ddir)
        with open(meta + ".tmp", "w") as f:
            json.dump({"key": key, "created_at": time.time(), "ttl_s": ttl_s or self.ttl_s}, f)
        os.rename(meta + ".tmp", meta)
        return df.sparkSession.read.parquet(ddir)

    def get_or_compute(
        self,
        spark: SparkSession,
        query_type: str,
        parameters: dict | None,
        build,
        ttl_s: float | None = None,
    ) -> DataFrame:
        """Cached query entry point: returns the cached DataFrame when
        fresh, else runs ``build()`` and persists its result."""
        return self.get_or_compute_tracked(spark, query_type, parameters, build, ttl_s)[0]

    def get_or_compute_tracked(
        self,
        spark: SparkSession,
        query_type: str,
        parameters: dict | None,
        build,
        ttl_s: float | None = None,
    ) -> tuple[DataFrame, bool]:
        """(result, was_hit) — the single lookup/store sequence; callers
        that record hit rates (QueryPatternTracker) use this so cache
        semantics live in exactly one place."""
        key = cache_key(query_type, parameters)
        hit = self.lookup(spark, key)
        if hit is not None:
            return hit, True
        return self.store(build(), key, ttl_s), False

    def invalidate(self, key: str) -> None:
        ddir, meta = self._paths(key)
        shutil.rmtree(ddir, ignore_errors=True)
        if os.path.isfile(meta):
            os.remove(meta)

    def sweep_expired(self) -> int:
        """Drop every expired entry (same effective-TTL rule as lookup:
        the stricter of writer-recorded and this cache's policy); returns
        how many were removed."""
        n = 0
        for meta in glob.glob(os.path.join(self.root, "*.meta.json")):
            with open(meta) as f:
                m = json.load(f)
            ttl = min(m.get("ttl_s", self.ttl_s), self.ttl_s)
            if time.time() - m["created_at"] > ttl:
                self.invalidate(m["key"])
                n += 1
        return n


class QueryPatternTracker:
    """Query-pattern recording + MV recommendation — the remaining
    query-optimizer duty (reference agent/query_optimizer.py:278-294
    `_record_query_pattern`, :343-367 metrics, :387-417
    `recommend_new_materialized_views`, :417-455 performance analysis).

    The reference thresholds are kept verbatim: a query type is
    recommended for materialization when it ran slow (> threshold) more
    than ``min_frequency`` times, 'high' priority above 20 occurrences.
    State is a bounded in-process ring like the reference's
    ``performance_metrics`` list; this is driver-side bookkeeping over a
    handful of floats per query — never row data."""

    def __init__(self, slow_query_threshold_s: float = 5.0, max_entries: int = 1000):
        self.slow_query_threshold_s = float(slow_query_threshold_s)
        self.max_entries = int(max_entries)
        self.metrics: list[dict] = []

    def record(self, query_type: str, execution_s: float, cached: bool = False) -> None:
        self.metrics.append(
            {
                "query_type": query_type,
                "execution_time_ms": float(execution_s) * 1000.0,
                "cached": bool(cached),
                "ts": time.time(),
            }
        )
        if len(self.metrics) > self.max_entries:
            del self.metrics[: len(self.metrics) - self.max_entries]

    def recommend_materialized_views(self, min_frequency: int = 5) -> list[dict]:
        """Query types frequently over the slow threshold, worst first
        (reference :387-414; 'high' above 20 occurrences)."""
        slow: dict[str, list[float]] = {}
        for m in self.metrics:
            if m["execution_time_ms"] > self.slow_query_threshold_s * 1000.0:
                slow.setdefault(m["query_type"], []).append(m["execution_time_ms"])
        recs = [
            {
                "query_type": qt,
                "frequency": len(ts),
                "avg_time_ms": sum(ts) / len(ts),
                "recommended_view": f"ocel.{qt}_optimized",
                "priority": "high" if len(ts) > 20 else "medium",
            }
            for qt, ts in slow.items()
            if len(ts) > min_frequency
        ]
        return sorted(recs, key=lambda r: (-r["frequency"], -r["avg_time_ms"]))

    def performance_analysis(self) -> dict:
        """Aggregate view of recorded patterns (reference :417-455)."""
        if not self.metrics:
            return {"error": "No performance metrics available"}
        recent = self.metrics[-100:]
        by_type: dict[str, list[float]] = {}
        for m in self.metrics:
            by_type.setdefault(m["query_type"], []).append(m["execution_time_ms"])
        return {
            "total_queries": len(self.metrics),
            "avg_recent_ms": sum(m["execution_time_ms"] for m in recent) / len(recent),
            "cache_hit_rate": sum(1 for m in self.metrics if m["cached"])
            / len(self.metrics),
            "slowest": sorted(
                self.metrics, key=lambda m: -m["execution_time_ms"]
            )[:10],
            "by_type": {
                qt: {"n": len(ts), "avg_ms": sum(ts) / len(ts), "max_ms": max(ts)}
                for qt, ts in by_type.items()
            },
        }
