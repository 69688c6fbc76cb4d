"""M1-M6 — materialized views over engine tables: registration, refresh
(overwrite commit), snapshot-based staleness, query-time MV routing.

Reference: ops/materialized_views.py (4 MVs recomputed via join → sort →
group-collect → Python loop → re-aggregate → overwrite) and
ops/view_refresh_scheduler.py (staleness by last-refresh age). Upgrades
here: the build is one Catalyst plan (no engine→Python round trip), and
staleness is *exact* — the MV snapshot records the base table's snapshot
id in its summary; stale ⇔ base moved — instead of wall-clock age.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core.catalog import Catalog
from .core.spec import TableSpec


@dataclass
class MVDefinition:
    name: str  # MV table identifier, e.g. "ocel.phash_stats"
    base: str  # base table identifier
    build: Callable[[SparkSession, DataFrame], DataFrame]  # base scan → MV rows
    spec: TableSpec | None = None
    # incremental view maintenance (self-maintainable aggregates): given the
    # CURRENT MV rows and the base-table DELTA rows appended since the MV's
    # recorded base snapshot, produce the new MV rows — e.g. union old rows
    # with build(delta) and re-aggregate (counts/sums/min/max merge). When
    # set, refresh() reads only the delta via Table.incremental_scan — cost
    # ∝ appended bytes, not table size — and falls back whenever the range
    # is not append-only (merge/overwrite/rollback) or the recorded
    # snapshot expired.
    incr_merge: Callable[[SparkSession, DataFrame, DataFrame], DataFrame] | None = None
    # CDC view maintenance: given the CURRENT MV rows and the base table's
    # row-level changelog (Table.changelog_scan: insert/delete rows with
    # _change_type), produce the new MV rows. The upgrade over incr_merge:
    # it survives MoR deletes, CoW merges and rollbacks — the ranges
    # incremental_scan refuses — so an MV behind a mutating table refreshes
    # at delta cost instead of a full rebuild. Use algebraic_cdc_merge for
    # the standard count/sum/avg shape; fallback order in refresh() is
    # incr_merge (append-only) → cdc_merge (any range) → full rebuild
    # (expired start snapshot).
    cdc_merge: Callable[[SparkSession, DataFrame, DataFrame], DataFrame] | None = None


def algebraic_cdc_merge(
    group_cols: Sequence[str],
    counts: Mapping[str, None] | Sequence[str],
    sums: Mapping[str, str] | None = None,
) -> Callable[[SparkSession, DataFrame, DataFrame], DataFrame]:
    """A ``cdc_merge`` for the self-maintainable aggregate MV shape:
    ``GROUP BY group_cols`` with COUNT(*) columns (``counts``: output
    names) and SUM columns (``sums``: output name → source column).

    Classic IVM algebra: each changelog row contributes with weight +1
    (insert) / −1 (delete); the delta aggregates map-side, unions with the
    current MV rows (already one row per group), and re-aggregates —
    cost ∝ |changelog| + |MV|, never the base table. Groups whose count
    reaches zero disappear, exactly as a full rebuild would drop them.
    AVG is stored as (sum, count) and derived at read time — the standard
    IVM requirement; MIN/MAX are NOT maintainable under deletes (a
    deleted extremum needs a rescan), so they keep the full-rebuild path.
    Requires at least one count column to detect dead groups."""
    count_cols = list(counts)
    sum_map = dict(sums or {})
    if not count_cols:
        raise ValueError("algebraic_cdc_merge needs ≥1 count column")
    measure_cols = count_cols + list(sum_map)

    def merge(spark: SparkSession, mv_now: DataFrame, changelog: DataFrame) -> DataFrame:
        w = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
        delta = changelog.groupBy(*group_cols).agg(
            *[F.sum(w).alias(c) for c in count_cols],
            *[F.sum(w * F.col(src)).alias(out) for out, src in sum_map.items()],
        )
        merged = (
            mv_now.select(*group_cols, *measure_cols)
            .unionByName(delta.select(*group_cols, *measure_cols))
            .groupBy(*group_cols)
            .agg(*[F.sum(c).alias(c) for c in measure_cols])
            .filter(F.col(count_cols[0]) > 0)
        )
        # cast back to the MV's stored types (sum() widens int → long etc.)
        return merged.select(
            *group_cols,
            *[
                F.col(c).cast(mv_now.schema[c].dataType).alias(c)
                for c in measure_cols
            ],
        )

    return merge


class MaterializedViewManager:
    def __init__(self, catalog: Catalog):
        self.catalog = catalog
        self.definitions: dict[str, MVDefinition] = {}

    def register(self, definition: MVDefinition) -> None:
        self.definitions[definition.name] = definition

    # ---- staleness (M5) ------------------------------------------------------
    def base_snapshot_id(self, name: str) -> int | None:
        d = self.definitions[name]
        base = self.catalog.load_table(d.base)
        snap = base.current_snapshot()
        return snap.snapshot_id if snap else None

    def recorded_base_snapshot(self, name: str) -> int | None:
        from .core.refresh import recorded_source_snapshot

        if not self.catalog.table_exists(name):
            return None
        return recorded_source_snapshot(
            self.catalog.load_table(name), "base-snapshot-id"
        )

    def is_stale(self, name: str) -> bool:
        return self.recorded_base_snapshot(name) != self.base_snapshot_id(name)

    # ---- refresh (M2-M4 pipeline shape) ---------------------------------------
    def refresh(self, spark: SparkSession, name: str, force: bool = False) -> dict:
        """One shared machine with the secondary indexes (core/refresh.py):
        incr_merge rides the append-only incremental scan, cdc_merge the
        row-level changelog, anything else rebuilds — and the
        base-snapshot stamp lands IN the overwrite commit (the former
        post-commit metadata rewrite left a crash window where rows were
        published under a stale stamp). ``force`` rebuilds in full."""
        from .core.refresh import refresh_derived

        d = self.definitions[name]
        if not force and not self.is_stale(name):
            return {"name": name, "status": "fresh"}
        base = self.catalog.load_table(d.base)
        if not self.catalog.table_exists(name):
            # first build: create the MV table from the build's schema
            # (plan-only — nothing executes), then the machine lands
            # rows + stamp in one commit
            df = d.build(spark, base.scan(spark))
            self.catalog.create_table(name, df.schema, d.spec or TableSpec())
        mv = self.catalog.load_table(name)
        r = refresh_derived(
            spark,
            mv,
            base,
            "base-snapshot-id",
            d.build,
            merge=d.incr_merge,
            cdc_merge=d.cdc_merge,
            full_status="refreshed",
            force=force,
        )
        if r["status"] == "empty-source":
            # forced refresh over a base with no snapshots: a full (empty)
            # rebuild, unstamped — the pre-helper behavior
            snap = mv.overwrite(d.build(spark, base.scan(spark)))
            r = {"status": "refreshed", "rows": int(snap.summary["added-records"])}
        return {"name": name, "status": r["status"], "rows": r["rows"]}

    def refresh_all(self, spark: SparkSession) -> list[dict]:
        return [self.refresh(spark, n) for n in self.definitions]

    # ---- scheduler (reference ops/view_refresh_scheduler.py:77-128) ----------
    def scheduler_tick(self, spark: SparkSession, interval_s: float = 3600.0) -> dict:
        """One scheduler pass: refresh every MV that is stale OR older than
        ``interval_s`` since its last refresh, and return run stats
        (reference tracks total/successful refreshes and durations,
        view_refresh_scheduler.py:130-160). The reference wraps this in a
        `schedule`-library daemon loop; here the tick is a pure function so
        any orchestrator (cron, Airflow, a while-loop) can drive it —
        the daemon loop itself is trivially `while True: tick(); sleep()`
        via :func:`run_scheduler`."""
        import time as _time

        t0 = _time.time()
        results = []
        for name in self.definitions:
            stale = self.is_stale(name)
            aged = self.last_refresh_age_s(name)
            due = stale or aged is None or aged >= interval_s
            if due:
                results.append(self.refresh(spark, name, force=not stale))
            else:
                results.append({"name": name, "status": "fresh"})
        refreshed = [r for r in results if r["status"].startswith("refreshed")]
        return {
            "total": len(results),
            "refreshed": len(refreshed),
            "fresh": len(results) - len(refreshed),
            "duration_s": round(_time.time() - t0, 3),
            "results": results,
        }

    def last_refresh_age_s(self, name: str) -> float | None:
        """Seconds since the MV's last refresh commit (None if never)."""
        import time as _time

        if not self.catalog.table_exists(name):
            return None
        snap = self.catalog.load_table(name).current_snapshot()
        if snap is None:
            return None
        return _time.time() - snap.timestamp_ms / 1000.0

    def run_scheduler(
        self, spark: SparkSession, interval_s: float = 3600.0, max_ticks: int | None = None
    ) -> list[dict]:
        """The daemon loop (bounded for tests; unbounded in production)."""
        import time as _time

        stats = []
        n = 0
        while max_ticks is None or n < max_ticks:
            stats.append(self.scheduler_tick(spark, interval_s))
            n += 1
            if max_ticks is not None and n >= max_ticks:
                break
            _time.sleep(interval_s)
        return stats

    # ---- routing (M6) -----------------------------------------------------------
    def read_or_build(self, spark: SparkSession, name: str) -> DataFrame:
        """Query-time MV routing with recompute fallback (reference pattern:
        agent/process_mining_queries.py:75-117)."""
        if self.catalog.table_exists(name) and not self.is_stale(name):
            return self.catalog.load_table(name).scan(spark)
        d = self.definitions[name]
        base = self.catalog.load_table(d.base)
        return d.build(spark, base.scan(spark))
