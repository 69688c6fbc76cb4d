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
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from .core.catalog import Catalog
from .core.spec import TableSpec


@dataclass
class MVDefinition:
    name: str  # MV table identifier, e.g. "ocel.phash_stats"
    base: str  # base table identifier
    build: Callable[[SparkSession, DataFrame], DataFrame]  # base scan → MV rows
    spec: TableSpec | None = None


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
        if not self.catalog.table_exists(name):
            return None
        mv = self.catalog.load_table(name)
        snap = mv.current_snapshot()
        if snap is None:
            return None
        return snap.summary.get("base-snapshot-id")

    def is_stale(self, name: str) -> bool:
        return self.recorded_base_snapshot(name) != self.base_snapshot_id(name)

    # ---- refresh (M2-M4 pipeline shape) ---------------------------------------
    def refresh(self, spark: SparkSession, name: str, force: bool = False) -> dict:
        d = self.definitions[name]
        if not force and not self.is_stale(name):
            return {"name": name, "status": "fresh"}
        base = self.catalog.load_table(d.base)
        base_snap = base.current_snapshot()
        result = d.build(spark, base.scan(spark))
        if not self.catalog.table_exists(name):
            self.catalog.create_table(name, result.schema, d.spec or TableSpec())
        mv = self.catalog.load_table(name)
        snap = mv.overwrite(result)
        # exact-staleness bookkeeping: pin the base snapshot into the commit
        snap.summary["base-snapshot-id"] = base_snap.snapshot_id if base_snap else None
        from .core import metadata as meta

        md = meta.load_metadata(mv.root)
        md.snapshots[-1].summary["base-snapshot-id"] = (
            base_snap.snapshot_id if base_snap else None
        )
        meta.commit_metadata(mv.root, md, md.version)
        return {"name": name, "status": "refreshed", "rows": result.count()}

    def refresh_all(self, spark: SparkSession) -> list[dict]:
        return [self.refresh(spark, n) for n in self.definitions]

    # ---- routing (M6) -----------------------------------------------------------
    def read_or_build(self, spark: SparkSession, name: str) -> DataFrame:
        """Query-time MV routing with recompute fallback (reference pattern:
        agent/process_mining_queries.py:75-117)."""
        if self.catalog.table_exists(name) and not self.is_stale(name):
            return self.catalog.load_table(name).scan(spark)
        d = self.definitions[name]
        base = self.catalog.load_table(d.base)
        return d.build(spark, base.scan(spark))
