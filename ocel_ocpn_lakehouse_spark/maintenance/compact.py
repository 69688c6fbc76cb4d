"""T2 — size-tiered bin-packing compaction, EXECUTED (not simulated).

The reference stops at simulation: estimated_files_after =
total_size // 256 MB, "would require rewrite" (ops/maintenance_system.py:
115-166). Here the plan is executed as one Spark job + a driver commit:

  plan   : per-partition first-fit-decreasing of small files into bins of
           ≤ target file size (driver, manifest-only — same split as the
           reference's metadata-only planner, §3.3).
  execute: ONE distributed job, ZERO shuffles. Each file group becomes one
           union branch: read exactly that group's files → coalesce(1) →
           tag lit(_group). The union's partitions are the groups, so one
           task reads ~target-size bytes, sorts them in memory by the table
           sort order (sortWithinPartitions), and writes one output file
           under partitionBy(_group) staging. Image bytes never shuffle and
           never join — at 10^12-row scale the job is N independent
           group-tasks with perfect locality (the same shape Iceberg's
           binpack rewrite uses). Footer stats are collected distributed;
           the driver then publishes group-by-group with checkpoint rows
           (planned → written), and commits ONE replace-snapshot at the end
           (written → committed).
  resume : deterministic job_id = f(table uuid, snapshot); groups already
           'written' are excluded from the rewrite job, their outputs are
           reused from the checkpoint row; a fully-committed job is a
           no-op — the snapshot is never re-committed (north rule).

Scale notes: the broadcast mapping is O(#input files) tiny rows; the only
shuffle is the group repartition, sized ≤ target_file_size per reducer;
binary image bytes shuffle once, sorted within partitions only (no global
sort — SURVEY §7.3 hard part 3).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..core import manifests as mf
from ..core.table import Table
from .checkpoint import SystemTables


class InjectedFailure(RuntimeError):
    """Raised by the fault-injection hook in tests (kill-resume scenario)."""


@dataclass
class FileGroup:
    group_id: str
    partition: dict
    input_paths: list[str]  # relative to table root
    input_bytes: int
    input_records: int


def _group_id(paths: list[str]) -> str:
    return hashlib.sha1("\n".join(sorted(paths)).encode()).hexdigest()[:16]


def plan_compaction(
    table: Table,
    include_all: bool = False,
    min_group_files: int = 2,
) -> list[FileGroup]:
    """First-fit-decreasing bin packing of small files, per partition.

    Only files below the small-file cutoff are candidates (reference
    threshold ops/maintenance_system.py:58) unless include_all; bins cap
    at the 256 MB target (:139). Deterministic: sorted inputs → stable
    group ids, which is what makes resume after a crash find its groups.
    """
    target = table.target_file_size
    small = table.small_file_bytes
    by_partition: dict[str, list[mf.ManifestEntry]] = {}
    for e in table.live_entries():
        if include_all or e.size_bytes < small:
            by_partition.setdefault(json.dumps(e.partition, sort_keys=True), []).append(e)

    groups: list[FileGroup] = []
    for pkey in sorted(by_partition):
        entries = sorted(by_partition[pkey], key=lambda e: (-e.size_bytes, e.path))
        bins: list[list[mf.ManifestEntry]] = []
        bin_sizes: list[int] = []
        for e in entries:
            placed = False
            for i, sz in enumerate(bin_sizes):
                if sz + e.size_bytes <= target:
                    bins[i].append(e)
                    bin_sizes[i] += e.size_bytes
                    placed = True
                    break
            if not placed:
                bins.append([e])
                bin_sizes.append(e.size_bytes)
        for b in bins:
            if len(b) < min_group_files:
                continue
            paths = [e.path for e in b]
            groups.append(
                FileGroup(
                    group_id=_group_id(paths),
                    partition=b[0].partition,
                    input_paths=paths,
                    input_bytes=sum(e.size_bytes for e in b),
                    input_records=sum(e.record_count for e in b),
                )
            )
    return groups


def estimate_files_after(table: Table) -> int:
    """The reference's simulation formula (ops/maintenance_system.py:139-141)."""
    total = sum(e.size_bytes for e in table.live_entries())
    return max(1, total // table.target_file_size + (1 if total % table.target_file_size else 0))


def _norm_path_sql(col):
    # 'file:///root/x' | '/root/x' | 's3://b/k' → scheme/leading-slash-free
    return F.regexp_replace(col, r"^([a-zA-Z0-9]+:)?/+", "")


def _norm_path_py(p: str) -> str:
    import re

    return re.sub(r"^([a-zA-Z0-9]+:)?/+", "", p)


def execute_compaction(
    spark: SparkSession,
    table: Table,
    sys_tables: SystemTables,
    table_name: str = "",
    groups: list[FileGroup] | None = None,
    job_id: str | None = None,
    sort_columns: list[str] | None = None,
    test_fail_after_written: int | None = None,
) -> dict:
    """Execute a compaction plan with checkpointed, resumable commits."""
    t0 = time.time()
    snap = table.current_snapshot()
    if snap is None:
        return {"status": "empty-table", "groups": 0}
    if groups is None:
        groups = plan_compaction(table)
    if not groups:
        return {"status": "healthy", "groups": 0}
    job_id = job_id or f"compact-{table.md.table_uuid[:8]}-snap{snap.snapshot_id}"
    op = "compact"

    states = sys_tables.group_states(job_id)
    if states and all(s["state"] == "committed" for s in states.values()) and set(states) >= {
        g.group_id for g in groups
    }:
        return {"status": "already-committed", "job_id": job_id, "groups": len(groups)}

    done = {gid for gid, s in states.items() if s["state"] in ("written", "committed")}
    pending = [g for g in groups if g.group_id not in done]
    for g in pending:
        sys_tables.record_group(
            job_id, op, table_name, json.dumps(g.partition, sort_keys=True), g.group_id,
            "planned", g.input_paths, rows=g.input_records, nbytes=g.input_bytes,
        )

    written_entries: dict[str, list[mf.ManifestEntry]] = {}
    # recover outputs of previously-written groups from their checkpoint rows
    for gid in done:
        extra = json.loads(states[gid].get("extra") or "{}")
        written_entries[gid] = [mf.ManifestEntry.from_row(r) for r in extra.get("entries", [])]

    if pending:
        staging = table._stage_dir()
        sort_cols = sort_columns or [
            f.column for f in table.sort_order.fields if f.column in table.schema.fieldNames()
        ]
        # one union branch per group: read only that group's files, collapse
        # to a single partition (a group is ≤ target-file-size by
        # construction, i.e. one output file's worth — ideal task size).
        # The union job runs every branch as an independent task: no join,
        # no shuffle, image bytes move exactly once (read → write).
        # Catalyst plan size is O(branches), so very large compactions run
        # in waves of ≤ wave_size groups — each wave one job, each job
        # enough tasks to saturate the cluster.
        wave_size = 256
        for w0 in range(0, len(pending), wave_size):
            wave = pending[w0 : w0 + wave_size]
            branches = []
            for g in wave:
                paths = [os.path.join(table.root, p) for p in g.input_paths]
                branches.append(
                    spark.read.schema(table.schema)
                    .parquet(*paths)
                    .coalesce(1)
                    .withColumn("_group", F.lit(g.group_id))
                )
            df = branches[0]
            for b in branches[1:]:
                df = df.unionByName(b)
            out = df.sortWithinPartitions(*sort_cols) if sort_cols else df
            out.write.mode("append").partitionBy("_group").parquet(staging)

        # distributed footer stats over everything we just wrote
        staged: dict[str, list[str]] = {}
        for g in pending:
            gdir = os.path.join(staging, f"_group={g.group_id}")
            if os.path.isdir(gdir):
                staged[g.group_id] = [
                    os.path.join(gdir, f) for f in sorted(os.listdir(gdir)) if f.endswith(".parquet")
                ]
        all_staged = [p for ps in staged.values() for p in ps]
        stats = mf.collect_stats(spark, all_staged, table.stats_columns())

        import uuid as _uuid

        n_written = 0
        for g in pending:
            files = staged.get(g.group_id, [])
            entries: list[mf.ManifestEntry] = []
            pdir = "/".join(f"{k}={v}" for k, v in sorted(g.partition.items()))
            destdir = os.path.join(table.data_dir, pdir) if pdir else table.data_dir
            os.makedirs(destdir, exist_ok=True)
            for f_abs in files:
                newname = f"{_uuid.uuid4().hex[:8]}-{os.path.basename(f_abs)}"
                dest = os.path.join(destdir, newname)
                os.rename(f_abs, dest)
                rel = os.path.relpath(dest, table.root)
                st = stats[f_abs]
                entries.append(
                    mf.ManifestEntry(
                        path=rel,
                        partition=g.partition,
                        size_bytes=os.path.getsize(dest),
                        record_count=st["record_count"],
                        lower_bounds=st["lower_bounds"],
                        upper_bounds=st["upper_bounds"],
                        null_counts=st["null_counts"],
                    )
                )
            written_entries[g.group_id] = entries
            sys_tables.record_group(
                job_id, op, table_name, json.dumps(g.partition, sort_keys=True), g.group_id,
                "written", g.input_paths,
                output_files=[e.path for e in entries],
                rows=sum(e.record_count for e in entries),
                nbytes=sum(e.size_bytes for e in entries),
                extra={"entries": [e.to_row() for e in entries]},
            )
            n_written += 1
            if test_fail_after_written is not None and n_written >= test_fail_after_written:
                raise InjectedFailure(f"injected failure after {n_written} written groups")

        import shutil

        shutil.rmtree(staging, ignore_errors=True)

    # single replace-snapshot commit covering every group
    removed = {p for g in groups for p in g.input_paths}
    added = [e for g in groups for e in written_entries.get(g.group_id, [])]
    table.commit_replace(
        removed, added, operation="replace", summary={"job": job_id, "op": op}
    )
    dur_ms = int((time.time() - t0) * 1000)
    total_rows = sum(e.record_count for e in added)
    total_bytes = sum(e.size_bytes for e in added)
    for g in groups:
        sys_tables.record_group(
            job_id, op, table_name, json.dumps(g.partition, sort_keys=True), g.group_id,
            "committed", g.input_paths,
            output_files=[e.path for e in written_entries.get(g.group_id, [])],
        )
        sys_tables.record_lineage(
            {
                "job_id": job_id,
                "op": op,
                "table_name": table_name,
                "partition_id": json.dumps(g.partition, sort_keys=True),
                "files_before": len(g.input_paths),
                "files_after": len(written_entries.get(g.group_id, [])),
                "bytes_before": g.input_bytes,
                "bytes_after": sum(e.size_bytes for e in written_entries.get(g.group_id, [])),
                "rows": g.input_records,
                "duration_ms": dur_ms,
                "throughput_rows_s": (total_rows / (dur_ms / 1000)) if dur_ms else 0.0,
                "throughput_bytes_s": (total_bytes / (dur_ms / 1000)) if dur_ms else 0.0,
            }
        )
    return {
        "status": "committed",
        "job_id": job_id,
        "groups": len(groups),
        "files_removed": len(removed),
        "files_added": len(added),
        "rows": total_rows,
        "bytes": total_bytes,
        "duration_ms": dur_ms,
    }
