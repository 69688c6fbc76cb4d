"""Checkpoint + lineage tables (FIXTURES.md §2.2/§2.3, north rule K3/K4).

Every maintenance action emits per-file-group state transitions
(planned → written → committed) and per-partition lineage/metrics rows.
A killed job resumes idempotently: groups recorded 'written' skip the
rewrite, a job whose groups are all 'committed' is a no-op — the snapshot
is never re-committed.

Storage: append-only Parquet fragments under ``<warehouse>/_system/``,
one tiny file per event (atomic rename). Readers take the latest state
per (job_id, file_group_id). Scales because checkpoint volume is
O(file groups per job), not O(rows); fragments are compacted away by the
same engine if they ever matter.

Reference analog: the scheduler's stats persistence
(ops/view_refresh_scheduler.py:184-201) and the staged-commit flow
(ops/commit_staged_files.py:47-88), upgraded from "report file" to a
real exactly-once mechanism.
"""

from __future__ import annotations

import glob
import json
import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

CHECKPOINT_SCHEMA = pa.schema(
    [
        pa.field("job_id", pa.string()),
        pa.field("op", pa.string()),
        pa.field("table_name", pa.string()),
        pa.field("partition_id", pa.string()),
        pa.field("file_group_id", pa.string()),
        pa.field("state", pa.string()),  # planned | written | committed
        pa.field("input_files", pa.list_(pa.string())),
        pa.field("output_files", pa.list_(pa.string())),
        pa.field("rows", pa.int64()),
        pa.field("bytes", pa.int64()),
        pa.field("extra", pa.string()),  # JSON payload (e.g. output entry stats)
        pa.field("updated_at_ms", pa.int64()),
    ]
)

LINEAGE_SCHEMA = pa.schema(
    [
        pa.field("job_id", pa.string()),
        pa.field("op", pa.string()),
        pa.field("table_name", pa.string()),
        pa.field("partition_id", pa.string()),
        pa.field("files_before", pa.int64()),
        pa.field("files_after", pa.int64()),
        pa.field("bytes_before", pa.int64()),
        pa.field("bytes_after", pa.int64()),
        pa.field("rows", pa.int64()),
        pa.field("duration_ms", pa.int64()),
        pa.field("throughput_rows_s", pa.float64()),
        pa.field("throughput_bytes_s", pa.float64()),
        pa.field("updated_at_ms", pa.int64()),
    ]
)


class SystemTables:
    def __init__(self, warehouse: str):
        self.checkpoint_dir = os.path.join(warehouse, "_system", "checkpoint")
        self.lineage_dir = os.path.join(warehouse, "_system", "lineage")
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        os.makedirs(self.lineage_dir, exist_ok=True)

    # ---- writes -------------------------------------------------------------
    def _append(self, directory: str, schema: pa.Schema, rows: list[dict]) -> None:
        if not rows:
            return
        cols = {f.name: [r.get(f.name) for r in rows] for f in schema}
        table = pa.Table.from_pydict(cols, schema=schema)
        path = os.path.join(directory, f"{int(time.time()*1000)}-{uuid.uuid4().hex[:8]}.parquet")
        tmp = path + ".tmp"
        pq.write_table(table, tmp, compression="snappy")
        os.rename(tmp, path)

    def record_group(
        self,
        job_id: str,
        op: str,
        table_name: str,
        partition_id: str,
        file_group_id: str,
        state: str,
        input_files: list[str],
        output_files: list[str] | None = None,
        rows: int = 0,
        nbytes: int = 0,
        extra: dict | None = None,
    ) -> None:
        self._append(
            self.checkpoint_dir,
            CHECKPOINT_SCHEMA,
            [
                {
                    "job_id": job_id,
                    "op": op,
                    "table_name": table_name,
                    "partition_id": partition_id,
                    "file_group_id": file_group_id,
                    "state": state,
                    "input_files": input_files,
                    "output_files": output_files or [],
                    "rows": rows,
                    "bytes": nbytes,
                    "extra": json.dumps(extra or {}, default=str),
                    "updated_at_ms": int(time.time() * 1000),
                }
            ],
        )

    def record_groups(
        self,
        job_id: str,
        op: str,
        table_name: str,
        state: str,
        groups: list[dict],
    ) -> None:
        """Batched state transition: ONE parquet fragment for N groups.

        A 10^5-group compaction records 'planned' and 'committed' as one
        file each, not 10^5 tiny fragments (the per-group form remains for
        the incremental 'written' transitions, where per-group durability
        is the resume granularity). Each dict: partition_id, file_group_id,
        input_files, and optionally output_files/rows/bytes/extra.
        """
        now = int(time.time() * 1000)
        rows = [
            {
                "job_id": job_id,
                "op": op,
                "table_name": table_name,
                "partition_id": g["partition_id"],
                "file_group_id": g["file_group_id"],
                "state": state,
                "input_files": g.get("input_files", []),
                "output_files": g.get("output_files", []),
                "rows": g.get("rows", 0),
                "bytes": g.get("bytes", 0),
                "extra": json.dumps(g.get("extra") or {}, default=str),
                "updated_at_ms": now,
            }
            for g in groups
        ]
        self._append(self.checkpoint_dir, CHECKPOINT_SCHEMA, rows)

    def record_lineage(self, row: dict) -> None:
        self.record_lineages([row])

    def record_lineages(self, rows: list[dict]) -> None:
        out = []
        now = int(time.time() * 1000)
        for row in rows:
            row = dict(row)
            row.setdefault("updated_at_ms", now)
            out.append(row)
        self._append(self.lineage_dir, LINEAGE_SCHEMA, out)

    # ---- reads --------------------------------------------------------------
    def _read_all(self, directory: str) -> list[dict]:
        files = sorted(glob.glob(os.path.join(directory, "*.parquet")))
        out: list[dict] = []
        for f in files:
            out.extend(pq.read_table(f).to_pylist())
        return out

    def group_states(self, job_id: str) -> dict[str, dict]:
        """Latest checkpoint row per file_group_id for a job."""
        latest: dict[str, dict] = {}
        for r in self._read_all(self.checkpoint_dir):
            if r["job_id"] != job_id:
                continue
            g = r["file_group_id"]
            if g not in latest or r["updated_at_ms"] >= latest[g]["updated_at_ms"]:
                latest[g] = r
        return latest

    def checkpoint_df(self, spark):
        files = glob.glob(os.path.join(self.checkpoint_dir, "*.parquet"))
        if not files:
            return None
        return spark.read.parquet(*files)

    def lineage_rows(self) -> list[dict]:
        return self._read_all(self.lineage_dir)
