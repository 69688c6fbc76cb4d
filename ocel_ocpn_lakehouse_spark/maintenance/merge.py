"""T12 / J6 — MERGE INTO as a broadcast/hash-join copy-on-write rewrite.

Absent from the reference entirely (north-rule graft). Semantics follow
SQL MERGE with a source carrying ``_op ∈ {'upsert','delete'}``:

  upsert, key in target  → replace the target row
  upsert, key not in     → insert
  delete, key in target  → remove the row
  delete, key not in     → no-op

Copy-on-write at FILE granularity:
  1. touched files = the distinct data files holding any source key —
     found by an inner join of (target rows + input_file_name) with the
     source key set; the source side is broadcast when small (the
     reference's bucketed-join guidance, ops/performance_optimization.py:
     254-259, maps to Spark broadcast/bucket pruning);
  2. bucket pruning first: with a BUCKET(N, key) partition spec, only
     files in source-key buckets are even scanned for the probe;
  3. rewrite = survivors of touched files (anti-join on key) ∪ all upsert
     rows (unionByName — SURVEY §2.6 O4); untouched files are carried
     forward unchanged in the replace-snapshot commit;
  4. old snapshot still references the pre-merge files → time travel
     reproduces pre-merge results.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.table import Table
from .checkpoint import SystemTables
from .compact import _norm_path_py, _norm_path_sql

BROADCAST_THRESHOLD_ROWS = 2_000_000  # source keys; ~16 MB of longs


def merge_into(
    spark: SparkSession,
    table: Table,
    source: DataFrame,
    key: str = "image_id",
    op_col: str = "_op",
    sys_tables: SystemTables | None = None,
    table_name: str = "",
) -> dict:
    t0 = time.time()
    data_cols = table.schema.fieldNames()
    src = source.select(*data_cols, op_col).cache()
    try:
        n_src = src.count()

        # --- 1+2: find touched files (bucket-pruned probe, broadcast keys)
        src_keys = src.select(key).distinct()
        if n_src <= BROADCAST_THRESHOLD_ROWS:
            src_keys = F.broadcast(src_keys)

        spec_buckets = {
            f for f in table.partition_spec.fields if f.transform == "bucket" and f.source == key
        }
        entries = table.live_entries()
        probe_entries = entries
        if spec_buckets:
            bf = next(iter(spec_buckets))
            buckets = {
                r["b"]
                for r in src.select(
                    F.pmod(F.xxhash64(F.col(key)), F.lit(bf.num_buckets)).cast("int").alias("b")
                )
                .distinct()
                .collect()
            }
            probe_entries = [
                e for e in entries if e.partition.get(bf.name, e.partition.get(bf.partition_column)) in buckets
                or not e.partition
            ]

        import os

        if probe_entries:
            probe_paths = [os.path.join(table.root, e.path) for e in probe_entries]
            tgt = (
                spark.read.schema(table.schema)
                .parquet(*probe_paths)
                .withColumn("_file", _norm_path_sql(F.input_file_name()))
            )
            touched_norm = {
                r["_file"]
                for r in tgt.join(src_keys, key, "inner").select("_file").distinct().collect()
            }
        else:
            touched_norm = set()

        norm_to_entry = {_norm_path_py(os.path.join(table.root, e.path)): e for e in entries}
        touched_entries = [norm_to_entry[n] for n in sorted(touched_norm)]

        # --- 3: rewrite touched rows + all upserts
        upserts = src.filter(F.col(op_col) == "upsert").select(*data_cols)
        if touched_entries:
            touched_paths = [os.path.join(table.root, e.path) for e in touched_entries]
            touched_df = spark.read.schema(table.schema).parquet(*touched_paths)
            anti_keys = src_keys  # both upsert & delete keys drop out of target
            survivors = touched_df.join(anti_keys, key, "left_anti")
            rewritten = survivors.unionByName(upserts)
        else:
            rewritten = upserts

        n_new_rows = rewritten.count()
        new_entries = []
        if n_new_rows:
            n_files = max(
                1,
                -(-sum(e.size_bytes for e in touched_entries) // table.target_file_size),
            )
            new_entries = table.write_data_files(rewritten, num_files=int(n_files))

        snap = table.commit_replace(
            {e.path for e in touched_entries},
            new_entries,
            operation="merge",
            summary={"source-rows": n_src, "touched-files": len(touched_entries)},
        )
        dur_ms = int((time.time() - t0) * 1000)
        if sys_tables:
            sys_tables.record_lineage(
                {
                    "job_id": f"merge-{table.md.table_uuid[:8]}-snap{snap.snapshot_id}",
                    "op": "merge",
                    "table_name": table_name,
                    "partition_id": "*",
                    "files_before": len(touched_entries),
                    "files_after": len(new_entries),
                    "bytes_before": sum(e.size_bytes for e in touched_entries),
                    "bytes_after": sum(e.size_bytes for e in new_entries),
                    "rows": n_new_rows,
                    "duration_ms": dur_ms,
                    "throughput_rows_s": n_new_rows / (dur_ms / 1000) if dur_ms else 0.0,
                    "throughput_bytes_s": 0.0,
                }
            )
        return {
            "status": "committed",
            "snapshot_id": snap.snapshot_id,
            "source_rows": n_src,
            "touched_files": len(touched_entries),
            "files_added": len(new_entries),
            "rows_rewritten": n_new_rows,
            "duration_ms": dur_ms,
        }
    finally:
        src.unpersist()
