"""T6 — Z-order/Hilbert clustering rewrite, EXECUTED (not just recommended).

The reference checks sort-order drift and recommends re-clustering
(ops/advanced_partitioning.py:154-181); here the rewrite runs:

  1. scan live files, attach the 64-bit curve key `_zkey`
     (functions/zorder.py — pure column expressions for Z-order, an
     Arrow-vectorized pandas UDF for Hilbert);
  2. `repartitionByRange(n_out, *partition_cols, _zkey)` — range shuffle
     sized so each output file ≈ the 256 MB target; range boundaries are
     sampled by Spark, so phash hot-spots spread across tasks, and the
     xxhash64(image_id) low bits inside the key salt residual skew
     (north rule: "salting for phash hot-spots");
  3. `sortWithinPartitions(*pcols, _zkey)` → write partitionBy(pcols),
     keeping `_zkey` as a real column in the files so footer stats give
     per-file zkey min/max — the "per-file min/max stats rewrite" the
     north rule requires. Scans pruning on `_zkey` (or on phash/w/h
     bounds, which clustering tightens) skip files entirely.
  4. replace-snapshot commit + manifest rewrite (T7) + lineage rows.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..core import manifests as mf
from ..core.table import Table
from ..functions.zorder import image_hilbert_key, image_zorder_key
from .checkpoint import SystemTables

ZKEY_COL = "_zkey"


def execute_cluster(
    spark: SparkSession,
    table: Table,
    sys_tables: SystemTables,
    table_name: str = "",
    curve: str = "zorder",  # zorder | hilbert
    key_column=None,
    job_id: str | None = None,
) -> dict:
    t0 = time.time()
    snap = table.current_snapshot()
    if snap is None:
        return {"status": "empty-table"}
    entries = table.live_entries()
    if not entries:
        return {"status": "empty-table"}
    job_id = job_id or f"cluster-{table.md.table_uuid[:8]}-snap{snap.snapshot_id}"

    states = sys_tables.group_states(job_id)
    if states.get("cluster-all", {}).get("state") == "committed":
        return {"status": "already-committed", "job_id": job_id}

    total_bytes = sum(e.size_bytes for e in entries)
    total_records = sum(e.record_count for e in entries)
    n_out = max(1, -(-total_bytes // table.target_file_size))

    if key_column is None:
        cols = set(table.schema.fieldNames())
        if {"phash", "w", "h", "image_id"} <= cols:
            key_column = image_hilbert_key() if curve == "hilbert" else image_zorder_key()
        else:
            sort_cols = [f.column for f in table.sort_order.fields] or table.schema.fieldNames()[:1]
            key_column = F.xxhash64(*sort_cols)  # fallback: stable spread

    spec = table.partition_spec
    pcols = spec.partition_columns()
    df = table.scan(spark).withColumn(ZKEY_COL, key_column)
    for f in spec.fields:
        df = df.withColumn(f.partition_column, f.to_column())

    sys_tables.record_group(
        job_id, "cluster", table_name, "*", "cluster-all", "planned",
        [e.path for e in entries], rows=total_records, nbytes=total_bytes,
    )

    # --- range boundaries WITHOUT repartitionByRange -----------------------
    # repartitionByRange samples the full-width shuffle input — on an image
    # table that is a second complete read of every payload byte. Instead:
    # per-partition zkey quantiles from a KEY-ONLY scan (column pruning
    # keeps bytes out of it), then a hash shuffle on the precomputed range
    # bucket. Output file count per partition = ceil(partition_bytes /
    # target) (the reference's sizing formula, ops/maintenance_system.py:139).
    key_inputs = sorted(
        {c for c in ("phash", "w", "h", "image_id") if c in table.schema.fieldNames()}
    ) or [f.column for f in table.sort_order.fields]
    key_df = table.scan(spark, columns=list(key_inputs)).withColumn(ZKEY_COL, key_column)
    for f in spec.fields:
        key_df = key_df.withColumn(f.partition_column, f.to_column())

    part_bytes: dict[str, int] = {}
    for e in entries:
        k = json.dumps(e.partition, sort_keys=True)
        part_bytes[k] = part_bytes.get(k, 0) + e.size_bytes
    n_sub = {
        k: max(1, -(-b // table.target_file_size)) for k, b in part_bytes.items()
    }
    max_sub = max(n_sub.values())

    zb = F.lit(0)
    if max_sub > 1:
        qs = [i / max_sub for i in range(1, max_sub)]
        bounds_rows = (
            key_df.groupBy(*pcols)
            .agg(F.percentile_approx(ZKEY_COL, qs, 5000).alias("bounds"))
            .collect()
        ) if pcols else [
            key_df.agg(F.percentile_approx(ZKEY_COL, qs, 5000).alias("bounds")).first()
        ]

        def pkey_of(row):
            return json.dumps(
                {c: row[c] for c in pcols}, sort_keys=True, default=str
            )

        # per-partition boundary literals, subsampled to that partition's
        # own output-file count
        bounds_df_rows = []
        for r in bounds_rows:
            pk = pkey_of(r) if pcols else next(iter(n_sub))
            nb = n_sub.get(pk, 1)
            bs = r["bounds"] or []
            step = max(1, len(bs) // nb) if nb > 1 else len(bs) + 1
            picked = [bs[i] for i in range(step - 1, len(bs), step)][: nb - 1] if nb > 1 else []
            bounds_df_rows.append(
                tuple([r[c] for c in pcols] + [picked])
            )
        bschema = ", ".join(f"{c} int" for c in pcols) + (", " if pcols else "") + "bounds array<long>"
        bounds_df = spark.createDataFrame(bounds_df_rows, bschema)
        df = df.join(F.broadcast(bounds_df), on=pcols, how="left") if pcols else df.crossJoin(
            F.broadcast(bounds_df)
        )
        zb = F.size(F.filter(F.col("bounds"), lambda b: b <= F.col(ZKEY_COL)))
        df = df.withColumn("_zb", zb).drop("bounds")
    else:
        df = df.withColumn("_zb", zb)

    staging = table._stage_dir()
    n_shuffle = int(sum(n_sub.values()))
    out = df.repartition(max(n_shuffle, 1), *pcols, "_zb").sortWithinPartitions(
        *pcols, "_zb", ZKEY_COL
    )
    # dir-per-(partition, zb): file content = one contiguous zkey range even
    # when hash collisions co-locate several ranges in one task
    writer = out.write.mode("overwrite").partitionBy(*pcols, "_zb")
    writer.parquet(staging)

    stats_cols = (table.stats_columns() or set()) | {ZKEY_COL}
    new_entries = table.publish_staged(
        spark, staging, stats_columns=stats_cols, drop_partition_keys={"_zb"}
    )

    sys_tables.record_group(
        job_id, "cluster", table_name, "*", "cluster-all", "written",
        [e.path for e in entries], output_files=[e.path for e in new_entries],
        rows=sum(e.record_count for e in new_entries),
        nbytes=sum(e.size_bytes for e in new_entries),
    )

    removed = {e.path for e in entries}
    table.commit_replace(removed, new_entries, operation="replace", summary={"job": job_id, "op": "cluster", "curve": curve})
    dur_ms = int((time.time() - t0) * 1000)
    sys_tables.record_group(
        job_id, "cluster", table_name, "*", "cluster-all", "committed",
        [e.path for e in entries], output_files=[e.path for e in new_entries],
    )
    sys_tables.record_lineage(
        {
            "job_id": job_id,
            "op": "cluster",
            "table_name": table_name,
            "partition_id": "*",
            "files_before": len(entries),
            "files_after": len(new_entries),
            "bytes_before": total_bytes,
            "bytes_after": sum(e.size_bytes for e in new_entries),
            "rows": total_records,
            "duration_ms": dur_ms,
            "throughput_rows_s": total_records / (dur_ms / 1000) if dur_ms else 0.0,
            "throughput_bytes_s": total_bytes / (dur_ms / 1000) if dur_ms else 0.0,
        }
    )
    return {
        "status": "committed",
        "job_id": job_id,
        "curve": curve,
        "files_before": len(entries),
        "files_after": len(new_entries),
        "rows": total_records,
        "bytes": total_bytes,
        "duration_ms": dur_ms,
    }


