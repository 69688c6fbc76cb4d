"""T20 — predicate-localized column transform (UPDATE as maintenance).

GDPR-style redaction, recaptioning, or metadata repair at rest: rewrite
ONLY the files that contain rows matching a predicate, applying column
expressions to the matching rows — every untouched file stays in place
byte-for-byte, so the cost is ∝ touched files, never the corpus. The
reference has no UPDATE surface at all (its closest move is a full table
reload); this op completes the row-level mutation family next to MERGE
(maintenance/merge.py) and MoR DELETE (maintenance/deletes.py).

Shape (the 100x question):

  phase 1  ONE narrow scan of the candidate files — Catalyst prunes the
           read to the predicate's columns plus ``_metadata.file_path``
           (the payload column never rides through the filter) — yields
           the touched-file set, O(#touched) driver strings.
  phase 2  only the touched files re-read full-width; existing delete
           vectors are ANTI-JOINED out (the rewrite absorbs them, like
           compaction), the SET expressions evaluate inside whole-stage
           codegen gated on the predicate (non-matching rows in a touched
           file pass through unchanged), and one applyInArrow task per
           file writes the replacement in original row order with fresh
           footer stats + Blooms (Arrow-native: no pandas int64→float64
           round-trip anywhere near the payload).
  commit   ``commit_replace`` with ``operation='update'`` (NOT the
           row-preserving 'replace': the changelog must emit the old rows
           as deletes and the new as inserts so CDC consumers see the
           update) guarded by ``expected_dv_counts`` — a concurrent
           delete on a touched file conflicts instead of resurrecting.

UPDATE semantics match SQL: every SET expression sees the ORIGINAL row
(simultaneous select, not sequential withColumn), and rows already
tombstoned by delete vectors do not resurrect.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid as _uuid

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from ..core import manifests as mf
from ..core.table import PrunePredicate, Table
from .checkpoint import SystemTables
from .deletes import exclude_existing_tombstones


def transform_where(
    spark: SparkSession,
    table: Table,
    condition: str | Column,
    set_exprs: dict[str, str | Column],
    prune: list[PrunePredicate] | None = None,
    sys_tables: SystemTables | None = None,
    table_name: str = "",
) -> dict:
    """``UPDATE <table> SET <set_exprs> WHERE <condition>`` as a CoW
    maintenance rewrite of exactly the touched files."""
    t0 = time.time()
    cond = F.expr(condition) if isinstance(condition, str) else condition
    snap = table.current_snapshot()
    if snap is None:
        return {"status": "empty-table", "updated_rows": 0}
    if prune is None and isinstance(condition, str):
        # simple conjunctions prune candidates at the manifest for free
        from .predicates import derive_prune_predicates

        prune = derive_prune_predicates(condition, table.schema)
    entries = table.live_entries()
    if prune:
        entries = [e for e in entries if table._entry_matches(e, prune)]
    if not entries:
        return {"status": "no-candidate-files", "updated_rows": 0}

    root = table.root
    schema = table.schema
    cols = schema.fieldNames()
    bad = sorted(set(set_exprs) - set(cols))
    if bad:
        raise ValueError(f"SET columns not in table schema: {bad}")
    # a partition-source SET would leave manifest partition values (and
    # the Hive directory) describing the OLD value: every later
    # partition-pruned read (delete_keys buckets, _p_ predicates) would
    # silently miss the row. Moving a row across partitions is a
    # DELETE + INSERT (MERGE), not an in-place rewrite.
    part_sources = {f.source for f in table.partition_spec.fields}
    bad = sorted(set(set_exprs) & part_sources)
    if bad:
        raise ValueError(
            f"SET touches partition-source columns {bad} — an in-place "
            "rewrite cannot move rows across partitions; use MERGE "
            "(delete + insert) instead"
        )
    prefix = f"file:{root}{os.sep}"
    cand_paths = [os.path.join(root, e.path) for e in entries]

    # phase 1: touched-file discovery — Catalyst column-prunes this scan
    # to the predicate's columns + metadata. Tombstoned rows are excluded
    # HERE too: a file whose only matches are already-deleted rows must
    # not be rewritten (zero real updates, phantom CDC delete+insert
    # pairs for every live row it holds)
    p1 = (
        spark.read.schema(schema)
        .parquet(*cand_paths)
        .select(
            F.col("_metadata.file_path").alias("_fp"),
            F.col("_metadata.row_index").alias("_pos"),
            *cols,
        )
        .filter(cond)
    )
    p1 = exclude_existing_tombstones(spark, table, entries, p1, prefix)
    touched_fps = {r["_fp"] for r in p1.select("_fp").distinct().collect()}
    touched = [e for e in entries if prefix + e.path.replace(os.sep, "/") in touched_fps
               or f"{prefix}{e.path}" in touched_fps]
    if not touched:
        return {
            "status": "no-matching-rows",
            "updated_rows": 0,
            "candidate_files": len(entries),
            "seconds": round(time.time() - t0, 3),
        }
    expected_dv_counts = {e.path: len(e.deletes) for e in touched}

    # phase 2: full-width read of touched files only; tombstoned rows out;
    # SET expressions evaluate simultaneously against the original row
    rows = (
        spark.read.schema(schema)
        .parquet(*[os.path.join(root, e.path) for e in touched])
        .select(
            F.col("_metadata.file_path").alias("_fp"),
            F.col("_metadata.row_index").alias("_pos"),
            *cols,
        )
    )
    rows = exclude_existing_tombstones(spark, table, touched, rows, prefix)
    proj = [
        (
            F.when(
                cond,
                F.expr(set_exprs[c]) if isinstance(set_exprs[c], str) else set_exprs[c],
            )
            .otherwise(F.col(c))
            .alias(c)
            if c in set_exprs
            else F.col(c)
        )
        for c in cols
    ]
    upd = rows.select("_fp", "_pos", cond.alias("_hit"), *proj)

    staging = table._stage_dir()
    arrow_schema = mf.spark_to_arrow_schema(schema)
    stats_cols = table.stats_columns()
    bloom_cols = table.bloom_columns
    codec = str(spark.conf.get("spark.sql.parquet.compression.codec", "snappy")).lower()
    codec = {"uncompressed": "none", "lz4raw": "lz4"}.get(codec, codec)
    fp_to_idx = {}
    for i, e in enumerate(touched):
        fp_to_idx[f"{prefix}{e.path}"] = i
        fp_to_idx[prefix + e.path.replace(os.sep, "/")] = i
    idx_b = spark.sparkContext.broadcast(fp_to_idx)

    def _write_file(tbl):
        # applyInArrow, NOT applyInPandas: pandas turns an int64 column
        # holding a null into float64 and silently rounds values > 2^53
        # (a 64-bit phash) even in rows the predicate never matched —
        # Arrow-native keeps every value bit-exact end to end
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        pa.set_cpu_count(1)
        tbl = tbl.sort_by([("_pos", "ascending")])
        fidx = idx_b.value[tbl["_fp"][0].as_py()]
        n_hit = int(
            pc.sum(pc.fill_null(tbl["_hit"], False).cast(pa.int64())).as_py() or 0
        )
        data = tbl.select(list(cols)).cast(arrow_schema)
        dest = os.path.join(staging, f"u{fidx}.parquet")
        tmp = f"{dest}.{os.getpid()}.inprogress"
        pq.write_table(data, tmp, compression=codec)
        os.rename(tmp, dest)
        st = mf.footer_stats(dest, stats_cols)
        out_schema = pa.schema(
            [
                ("fidx", pa.int32()),
                ("updated", pa.int64()),
                ("size_bytes", pa.int64()),
                ("record_count", pa.int64()),
                ("lower_bounds", pa.string()),
                ("upper_bounds", pa.string()),
                ("null_counts", pa.string()),
                ("blooms", pa.string()),
            ]
        )
        return pa.Table.from_pylist(
            [
                {
                    "fidx": fidx,
                    "updated": n_hit,
                    "size_bytes": os.path.getsize(dest),
                    "record_count": st["record_count"],
                    "lower_bounds": json.dumps(st["lower_bounds"], default=str),
                    "upper_bounds": json.dumps(st["upper_bounds"], default=str),
                    "null_counts": json.dumps(st["null_counts"]),
                    "blooms": json.dumps(mf.build_blooms(data, bloom_cols)),
                }
            ],
            schema=out_schema,
        )

    out_rows = (
        upd.groupBy("_fp")
        .applyInArrow(
            _write_file,
            "fidx int, updated long, size_bytes long, record_count long, "
            "lower_bounds string, upper_bounds string, null_counts string, "
            "blooms string",
        )
        .collect()
    )

    os.makedirs(table.data_dir, exist_ok=True)
    new_entries = []
    updated_rows = 0
    for r in out_rows:
        e_in = touched[r["fidx"]]
        pdir = "/".join(f"{k}={v}" for k, v in sorted(e_in.partition.items()))
        destdir = os.path.join(table.data_dir, pdir) if pdir else table.data_dir
        os.makedirs(destdir, exist_ok=True)
        dest = os.path.join(destdir, f"{_uuid.uuid4().hex[:8]}-u{r['fidx']}.parquet")
        os.rename(os.path.join(staging, f"u{r['fidx']}.parquet"), dest)
        new_entries.append(
            mf.ManifestEntry(
                path=os.path.relpath(dest, root),
                partition=e_in.partition,
                size_bytes=r["size_bytes"],
                record_count=r["record_count"],
                lower_bounds=json.loads(r["lower_bounds"]),
                upper_bounds=json.loads(r["upper_bounds"]),
                null_counts=json.loads(r["null_counts"]),
                blooms=json.loads(r["blooms"]),
            )
        )
        updated_rows += int(r["updated"])
    shutil.rmtree(staging, ignore_errors=True)

    snap2 = table.commit_replace(
        {e.path for e in touched},
        new_entries,
        operation="update",
        summary={
            "updated-rows": updated_rows,
            "rewritten-files": len(new_entries),
            "rewritten-bytes": sum(e.size_bytes for e in new_entries),
        },
        expected_dv_counts=expected_dv_counts,
    )
    rep = {
        "status": "ok",
        "updated_rows": updated_rows,
        "candidate_files": len(entries),
        "rewritten_files": len(new_entries),
        "untouched_files": len(entries) - len(touched),
        "snapshot_id": snap2.snapshot_id,
        "seconds": round(time.time() - t0, 3),
    }
    if sys_tables is not None:
        sys_tables.record_group(
            f"update-{table.md.table_uuid[:8]}-snap{snap2.snapshot_id}",
            "update",
            table_name,
            "*",
            "update-all",
            "committed",
            [e.path for e in touched],
            [e.path for e in new_entries],
            rows=updated_rows,
            nbytes=sum(e.size_bytes for e in new_entries),
        )
    return rep
