"""T16 — merge-on-read DELETE (Iceberg v2 positional delete vectors).

The reference has no row-level delete at all (its tables are append/
overwrite only — ops/materialized_views.py rebuilds, never deletes); the
engine's MERGE (T12, maintenance/merge.py) gives copy-on-write row-level
ops. This module adds the MoR alternative: ``DELETE FROM t WHERE p``
without rewriting a single data byte —

  plan   : manifest-level candidate pruning (optional PrunePredicates:
           only files whose bounds/partition/bloom can match the predicate
           are scanned), then ONE vectorized JVM scan of the candidates
           projecting (``_metadata.file_path``, ``_metadata.row_index``)
           for rows matching the predicate. Rows already tombstoned by an
           earlier delete are anti-joined out, so re-running a delete is a
           no-op and per-file live counts never double-count.
  write  : the (file, pos) pairs — sorted by (path, pos) so readers get
           row-group pushdown on ``path`` — land in ONE delete-vector
           parquet under ``data/_deletes/``. O(deleted rows), not O(table).
  commit : metadata-only — every touched file's manifest entry gains a DV
           reference (``Table.commit_delete_vectors``); concurrent rewrite
           of a touched file fails the commit (positions would index the
           wrong rows).

Readers apply tombstones at scan time (core/table.py _scan_with_deletes:
clean files stream through the ordinary scan; tombstoned files pay one
broadcast anti-join). Maintenance rewrites (compaction T2, clustering T6,
MERGE T12) absorb DVs — rewritten files come out clean.

Scale notes: a predicate delete at 10^12 rows scans only the files its
predicate can touch (manifest pruning), moves only (path, pos) pairs, and
commits O(touched files) metadata. The single-file DV write serializes in
one task — at warehouse scale shard the write by table partition (one DV
per partition, same entry-level reference scheme); noted, not needed at
this corpus' delete volumes.
"""

from __future__ import annotations

import glob
import os
import time
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.table import PrunePredicate, Table
from .checkpoint import SystemTables

DELETES_SUBDIR = os.path.join("data", "_deletes")


def exclude_existing_tombstones(spark, table: Table, entries, hits, prefix: str):
    """Anti-join rows an earlier delete already tombstoned out of ``hits``
    ((_fp, _pos) rows): repeated predicates become no-ops and per-file
    live counts never double-count."""
    dv_rel = sorted({d["path"] for e in entries for d in e.deletes})
    if not dv_rel:
        return hits
    old = spark.read.parquet(*[os.path.join(table.root, p) for p in dv_rel]).select(
        F.concat(F.lit(prefix), F.col("path")).alias("_fp"),
        F.col("pos").alias("_pos"),
    )
    return hits.join(F.broadcast(old), ["_fp", "_pos"], "left_anti")


def write_delete_vector(
    spark, table: Table, hits, prefix: str
) -> tuple[str | None, dict[str, int]]:
    """Materialize (_fp, _pos) hit rows as ONE (path, pos)-sorted delete-
    vector parquet under ``data/_deletes/`` (sorted so every later reader
    gets row-group pushdown on ``path``). Returns (rel DV path, per-file
    counts) — (None, {}) when nothing matched."""
    import shutil

    import pyarrow.parquet as pq

    hits = hits.select(
        F.expr(f"substring(_fp, {len(prefix) + 1})").alias("path"),
        F.col("_pos").alias("pos"),
    )
    stage = table._stage_dir()
    out_dir = os.path.join(stage, "dv")
    hits.coalesce(1).sortWithinPartitions("path", "pos").write.mode("overwrite").parquet(out_dir)
    parts = glob.glob(os.path.join(out_dir, "part-*.parquet"))
    if len(parts) != 1:
        raise RuntimeError(f"expected one DV part file, found {len(parts)}")

    # per-file counts: driver-side single-file read, metadata-sized result
    tbl = pq.read_table(parts[0], columns=["path"])
    if tbl.num_rows == 0:
        shutil.rmtree(stage, ignore_errors=True)
        return None, {}
    vc = tbl["path"].value_counts().to_pylist()
    counts = {v["values"]: int(v["counts"]) for v in vc}

    dest_dir = os.path.join(table.root, DELETES_SUBDIR)
    os.makedirs(dest_dir, exist_ok=True)
    dest = os.path.join(dest_dir, f"dv-{uuid.uuid4().hex[:12]}.parquet")
    os.rename(parts[0], dest)
    shutil.rmtree(stage, ignore_errors=True)
    return os.path.relpath(dest, table.root), counts


def delete_where(
    spark: SparkSession,
    table: Table,
    condition: str | Column,
    prune: list[PrunePredicate] | None = None,
    sys_tables: SystemTables | None = None,
    table_name: str = "",
) -> dict:
    """Merge-on-read row delete. Returns a result dict with the DV path,
    per-commit deleted-row count and touched-file count."""
    t0 = time.time()
    cond = F.expr(condition) if isinstance(condition, str) else condition
    snap = table.current_snapshot()
    if snap is None:
        return {"status": "empty-table"}
    if prune is None and isinstance(condition, str):
        # simple conjunctions prune candidates at the manifest for free
        from .predicates import derive_prune_predicates

        prune = derive_prune_predicates(condition, table.schema)
    entries = table.live_entries()
    if prune:
        entries = [e for e in entries if table._entry_matches(e, prune)]
    if not entries:
        return {"status": "no-candidate-files", "deleted_rows": 0}

    root = table.root
    schema = table.schema
    cols = schema.fieldNames()
    prefix = f"file:{root}{os.sep}"
    cand_paths = [os.path.join(root, e.path) for e in entries]
    df = (
        spark.read.schema(schema)
        .parquet(*cand_paths)
        .select(
            F.col("_metadata.file_path").alias("_fp"),
            F.col("_metadata.row_index").alias("_pos"),
            *cols,
        )
    )
    hits = df.filter(cond).select("_fp", "_pos")
    return _finalize_delete(spark, table, entries, hits, prefix, t0, sys_tables, table_name)


def delete_keys(
    spark: SparkSession,
    table: Table,
    keys: DataFrame,
    key_col: str = "image_id",
    sys_tables: SystemTables | None = None,
    table_name: str = "",
    broadcast_max_rows: int = 2_000_000,
) -> dict:
    """Merge-on-read delete of every row whose ``key_col`` appears in the
    ``keys`` DataFrame — the set-driven sibling of :func:`delete_where` for
    callers whose delete list is itself a distributed result (near-dup
    losers, GDPR erasure batches), where an ``IN (...)`` predicate would
    drag the whole set through the driver.

    Scale shape: when the table is bucketed on ``key_col`` the candidate
    files shrink to the buckets the keys hash into (O(distinct buckets)
    driver rows, same pruning MERGE uses — maintenance/merge.py); the scan
    projects only (file, pos, key), and the semi-join broadcasts the keys
    under ``broadcast_max_rows`` else shuffles. Everything downstream
    (tombstone exclusion → one sorted DV file → metadata-only commit with
    DV-count conflict guards) is shared with delete_where, so re-running
    the same key set is a no-op and concurrent file rewrites conflict
    instead of corrupting positions."""
    t0 = time.time()
    if table.current_snapshot() is None:
        return {"status": "empty-table"}
    keys = keys.select(key_col).distinct()
    n_keys = keys.count()  # caller caches `keys` when it is an expensive plan
    if n_keys == 0:
        return {"status": "no-matches", "deleted_rows": 0, "sec": round(time.time() - t0, 3)}
    entries = table.live_entries()
    bf = next(
        (
            f
            for f in table.partition_spec.fields
            if f.transform == "bucket" and f.source == key_col
        ),
        None,
    )
    if bf is not None:
        buckets = {
            r["b"]
            for r in keys.select(
                F.pmod(F.xxhash64(F.col(key_col)), F.lit(bf.num_buckets)).cast("int").alias("b")
            )
            .distinct()
            .collect()
        }
        entries = [
            e
            for e in entries
            if not e.partition
            or e.partition.get(bf.name, e.partition.get(bf.partition_column)) in buckets
        ]
    if not entries:
        return {"status": "no-candidate-files", "deleted_rows": 0}

    root = table.root
    prefix = f"file:{root}{os.sep}"
    cand_paths = [os.path.join(root, e.path) for e in entries]
    df = (
        spark.read.schema(table.schema)
        .parquet(*cand_paths)
        .select(
            F.col("_metadata.file_path").alias("_fp"),
            F.col("_metadata.row_index").alias("_pos"),
            key_col,
        )
    )
    rhs = F.broadcast(keys) if n_keys <= broadcast_max_rows else keys
    hits = df.join(rhs, key_col, "semi").select("_fp", "_pos")
    return _finalize_delete(spark, table, entries, hits, prefix, t0, sys_tables, table_name)


def _finalize_delete(
    spark, table: Table, entries, hits, prefix: str, t0: float, sys_tables, table_name: str
) -> dict:
    """Shared delete tail: tombstone exclusion → DV write → metadata-only
    commit guarded by the candidate entries' observed DV counts."""
    hits = exclude_existing_tombstones(spark, table, entries, hits, prefix)
    rel_dv, counts = write_delete_vector(spark, table, hits, prefix)
    if rel_dv is None:
        return {"status": "no-matches", "deleted_rows": 0, "sec": round(time.time() - t0, 3)}

    commit = table.commit_delete_vectors(
        rel_dv,
        counts,
        # the already-tombstoned exclusion ran against THESE DV sets; a file
        # that gained a DV since must conflict, not double-count
        expected_dv_counts={e.path: len(e.deletes) for e in entries},
    )
    result = {
        "status": "deleted",
        "deleted_rows": int(sum(counts.values())),
        "tombstoned_files": len(counts),
        "candidate_files": len(entries),
        "dv_path": rel_dv,
        "snapshot_id": commit.snapshot_id,
        "sec": round(time.time() - t0, 3),
    }
    if sys_tables is not None:
        sys_tables.record_group(
            f"delete-{table.md.table_uuid[:8]}-snap{commit.snapshot_id}",
            "delete",
            table_name,
            "*",
            "delete-all",
            "committed",
            [rel_dv],
            rows=result["deleted_rows"],
            nbytes=os.path.getsize(os.path.join(table.root, rel_dv)),
        )
    return result
