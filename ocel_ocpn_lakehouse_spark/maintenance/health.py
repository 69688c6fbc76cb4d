"""T1 table-health + T4 partition-skew analysis — metadata-only DataFrame ops.

Faithful to the reference's scoring model (ops/maintenance_system.py:30-112):
  health = 100 − 20·[files>1000] − 15·[small_ratio>0.5] − 10·[snapshots>100]
small-file cutoff 64 MB, large 256 MB (:58-60); skew = (max−min)/avg
(ops/advanced_partitioning.py:54-59) extended with per-partition row-count
skew feeding the salting decision. All metrics are computed on the manifest
entries DataFrame (S3 metadata scan) — the data path is never touched.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..core.table import Table


@dataclass
class HealthReport:
    table_name: str
    total_files: int
    total_bytes: int
    total_records: int
    tombstoned_files: int  # files carrying merge-on-read delete vectors
    dead_rows: int  # positional-delete tombstones awaiting absorb
    small_files: int
    medium_files: int
    large_files: int
    avg_file_bytes: float
    size_skew: float
    partition_row_skew: float
    snapshot_count: int
    health_score: int
    recommendations: list[str] = field(default_factory=list)

    def to_dict(self) -> dict:
        return dict(self.__dict__)


def analyze_table_health(spark: SparkSession, table: Table, name: str = "") -> HealthReport:
    small = table.small_file_bytes
    large = table.target_file_size
    entries = table.entries_df(spark)

    agg = entries.agg(
        F.count("*").alias("files"),
        F.coalesce(F.sum("size_bytes"), F.lit(0)).alias("bytes"),
        F.coalesce(F.sum("record_count"), F.lit(0)).alias("records"),
        F.coalesce(F.sum(F.when(F.col("size_bytes") < small, 1).otherwise(0)), F.lit(0)).alias("n_small"),
        F.coalesce(
            F.sum(
                F.when((F.col("size_bytes") >= small) & (F.col("size_bytes") < large), 1).otherwise(0)
            ),
            F.lit(0),
        ).alias("n_medium"),
        F.coalesce(F.sum(F.when(F.col("size_bytes") >= large, 1).otherwise(0)), F.lit(0)).alias("n_large"),
        F.min("size_bytes").alias("min_b"),
        F.max("size_bytes").alias("max_b"),
        F.avg("size_bytes").alias("avg_b"),
        F.coalesce(
            F.sum(F.when(F.coalesce(F.col("deletes"), F.lit("[]")) != "[]", 1).otherwise(0)),
            F.lit(0),
        ).alias("n_tomb"),
        F.coalesce(
            F.sum(
                F.expr(
                    "coalesce(aggregate(from_json(deletes, "
                    "'array<struct<path:string,count:bigint>>'), 0L, (a, x) -> a + x.count), 0L)"
                )
            ),
            F.lit(0),
        ).alias("dead_rows"),
    ).first()

    pskew_row = (
        entries.groupBy("partition")
        .agg(F.sum("record_count").alias("rows"))
        .agg(F.min("rows").alias("mn"), F.max("rows").alias("mx"), F.avg("rows").alias("av"))
        .first()
    )

    files = agg["files"] or 0
    avg_b = agg["avg_b"] or 0.0
    size_skew = ((agg["max_b"] - agg["min_b"]) / avg_b) if files and avg_b else 0.0
    prow_skew = (
        ((pskew_row["mx"] - pskew_row["mn"]) / pskew_row["av"])
        if pskew_row and pskew_row["av"]
        else 0.0
    )
    n_snapshots = len(table.snapshots())

    score = 100
    recs: list[str] = []
    if files > 1000:
        score -= 20
        recs.append("compact: too many files (>1000)")
    small_ratio = (agg["n_small"] / files) if files else 0.0
    if small_ratio > 0.5:
        score -= 15
        recs.append("compact: >50% small files")
    if n_snapshots > 100:
        score -= 10
        recs.append("expire-snapshots: >100 snapshots")
    if size_skew > 2.0:
        recs.append("rebalance: file-size skew > 2.0")
    if prow_skew > 2.0:
        recs.append("salt: partition row-count skew > 2.0")
    if files and avg_b < small:
        recs.append("compact: avg file size below small-file cutoff")
    dead = int(agg["dead_rows"] or 0)
    records = int(agg["records"] or 0)
    if records and dead / records > 0.05:
        # tombstone debt: every scan of those files pays the MoR anti-join
        # and footer stats over-count — absorb via compaction
        recs.append("compact: >5% rows tombstoned by delete vectors")

    return HealthReport(
        table_name=name,
        total_files=files,
        total_bytes=int(agg["bytes"]),
        total_records=int(agg["records"]),
        tombstoned_files=int(agg["n_tomb"] or 0),
        dead_rows=dead,
        small_files=int(agg["n_small"]),
        medium_files=int(agg["n_medium"]),
        large_files=int(agg["n_large"]),
        avg_file_bytes=float(avg_b),
        size_skew=float(size_skew),
        partition_row_skew=float(prow_skew),
        snapshot_count=n_snapshots,
        health_score=score,
        recommendations=recs,
    )


def maintenance_schedule(health_score: int) -> str:
    """Reference scheduling policy (ops/maintenance_system.py:273-285)."""
    if health_score < 70:
        return "daily"
    if health_score < 85:
        return "weekly"
    return "monthly"


def pruning_effectiveness(
    spark: SparkSession, table: Table, prune_predicates, residual_filter=None
) -> dict:
    """T4 partition-effectiveness probe (reference times full vs filtered
    scans, ops/advanced_partitioning.py:32-86 / the ≥50% gate in
    queries/final_system_validation.py:183-188). Reports both the timing
    ratio and the structural number that actually matters at scale: the
    fraction of files the manifest-level prune eliminated."""
    import time as _t

    entries = table.live_entries()
    total_files = len(entries)
    kept = [e for e in entries if table._entry_matches(e, prune_predicates)]

    t0 = _t.time()
    full = table.scan(spark)
    if residual_filter is not None:
        full = full.filter(residual_filter)
    n_full = full.count()
    t_full = _t.time() - t0

    t0 = _t.time()
    pruned = table.scan(spark, prune=prune_predicates)
    if residual_filter is not None:
        pruned = pruned.filter(residual_filter)
    n_pruned = pruned.count()
    t_pruned = _t.time() - t0

    return {
        "total_files": total_files,
        "files_scanned": len(kept),
        "files_pruned_pct": round(100 * (1 - len(kept) / total_files), 1) if total_files else 0.0,
        "rows_full": n_full,
        "rows_pruned": n_pruned,
        "consistent": n_full == n_pruned,
        "time_full_s": round(t_full, 3),
        "time_pruned_s": round(t_pruned, 3),
        "time_reduction_pct": round(100 * (1 - t_pruned / t_full), 1) if t_full else 0.0,
    }
