"""Manifest files: per-data-file entries with stats, as Parquet.

Re-implements what the reference reads through PyIceberg's
``table.scan().plan_files()`` (ops/maintenance_system.py:38-49 iterates
``task.files[*].file_size_in_bytes``): every data file is described by a
manifest entry carrying path, partition values, size, record count and
per-column min/max — the input to health analysis, the compaction planner
and scan-time file pruning.

Manifests are Parquet so they can be read either driver-side (pyarrow, for
small tables) or as a distributed DataFrame (``entries_df``) when a table
has millions of files — the scan layer never assumes manifests fit on the
driver beyond the final surviving path list.

Per-file stats are extracted from Parquet footers **executor-side** via
``mapInPandas`` over the path list (collect_stats), so stat collection
scales with the cluster, not the driver.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field
from typing import Iterable, Iterator

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_SCHEMA = pa.schema(
    [
        pa.field("path", pa.string()),  # relative to table root
        pa.field("partition", pa.string()),  # JSON {partition_col: value}
        pa.field("size_bytes", pa.int64()),
        pa.field("record_count", pa.int64()),
        pa.field("lower_bounds", pa.string()),  # JSON {col: min}
        pa.field("upper_bounds", pa.string()),  # JSON {col: max}
        pa.field("null_counts", pa.string()),  # JSON {col: n}
        pa.field("added_snapshot_id", pa.int64()),
    ]
)


@dataclass
class ManifestEntry:
    path: str
    partition: dict
    size_bytes: int
    record_count: int
    lower_bounds: dict = field(default_factory=dict)
    upper_bounds: dict = field(default_factory=dict)
    null_counts: dict = field(default_factory=dict)
    added_snapshot_id: int = 0

    def to_row(self) -> dict:
        return {
            "path": self.path,
            "partition": json.dumps(self.partition, sort_keys=True),
            "size_bytes": int(self.size_bytes),
            "record_count": int(self.record_count),
            "lower_bounds": json.dumps(self.lower_bounds, sort_keys=True, default=str),
            "upper_bounds": json.dumps(self.upper_bounds, sort_keys=True, default=str),
            "null_counts": json.dumps(self.null_counts, sort_keys=True),
            "added_snapshot_id": int(self.added_snapshot_id),
        }

    @staticmethod
    def from_row(r: dict) -> "ManifestEntry":
        return ManifestEntry(
            path=r["path"],
            partition=json.loads(r["partition"]),
            size_bytes=r["size_bytes"],
            record_count=r["record_count"],
            lower_bounds=json.loads(r["lower_bounds"]),
            upper_bounds=json.loads(r["upper_bounds"]),
            null_counts=json.loads(r["null_counts"]),
            added_snapshot_id=r["added_snapshot_id"],
        )


def write_manifest(metadata_dir: str, entries: Iterable[ManifestEntry], seq: int) -> str:
    """Write one manifest parquet; returns its file name."""
    name = f"manifest-{seq:08d}-{uuid.uuid4().hex[:12]}.parquet"
    rows = [e.to_row() for e in entries]
    cols = {f.name: [r[f.name] for r in rows] for f in MANIFEST_SCHEMA}
    table = pa.Table.from_pydict(cols, schema=MANIFEST_SCHEMA)
    path = os.path.join(metadata_dir, name)
    tmp = path + ".tmp"
    pq.write_table(table, tmp, compression="snappy")
    os.rename(tmp, path)
    return name


def read_manifest(metadata_dir: str, name: str) -> list[ManifestEntry]:
    table = pq.read_table(os.path.join(metadata_dir, name))
    return [ManifestEntry.from_row(r) for r in table.to_pylist()]


def read_manifests(metadata_dir: str, names: Iterable[str]) -> list[ManifestEntry]:
    out: list[ManifestEntry] = []
    for n in names:
        out.extend(read_manifest(metadata_dir, n))
    return out


# ---- schema-evolution-aware Arrow reads --------------------------------------


def read_table_nullfill(path: str, arrow_schema, columns: list[str] | None = None) -> "pa.Table":
    """pyarrow read honoring additive schema evolution (T8).

    Files written before ``Table.add_column`` lack the new column;
    ``pq.read_table(columns=...)`` raises ArrowInvalid for them, while the
    engine contract (core/table.py add_column: "existing files null-fill
    on read") requires a null column. Read the intersection, then append
    null columns for missing fields, and return columns in table-schema
    order. Every Arrow maintenance task (compact/cluster/merge/verify)
    reads through this. ``columns`` prunes the read to a subset (e.g. the
    cluster bounds sampler reads key columns only — never image bytes)."""
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    pf = _pq.ParquetFile(path)
    present = set(pf.schema_arrow.names)
    fields = [f for f in arrow_schema if columns is None or f.name in columns]
    want = [f.name for f in fields]
    tbl = pf.read(columns=[c for c in want if c in present])
    n = tbl.num_rows
    for f in fields:
        if f.name not in present:
            tbl = tbl.append_column(f.name, _pa.nulls(n, type=f.type))
    # cast to the canonical schema: per-file nullability/metadata quirks
    # would otherwise make concat_tables over mixed-era files fail
    return tbl.select(want).cast(_pa.schema([(f.name, f.type) for f in fields]))


def spark_to_arrow_schema(spark_schema):
    """Spark StructType → pyarrow schema (driver-side, for task closures)."""
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(spark_schema)


# ---- distributed footer-stats collection ------------------------------------

# Parquet logical types we track bounds for; binary payloads are skipped
# (image bytes min/max are meaningless and huge).
_STATS_SKIP_TYPES = {"BYTE_ARRAY"}  # only when no logical string type


def _jsonable(v):
    import datetime

    if isinstance(v, (bytes, bytearray)):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return v


def footer_stats(local_path: str, stats_columns: set[str] | None) -> dict:
    """Read one Parquet footer → size/rows/min-max. Runs executor-side."""
    md = pq.ParquetFile(local_path).metadata
    lowers: dict = {}
    uppers: dict = {}
    nulls: dict = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if stats_columns is not None and name not in stats_columns:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            mn, mx = _jsonable(st.min), _jsonable(st.max)
            if mn is None or mx is None:
                continue
            if name not in lowers or (lowers[name] is not None and mn < lowers[name]):
                lowers[name] = mn
            if name not in uppers or (uppers[name] is not None and mx > uppers[name]):
                uppers[name] = mx
            if st.null_count is not None:
                nulls[name] = nulls.get(name, 0) + st.null_count
    return {
        "record_count": md.num_rows,
        "lower_bounds": lowers,
        "upper_bounds": uppers,
        "null_counts": nulls,
    }


def collect_stats(spark, abs_paths: list[str], stats_columns: set[str] | None) -> dict[str, dict]:
    """Distributed footer-stat collection: path list → {abs_path: stats}.

    Uses mapInPandas over a paths DataFrame so footer reads run on
    executors (at 10^12-row scale a compaction pass touches 10^4-10^5
    files; the driver only sees the aggregated JSON rows).
    """
    import pandas as pd

    if not abs_paths:
        return {}
    if len(abs_paths) <= 16:
        # tiny batches: driver-side is cheaper than a Spark job
        return {p: footer_stats(p, stats_columns) for p in abs_paths}

    stats_cols = sorted(stats_columns) if stats_columns is not None else None

    def scan_footers(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = set(stats_cols) if stats_cols is not None else None
        for pdf in batches:
            out = []
            for p in pdf["path"]:
                s = footer_stats(p, cols)
                out.append(
                    {
                        "path": p,
                        "record_count": s["record_count"],
                        "lower_bounds": json.dumps(s["lower_bounds"], default=str),
                        "upper_bounds": json.dumps(s["upper_bounds"], default=str),
                        "null_counts": json.dumps(s["null_counts"]),
                    }
                )
            yield pd.DataFrame(out)

    paths_df = spark.createDataFrame([(p,) for p in abs_paths], "path string").repartition(
        min(len(abs_paths), 64)
    )
    rows = paths_df.mapInPandas(
        scan_footers,
        "path string, record_count long, lower_bounds string, upper_bounds string, null_counts string",
    ).collect()
    return {
        r["path"]: {
            "record_count": r["record_count"],
            "lower_bounds": json.loads(r["lower_bounds"]),
            "upper_bounds": json.loads(r["upper_bounds"]),
            "null_counts": json.loads(r["null_counts"]),
        }
        for r in rows
    }
