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

import numpy as np
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
        # JSON {col: {"m": bits, "k": hashes, "b64": bitset}} — per-file Bloom
        # filters for the columns in table property 'write.bloom-columns'
        # (Iceberg puffin / Delta bloom-index equivalent). "{}" when absent;
        # readers MUST treat absence as might-contain (no false negatives).
        pa.field("blooms", pa.string()),
        # JSON [{"path": <dv rel path>, "count": n}] — positional delete
        # vectors (Iceberg v2 merge-on-read). Each referenced parquet holds
        # (path, pos) rows; a reader of this data file must drop the rows at
        # those positions. "[]" when the file has no deletes; maintenance
        # rewrites absorb DVs and emit clean entries.
        pa.field("deletes", pa.string()),
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
    blooms: dict = field(default_factory=dict)
    deletes: list = field(default_factory=list)  # [{"path": rel, "count": n}]

    @property
    def live_count(self) -> int:
        """Rows visible after positional deletes (record_count is the file's
        physical row count, Iceberg semantics)."""
        return self.record_count - sum(int(d.get("count", 0)) for d in self.deletes)

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
            "blooms": json.dumps(self.blooms, sort_keys=True),
            "deletes": json.dumps(self.deletes, sort_keys=True),
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
            blooms=json.loads(r.get("blooms") or "{}"),
            deletes=json.loads(r.get("deletes") or "[]"),
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


def read_tables_overlapped(
    paths: list[str], arrow_schema=None, columns: list[str] | None = None
) -> "pa.Table":
    """Multi-file read through the pyarrow DATASET scanner: the I/O thread
    prefetches and decodes the next file while the compute thread drains
    the current one — measured 3.7x lower read task-time and ~19% faster
    reduce-task wall than a sequential per-file read_table loop at the
    SAME one-core budget (tools/reduce_probe_scanner.py; adopted round 4).
    Scaling efficiency is unchanged (both forms hit the same bandwidth
    ceiling) — this is an absolute-cost win, not a parallelism one.

    With ``arrow_schema`` the scanner null-fills columns missing from
    pre-evolution files and casts to the canonical types — the same T8
    contract as read_table_nullfill, minus its per-file footer probe.
    Fragment order is preserved (Scanner.to_table is ordered), so output
    is bit-identical to the loop+concat form. Callers inside one-core
    tasks must pa.set_io_thread_count(1) alongside set_cpu_count(1): the
    single I/O thread is what overlaps; the default 8-thread pool times
    16 workers would thrash the cpuset."""
    import pyarrow.dataset as _ds

    schema = None
    if arrow_schema is not None:
        schema = pa.schema([(f.name, f.type) for f in arrow_schema])
    dset = _ds.dataset(paths, schema=schema, format="parquet")
    want = None
    if columns is not None:
        want = [f.name for f in (arrow_schema or [])
                if f.name in columns] if arrow_schema is not None else list(columns)
    return dset.to_table(columns=want)


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


def apply_delete_vectors(tbl: "pa.Table", rel_path: str, dv_abs_paths: list[str]) -> "pa.Table":
    """Drop the positions listed for ``rel_path`` in the given delete-vector
    parquet files (Iceberg v2 positional deletes). ``tbl`` must be the
    file's FULL row set in file order — positions index physical rows.
    Row-group predicate pushdown on ``path`` keeps the read cheap when a
    commit-level DV spans many data files. Duplicate positions (two delete
    commits hitting the same row) mask idempotently."""
    import pyarrow.parquet as _pq

    if not dv_abs_paths:
        return tbl
    pos: list[np.ndarray] = []
    for dv in dv_abs_paths:
        t = _pq.read_table(dv, filters=[("path", "=", rel_path)], columns=["pos"])
        if t.num_rows:
            pos.append(t["pos"].to_numpy(zero_copy_only=False))
    if not pos:
        return tbl
    mask = np.ones(tbl.num_rows, dtype=bool)
    allpos = np.concatenate(pos)
    mask[allpos] = False
    return tbl.filter(pa.array(mask))


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


# ---- per-file Bloom filters (manifest-level membership pruning) ---------------
#
# Bounds prune only when files are clustered on the probed column; a bloom
# prunes on ANY layout (the 100k-file merge stress showed bounds eliminating
# nothing on a fragment-distributed key). Built inside the Arrow rewrite
# tasks where the file's data is already in memory; JVM-written files simply
# carry no bloom until their first rewrite (absence = might-contain).

BLOOM_MAX_BITS = 1 << 20  # 128 KiB of bits per column per file, hard cap


def _bloom_hash_pair(value) -> tuple[int, int]:
    """Two independent 64-bit hashes for double hashing (h1 + i*h2 % m).
    Deterministic across processes (blake2b, not PYTHONHASHSEED)."""
    import hashlib

    if isinstance(value, bool):
        b = b"\x01" if value else b"\x00"
    elif isinstance(value, int):
        b = value.to_bytes(16, "little", signed=True)
    elif isinstance(value, str):
        b = value.encode()
    elif isinstance(value, bytes):
        b = value
    else:
        b = str(value).encode()
    d = hashlib.blake2b(b, digest_size=16).digest()
    return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little") | 1


def build_bloom(values, fpp: float = 0.001) -> dict | None:
    """Bloom filter over the distinct non-null values → manifest-storable
    {"m", "k", "b64"}; None for an all-null column (absence = no pruning).

    fpp is PER probe key; a probe checking ANY of q keys sees
    1-(1-fpp)^q, so the default is sized for multi-key merge probes
    (q=40 → ~4% at 0.001 vs ~33% at 0.01) — ~14.4 bits per distinct
    value, ≈1.3 KiB/file/column at 750 values. The BLOOM_MAX_BITS cap
    binds above ~70k distinct values and degrades fpp gracefully."""
    import base64
    import math

    vals = {v for v in values if v is not None}
    if not vals:
        return None
    n = len(vals)
    m = min(BLOOM_MAX_BITS, max(64, int(-n * math.log(fpp) / (math.log(2) ** 2))))
    k = max(1, min(16, round(m / n * math.log(2))))
    bits = np.zeros(m, dtype=bool)
    # one fancy-index assignment instead of n×k interpreted iterations (at
    # the BLOOM_MAX_BITS cap that loop was ~1M steps per column per output
    # file, dominating small rewrite tasks); uint64 (+, *) wrap exactly like
    # the probe's arithmetic in bloom_any_contains
    hp = bloom_key_hashes(vals)  # (n, 2) uint64 — blake2b once per value
    with np.errstate(over="ignore"):
        idx = (hp[:, :1] + np.arange(k, dtype=np.uint64) * hp[:, 1:]) % np.uint64(m)
    bits[idx.ravel()] = True
    return {"m": int(m), "k": int(k), "b64": base64.b64encode(np.packbits(bits).tobytes()).decode()}


def bloom_key_hashes(keys) -> "np.ndarray":
    """Precompute the (n, 2) uint64 hash-pair matrix for a probe key set —
    done once per task, reused against every file's bloom."""
    return np.array(
        [_bloom_hash_pair(kv) for kv in keys if kv is not None], dtype=np.uint64
    ).reshape(-1, 2)


def bloom_any_contains(bloom: dict | None, key_hashes: "np.ndarray") -> bool:
    """True iff SOME probe key might be in the file (vectorized: one fancy-
    index gather per file). Conservative: missing/empty bloom → True."""
    if not bloom or key_hashes.size == 0:
        return True
    import base64

    bits = np.unpackbits(np.frombuffer(base64.b64decode(bloom["b64"]), dtype=np.uint8))
    m = np.uint64(bloom["m"])
    k = int(bloom["k"])
    h1 = key_hashes[:, 0:1]
    h2 = key_hashes[:, 1:2]
    idx = (h1 + np.arange(k, dtype=np.uint64)[None, :] * h2) % m
    return bool(bits[idx.astype(np.int64)].all(axis=1).any())


def build_blooms(tbl, bloom_cols, fpp: float = 0.001) -> dict:
    """Blooms for the given columns of an in-memory Arrow table → the
    ManifestEntry.blooms dict (columns absent from the table are skipped)."""
    out = {}
    for c in bloom_cols or []:
        if c in tbl.column_names:
            b = build_bloom(tbl[c].to_pylist(), fpp)
            if b is not None:
                out[c] = b
    return out


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


def _file_blooms(path: str, bloom_cols) -> dict:
    """Blooms for a file already on disk: one pruned column read per bloom
    column (cheap next to the write the file just paid)."""
    if not bloom_cols:
        return {}
    pf = pq.ParquetFile(path)
    present = set(pf.schema_arrow.names)
    out = {}
    for c in bloom_cols:
        if c in present:
            b = build_bloom(pf.read(columns=[c])[c].to_pylist())
            if b is not None:
                out[c] = b
    return out


def collect_stats(
    spark,
    abs_paths: list[str],
    stats_columns: set[str] | None,
    bloom_columns: list[str] | None = None,
) -> dict[str, dict]:
    """Distributed footer-stat collection: path list → {abs_path: stats}.

    Uses mapInPandas over a paths DataFrame so footer reads run on
    executors (at 10^12-row scale a compaction pass touches 10^4-10^5
    files; the driver only sees the aggregated JSON rows). When
    ``bloom_columns`` is set, each file also pays one pruned column read
    per bloom column so JVM-written files carry blooms from birth.
    """
    import pandas as pd

    if not abs_paths:
        return {}
    if len(abs_paths) <= 16:
        # tiny batches: driver-side is cheaper than a Spark job
        out = {p: footer_stats(p, stats_columns) for p in abs_paths}
        for p in abs_paths:
            out[p]["blooms"] = _file_blooms(p, bloom_columns)
        return out

    stats_cols = sorted(stats_columns) if stats_columns is not None else None
    bl_cols = list(bloom_columns or [])

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
                        "blooms": json.dumps(_file_blooms(p, bl_cols)),
                    }
                )
            yield pd.DataFrame(out)

    paths_df = spark.createDataFrame([(p,) for p in abs_paths], "path string").repartition(
        min(len(abs_paths), 64)
    )
    rows = paths_df.mapInPandas(
        scan_footers,
        "path string, record_count long, lower_bounds string, upper_bounds string, "
        "null_counts string, blooms string",
    ).collect()
    return {
        r["path"]: {
            "record_count": r["record_count"],
            "lower_bounds": json.loads(r["lower_bounds"]),
            "upper_bounds": json.loads(r["upper_bounds"]),
            "null_counts": json.loads(r["null_counts"]),
            "blooms": json.loads(r["blooms"]),
        }
        for r in rows
    }
