"""T6 — Z-order/Hilbert clustering rewrite, EXECUTED (not just recommended).

The reference checks sort-order drift and recommends re-clustering
(ops/advanced_partitioning.py:154-181); here the rewrite runs:

  1. scan live files, attach the 64-bit curve key `_zkey`
     (functions/zorder.py — pure column expressions for Z-order, an
     Arrow-vectorized pandas UDF for Hilbert); per-partition zkey
     quantiles come from a KEY-ONLY scan (column pruning keeps image
     bytes out of the sampling pass) and define one range bucket `_zb`
     per ≈target-size output file; the xxhash64(image_id) low bits
     inside the key salt residual phash hot-spot skew (north rule:
     "salting for phash hot-spots");
  2. ONE hash shuffle with an exact reducer assignment: every
     (partition, _zb) combo maps to its own reducer via a broadcast
     combo→(idx, salt) table whose salts are probed so Spark's hash
     partitioning becomes collision-free (exact_partition_salts) —
     parallelism = #output files, no idle reducers, no co-located
     ranges;
  3. `sortWithinPartitions(*pcols, _zb, _zkey)` → write
     partitionBy(pcols, _zb), keeping `_zkey` as a real column in the
     files so footer stats give per-file zkey min/max — the "per-file
     min/max stats rewrite" the north rule requires. Scans pruning on
     `_zkey` (or on phash/w/h bounds, which clustering tightens) skip
     files entirely.
  4. replace-snapshot commit + manifest rewrite (T7) + lineage rows.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core import manifests as mf
from ..core.table import Table
from ..functions.zorder import image_hilbert_key, image_zorder_key
from .checkpoint import SystemTables

ZKEY_COL = "_zkey"


def exact_partition_salts(spark: SparkSession, n_keys: int, n_part: int, max_tries: int = 64) -> list[int]:
    """Collision-free reducer assignment for dense int keys 0..n_keys-1.

    DataFrame ``repartition(n, cols)`` hash-partitions — with #reducers ≈
    #distinct keys, collisions leave reducers empty and pile several file
    groups onto one task (the round-1 cluster phase scaled 1.4× for this
    reason). There is no identity partitioner in the DataFrame API, so we
    make the hash behave like one: probe ``pmod(hash(key, salt), n_part)``
    for a few candidate salts per key (one tiny Spark job over n_keys ×
    max_tries metadata rows — this uses Spark's own Murmur3, so it can
    never drift from the engine), then greedily pick salts so every key
    lands in a distinct bucket. With n_part ≥ 2×n_keys the greedy pick
    fails with probability ~(1/2)^max_tries per key. Returns salt[key].
    """
    probe = (
        spark.range(n_keys)
        .select(
            F.col("id").cast("int").alias("k"),
            F.explode(F.sequence(F.lit(0), F.lit(max_tries - 1))).alias("salt"),
        )
        .withColumn("bucket", F.pmod(F.hash("k", "salt"), F.lit(n_part)))
        .collect()
    )
    by_key: dict[int, list[tuple[int, int]]] = {}
    for r in probe:
        by_key.setdefault(r["k"], []).append((r["salt"], r["bucket"]))
    used: set[int] = set()
    salts: list[int] = []
    for k in range(n_keys):
        chosen = None
        for salt, bucket in sorted(by_key[k]):
            if bucket not in used:
                used.add(bucket)
                chosen = salt
                break
        if chosen is None:  # astronomically unlikely; collide rather than fail
            chosen = 0
        salts.append(chosen)
    return salts


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
    phases: dict[str, float] = {}
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
        # partition transforms need their source columns even in the
        # key-only scan (e.g. an identity partition on fmt)
        | {f.source for f in spec.fields if f.source in table.schema.fieldNames()}
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

    t_bounds = time.time()
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
        # partition-column types come from the table schema (an identity
        # partition may be a string column — int literals would break the
        # broadcast-join key)
        bschema = T.StructType(
            [T.StructField(c, df.schema[c].dataType) for c in pcols]
            + [T.StructField("bounds", T.ArrayType(T.LongType()))]
        )
        bounds_df = spark.createDataFrame(bounds_df_rows, bschema)
        df = df.join(F.broadcast(bounds_df), on=pcols, how="left") if pcols else df.crossJoin(
            F.broadcast(bounds_df)
        )
        zb = F.size(F.filter(F.col("bounds"), lambda b: b <= F.col(ZKEY_COL)))
        df = df.withColumn("_zb", zb).drop("bounds")
    else:
        df = df.withColumn("_zb", zb)

    phases["bounds"] = time.time() - t_bounds

    # --- exact reducer assignment -----------------------------------------
    # One reducer per (partition, range-bucket) combo: combos are known
    # driver-side (metadata), so broadcast a combo → (dense idx, salt) map
    # and hash-partition on (idx, salt) with salts probed so every combo
    # lands in its own bucket (exact_partition_salts). Parallelism equals
    # #output files with zero collisions — the previous
    # repartition(n, pcols, _zb) collided ranges into shared reducers and
    # left others empty, capping the 4→16-core speedup at 1.4×.
    t_assign = time.time()
    combos: list[tuple[str, int]] = [
        (pk, zb_i) for pk in sorted(n_sub) for zb_i in range(n_sub[pk])
    ]
    n_combos = len(combos)
    staging = table._stage_dir()
    if n_combos > 1:
        n_part = 2 * n_combos
        salts = exact_partition_salts(spark, n_combos, n_part)
        mrows = []
        for cidx, (pk, zb_i) in enumerate(combos):
            pvals = json.loads(pk)
            mrows.append(tuple([pvals[c] for c in pcols] + [zb_i, cidx, salts[cidx]]))
        mschema = T.StructType(
            [T.StructField(c, df.schema[c].dataType) for c in pcols]
            + [
                T.StructField("_zb", T.IntegerType()),
                T.StructField("_cidx", T.IntegerType()),
                T.StructField("_salt", T.IntegerType()),
            ]
        )
        mapping = spark.createDataFrame(mrows, mschema)
        shuffled = (
            df.withColumn("_zb", F.col("_zb").cast("int"))
            .join(F.broadcast(mapping), on=[*pcols, "_zb"], how="left")
            .repartition(n_part, "_cidx", "_salt")
        )
    else:
        shuffled = (
            df.withColumn("_zb", F.col("_zb").cast("int"))
            .withColumn("_cidx", F.lit(0))
            .withColumn("_salt", F.lit(0))
            .repartition(1)
        )
    phases["assign"] = time.time() - t_assign

    # --- Arrow-native reduce ----------------------------------------------
    # Each reducer holds exactly one combo (≈ one target-size output file).
    # mapInArrow keeps the shuffled rows in Arrow buffers: the task sorts
    # by _zkey in C++, writes ONE parquet file with pyarrow, and returns
    # footer stats as a metadata row — no JVM parquet writer, no dynamic-
    # partition machinery, no second stats job, no staging os.walk. Payload
    # crosses JVM→Arrow once (columnar IPC), then memory→disk once.
    t_write = time.time()
    stats_cols = (table.stats_columns() or set()) | {ZKEY_COL}
    codec = str(spark.conf.get("spark.sql.parquet.compression.codec", "snappy")).lower()
    codec = {"uncompressed": "none", "lz4raw": "lz4"}.get(codec, codec)
    drop_cols = [*pcols, "_zb", "_cidx", "_salt"]

    def _write_combo(batches):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        out_schema = pa.schema(
            [
                ("cidx", pa.int32()),
                ("size_bytes", pa.int64()),
                ("record_count", pa.int64()),
                ("lower_bounds", pa.string()),
                ("upper_bounds", pa.string()),
                ("null_counts", pa.string()),
            ]
        )
        got = list(batches)
        if not got:
            return
        tbl = pa.Table.from_batches(got)
        for cidx_val in pc.unique(tbl["_cidx"]).to_pylist():
            part = (
                tbl.filter(pc.equal(tbl["_cidx"], cidx_val))
                if len(pc.unique(tbl["_cidx"])) > 1
                else tbl
            )
            part = part.drop_columns([c for c in drop_cols if c in part.column_names])
            part = part.sort_by([(ZKEY_COL, "ascending")])
            dest = os.path.join(staging, f"c{cidx_val}.parquet")
            tmp = dest + ".inprogress"
            pq.write_table(part, tmp, compression=codec)
            os.rename(tmp, dest)
            st = mf.footer_stats(dest, stats_cols)
            yield pa.RecordBatch.from_pylist(
                [
                    {
                        "cidx": int(cidx_val),
                        "size_bytes": os.path.getsize(dest),
                        "record_count": st["record_count"],
                        "lower_bounds": json.dumps(st["lower_bounds"], default=str),
                        "upper_bounds": json.dumps(st["upper_bounds"], default=str),
                        "null_counts": json.dumps(st["null_counts"]),
                    }
                ],
                schema=out_schema,
            )

    stat_rows = shuffled.mapInArrow(
        _write_combo,
        "cidx int, size_bytes long, record_count long, "
        "lower_bounds string, upper_bounds string, null_counts string",
    ).collect()
    phases["write"] = time.time() - t_write

    # publish: rename each combo file into its partition dir, build entries
    t_publish = time.time()
    import uuid as _uuid

    os.makedirs(table.data_dir, exist_ok=True)
    new_entries: list[mf.ManifestEntry] = []
    for r in stat_rows:
        pk, _zb_i = combos[r["cidx"]]
        partition = json.loads(pk)
        pdir = "/".join(f"{k}={v}" for k, v in sorted(partition.items()))
        destdir = os.path.join(table.data_dir, pdir) if pdir else table.data_dir
        os.makedirs(destdir, exist_ok=True)
        dest = os.path.join(destdir, f"{_uuid.uuid4().hex[:8]}-c{r['cidx']}.parquet")
        os.rename(os.path.join(staging, f"c{r['cidx']}.parquet"), dest)
        new_entries.append(
            mf.ManifestEntry(
                path=os.path.relpath(dest, table.root),
                partition=partition,
                size_bytes=r["size_bytes"],
                record_count=r["record_count"],
                lower_bounds=json.loads(r["lower_bounds"]),
                upper_bounds=json.loads(r["upper_bounds"]),
                null_counts=json.loads(r["null_counts"]),
            )
        )
    import shutil as _shutil

    _shutil.rmtree(staging, ignore_errors=True)
    phases["publish"] = time.time() - t_publish

    sys_tables.record_group(
        job_id, "cluster", table_name, "*", "cluster-all", "written",
        [e.path for e in entries], output_files=[e.path for e in new_entries],
        rows=sum(e.record_count for e in new_entries),
        nbytes=sum(e.size_bytes for e in new_entries),
    )

    removed = {e.path for e in entries}
    t_commit = time.time()
    table.commit_replace(removed, new_entries, operation="replace", summary={"job": job_id, "op": "cluster", "curve": curve})
    phases["commit"] = time.time() - t_commit
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
        "phases": {k: round(v, 3) for k, v in phases.items()},
    }


