"""Focused probe: execute_cluster alone, with Spark event logs, at one
parallelism level. Prepares a compacted source once (untimed, reused),
then times the cluster rewrite and prints a per-stage breakdown (task
time, GC, shuffle bytes, spill) parsed from the event log.

Usage:  python tools/cluster_probe.py <cpus> [rows]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TMPBASE = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()


def prepare(rows: int) -> str:
    """Generate + compact once; return warehouse path (cached)."""
    src = os.path.join(TMPBASE, f"probe_src_{rows}")
    marker = os.path.join(src, "_PROBE_READY")
    if os.path.isfile(marker):
        return src
    shutil.rmtree(src, ignore_errors=True)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scaling_bench.py"), "--gen", str(rows), src],
        cwd=REPO, capture_output=True, text=True, timeout=3600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    from ocel_ocpn_lakehouse_spark.core import Catalog
    from ocel_ocpn_lakehouse_spark.maintenance.checkpoint import SystemTables
    from ocel_ocpn_lakehouse_spark.maintenance.compact import execute_compaction
    from ocel_ocpn_lakehouse_spark.session import get_spark

    spark = get_spark("probe-prep", master="local[32]", shuffle_partitions=32,
                      extra_conf={"spark.sql.parquet.compression.codec": "zstd"})
    spark.sparkContext.setLogLevel("ERROR")
    cat = Catalog(src)
    t = cat.load_table("bench.images")
    execute_compaction(spark, t, SystemTables(cat.warehouse), "bench.images")
    spark.stop()
    open(marker, "w").write("ok")
    return src


def run(cpus: int, rows: int) -> None:
    src = os.path.join(TMPBASE, f"probe_src_{rows}")
    wh = tempfile.mkdtemp(prefix=f"probe_wh_{cpus}_", dir=TMPBASE)
    shutil.rmtree(wh)
    if subprocess.run(["cp", "-al", src, wh]).returncode != 0:
        shutil.copytree(src, wh)
    evdir = tempfile.mkdtemp(prefix="probe_ev_", dir=TMPBASE)
    shuffle_dir = tempfile.mkdtemp(prefix="probe_shuf_", dir=TMPBASE)

    from ocel_ocpn_lakehouse_spark.core import Catalog
    from ocel_ocpn_lakehouse_spark.maintenance.checkpoint import SystemTables
    from ocel_ocpn_lakehouse_spark.maintenance.cluster import execute_cluster
    from ocel_ocpn_lakehouse_spark.session import get_spark
    from pyspark.sql import functions as F

    extra = {
        "spark.sql.parquet.compression.codec": "zstd",
        "spark.local.dir": shuffle_dir,
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": evdir,
        "spark.eventLog.compress": "false",
    }
    extra.update(json.loads(os.environ.get("SPARK_PROBE_EXTRA", "{}")))
    spark = get_spark(
        "cluster-probe", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8),
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    cat = Catalog(wh)
    t = cat.load_table("bench.images")
    # warmup
    t.scan(spark).agg(F.sum(F.xxhash64("image_id").cast("decimal(38,0)"))).first()
    t0 = time.time()
    res = execute_cluster(spark, t, SystemTables(cat.warehouse), "bench.images", curve="zorder")
    wall = time.time() - t0
    spark.stop()

    stages: dict[int, dict] = {}
    ev_files = [p for p in glob.glob(os.path.join(evdir, "**", "*"), recursive=True)
                if os.path.isfile(p) and "appstatus" not in os.path.basename(p)]
    for ev_file in ev_files:
        with open(ev_file) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sid = si["Stage ID"]
                    dur = (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1000
                    stages[sid] = {
                        "name": si["Stage Name"].split("\n")[0][:60],
                        "tasks": si["Number of Tasks"],
                        "wall_s": round(dur, 2),
                        "exec_run_s": 0.0,
                        "gc_s": 0.0,
                        "spill_mb": 0.0,
                        "shuffle_write_mb": 0.0,
                        "shuffle_read_mb": 0.0,
                        "input_mb": 0.0,
                        "output_mb": 0.0,
                    }
                elif ev.get("Event") == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    m = ev.get("Task Metrics") or {}
                    if sid not in stages:
                        stages[sid] = {"name": "?", "tasks": 0, "wall_s": 0, "exec_run_s": 0.0,
                                       "gc_s": 0.0, "spill_mb": 0.0, "shuffle_write_mb": 0.0,
                                       "shuffle_read_mb": 0.0, "input_mb": 0.0, "output_mb": 0.0}
                    s = stages[sid]
                    s["exec_run_s"] += m.get("Executor Run Time", 0) / 1000
                    s["gc_s"] += m.get("JVM GC Time", 0) / 1000
                    s["spill_mb"] += (m.get("Memory Bytes Spilled", 0) + m.get("Disk Bytes Spilled", 0)) / 1e6
                    s["shuffle_write_mb"] += (m.get("Shuffle Write Metrics") or {}).get("Shuffle Bytes Written", 0) / 1e6
                    rm = m.get("Shuffle Read Metrics") or {}
                    s["shuffle_read_mb"] += (rm.get("Local Bytes Read", 0) + rm.get("Remote Bytes Read", 0)) / 1e6
                    s["input_mb"] += (m.get("Input Metrics") or {}).get("Bytes Read", 0) / 1e6
                    s["output_mb"] += (m.get("Output Metrics") or {}).get("Bytes Written", 0) / 1e6

    print(json.dumps({"cpus": cpus, "rows": rows, "wall_s": round(wall, 2),
                      "phases": res.get("phases", {})}))
    for sid in sorted(stages):
        s = stages[sid]
        for k in ("exec_run_s", "gc_s", "spill_mb", "shuffle_write_mb",
                  "shuffle_read_mb", "input_mb", "output_mb"):
            s[k] = round(s[k], 2)
        print(f"stage {sid}: {json.dumps(s)}")

    shutil.rmtree(wh, ignore_errors=True)
    shutil.rmtree(evdir, ignore_errors=True)
    shutil.rmtree(shuffle_dir, ignore_errors=True)


if __name__ == "__main__":
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 240_000
    prepare(rows)
    run(cpus, rows)
