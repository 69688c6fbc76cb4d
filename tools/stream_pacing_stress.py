"""Stream admission-control stress: bounded micro-batches at 10^5 rows.

Evidence for the round-5 paced drain: a table built across many snapshots
is consumed through `format("lakehouse")` twice — uncapped (the round-4
behavior: bootstrap = one table-sized batch) and with
`read.max-files-per-trigger` — and the offset WAL is decoded to show the
per-batch snapshot spans the caps produced. Appends a section-ready JSON
to stdout; BENCH/DATASOURCE_STRESS.md carries the curated numbers.

Usage: python tools/stream_pacing_stress.py [rows] [appends] [cap]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TMPBASE = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    appends = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from pyspark.sql import functions as F

    from ocel_ocpn_lakehouse_spark.core import Catalog
    from ocel_ocpn_lakehouse_spark.session import get_spark
    from ocel_ocpn_lakehouse_spark.sources import register_lakehouse_source

    spark = get_spark("pacing-stress", shuffle_partitions=16)
    register_lakehouse_source(spark)
    base = tempfile.mkdtemp(prefix="pace_stress_", dir=TMPBASE)
    try:
        cat = Catalog(os.path.join(base, "wh"))
        df = spark.range(rows).select(
            F.col("id"), F.md5(F.col("id").cast("string")).alias("v")
        )
        t = cat.create_table("ns.paced", df.schema)
        t.append(df, num_files=8)
        per = max(rows // 10, 1)
        for i in range(appends):
            t.refresh().append(
                spark.range(rows + i * per, rows + (i + 1) * per).select(
                    F.col("id"), F.md5(F.col("id").cast("string")).alias("v")
                ),
                num_files=2,
            )
        total = rows + appends * per
        files_total = len(t.refresh().live_entries())

        def drain(options):
            out = tempfile.mkdtemp(prefix="out_", dir=base)
            ckpt = os.path.join(base, f"ckpt_{len(os.listdir(base))}")
            reader = spark.readStream.format("lakehouse")
            for k, v in options.items():
                reader = reader.option(k, v)
            t0 = time.time()
            q = (
                reader.load(t.root)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            dt = time.time() - t0
            n = spark.read.parquet(out).count()
            commits = len(
                [f for f in os.listdir(os.path.join(ckpt, "commits")) if not f.startswith(".")]
            )
            # decode the offset WAL: per-batch end snapshot ids
            odir = os.path.join(ckpt, "offsets")
            ends = []
            for f in sorted(os.listdir(odir), key=lambda x: (len(x), x)):
                if f.startswith("."):
                    continue
                with open(os.path.join(odir, f)) as fh:
                    last = fh.read().strip().splitlines()[-1]
                try:
                    v = json.loads(last)
                    if isinstance(v, str):
                        v = json.loads(v)
                    ends.append(int(v["snapshot_id"]))
                except Exception:
                    pass
            return {"sec": round(dt, 2), "rows": n, "batches": commits, "offset_ends": ends}

        uncapped = drain({})
        capped = drain({"read.max-files-per-trigger": str(cap)})
        assert uncapped["rows"] == total and capped["rows"] == total, (uncapped, capped)
        spans = [
            b - a for a, b in zip([0] + capped["offset_ends"], capped["offset_ends"]) if b > a
        ]
        res = {
            "rows": total,
            "snapshots": appends + 1,
            "files_total": files_total,
            "cap_files_per_trigger": cap,
            "uncapped_batches": uncapped["batches"],
            "uncapped_sec": uncapped["sec"],
            "capped_batches": capped["batches"],
            "capped_sec": capped["sec"],
            "capped_rows_per_sec": round(total / capped["sec"], 1),
            "max_snapshots_per_batch": max(spans) if spans else 0,
        }
        print(json.dumps(res))
        return 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
