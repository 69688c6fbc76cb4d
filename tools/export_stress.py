"""Training-export stress: full vs incremental export at 10^5 images.

Evidence for the export surface's 100x question: a monotone 2% append
must re-export ~2% of the shards (each touched bucket's partial tail plus
the new batches), at wall-clock cost proportional to the delta — while
the full export sets the baseline. Writes BENCH/EXPORT_STRESS.md.

Round 5 adds a grouped phase: the same corpus exported with
``batches_per_shard`` > 1 (tar size decoupled from batch size) — same
training batches, far fewer tars, incremental rerun still ∝ delta.

Usage: python tools/export_stress.py [n_rows] [delta_rows] [batch_size] [batches_per_shard]
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
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    delta_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    bps = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    from pyspark.sql import functions as F

    from ocel_ocpn_lakehouse_spark.core import Catalog, PartitionSpec, TableSpec
    from ocel_ocpn_lakehouse_spark.images.export import export_webdataset_job
    from ocel_ocpn_lakehouse_spark.images.synth import synth_images_df
    from ocel_ocpn_lakehouse_spark.session import get_spark

    spark = get_spark("export-stress", shuffle_partitions=32)
    base = tempfile.mkdtemp(prefix="exp_stress_", dir=TMPBASE)
    try:
        cat = Catalog(os.path.join(base, "wh"))
        t = cat.create_table(
            "ocel.images",
            synth_images_df(spark, 1).schema,
            TableSpec(partition_spec=PartitionSpec.bucket("image_id", 8)),
        )
        t.append(synth_images_df(spark, n_rows, seed=3), num_files=16)
        out = os.path.join(base, "export")

        t0 = time.time()
        r1 = export_webdataset_job(spark, cat, "ocel.images", out, batch_size=batch)
        full_dt = time.time() - t0

        # monotone 2% append ('z_' sorts after 'img_')
        t.refresh().append(
            synth_images_df(spark, delta_rows, seed=17).select(
                F.concat(F.lit("z_"), "image_id").alias("image_id"),
                "bytes", "w", "h", "fmt", "caption", "phash",
            ),
            num_files=2,
        )
        t0 = time.time()
        r2 = export_webdataset_job(spark, cat, "ocel.images", out, batch_size=batch)
        incr_dt = time.time() - t0
        assert r2.get("mode") == "incremental", r2

        # grouped tars: identical batch contract, bps batches per tar
        out_g = os.path.join(base, "export_grouped")
        t0 = time.time()
        g1 = export_webdataset_job(
            spark, cat, "ocel.images", out_g, batch_size=batch,
            batches_per_shard=bps, manifest_table="ocel.images_export_g",
        )
        gfull_dt = time.time() - t0
        t.refresh().append(
            synth_images_df(spark, delta_rows, seed=23).select(
                F.concat(F.lit("zz_"), "image_id").alias("image_id"),
                "bytes", "w", "h", "fmt", "caption", "phash",
            ),
            num_files=2,
        )
        t0 = time.time()
        g2 = export_webdataset_job(
            spark, cat, "ocel.images", out_g, batch_size=batch,
            batches_per_shard=bps, manifest_table="ocel.images_export_g",
        )
        gincr_dt = time.time() - t0
        assert g2.get("mode") == "incremental", g2

        res = {
            "n_rows": n_rows,
            "delta_rows": delta_rows,
            "batch_size": batch,
            "full_sec": round(full_dt, 2),
            "full_shards": r1["exported"],
            "full_images_per_sec": round(n_rows / full_dt, 1),
            "incr_sec": round(incr_dt, 2),
            "incr_shards": r2["exported"],
            "incr_items": r2["items"],
            "shard_frac": round(r2["exported"] / max(r1["exported"], 1), 4),
            "time_frac": round(incr_dt / full_dt, 4),
            "speedup_vs_full": round(full_dt / incr_dt, 1),
            "batches_per_shard": bps,
            "grouped_full_sec": round(gfull_dt, 2),
            "grouped_full_shards": g1["exported"],
            "grouped_full_images_per_sec": round((n_rows + delta_rows) / gfull_dt, 1),
            "grouped_incr_sec": round(gincr_dt, 2),
            "grouped_incr_shards": g2["exported"],
            "grouped_incr_items": g2["items"],
        }
        print(json.dumps(res))
        with open(os.path.join(REPO, "BENCH", "EXPORT_STRESS.md"), "w") as f:
            f.write(
                "# Export stress — full vs incremental at 10^5 images\n\n"
                f"Table: {n_rows} synthetic images, bucket(image_id,8), "
                f"batch_size {batch}; append {delta_rows} monotone-key rows "
                "(~{:.0%} of corpus), rerun the SAME `--op export`.\n\n".format(
                    delta_rows / n_rows
                )
                + "| phase | wall s | shards written | images/s |\n|---|---|---|---|\n"
                + f"| full export | {res['full_sec']} | {res['full_shards']} | {res['full_images_per_sec']} |\n"
                + f"| incremental (2% append) | {res['incr_sec']} | {res['incr_shards']} | — |\n\n"
                + f"- shards re-exported: **{res['shard_frac']:.1%}** of the full count\n"
                + f"- wall time: **{res['time_frac']:.1%}** of the full export "
                + f"({res['speedup_vs_full']}x faster)\n"
                + f"- items in re-exported shards: {res['incr_items']} "
                + f"(delta {delta_rows} + touched partial tails)\n\n"
                + "Byte-equivalence of incremental vs from-scratch export is "
                + "asserted by `tests/test_training_export.py::"
                + "test_export_job_incremental_equals_full`; this harness "
                + "measures the cost ratio at scale.\n\n"
                + f"Grouped tars (round 5): batches_per_shard={bps} packs the "
                + f"same {batch}-image batches into {res['grouped_full_shards']} "
                + f"tars instead of {res['full_shards']} "
                + f"({res['grouped_full_sec']} s full, "
                + f"{res['grouped_full_images_per_sec']} img/s; incremental "
                + f"rerun after a monotone append re-exported "
                + f"{res['grouped_incr_shards']} tars in {res['grouped_incr_sec']} s) "
                + "— tar size tracks the WebDataset 0.5-1 GiB convention "
                + "independently of the training batch, and the manifest "
                + "commit/sweep/totals stay fully distributed. Raw JSON: \n\n```json\n"
                + json.dumps(res, indent=2)
                + "\n```\n\n"
                + "Reading the ratio honestly: at 10^5 images the "
                + "incremental wall is dominated by fixed orchestration "
                + "(manifest aggregates, the narrow (key,w,h) corpus pass "
                + "that finds tail keys, ~a dozen small jobs) — the "
                + "asymptotic win is the SHARD fraction, which is what "
                + "scales: full export cost grows with the corpus while "
                + "the incremental path's payload work is delta + ≤ "
                + "#buckets×batch_size tail rows, filtered through a "
                + "broadcast semi-join probe that keeps the bytes column "
                + "out of every corpus-wide pass. Full-export baselines "
                + "swing 10-30 s with the host's bandwidth-throttling "
                + "waves (see BENCH/BASELINE.md variance).\n"
            )
        return 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
