"""Physical-plan audit: assert the plans we claim (SURVEY §4).

Checks, via explain(formatted):
  1. Parquet scans push filters + prune columns (PushedFilters/ReadSchema);
  2. small-dim joins go BroadcastHashJoin;
  3. aggregates run partial+final (no single-point shuffle);
  4. hot paths stay inside WholeStageCodegen;
  5. engine scans feed Spark only surviving files (manifest pruning).

Writes PLANS.md with the evidence. Run: python tools/plan_audit.py
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


MANUAL_MARKER = "<!-- MANUAL AUDITS — preserved by tools/plan_audit.py -->"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    from ocel_ocpn_lakehouse_spark.session import get_spark

    spark = get_spark("plan-audit", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.01"
    checks: list[tuple[str, bool, str]] = []
    sections: list[str] = []

    # 1. pushdown + column pruning
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") >= "1995-01-01").select("l_orderkey", "l_quantity")
    p = plan_of(q)
    checks.append(("filter pushed to parquet scan", "PushedFilters: [IsNotNull(l_shipdate)" in p or "GreaterThanOrEqual(l_shipdate" in p, p))
    checks.append(("column pruning (3-col ReadSchema)", "ReadSchema" in p and "l_extendedprice" not in p.split("ReadSchema")[1][:300], p))

    # 2. broadcast join for small dim
    n = spark.read.parquet(f"{sf}/nation.parquet")
    c = spark.read.parquet(f"{sf}/customer.parquet")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).groupBy("n_name").count()
    p = plan_of(j)
    checks.append(("broadcast hash join on dim", "BroadcastHashJoin" in p, p))

    # 3. partial aggregation (map-side combine)
    a = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    p = plan_of(a)
    checks.append(
        ("partial+final hash aggregate", p.count("HashAggregate") >= 2, p)
    )
    # codegen stars only visible pre-AQE: probe with AQE off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        li.groupBy("l_returnflag").agg(F.sum("l_quantity")).explain()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    p2 = buf.getvalue()
    checks.append(("whole-stage codegen active", "*(" in p2, p2))

    # 4. engine scan: manifest-level file pruning
    import tempfile

    from ocel_ocpn_lakehouse_spark.core import Catalog, PartitionSpec, TableSpec
    from ocel_ocpn_lakehouse_spark.core.table import PrunePredicate
    from ocel_ocpn_lakehouse_spark.images.synth import IMAGE_SCHEMA, synth_images_df

    wh = tempfile.mkdtemp(prefix="audit_wh_")
    cat = Catalog(wh)
    t = cat.create_table(
        "a.images", IMAGE_SCHEMA, TableSpec(partition_spec=PartitionSpec.bucket("image_id", 8))
    )
    t.append(synth_images_df(spark, 400, seed=9), num_files=8)
    key = "img_000000000007"
    b = t.bucket_value(spark, key)
    pruned = t.scan(spark, prune=[PrunePredicate("_p_image_id_bucket", "=", b)])
    total_files = len(t.live_entries())
    kept = [e for e in t.live_entries() if e.partition.get("_p_image_id_bucket") == b]
    p = plan_of(pruned.filter(F.col("image_id") == key))
    checks.append(
        (
            f"manifest bucket pruning ({len(kept)}/{total_files} files reach Spark)",
            0 < len(kept) < total_files,
            p,
        )
    )
    # 4b. merge-on-read scan: tombstoned files take ONE broadcast left-anti
    # join on (_metadata.file_path, row_index); clean files union in with a
    # plain scan that never pays the join (the MoR read-cost claim)
    from ocel_ocpn_lakehouse_spark.maintenance.deletes import delete_where

    # bucket-pruned delete → one dirty file among clean ones (mixed plan)
    delete_where(spark, t, "w = 32", prune=[PrunePredicate("_p_image_id_bucket", "=", b)])
    t = t.refresh()
    dirty_n = sum(1 for e in t.live_entries() if e.deletes)
    clean_n = sum(1 for e in t.live_entries() if not e.deletes)
    p = plan_of(t.scan(spark))
    checks.append(
        (
            f"MoR scan: broadcast anti-join tombstones ({dirty_n} dirty / {clean_n} clean files)",
            "BroadcastHashJoin" in p and "LeftAnti" in p,
            p,
        )
    )
    checks.append(
        (
            "MoR scan: clean files bypass the join (Union of plain scan + anti-join branch)",
            ("Union" in p) == (clean_n > 0),
            p,
        )
    )
    import shutil

    shutil.rmtree(wh, ignore_errors=True)

    # 5. similarity paths: embedding scan prunes the unused column; the
    # banded-LSH candidate join keys on (band, bucket) — an equi-join
    # (hash or sort-merge), NEVER a cartesian product (the scale claim)
    from ocel_ocpn_lakehouse_spark.functions import similarity as S

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    p = plan_of(S.cosine_neardup_pairs(emb, threshold=0.45))
    checks.append(
        (
            "embedding near-dup prunes unused column (no 'label' in ReadSchema)",
            "ReadSchema" in p and "label" not in p.split("ReadSchema")[1][:300],
            p,
        )
    )
    p = plan_of(S.lsh_neardup_pairs(emb, threshold=0.45))
    checks.append(
        (
            "banded-LSH candidate join is equi-join on (band,bucket), not cartesian",
            ("SortMergeJoin" in p or "ShuffledHashJoin" in p or "BroadcastHashJoin" in p)
            and "CartesianProduct" not in p,
            p,
        )
    )

    ok = True
    lines = ["# PLANS — physical-plan audit evidence", ""]
    for name, passed, plan in checks:
        ok &= passed
        mark = "PASS" if passed else "FAIL"
        print(f"{mark} {name}")
        lines.append(f"## {mark}: {name}\n\n```\n{plan.strip()[:2500]}\n```\n")
    # hand-written audit sections live below the marker and survive reruns
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
    )
    manual = ""
    if os.path.isfile(path):
        old = open(path).read()
        if MANUAL_MARKER in old:
            manual = old[old.index(MANUAL_MARKER):]
    with open(path, "w") as f:
        f.write("\n".join(lines))
        f.write("\n" + (manual or MANUAL_MARKER + "\n"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
