"""Perceptual image deduplication as an executed table-maintenance op.

The north-star image+caption tables accumulate near-duplicate images
(re-encodes, crops-with-noise, thumbnails of the same source); this op
removes them IN PLACE, with snapshot isolation:

  plan    : scan ONLY (image_id, phash, w, h) — manifest pruning plus
            parquet column projection keep the multi-TB ``bytes`` column
            untouched; candidate pairs via the exact pigeonhole-banded
            Hamming join (functions/dedup.py hamming_pairs: recall 1,
            precision 1 at the chosen radius); duplicate groups via
            min-label connected components (functions/cc.py), survivor =
            highest-resolution member (w*h, ties to min image_id) or
            plain min-id.
  execute : the loser ids feed a merge-on-read key delete
            (maintenance/deletes.py delete_keys) — a metadata-only commit
            of one sorted delete-vector file, bucket-pruned when the
            table is bucketed on image_id. No data file is rewritten; a
            later compaction absorbs the tombstones (the standard MoR
            lifecycle this engine already runs).

Scale shape at 10^12 images: pair generation shuffles only ~32 bytes/row
× (max_dist+2) banded projections; group rounds are bounded by dup-clique
diameter (2–4); the delete moves O(losers) (file, pos) pairs. Nothing in
the plan touches pixel bytes, and re-running the op is a no-op (the
tombstone exclusion in the delete path sees the previous DVs).

Reference parity: the reference has no image surface at all (the image
payload is this engine's graft axis); the op composes the same primitives
its text dedup story uses, so survivor semantics match near_dup_survivors
(tested against it in tests/test_image_dedup.py).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.table import Table
from ..functions.dedup import near_dup_losers, phash_pairs
from .checkpoint import SystemTables
from .deletes import delete_keys

POLICIES = ("resolution", "min_id")


def plan_image_dedup(
    spark: SparkSession,
    table: Table,
    max_dist: int = 6,
    policy: str = "resolution",
    max_iter: int = 20,
) -> DataFrame:
    """The loser ids a dedup pass would tombstone — one ``image_id``
    column, computed from the CURRENT snapshot (rows earlier deletes
    tombstoned never enter pair generation, so repeated planning
    converges to empty). Callers wanting a dry run count/inspect this."""
    if policy not in POLICIES:
        raise ValueError(f"unknown survivor policy {policy!r}; use one of {POLICIES}")
    narrow = table.scan(spark, columns=["image_id", "phash", "w", "h"])
    if policy == "resolution":
        narrow = narrow.withColumn("_res", F.col("w").cast("long") * F.col("h"))
    pairs = phash_pairs(narrow, phash_col="phash", id_col="image_id", max_dist=max_dist)
    return near_dup_losers(
        narrow,
        pairs,
        id_col="image_id",
        quality_col="_res" if policy == "resolution" else None,
        max_iter=max_iter,
    )


def dedup_images(
    spark: SparkSession,
    table: Table,
    max_dist: int = 6,
    policy: str = "resolution",
    max_iter: int = 20,
    dry_run: bool = False,
    sys_tables: SystemTables | None = None,
    table_name: str = "",
) -> dict:
    """Plan + execute perceptual dedup. Returns the delete result dict
    plus op metadata; ``dry_run=True`` only counts the losers."""
    t0 = time.time()
    losers = plan_image_dedup(
        spark, table, max_dist=max_dist, policy=policy, max_iter=max_iter
    ).cache()
    try:
        n_losers = losers.count()
        if dry_run or n_losers == 0:
            return {
                "status": "planned" if dry_run else "no-duplicates",
                "op": "image-dedup",
                "max_dist": max_dist,
                "policy": policy,
                "losers": n_losers,
                "sec": round(time.time() - t0, 3),
            }
        result = delete_keys(
            spark,
            table,
            losers,
            key_col="image_id",
            sys_tables=sys_tables,
            table_name=table_name,
        )
    finally:
        losers.unpersist()
    result.update(
        {"op": "image-dedup", "max_dist": max_dist, "policy": policy, "losers": n_losers}
    )
    result["sec"] = round(time.time() - t0, 3)
    return result
