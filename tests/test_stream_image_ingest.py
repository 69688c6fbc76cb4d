"""Streaming perceptually-deduplicated image ingest
(streaming/ingest.py stream_image_ingest): exactly-once epoch guard,
near-dup drops vs brute force, replayed content converging to zero
accepts, and the leading index refresh absorbing out-of-band corpus
appends.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocel_ocpn_lakehouse_spark.core import Catalog, PartitionSpec, TableSpec
from ocel_ocpn_lakehouse_spark.functions import hamming_index as HI
from ocel_ocpn_lakehouse_spark.images.synth import IMAGE_SCHEMA, synth_images_df
from ocel_ocpn_lakehouse_spark.streaming.ingest import stream_image_ingest

MAXD = 6
_M = (1 << 64) - 1


def _ham(a, b):
    return bin((a ^ b) & _M).count("1")


def _rows(spark, start, end):
    return synth_images_df(
        spark, n_rows=end, seed=7, hot_key_fraction=0.3, n_hot_bases=3
    ).filter(F.col("image_id") >= f"img_{start:012d}")


def _fps(df):
    return {r["image_id"]: r["phash"] for r in df.select("image_id", "phash").collect()}


def test_stream_image_ingest_dedup_exactly_once(spark, tmp_path):
    cat = Catalog(str(tmp_path / "wh"))
    t = cat.create_table(
        "ocel.images", IMAGE_SCHEMA, TableSpec(partition_spec=PartitionSpec.bucket("image_id", 2))
    )
    t.append(_rows(spark, 0, 200), num_files=4)
    idx = HI.hamming_index_table(spark, cat, "ocel.images_idx", t, max_dist=MAXD, key_buckets=8)

    src = tmp_path / "drop"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    corpus0 = _fps(t.scan(spark))
    batch1 = _rows(spark, 200, 250)
    batch1.write.parquet(str(src / "b1"))
    n = stream_image_ingest(
        spark, t, idx, str(src / "*"), IMAGE_SCHEMA, ckpt, quality_col="w", max_dist=MAXD
    )
    assert n == 1
    t.refresh()

    after = _fps(t.scan(spark))
    accepted = {k: v for k, v in after.items() if k not in corpus0}
    batch_fps = _fps(batch1)
    # accepted rows: far from the pre-batch corpus AND pairwise far
    for k, v in accepted.items():
        assert all(_ham(v, c) > MAXD for c in corpus0.values())
    acc = list(accepted.items())
    assert all(_ham(a[1], b[1]) > MAXD for i, a in enumerate(acc) for b in acc[i + 1 :])
    # dropped rows: each has a reason (near corpus or near another batch row)
    for k, v in batch_fps.items():
        if k in accepted:
            continue
        near_corpus = any(_ham(v, c) <= MAXD for c in corpus0.values())
        near_batch = any(_ham(v, o) <= MAXD for ok, o in batch_fps.items() if ok != k)
        assert near_corpus or near_batch
    assert len(accepted) > 0
    # the index kept up: fresh, and the commit recorded the accept count
    assert not HI.hamming_index_is_stale(idx, t)
    assert int(t.current_snapshot().summary["dedup-accepted"]) == len(accepted)

    # replaying the SAME CONTENT as new files → new epoch, zero accepts
    # (every survivor is now its own dist-0 corpus match)
    n_rows_before = t.scan(spark).count()
    batch1.write.parquet(str(src / "b2"))
    stream_image_ingest(
        spark, t, idx, str(src / "*"), IMAGE_SCHEMA, ckpt, quality_col="w", max_dist=MAXD
    )
    t.refresh()
    assert t.scan(spark).count() == n_rows_before

    # draining with nothing new commits nothing (epoch guard, availableNow)
    snaps = len(t.snapshots())
    stream_image_ingest(
        spark, t, idx, str(src / "*"), IMAGE_SCHEMA, ckpt, quality_col="w", max_dist=MAXD
    )
    assert len(t.refresh().snapshots()) == snaps


def test_stream_image_ingest_leading_refresh_absorbs_stale_index(spark, tmp_path):
    cat = Catalog(str(tmp_path / "wh"))
    t = cat.create_table(
        "ocel.images", IMAGE_SCHEMA, TableSpec(partition_spec=PartitionSpec.bucket("image_id", 2))
    )
    t.append(_rows(spark, 0, 100), num_files=2)
    idx = HI.hamming_index_table(spark, cat, "ocel.images_idx", t, max_dist=MAXD, key_buckets=8)

    # out-of-band append AFTER the index build: the index is now stale
    t.append(_rows(spark, 100, 160), num_files=2)
    assert HI.hamming_index_is_stale(idx, t)

    src = tmp_path / "drop"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    # the batch replays rows 100-160 (exact content of the unindexed tail):
    # only the leading refresh can know they are dups
    _rows(spark, 100, 160).write.parquet(str(src / "b1"))
    before = t.scan(spark).count()
    stream_image_ingest(spark, t, idx, str(src / "*"), IMAGE_SCHEMA, ckpt, max_dist=MAXD)
    t.refresh()
    assert t.scan(spark).count() == before  # all recognized as corpus dups
    assert not HI.hamming_index_is_stale(idx, t)
