"""Persisted Hamming-LSH index (functions/hamming_index.py): probe
correctness vs brute force, manifest pruning evidence, incremental /
rebuild freshness, and the ingest-side batch filter incl. replay.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocel_ocpn_lakehouse_spark.core import Catalog, PartitionSpec, TableSpec
from ocel_ocpn_lakehouse_spark.functions import hamming_index as HI
from ocel_ocpn_lakehouse_spark.images.synth import IMAGE_SCHEMA, synth_images_df

MAXD = 6
_M = (1 << 64) - 1


def _ham(a, b):
    return bin((a ^ b) & _M).count("1")


def _setup(spark, warehouse, n_corpus=300, key_buckets=8):
    cat = Catalog(warehouse)
    src = cat.create_table(
        "ocel.images", IMAGE_SCHEMA, TableSpec(partition_spec=PartitionSpec.bucket("image_id", 2))
    )
    # rows [0, n_corpus) of the seed-7 stream; later rows share the same
    # hot base images, so fresh batches carry planted corpus near-dups
    src.append(
        synth_images_df(spark, n_rows=n_corpus, seed=7, hot_key_fraction=0.3, n_hot_bases=3),
        num_files=6,
    )
    idx = HI.hamming_index_table(
        spark, cat, "ocel.images_phash_idx", src, max_dist=MAXD, key_buckets=key_buckets
    )
    return cat, src, idx


def _later_rows(spark, start, end):
    return synth_images_df(
        spark, n_rows=end, seed=7, hot_key_fraction=0.3, n_hot_bases=3
    ).filter(F.col("image_id") >= f"img_{start:012d}")


def _fps(df, id_col="image_id", fp_col="phash"):
    return [(r[id_col], r[fp_col]) for r in df.select(id_col, fp_col).collect()]


def test_probe_matches_bruteforce(spark, warehouse):
    _, src, idx = _setup(spark, warehouse)
    batch = _later_rows(spark, 300, 340).cache()
    res = HI.hamming_probe_indexed(spark, idx, batch)
    got = {(r.batch_id, r.corpus_id, r.dist) for r in res["pairs"].collect()}
    corpus = _fps(src.scan(spark))
    want = {
        (bi, ci, _ham(bf, cf))
        for bi, bf in _fps(batch)
        for ci, cf in corpus
        if _ham(bf, cf) <= MAXD
    }
    assert got == want and len(want) > 0
    batch.unpersist()


def test_probe_prunes_manifest_files(spark, warehouse):
    _, src, idx = _setup(spark, warehouse)
    # a 2-row batch touches ≤ 2 key-buckets per block; the corpus index
    # spreads over all 8, so the manifest must hand Spark a strict subset
    batch = _later_rows(spark, 300, 302)
    res = HI.hamming_probe_indexed(spark, idx, batch)
    assert 0 < res["files_scanned"] < res["files_total"]
    # and the pruned probe still finds exactly the brute-force pairs
    got = {(r.batch_id, r.corpus_id) for r in res["pairs"].collect()}
    corpus = _fps(src.scan(spark))
    want = {
        (bi, ci)
        for bi, bf in _fps(batch)
        for ci, cf in corpus
        if _ham(bf, cf) <= MAXD
    }
    assert got == want


def test_key_buckets_capped_at_band_width(spark, warehouse):
    """At d=6 the narrowest of the 7 blocks is 9 bits wide → 512 distinct
    keys; more buckets than that are guaranteed-empty partitions and must
    be capped (probe correctness is unaffected either way)."""
    cat = Catalog(warehouse)
    src = cat.create_table(
        "ocel.images2", IMAGE_SCHEMA, TableSpec(partition_spec=PartitionSpec.bucket("image_id", 2))
    )
    src.append(synth_images_df(spark, n_rows=40, seed=7), num_files=1)
    idx = HI.hamming_index_table(
        spark, cat, "ocel.idx_capped", src, max_dist=MAXD, key_buckets=10**6
    )
    assert int(idx.md.properties["hamming.key-buckets"]) == 512


def test_probe_radius_guard(spark, warehouse):
    _, _, idx = _setup(spark, warehouse, n_corpus=50)
    batch = _later_rows(spark, 50, 52)
    with pytest.raises(ValueError, match="exceeds the indexed|exceeds indexed"):
        HI.hamming_probe_indexed(spark, idx, batch, max_dist=MAXD + 1)
    # smaller radius is fine and is a subset of the indexed-radius pairs
    small = HI.hamming_probe_indexed(spark, idx, batch, max_dist=2)["pairs"]
    full = HI.hamming_probe_indexed(spark, idx, batch)["pairs"]
    s = {(r.batch_id, r.corpus_id) for r in small.collect()}
    f = {(r.batch_id, r.corpus_id) for r in full.collect()}
    assert s <= f


def test_refresh_incremental_then_rebuild(spark, warehouse):
    _, src, idx = _setup(spark, warehouse)
    assert not HI.hamming_index_is_stale(idx, src)
    assert HI.hamming_index_refresh(spark, idx, src)["status"] == "fresh"

    # append → incremental refresh, probe agrees with brute force on the
    # GROWN corpus (new rows must be findable)
    src.append(_later_rows(spark, 300, 360), num_files=2)
    assert HI.hamming_index_is_stale(idx, src)
    r = HI.hamming_index_refresh(spark, idx, src)
    assert r["status"] == "refreshed-incremental" and r["rows_indexed"] == 60 * (MAXD + 1)
    assert not HI.hamming_index_is_stale(idx, src)

    batch = _later_rows(spark, 360, 380).cache()
    got = {(p.batch_id, p.corpus_id) for p in HI.hamming_probe_indexed(spark, idx, batch)["pairs"].collect()}
    corpus = _fps(src.scan(spark))
    want = {
        (bi, ci) for bi, bf in _fps(batch) for ci, cf in corpus if _ham(bf, cf) <= MAXD
    }
    assert got == want
    batch.unpersist()

    # a non-append-only source range (MoR delete) → rebuild; deleted rows
    # must vanish from probe results
    from ocel_ocpn_lakehouse_spark.maintenance.deletes import delete_where

    assert delete_where(spark, src, "w = 32")["status"] == "deleted"
    r2 = HI.hamming_index_refresh(spark, idx, src)
    assert r2["status"] == "rebuilt"
    live_ids = {x[0] for x in _fps(src.scan(spark))}
    pairs = HI.hamming_probe_indexed(spark, idx, _later_rows(spark, 380, 400))["pairs"]
    assert {r.corpus_id for r in pairs.collect()} <= live_ids


def test_batch_neardup_filter_exact_only_radius_zero(spark, warehouse):
    """max_dist=0 must mean EXACT duplicates only — a falsy-swallowing
    `max_dist or cfg` default would silently rerun the in-batch dedup at
    the indexed radius and drop merely-similar rows (regression)."""
    _, src, idx = _setup(spark, warehouse, n_corpus=100)
    batch = _later_rows(spark, 100, 160).cache()
    surv = HI.batch_neardup_filter(spark, idx, batch, max_dist=0).cache()
    batch_fps = dict(_fps(batch))
    corpus_fps = [f for _, f in _fps(src.scan(spark))]
    surv_ids = {i for i, _ in _fps(surv)}
    # exactly the rows whose phash equals a corpus phash, or that lose an
    # exact in-batch tie, are dropped; near-but-not-equal rows survive
    for bid, bf in batch_fps.items():
        exact_corpus = any(bf == cf for cf in corpus_fps)
        exact_batch_earlier = any(
            of == bf and o != bid for o, of in batch_fps.items()
        )
        if not exact_corpus and not exact_batch_earlier:
            assert bid in surv_ids, f"{bid} dropped though only near, not equal"
    # plant a dist-1 neighbour of a radius-MAXD survivor (so it is >MAXD-1
    # from every corpus row — never an exact corpus match): radius 0 must
    # keep it, the default (indexed) radius must collapse it
    full = HI.batch_neardup_filter(spark, idx, batch).cache()
    planted = (
        full.orderBy("image_id").limit(1)
        .withColumn("image_id", F.lit("zzz_planted"))
        .withColumn("phash", F.col("phash").bitwiseXOR(F.lit(1)))
    )
    batch2 = batch.unionByName(planted)
    surv0_ids = {i for i, _ in _fps(HI.batch_neardup_filter(spark, idx, batch2, max_dist=0))}
    assert "zzz_planted" in surv0_ids
    survd_ids = {i for i, _ in _fps(HI.batch_neardup_filter(spark, idx, batch2))}
    assert "zzz_planted" not in survd_ids
    full.unpersist()
    batch.unpersist()
    surv.unpersist()


def test_batch_neardup_filter_replay_and_survivors(spark, warehouse):
    _, src, idx = _setup(spark, warehouse)
    # replayed corpus rows are their own dist-0 matches → dropped entirely
    replay = _later_rows(spark, 0, 50).filter(F.col("image_id") < "img_000000000050")
    assert HI.batch_neardup_filter(spark, idx, replay).count() == 0

    # a fresh batch: corpus near-dups drop, in-batch groups collapse to one
    batch = _later_rows(spark, 300, 350).cache()
    surv = HI.batch_neardup_filter(spark, idx, batch).cache()
    surv_fps = _fps(surv)
    corpus = _fps(src.scan(spark))
    # no survivor is near any corpus row
    assert all(_ham(bf, cf) > MAXD for _, bf in surv_fps for _, cf in corpus)
    # no two survivors are near each other
    assert all(
        _ham(a[1], b[1]) > MAXD
        for i, a in enumerate(surv_fps)
        for b in surv_fps[i + 1 :]
    )
    # and nothing MORE was dropped than the brute-force rule requires:
    # every dropped row is near a corpus row or near a surviving/other row
    batch_fps = dict(_fps(batch))
    dropped = set(batch_fps) - {i for i, _ in surv_fps}
    for d in dropped:
        near_corpus = any(_ham(batch_fps[d], cf) <= MAXD for _, cf in corpus)
        near_batch = any(
            _ham(batch_fps[d], of) <= MAXD for o, of in batch_fps.items() if o != d
        )
        assert near_corpus or near_batch
    batch.unpersist()
    surv.unpersist()
