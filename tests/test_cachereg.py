"""scoped_cache registry (core/cachereg.py): bounded pinning with
semantic-identity reuse."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ocel_ocpn_lakehouse_spark.core.cachereg import scoped_cache


def _is_cached(df):
    return df.storageLevel != StorageLevel(False, False, False, False, 1)


def test_same_plan_reuses_pinned_relation(spark):
    a = scoped_cache(spark.range(100).withColumn("v", F.col("id") * 2), "t-reuse")
    a.count()
    b = scoped_cache(spark.range(100).withColumn("v", F.col("id") * 2), "t-reuse")
    # identical plan → the SAME cached relation comes back, still pinned
    assert b is a and _is_cached(a)
    a.unpersist()


def test_different_plan_releases_previous(spark):
    a = scoped_cache(spark.range(50), "t-swap")
    a.count()
    assert _is_cached(a)
    b = scoped_cache(spark.range(60), "t-swap")
    # the old relation is unpinned, the new one is pinned and correct
    assert not _is_cached(a) and _is_cached(b)
    assert b.count() == 60
    # the stale handle still computes (through the unpersisted plan)
    assert a.count() == 50
    b.unpersist()


def test_tags_are_independent(spark):
    a = scoped_cache(spark.range(10), "t-a")
    b = scoped_cache(spark.range(20), "t-b")
    assert _is_cached(a) and _is_cached(b)
    a.unpersist()
    b.unpersist()


def test_externally_unpersisted_relation_is_repinned(spark):
    """clearCache()/a caller unpersisting behind the registry's back must
    not leave scoped_cache serving an uncached relation forever."""
    a = scoped_cache(spark.range(70).withColumn("v", F.col("id") + 1), "t-ext")
    a.count()
    a.unpersist()  # external teardown; registry still holds the handle
    b = scoped_cache(spark.range(70).withColumn("v", F.col("id") + 1), "t-ext")
    assert _is_cached(b)
    assert b.count() == 70
    b.unpersist()
