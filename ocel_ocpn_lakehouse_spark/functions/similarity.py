"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k — broadcast the (small) query set
  against the corpus; the per-row dot product is a JVM-side
  ``aggregate(zip_with(...))`` fold, no UDF, so the scan parallelizes
  perfectly and AQE handles the final per-query top-k shuffle.
- lsh_topk: the scale path — random-hyperplane (sign) LSH buckets the
  corpus; queries probe only their own bucket (+ optional multi-probe),
  turning a 10^12-row scan into a bucket-local search. Hyperplanes are
  deterministic (seeded), computed once and broadcast as literal arrays.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def as_double(arr):
    return F.transform(arr, lambda x: x.cast("double"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, sim) — deterministic
    ordering via (sim desc, neighbor_id)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"), "rank")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(vec_col, planes: np.ndarray):
    """Sign-LSH bucket id: bit i = sign(dot(vec, plane_i)). Planes inlined
    as array literals (broadcast by the plan)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = (_dot(vec_col, plane) > 0).cast("long")
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 7,
    probes: int = 1,
) -> DataFrame:
    """Approximate cosine top-k with MULTI-PROBE sign-LSH.

    ``probes`` is the hamming radius of probed buckets: 0 probes only the
    query's own bucket (cheapest, weakest recall); 1 additionally probes
    the n_planes buckets one sign-flip away — the standard multi-probe
    trick, and the cost lands entirely on the tiny broadcast query side
    ((1 + n_planes)× query rows), never on the corpus. Recall < 1 by
    design; at scale buckets shard across the cluster. Output shape
    matches brute_force_topk for recall evaluation."""
    planes = hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    ).withColumn("bucket", lsh_bucket(F.col("cv"), planes))
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("bucket", lsh_bucket(F.col("qv"), planes))
    if probes >= 1:
        flips = F.array(
            F.lit(0), *[F.lit(1 << i) for i in range(n_planes)]
        )  # hamming-0 + hamming-1 probe masks
        q = q.withColumn("_flip", F.explode(flips)).withColumn(
            "bucket", F.col("bucket").bitwiseXOR(F.col("_flip"))
        ).drop("_flip")
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cosine(F.col("qv"), F.col("cv")))
        .select("query_id", "neighbor_id", "sim")
        .distinct()  # a candidate can surface via several probed buckets
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"), "rank")
    )
