"""Deterministic dataset splitting & sampling (training-data pipeline ops).

Beyond the reference (SURVEY §2.13): a 10^12-row corpus needs train/val/
test assignment and subsampling that is (a) a pure function of the row's
id — stable across reruns, appends, repartitioning, and engines — and
(b) shuffle-free. Spark's ``randomSplit``/``sample`` fail both: they
seed per-partition, so the same row flips splits when the layout changes.

The primitive here is a permyriad bucket from the first 8 hex digits of
``md5(id || salt)`` — ``conv(substring(md5(x),1,8),16,10) % 10000`` —
chosen because the identical arithmetic exists in DuckDB
(``('0x'||substr(md5(x),1,8))::BIGINT``), so split assignment is
bit-identical cross-engine (q45's oracle proves it; cf. the md5
fingerprint F9, functions/text.py). Pure column expressions: whole-stage
codegen, no UDF, no shuffle, no state.

- ``assign_split``: named-split column from cumulative weight cutoffs.
  Changing the salt re-rolls every assignment (a new dataset "epoch");
  appended rows land in splits at the target rates automatically.
- ``hash_sample``: keep a deterministic ``fraction`` of rows. Uniform
  within every stratum by construction (md5 is independent of any data
  column), so per-group rates converge to ``fraction`` — the scalable
  path, zero shuffle.
- ``exact_stratified_sample``: EXACT per-stratum counts via one
  row_number window ordered by the same hash — deterministic, one
  shuffle on the strata key; for when quota precision beats scan cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 10_000  # permyriad resolution: 0.01% split granularity


def split_bucket(id_col: Column | str, salt: str = "") -> Column:
    """Deterministic bucket in [0, 10000) from md5(id || salt)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(F.substring(F.md5(F.concat(c.cast("string"), F.lit(salt))), 1, 8), 16, 10)
    return (h.cast("bigint") % BUCKETS).alias("bucket")


def assign_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "v1",
    out_col: str = "split",
) -> DataFrame:
    """Add a named-split column (default 98/1/1 train/val/test)."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    b = split_bucket(id_col, salt)
    expr = None
    acc = 0.0
    for name, w in weights.items():
        acc += w / total
        cut = int(round(acc * BUCKETS))
        cond = b < F.lit(cut)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    # float rounding can leave bucket == BUCKETS-1 uncovered; last split wins
    expr = expr.otherwise(F.lit(list(weights)[-1]))
    return df.withColumn(out_col, expr)


def hash_sample(df: DataFrame, id_col: str, fraction: float, salt: str = "v1") -> DataFrame:
    """Deterministic ~fraction subsample, stable under any layout change."""
    return df.filter(split_bucket(id_col, salt) < F.lit(int(round(fraction * BUCKETS))))


def exact_stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    fraction: float,
    id_col: str,
    salt: str = "v1",
) -> DataFrame:
    """Exactly ceil(fraction × stratum size) rows per stratum, chosen by
    hash order (deterministic; one shuffle on the strata key)."""
    w = Window.partitionBy(*strata_cols).orderBy(split_bucket(id_col, salt), F.col(id_col))
    n = Window.partitionBy(*strata_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(n))
        .filter(F.col("_rn") <= F.ceil(F.col("_n") * F.lit(fraction)))
        .drop("_rn", "_n")
    )
