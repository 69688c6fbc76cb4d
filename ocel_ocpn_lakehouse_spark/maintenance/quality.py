"""T9 — data-quality validation gate (post-maintenance invariant check).

Reference model: per-table null checks with weighted score deductions
(ops/schema_evolution.py:169-244 — null time −30, null type −25,
null id −20). Grafted to the image table per FIXTURES.md §4.6:
image_id/bytes/caption non-null, w>0, h>0, fmt ∈ {png,jpeg}.
Runs as ONE Spark aggregate over the table (no per-check scans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def image_checks():
    # built lazily: Column exprs need an active SparkContext
    return [
        ("null_image_id", F.col("image_id").isNull(), 30),
        ("null_bytes", F.col("bytes").isNull(), 30),
        ("null_caption", F.col("caption").isNull(), 20),
        ("bad_width", (F.col("w").isNull()) | (F.col("w") <= 0), 15),
        ("bad_height", (F.col("h").isNull()) | (F.col("h") <= 0), 15),
        ("bad_fmt", ~F.col("fmt").isin("png", "jpeg"), 25),
    ]


def quality_report(df: DataFrame, checks=None) -> dict:
    checks = checks if checks is not None else image_checks()
    aggs = [F.count("*").alias("_total")] + [
        F.sum(F.when(cond, 1).otherwise(0)).alias(name) for name, cond, _w in checks
    ]
    row = df.agg(*aggs).first()
    total = row["_total"] or 0
    score = 100
    issues = {}
    for name, _cond, weight in checks:
        n = int(row[name] or 0)
        if n > 0:
            issues[name] = n
            score -= weight
    return {
        "rows": total,
        "score": max(score, 0),
        "issues": issues,
        "passed": not issues,
    }
