"""Conformance checking: DFG-replay fitness + precision per case.

Reference parity: analytics/conformance_checking.py:258-290 computes
fitness as the fraction of a trace's consecutive activity transitions
allowed by the discovered model's activity graph, :295-330 computes
precision as the fraction of the trace's distinct activities known to the
model, and :236-239 scores conformance as 0.7*fitness + 0.3*precision
with a 0.8 "conforming" threshold. The reference replays one instance at
a time in driver Python (a per-instance Daft query + pandas loop); here
the whole log replays in ONE Catalyst plan: window lead → transitions →
broadcast join against the model edge set → per-case aggregation. The
model itself is discovered from the log in the same plan (above-average-
frequency DFG edges), so the query is self-contained and every step is
SQL-expressible — unlike the reference, this conformance check has a
cross-engine oracle.

Scale shape: transitions are a lead() window per case (one shuffle on the
case key), the model is a tiny aggregate (≤ |activities|² rows) joined
broadcast, and all per-case scores come from one groupBy — no per-case
driver loop, no collect. At 10^12 events this is a single pass plus one
case-keyed shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..core.cachereg import scoped_cache


def case_transitions(
    events: DataFrame,
    case_col: str = "user_id",
    act_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts_us", "event_id"),
) -> DataFrame:
    """(case, src, dst) consecutive-activity pairs, deterministic order."""
    w = Window.partitionBy(case_col).orderBy(*order_cols)
    return (
        events.withColumn("_next", F.lead(act_col).over(w))
        .filter(F.col("_next").isNotNull())
        .select(
            F.col(case_col).alias("case_id"),
            F.col(act_col).alias("src"),
            F.col("_next").alias("dst"),
        )
    )


def dfg_model_from_edges(edges: DataFrame) -> DataFrame:
    """Above-average-frequency cut over a weighted (src, dst, freq) edge
    set — the ONE place the discovery threshold lives (dfg_model and
    conformance_per_case must agree or their model semantics drift)."""
    # Scalar threshold via broadcast cross join, not an unpartitioned window
    # (Window.partitionBy() funnels the edge set into one task and warns).
    avg_freq = edges.agg(F.avg("freq").alias("_avg"))
    return (
        edges.crossJoin(F.broadcast(avg_freq))
        .filter(F.col("freq") > F.col("_avg"))
        .select("src", "dst")
    )


def dfg_model(transitions: DataFrame) -> DataFrame:
    """Discovered model: DFG edges with above-average frequency.

    The frequency cut mirrors the reference's intent (a discovered model
    admits the common paths, flags the rare ones); above-average is scale-
    invariant and deterministic."""
    return dfg_model_from_edges(
        transitions.groupBy("src", "dst").agg(F.count("*").alias("freq"))
    )


def conformance_per_case(
    events: DataFrame,
    case_col: str = "user_id",
    act_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts_us", "event_id"),
    model: DataFrame | None = None,
) -> DataFrame:
    """Per-case fitness / precision / conformance score, one plan.

    fitness    = allowed transitions / total transitions (1.0 for a
                 single-event case — reference :285-287)
    precision  = distinct trace activities present in the model's
                 activity set / distinct trace activities (:295-330)
    score      = 0.7*fitness + 0.3*precision; conforming ⇔ score > 0.8
                 (:236-239)
    """
    # One events scan, one case-keyed window, then everything — model
    # discovery, fitness counts, and the per-case activity sets — derives
    # from a cached (case, act, next) count relation whose size is bounded
    # by distinct trace triples (≪ events). The naive form replays the
    # window per branch: events would scan 3× (fitness trans, model trans,
    # precision distinct) for identical arithmetic.
    w = Window.partitionBy(case_col).orderBy(*order_cols)
    g = (
        events.withColumn("_next", F.lead(act_col).over(w))
        .select(
            F.col(case_col).alias("case_id"),
            F.col(act_col).alias("act"),
            "_next",
        )
        .groupBy("case_id", "act", "_next")
        .agg(F.count("*").alias("cnt"))
    )
    # scoped cache: g feeds three branches; a bare .cache() on a lazily
    # returned result leaks one pinned relation per invocation
    g = scoped_cache(g, "conformance-g")
    ct = g.filter(F.col("_next").isNotNull()).select(
        "case_id", F.col("act").alias("src"), F.col("_next").alias("dst"), "cnt"
    )
    if model is None:
        model = dfg_model_from_edges(
            ct.groupBy("src", "dst").agg(F.sum("cnt").alias("freq"))
        )
    mdl = model.select("src", "dst", F.lit(1).alias("_ok"))
    fit = (
        ct.join(F.broadcast(mdl), ["src", "dst"], "left")
        .groupBy("case_id")
        .agg(
            F.sum("cnt").alias("n_trans"),
            F.sum(F.when(F.col("_ok").isNotNull(), F.col("cnt")).otherwise(F.lit(0)))
            .cast("long")
            .alias("allowed_trans"),
        )
    )
    model_acts = (
        mdl.select(F.col("src").alias("act"))
        .union(mdl.select(F.col("dst").alias("act")))
        .distinct()
        .withColumn("_in", F.lit(1))
    )
    # Every event contributes its own activity as `act` in exactly one g
    # row, so distinct (case, act) over g equals distinct over raw events
    # — including single-event cases, whose only row has _next NULL.
    prec = (
        g.select("case_id", "act")
        .distinct()
        .join(F.broadcast(model_acts), "act", "left")
        .groupBy("case_id")
        .agg(
            F.count("*").alias("n_acts"),
            F.sum(F.coalesce("_in", F.lit(0))).cast("long").alias("in_model_acts"),
        )
    )
    fitness = F.round(
        F.when(F.coalesce("n_trans", F.lit(0)) == 0, F.lit(1.0)).otherwise(
            F.col("allowed_trans") / F.col("n_trans")
        ),
        6,
    )
    out = (
        prec.join(fit, "case_id", "left")
        .withColumn("n_trans", F.coalesce("n_trans", F.lit(0)))
        .withColumn("allowed_trans", F.coalesce("allowed_trans", F.lit(0)))
        .withColumn("fitness", fitness)
        .withColumn("precision_score", F.round(F.col("in_model_acts") / F.col("n_acts"), 6))
        .withColumn(
            "score",
            F.round(0.7 * F.col("fitness") + 0.3 * F.col("precision_score"), 6),
        )
        .withColumn("conforming", F.col("score") > 0.8)
    )
    return out.select(
        "case_id", "n_trans", "allowed_trans", "n_acts", "in_model_acts",
        "fitness", "precision_score", "score", "conforming",
    )


def conformance_summary(per_case: DataFrame) -> DataFrame:
    """Aggregate metrics (reference :85-121): one row."""
    return per_case.agg(
        F.count("*").alias("total_instances"),
        F.sum(F.col("conforming").cast("long")).alias("conforming_instances"),
        F.round(F.avg(F.col("conforming").cast("double")), 6).alias("conformance_rate"),
        F.round(F.avg("fitness"), 6).alias("avg_fitness"),
        F.round(F.avg("precision_score"), 6).alias("avg_precision"),
        F.round(F.avg("score"), 6).alias("avg_score"),
    )


def common_deviations(
    events: DataFrame,
    case_col: str = "user_id",
    act_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts_us", "event_id"),
    model: DataFrame | None = None,
    top_n: int = 10,
) -> DataFrame:
    """Most frequent model-violating transitions (reference :97-108)."""
    trans = case_transitions(events, case_col, act_col, order_cols)
    mdl = (model if model is not None else dfg_model(trans)).select(
        "src", "dst", F.lit(1).alias("_ok")
    )
    return (
        trans.join(F.broadcast(mdl), ["src", "dst"], "left")
        .filter(F.col("_ok").isNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "src", "dst")
        .limit(top_n)
    )


# --- driver query q36 over the testdata events table -------------------------


def _events(spark, sf_dir: str) -> DataFrame:
    import os

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return ev.withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))


def q36_conformance(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return conformance_per_case(ev)


Q36_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_type
  FROM events
),
trans AS (SELECT user_id AS case_id, event_type AS src, next_type AS dst FROM seq WHERE next_type IS NOT NULL),
edges AS (SELECT src, dst, count(*) AS freq FROM trans GROUP BY 1, 2),
model AS (SELECT src, dst FROM edges WHERE freq > (SELECT avg(freq) FROM edges)),
model_acts AS (SELECT src AS act FROM model UNION SELECT dst AS act FROM model),
fit AS (
  SELECT t.case_id, count(*) AS n_trans,
         CAST(sum(CASE WHEN m.src IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS allowed_trans
  FROM trans t LEFT JOIN model m ON t.src = m.src AND t.dst = m.dst
  GROUP BY 1
),
acts AS (SELECT DISTINCT user_id AS case_id, event_type AS act FROM events),
prec AS (
  SELECT a.case_id, count(*) AS n_acts,
         CAST(sum(CASE WHEN ma.act IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS in_model_acts
  FROM acts a LEFT JOIN model_acts ma USING (act)
  GROUP BY 1
)
SELECT p.case_id,
       coalesce(f.n_trans, 0) AS n_trans,
       coalesce(f.allowed_trans, 0) AS allowed_trans,
       p.n_acts,
       p.in_model_acts,
       round(CASE WHEN coalesce(f.n_trans, 0) = 0 THEN 1.0
                  ELSE coalesce(f.allowed_trans, 0) * 1.0 / f.n_trans END, 6) AS fitness,
       round(p.in_model_acts * 1.0 / p.n_acts, 6) AS precision_score,
       round(0.7 * round(CASE WHEN coalesce(f.n_trans, 0) = 0 THEN 1.0
                              ELSE coalesce(f.allowed_trans, 0) * 1.0 / f.n_trans END, 6)
             + 0.3 * round(p.in_model_acts * 1.0 / p.n_acts, 6), 6) AS score,
       round(0.7 * round(CASE WHEN coalesce(f.n_trans, 0) = 0 THEN 1.0
                              ELSE coalesce(f.allowed_trans, 0) * 1.0 / f.n_trans END, 6)
             + 0.3 * round(p.in_model_acts * 1.0 / p.n_acts, 6), 6) > 0.8 AS conforming
FROM prec p LEFT JOIN fit f USING (case_id)
"""


def q37_conformance_summary(spark, sf_dir):
    return conformance_summary(q36_conformance(spark, sf_dir))


Q37_SQL = f"""
WITH per_case AS ({Q36_SQL})
SELECT CAST(count(*) AS BIGINT) AS total_instances,
       CAST(sum(CASE WHEN conforming THEN 1 ELSE 0 END) AS BIGINT) AS conforming_instances,
       round(avg(CASE WHEN conforming THEN 1.0 ELSE 0.0 END), 6) AS conformance_rate,
       round(avg(fitness), 6) AS avg_fitness,
       round(avg(precision_score), 6) AS avg_precision,
       round(avg(score), 6) AS avg_score
FROM per_case
"""

QUERIES = {
    "q36_conformance": q36_conformance,
    "q37_conformance_summary": q37_conformance_summary,
}
ORACLES = {
    "q36_conformance": Q36_SQL,
    "q37_conformance_summary": Q37_SQL,
}
