"""Connected components over an edge DataFrame — near-dup clustering.

The dedup operators (exact / n-gram Jaccard / MinHash / SimHash /
embedding-LSH) emit candidate PAIRS; a curation pipeline needs GROUPS:
transitively-connected duplicates collapse to one cluster with one
survivor. The reference has no grouping stage at all (its similarity
helpers stop at pairwise scores, agent/process_mining_queries.py:769-794)
— at LLM-corpus scale, near-dup clusters routinely chain A~B~C where A~C
is below threshold, and deduping by pairs alone either over-deletes
(drop both ends of every pair) or under-deletes (keep one end per pair,
leaving C).

Spark has no built-in graph operator, so this is the canonical
DataFrame-iterative algorithm: min-label propagation to a fixpoint.

Scale shape: each round is two shuffles (edge⋈label join + min-agg),
rounds = graph diameter — near-dup graphs are dense little cliques
(diameter 2-4), so 3-5 rounds in practice, and ``max_iter`` bounds the
adversarial chain. Labels are checkpointed each round to break lineage
(an unbounded iterative plan otherwise re-executes from round 0 and
overflows the optimizer). The fixpoint test is a ONE-ROW aggregate
(sum of changed flags), not a collect of labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Return (node, component) where component = min node id reachable —
    deterministic cluster ids with no driver-side graph state. Nodes are
    the distinct endpoints of ``edges`` (isolated nodes: union them in as
    self-edges if they must appear)."""
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).filter(
        F.col("src") != F.col("dst")
    )
    # undirected: propagate both ways with one symmetric relation
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sym = sym.distinct().localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # candidate label for each node = min over neighbors' labels
        nbr = (
            sym.join(labels, sym.dst == labels.node, "inner")
            .select(sym.src.alias("node"), "component")
            .groupBy("node")
            .agg(F.min("component").alias("nbr_min"))
        )
        nxt = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
                (
                    F.coalesce("nbr_min", F.col("component")) < F.col("component")
                ).cast("int").alias("changed"),
            )
        ).localCheckpoint(eager=True)
        n_changed = nxt.agg(F.sum("changed")).first()[0] or 0
        labels = nxt.drop("changed")
        if n_changed == 0:
            return labels
    # exhausting max_iter without a fixpoint means some component has
    # diameter > max_iter and its labels are WRONG (one real cluster would
    # split into several, each claiming a survivor — silent under-deletion
    # downstream). Fail loudly; callers with legitimately long chains pass
    # a larger max_iter.
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations "
        f"({n_changed} labels still changing) — a component's diameter "
        f"exceeds max_iter; raise max_iter"
    )


def near_dup_groups(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Candidate pairs → (doc_id, group_id, is_survivor): transitive
    closure of the pair relation, survivor = min id per group (the same
    deterministic keep-lowest policy as dedup_exact)."""
    cc = connected_components(pairs, src=id_a, dst=id_b, max_iter=max_iter)
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("group_id"),
        (F.col("node") == F.col("component")).alias("is_survivor"),
    )
