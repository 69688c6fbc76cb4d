"""Similarity-search scale stress: do the ANN / near-dup scale paths hold
at ~100× the oracle-test corpus?

The driver's correctness gate runs at 2k vectors; the design point is
10^9+. This tool plants ground truth in a BIG synthetic corpus and
measures the scale-path operators end to end:

- banded sign-LSH near-dup (q40's operator): recall against PLANTED
  near-identical pairs (precision is 1 by construction — candidates are
  exact-verified), wall time, candidate count (the quadratic-blowup
  check: candidates must stay O(n), not O(n²)).
- connected components over the found pairs (q49's operator).
- IVF index build as an engine table + indexed probe (q42's operator):
  recall@k against brute force for sampled queries, manifest files
  pruned.

Usage: python tools/ann_stress.py [n_vectors] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TMPBASE = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
DIM = 64


def synth_embeddings(spark, n: int):
    """Deterministic corpus: every 20th id and its successor are a planted
    near-identical pair (unit base + 1% noise); the rest are iid normal.
    Generated executor-side (mapInPandas over ranges — no driver data)."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        def vec(i: int) -> "np.ndarray":
            # clustered like real embeddings: 256 Gaussian centers, member =
            # center + noise sized so intra-cluster cosine ~0.61 — below the
            # dup threshold (cluster structure for IVF, but only PLANTED
            # pairs clear 0.9)
            cid = (i * 2654435761) % 256
            center = np.random.default_rng(10**6 + cid).standard_normal(DIM)
            v = center + 0.8 * np.random.default_rng(i).standard_normal(DIM)
            return v / np.linalg.norm(v)

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = np.empty((len(ids), DIM), dtype=np.float64)
            for j, i in enumerate(ids):
                if i % 20 == 1:  # planted near-dup of its predecessor
                    v = vec(i - 1) + 0.01 * np.random.default_rng(i + 10**9).standard_normal(DIM)
                    out[j] = v / np.linalg.norm(v)
                else:
                    out[j] = vec(i)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(out)})

    return (
        spark.range(n)
        .repartition(int(spark.sparkContext.defaultParallelism) * 2)
        .mapInPandas(gen, "vec_id long, embedding array<double>")
    )


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from pyspark.sql import functions as F

    from ocel_ocpn_lakehouse_spark.core import Catalog
    from ocel_ocpn_lakehouse_spark.functions import similarity as S
    from ocel_ocpn_lakehouse_spark.functions.cc import near_dup_groups
    from ocel_ocpn_lakehouse_spark.session import get_spark

    spark = get_spark("ann-stress", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    wh = tempfile.mkdtemp(prefix="ann_wh_", dir=TMPBASE)
    out: dict = {"n_vectors": n, "dim": DIM, "cpus": cpus}
    try:
        src = os.path.join(wh, "corpus.parquet")
        synth_embeddings(spark, n).write.mode("overwrite").parquet(src)
        emb = spark.read.parquet(src)
        n_planted = n // 20  # one planted pair per 20 ids

        # --- banded-LSH near-dup (scale path of q39/q40) ------------------
        # dup-detection config (threshold 0.9): r=16 planes/band, b=8 —
        # near-identical pairs collide w.p. ~1 while random-pair candidate
        # mass is b/2^r = 0.012% of all-pairs (the default b=64/r=9 is the
        # recall-tuned config for the 0.45 regime and carries 12.5% random
        # mass, which IS quadratic blowup at dup thresholds)
        t0 = time.time()
        pairs = S.lsh_neardup_pairs(
            emb, threshold=0.9, bands=8, planes_per_band=16
        ).cache()
        n_pairs = pairs.count()
        lsh_s = time.time() - t0
        hits = pairs.filter(
            (F.col("id_b") - F.col("id_a") == 1) & (F.col("id_a") % 20 == 0)
        ).count()
        out["neardup"] = {
            "planted_pairs": n_planted,
            "found_pairs": n_pairs,
            "planted_recall": round(hits / n_planted, 4),
            "extra_verified_pairs": n_pairs - hits,  # exact-verified >=0.9, just not planted
            "wall_s": round(lsh_s, 1),
        }

        # --- connected components over found pairs (q49 operator) ---------
        t0 = time.time()
        groups = near_dup_groups(pairs, id_a="id_a", id_b="id_b")
        n_grouped = groups.count()
        n_surv = groups.filter("is_survivor").count()
        out["grouping"] = {
            "grouped_docs": n_grouped,
            "groups": n_surv,
            "wall_s": round(time.time() - t0, 1),
        }

        # --- IVF engine-table index + probe (q42 operator) -----------------
        t0 = time.time()
        t = S.ivf_index_table(spark, Catalog(wh), "ann.emb", emb, n_cells=64, iters=2)
        build_s = time.time() - t0
        queries = emb.filter(F.col("vec_id") % (n // 8) == 7).limit(8).cache()
        queries.count()
        t0 = time.time()
        approx = S.ivf_topk_indexed(spark, t, queries, k=10, nprobe=4)
        approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
        probe_s = time.time() - t0
        t0 = time.time()
        exact = S.brute_force_topk(emb, queries, k=10)
        exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
        exact_s = time.time() - t0
        import json as _json

        cents = _json.loads(t.md.properties["ivf.centroids"])
        q = S._probe_cells(queries, cents, 4, "vec_id", "embedding")
        cells = {int(r["cell"]) for r in q.select("cell").distinct().collect()}
        entries = t.live_entries()
        kept = [e for e in entries if str(e.partition.get("_p_cell")) in {str(c) for c in cells}]
        out["ivf"] = {
            "build_s": round(build_s, 1),
            "probe_s_8q": round(probe_s, 1),
            "brute_force_s_8q": round(exact_s, 1),
            "recall_at_10": round(len(approx_set & exact_set) / max(1, len(exact_set)), 4),
            "files_total": len(entries),
            "files_probed": len(kept),
        }
        print(json.dumps(out))
        return 0
    finally:
        spark.stop()
        import shutil

        shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
