"""Hamming-index scale stress: does the manifest-pruned probe hold at
~1000× the pytest corpus?

tests/test_hamming_index.py proves exactness at 300 rows; the design
point is 10^12. This tool builds the index over a BIG synthetic
fingerprint corpus with planted near-dups, probes with a realistic
ingest batch, and measures:

- exactness: probe pairs vs numpy brute force over (batch × corpus) —
  the operator claims recall 1 AND precision 1, so the stress asserts
  exact-set equality, not a recall floor;
- manifest pruning: index files scanned / total (the reason the index
  exists — per-batch cost must track the batch, not the corpus);
- wall time: indexed probe vs the no-index alternative (banded join
  against the full corpus fp column).

Fingerprints stand in for phash64 — the operator never looks at pixels,
so a (image_id, phash) corpus exercises the identical code path at a
fraction of the synthesis cost.

Regime note (measured, see BENCH/HAMMING_STRESS.md): at d=6 the seven
pigeonhole blocks are 9-10 bits wide, so the structure tops out at ~4k
distinct (block, key-bucket) cells — pruning is strong for MICRO-BATCH
probes (tens-to-hundreds of rows, the streaming-ingest shape) and
degrades gracefully toward the plain banded join as the batch's distinct
band keys approach 2^width. Bulk near-dup jobs should use hamming_pairs
directly; the index's job is making per-ingest-batch cost track the
batch, not the corpus.

Usage: python tools/hamming_stress.py [n_corpus] [n_batch] [cpus] [key_buckets]
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
MAXD = 6


def synth_fps(spark, n: int, seed: int, dup_of: int | None = None, dup_frac: float = 0.3):
    """(image_id, phash) rows, executor-side. With ``dup_of`` set, a
    dup_frac slice are near-dups (≤ MAXD bit flips) of the FIRST
    ``dup_of`` ids' fingerprints — the planted cross-set ground truth."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    def gen(batches):
        import numpy as np
        import pandas as pd

        def fp(i: int, s: int) -> int:
            v = np.random.default_rng(np.uint64(s) * np.uint64(1_000_003) + np.uint64(i))
            return int(v.integers(-(2**63), 2**63, dtype=np.int64))

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng(np.uint64(seed) * np.uint64(97) + np.uint64(i))
                if dup_of is not None and rng.random() < dup_frac:
                    base = fp(int(rng.integers(0, dup_of)), 7)  # corpus seed
                    v = base & ((1 << 64) - 1)  # two's-complement view
                    for b in rng.choice(64, size=int(rng.integers(0, MAXD + 1)), replace=False):
                        v ^= 1 << int(b)
                    v = v - (1 << 64) if v >= (1 << 63) else v
                else:
                    v = fp(i, seed)
                rows.append({"image_id": f"{'b' if dup_of else 'c'}_{i:010d}", "phash": v})
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [T.StructField("image_id", T.StringType()), T.StructField("phash", T.LongType())]
    )
    par = spark.sparkContext.defaultParallelism
    return spark.range(0, n, numPartitions=par).mapInPandas(gen, schema)


def main() -> int:
    n_corpus = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    # cells must scale with the corpus for pruning to bite: a probe touches
    # ≤ batch × blocks cells, so key_buckets ≫ batch keeps the touched
    # fraction small (the design-scale sizing knob)
    key_buckets = int(sys.argv[4]) if len(sys.argv) > 4 else 1024

    from ocel_ocpn_lakehouse_spark.core import Catalog, TableSpec
    from ocel_ocpn_lakehouse_spark.functions import hamming_index as HI
    from ocel_ocpn_lakehouse_spark.functions.dedup import banded_fingerprints
    from ocel_ocpn_lakehouse_spark.session import get_spark

    spark = get_spark(
        "hamming-stress", master=f"local[{cpus}]", shuffle_partitions=cpus * 2
    )
    wh = tempfile.mkdtemp(prefix="hstress_", dir=TMPBASE)
    cat = Catalog(wh)

    corpus_df = synth_fps(spark, n_corpus, seed=7)
    src = cat.create_table("s.fps", corpus_df.schema, TableSpec())
    t0 = time.time()
    src.append(corpus_df, num_files=max(cpus, 16))
    t_corpus = time.time() - t0

    t0 = time.time()
    idx = HI.hamming_index_table(
        spark, cat, "s.fps_idx", src, max_dist=MAXD, key_buckets=key_buckets
    )
    t_build = time.time() - t0
    idx_files = len(idx.live_entries())

    batch = synth_fps(spark, n_batch, seed=31, dup_of=n_corpus).cache()
    batch.count()

    t0 = time.time()
    res = HI.hamming_probe_indexed(spark, idx, batch)
    got = {(r.batch_id, r.corpus_id, r.dist) for r in res["pairs"].collect()}
    t_probe = time.time() - t0

    # no-index alternative: band the batch and the FULL corpus fp column,
    # equi-join — correct, but reads the whole corpus every batch
    from pyspark.sql import functions as F

    t0 = time.time()
    bb = banded_fingerprints(batch, "image_id", "phash", MAXD).select(
        F.col("_hid").alias("batch_id"), F.col("_hfp").alias("bfp"), "block", "key"
    )
    cb = banded_fingerprints(
        src.scan(spark), "image_id", "phash", MAXD
    ).select(F.col("_hid").alias("corpus_id"), F.col("_hfp").alias("cfp"), "block", "key")
    noidx = (
        bb.join(cb, ["block", "key"])
        .withColumn("dist", F.bit_count(F.col("bfp").bitwiseXOR(F.col("cfp"))).cast("int"))
        .filter(F.col("dist") <= MAXD)
        .select("batch_id", "corpus_id", "dist")
        .distinct()
    )
    got_noidx = {(r.batch_id, r.corpus_id, r.dist) for r in noidx.collect()}
    t_noidx = time.time() - t0

    # exactness vs numpy brute force (vectorized xor+popcount, batch ×
    # corpus) — driver-side, so gated to corpora the driver can hold; the
    # no-index banded join above stays the independent cross-check at any
    # scale (different pruning, same claimed result)
    want = None
    if n_corpus <= 4_000_000:
        import numpy as np

        bid, bfp = zip(*[(r.image_id, r.phash) for r in batch.collect()])
        crows = src.scan(spark).collect()
        cid = [r.image_id for r in crows]
        cfp = np.array([r.phash for r in crows], dtype=np.int64).view(np.uint64)
        bfp_a = np.array(bfp, dtype=np.int64).view(np.uint64)

        def popcount(a: "np.ndarray") -> "np.ndarray":
            return np.unpackbits(
                np.ascontiguousarray(a).view(np.uint8).reshape(len(a), 8), axis=1
            ).sum(axis=1)

        want = set()
        for i in range(len(bid)):
            pc = popcount(np.bitwise_xor(cfp, bfp_a[i]))
            for j in np.nonzero(pc <= MAXD)[0]:
                want.add((bid[i], cid[int(j)], int(pc[int(j)])))

    report = {
        "n_corpus": n_corpus,
        "n_batch": n_batch,
        "cpus": cpus,
        "key_buckets": key_buckets,
        "corpus_append_sec": round(t_corpus, 2),
        "index_build_sec": round(t_build, 2),
        "index_files": idx_files,
        "probe_sec": round(t_probe, 2),
        "noindex_probe_sec": round(t_noidx, 2),
        "speedup_vs_noindex": round(t_noidx / t_probe, 2) if t_probe else None,
        "files_scanned": res["files_scanned"],
        "files_total": res["files_total"],
        "files_pruned_frac": round(1 - res["files_scanned"] / res["files_total"], 4),
        "bytes_pruned_frac": round(1 - res["bytes_scanned"] / res["bytes_total"], 4),
        "pairs": len(got),
        "exact_vs_bruteforce": (got == want) if want is not None else "skipped-large-corpus",
        "exact_vs_noindex": got == got_noidx,
    }
    print(json.dumps(report))
    import shutil

    shutil.rmtree(wh, ignore_errors=True)
    ok = report["exact_vs_noindex"] and report["exact_vs_bruteforce"] in (True, "skipped-large-corpus")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
