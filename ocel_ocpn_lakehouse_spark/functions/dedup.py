"""Deduplication operators for training-data pipelines.

Four tiers, all shuffle-conscious:

- exact        : hash-groupBy on a canonical fingerprint — one shuffle,
                 map-side partial agg; the 100 TB workhorse.
- ngram Jaccard: shingle → explode → self-join on shingle → per-pair
                 intersection counts → Jaccard. The join key is the
                 shingle, so only documents sharing a shingle ever meet
                 (no O(n²) cross join); skewed shingles are capped by a
                 document-frequency filter (stop-shingle removal), the
                 standard scale guard.
- MinHash LSH  : k independent min-hashes over shingles, banded into
                 b buckets; candidate pairs = same (band, band-signature).
                 Hashes are xxhash64(seed⊕shingle) — JVM-side, no UDF.
- SimHash      : 64-bit signature from per-token hash bit votes;
                 near-dup = hamming(sig_a, sig_b) ≤ k over LSH-ish
                 prefix buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..core.cachereg import scoped_cache
from .text import fingerprint


# ---- exact ------------------------------------------------------------------


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical (canonicalized) documents.

    Returns (fp, n_dups, keeper_id) for groups with >1 member; keeper is
    the smallest id (deterministic survivor policy)."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keeper_id"))
        .filter(F.col("n_dups") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one row per canonical fingerprint (min-id survivor)."""
    w_keep = (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(w_keep, id_col, "left_semi")


# ---- shingling --------------------------------------------------------------


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array of strings (distinct)."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)])
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def _exploded_shingles(
    df: DataFrame, text_col: str, id_col: str, n: int, max_doc_freq: int | None
) -> DataFrame:
    """(id, shingle) rows, distinct per doc.

    Shape matters: posexplode once + window leads, NOT
    explode(transform(sequence…element_at…)) — the lambda form re-evaluates
    the split per element_at (measured 2.6× slower end-to-end), while here
    each token is materialized exactly once and shingles assemble via lag-
    free lead() in a single per-doc window pass."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("pos", "t"),
    )
    w = Window.partitionBy("_id").orderBy("pos")
    grams = toks.select(
        "_id",
        "pos",
        F.concat_ws(
            " ", "t", *[F.lead("t", j).over(w) for j in range(1, n)]
        ).alias("shingle"),
        F.lead("t", n - 1).over(w).isNotNull().alias("_full"),
        F.count("*").over(Window.partitionBy("_id")).alias("_ntok"),
    )
    # docs shorter than n tokens keep one whole-text shingle (pos 0 row)
    ex = (
        grams.filter(F.col("_full") | ((F.col("_ntok") < n) & (F.col("pos") == 0)))
        .select("_id", "shingle")
        .distinct()
    )
    if max_doc_freq:
        hot = (
            ex.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("shingle")
        )
        ex = ex.join(F.broadcast(hot), "shingle", "left_anti")
    return ex


# ---- n-gram Jaccard ----------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = 1000,
) -> DataFrame:
    """Near-dup pairs (id_a < id_b, jaccard ≥ threshold) via shingle join.

    ``max_doc_freq`` is the standard scale guard and defaults ON: a shingle
    appearing in more than that many documents (a stop-shingle) is dropped
    from both the intersection and the per-doc sizes before the join — at
    corpus scale one such shingle alone makes the candidate join quadratic.
    Pass ``None`` to disable (exact Jaccard, small corpora only).
    """
    # cache: ex feeds three plans (both join sides + sizes); uncached it
    # re-shingles the corpus 3× (persist to a table at warehouse scale);
    # scoped so repeated calls don't pin stale relations
    ex = scoped_cache(_exploded_shingles(df, text_col, id_col, n, max_doc_freq), "jaccard-shingles")
    sizes = ex.groupBy("_id").agg(F.count("*").alias("n_sh"))
    a = ex.select(F.col("_id").alias("id_a"), "shingle")
    b = ex.select(F.col("_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def exact_jaccard_for_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    out_col: str = "exact_jaccard",
) -> DataFrame:
    """Annotate a (id_a, id_b) pair set with its exact n-gram Jaccard.

    The self-check path for the approximate detectors (MinHash/SimHash/LSH
    candidates): only docs appearing in ``pairs`` are shingled (semi-join
    on the broadcast id set), and the intersection computes per PAIR via
    array_intersect over each side's shingle set — never the all-co-shingled-
    pairs join of :func:`ngram_jaccard_pairs`, whose cost is the thing the
    approximate detectors exist to avoid. Cost: O(|pairs| · shingles/doc).
    """
    # the pair set is usually the output of an expensive detector subtree
    # (minhash banding, simhash buckets) — cache it so the id extraction
    # and the final annotate join evaluate it once, and shingle ONLY the
    # docs that appear in some pair (window cost scales with candidates,
    # not the corpus); scoped so repeated calls don't pin stale relations
    pairs = scoped_cache(pairs, "annotate-pairs")
    ids = pairs.select(F.explode(F.array("id_a", "id_b")).alias(id_col)).distinct()
    sub = df.join(F.broadcast(ids), id_col)
    ex = _exploded_shingles(sub, text_col, id_col, n, None)
    sets = ex.groupBy("_id").agg(F.collect_set("shingle").alias("_sh"))
    return (
        pairs.join(sets.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sa")), "id_a")
        .join(sets.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_sb")), "id_b")
        .withColumn(
            out_col,
            F.round(
                F.size(F.array_intersect("_sa", "_sb"))
                / F.size(F.array_union("_sa", "_sb")),
                6,
            ),
        )
        .drop("_sa", "_sb")
    )


# ---- MinHash + LSH -----------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    n: int = 3,
) -> DataFrame:
    """(id, array<long> signature): sig[i] = min over shingles of
    xxhash64(i, shingle). Pure column expressions — one explode + one
    groupBy(min) per document; hashes computed JVM-side."""
    ex = _exploded_shingles(df, text_col, id_col, n, None)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}") for i in range(num_hashes)
    ]
    sig = ex.groupBy("_id").agg(*aggs)
    return sig.select(
        F.col("_id").alias(id_col), F.array(*[f"h{i}" for i in range(num_hashes)]).alias("signature")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH: same signature slice in any
    band → candidate. Returns (id_a, id_b, est_jaccard) with the MinHash
    Jaccard estimate (= fraction of agreeing hash positions)."""
    rows_per_band = num_hashes // bands
    # cache: the signature relation feeds the band projection (both join
    # sides) plus the two estimate joins; scoped so repeated calls don't
    # pin stale relations
    sig = scoped_cache(
        minhash_signatures(df, text_col, id_col, num_hashes, n), "minhash-sigs"
    )
    # all band buckets in ONE pass per row (explode of structs), not a
    # union of per-band projections that re-reads sig once per band×side
    band_entries = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[F.element_at("signature", b * rows_per_band + j + 1) for j in range(rows_per_band)]
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    bands_df = sig.select(
        F.col(id_col).alias("_id"), F.explode(F.array(*band_entries)).alias("_bb")
    ).select("_id", F.col("_bb.band").alias("band"), F.col("_bb.bucket").alias("bucket"))
    l = bands_df.select(F.col("_id").alias("id_a"), "band", "bucket")
    r = bands_df.select(F.col("_id").alias("id_b"), "band", "bucket")
    cand = (
        l.join(r, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sig.select(F.col(id_col).alias("id_a"), F.col("signature").alias("sig_a"))
    sb = sig.select(F.col(id_col).alias("id_b"), F.col("signature").alias("sig_b"))
    est = F.round(
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
        / F.size("sig_a"),
        6,
    )
    return cand.join(sa, "id_a").join(sb, "id_b").withColumn("est_jaccard", est).select(
        "id_a", "id_b", "est_jaccard"
    )


# ---- SimHash -----------------------------------------------------------------


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, sig): 64-bit SimHash = per-bit majority vote of distinct
    n-gram-shingle xxhash64s. One explode + one groupBy with 64 JVM-side
    bit-sum aggregates — shingles hash exactly once (a naive per-bit
    column expression re-evaluates split+hash 64×; this shape is what
    scales).

    Votes run over the SAME shingle universe as ngram_jaccard_pairs: on a
    small-vocabulary corpus, distinct unigram sets are nearly identical
    across documents and unigram-SimHash collapses (hamming-0 collisions
    between unrelated texts); the n-gram space is large enough to stay
    discriminative and makes hamming distance track shingle-Jaccard."""
    tok = _exploded_shingles(df, text_col, id_col, n, max_doc_freq=None).withColumn(
        "h", F.xxhash64("shingle")
    )
    votes = tok.groupBy("_id").agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.shiftrightunsigned("h", b).bitwiseAND(F.lit(1))).alias(f"b{b}")
            for b in range(64)
        ],
    )
    sig = F.lit(0).cast("long")
    for b in range(64):
        vote = (F.col(f"b{b}") * 2 > F.col("n")).cast("long")
        sig = sig.bitwiseOR(F.shiftleft(vote, b))
    return votes.select(F.col("_id"), sig.alias("sig"))


def simhash_md5_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3, nbits: int = 62
) -> DataFrame:
    """(_id, sig): SimHash whose token hash is md5 — bit-for-bit reproducible
    in any engine with md5 + string ops (the DuckDB oracle for q52 recomputes
    it from scratch), unlike the xxhash64 production variant above.

    Two 32-bit halves of the md5 hex digest supply the bit planes
    (conv(hex,16,10) stays within signed-long range — the same cross-engine
    trick functions/sample.py proves via q45's oracle); 62 sig bits keep
    every shift non-negative in engines without unsigned 64-bit ints. Same
    scale shape as simhash_signatures: one explode, one groupBy with JVM
    bit-vote aggregates, shingles hashed exactly once. Use this where
    cross-engine reproducibility matters (oracle checks, mixed-engine
    warehouses); xxhash64 is ~2× cheaper and stays the default."""
    if not 1 <= nbits <= 62:
        raise ValueError(f"nbits must be in [1, 62], got {nbits}")
    tok = _exploded_shingles(df, text_col, id_col, n, max_doc_freq=None)
    h = tok.select(
        "_id",
        F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long").alias("lo"),
        F.conv(F.substring(F.md5("shingle"), 9, 8), 16, 10).cast("long").alias("hi"),
    )
    votes = h.groupBy("_id").agg(
        F.count("*").alias("n"),
        *[
            F.sum(
                F.shiftrightunsigned("lo" if b < 32 else "hi", b % 32).bitwiseAND(F.lit(1))
            ).alias(f"b{b}")
            for b in range(nbits)
        ],
    )
    sig = F.lit(0).cast("long")
    for b in range(nbits):
        vote = (F.col(f"b{b}") * 2 > F.col("n")).cast("long")
        sig = sig.bitwiseOR(F.shiftleft(vote, b))
    return votes.select(F.col("_id"), sig.alias("sig"))


def hamming_pairs(
    fps: DataFrame,
    id_col: str = "_id",
    fp_col: str = "sig",
    max_dist: int = 3,
    nbits: int = 64,
    blocks: int | None = None,
) -> DataFrame:
    """EXACT near-dup pairs by Hamming distance over any ≤64-bit fingerprint
    column (SimHash sigs, image phash64, token bitmaps): every pair with
    ``bit_count(a ^ b) <= max_dist`` and nothing else.

    Pigeonhole banding: the ``nbits`` fingerprint bits split into ``blocks``
    disjoint contiguous blocks (``blocks >= max_dist + 1``); a pair differing
    in ≤ max_dist bits must match EXACTLY in at least one block, so a
    self-equi-join on (block, block_value) finds every qualifying pair, and
    the bit_count(xor) verify filters false candidates — recall 1, precision
    1, which is what makes the operator DuckDB-oracle-able (q52).

    Scale shape: one union of ``blocks`` cheap projections, one shuffle on
    (block, key), one distinct on the pair keys — all JVM codegen, no UDF.
    Bucket sizes follow the fingerprint distribution; a megaclique of
    identical fingerprints is genuinely quadratic in its OUTPUT (the pairs
    exist), the standard preprocessing being exact-dedup first (dedup_exact)
    so only representatives enter. More blocks than the pigeonhole minimum
    trade more candidate-join fanout for shorter (hotter) keys; the minimum
    ``max_dist + 1`` is the right default.
    """
    banded = banded_fingerprints(fps, id_col, fp_col, max_dist, nbits, blocks)
    l = banded.select(F.col("_hid").alias("id_a"), F.col("_hfp").alias("fp_a"), "block", "key")
    r = banded.select(F.col("_hid").alias("id_b"), F.col("_hfp").alias("fp_b"), "block", "key")
    return (
        l.join(r, ["block", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).cast("int"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
        .distinct()
    )


def band_layout(max_dist: int, nbits: int = 64, blocks: int | None = None) -> list[tuple[int, int]]:
    """[(offset, width)] of the pigeonhole blocks — the ONE place the bit
    layout lives, shared by the pair join and the persisted index
    (functions/hamming_index.py), which must band identically or probes
    silently lose recall."""
    if blocks is None:
        blocks = max_dist + 1
    if blocks < max_dist + 1:
        raise ValueError(f"pigeonhole needs blocks >= max_dist+1, got {blocks} < {max_dist + 1}")
    if blocks > nbits:
        raise ValueError(f"blocks={blocks} > nbits={nbits}: empty blocks break the guarantee")
    widths = [nbits // blocks + (1 if i < nbits % blocks else 0) for i in range(blocks)]
    return [(sum(widths[:i]), widths[i]) for i in range(blocks)]


def banded_fingerprints(
    fps: DataFrame,
    id_col: str,
    fp_col: str,
    max_dist: int,
    nbits: int = 64,
    blocks: int | None = None,
) -> DataFrame:
    """(_hid, _hfp, block, key): one row per (fingerprint, pigeonhole
    block) — the banded relation both the self-join and the index probe
    equi-join on."""
    base = fps.select(F.col(id_col).alias("_hid"), F.col(fp_col).cast("long").alias("_hfp"))
    # One projection + explode, NOT a union of per-block projections: a
    # union re-executes the input plan once per block (×2 through a
    # self-join), so a d=6 probe whose input is itself a join would pay
    # ~14 scans. Exploding an array of (block, key) structs computes all
    # band keys in a single pass over each row.
    entries = []
    for i, (offset, width) in enumerate(band_layout(max_dist, nbits, blocks)):
        key = F.shiftrightunsigned("_hfp", offset)
        if width < 64:  # a full-width mask literal would overflow signed long
            key = key.bitwiseAND(F.lit((1 << width) - 1))
        entries.append(F.struct(F.lit(i).alias("block"), key.alias("key")))
    return base.select(
        "_hid", "_hfp", F.explode(F.array(*entries)).alias("_bk")
    ).select("_hid", "_hfp", F.col("_bk.block").alias("block"), F.col("_bk.key").alias("key"))


def phash_pairs(
    images: DataFrame,
    phash_col: str = "phash",
    id_col: str = "image_id",
    max_dist: int = 6,
) -> DataFrame:
    """Perceptual near-duplicate image pairs: exact Hamming ≤ max_dist over
    the 64-bit DCT phash (images/codec.py phash64). The image-table analogue
    of near-dup text dedup — feeds the same connected-components grouping +
    survivor policy pipeline (functions/cc.py, near_dup_survivors). Covers
    the reference's perceptual-duplicate detection over image+caption tables
    at manifest scale: only the int64 phash column is scanned, never bytes."""
    return hamming_pairs(images, id_col=id_col, fp_col=phash_col, max_dist=max_dist, nbits=64)


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    prefix_bits: int = 16,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming via hamming_pairs
    (pigeonhole banding + exact verify). ``prefix_bits`` sets the preferred
    block width (default 16 → 4 blocks); when max_hamming needs more blocks
    than that for the recall-1 guarantee, the block count rises to
    max_hamming+1 instead of silently dropping pairs."""
    # cache: the signature aggregation would otherwise recompute once per
    # self-join side; scoped so repeated invocations don't pin stale
    # relations. At warehouse scale signatures persist to a table instead.
    sigs = scoped_cache(simhash_signatures(df, text_col, id_col), "simhash-sigs")
    blocks = max(64 // prefix_bits, max_hamming + 1)
    return hamming_pairs(
        sigs, "_id", "sig", max_dist=max_hamming, nbits=64, blocks=blocks
    ).withColumnRenamed("dist", "hamming")


# ---- grouping survivors / incremental dedup -----------------------------------


def near_dup_survivors(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    quality_col: str | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Collapse near-dup groups to ONE survivor each and return the
    deduplicated corpus (ungrouped docs pass through untouched).

    Survivor policy: by default the min id (deterministic, matches
    dedup_exact); with ``quality_col``, the HIGHEST-quality member wins
    (min id on ties) — the policy real curation pipelines want, since the
    canonical copy of a near-dup cluster is rarely the lowest-numbered
    one. Scale shape: components via functions/cc.py (O(edges) rounds),
    one window over group members only (never the full corpus), one
    anti-join to drop losers."""
    losers = near_dup_losers(
        docs, pairs, id_col=id_col, quality_col=quality_col, id_a=id_a, id_b=id_b, max_iter=max_iter
    )
    return docs.join(losers, id_col, "left_anti")


def near_dup_losers(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    quality_col: str | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """The ids near_dup_survivors would DROP — one ``id_col`` column, every
    non-survivor group member. This is the half a deletion pipeline wants
    (maintenance/image_dedup.py tombstones exactly these rows), and it is
    O(group members): ungrouped docs never enter the plan."""
    from pyspark.sql import Window

    from .cc import connected_components

    cc = connected_components(pairs, src=id_a, dst=id_b, max_iter=max_iter)
    if quality_col is None:
        return cc.filter(F.col("node") != F.col("component")).select(F.col("node").alias(id_col))
    members = cc.join(
        docs.select(F.col(id_col).alias("node"), F.col(quality_col).alias("_q")),
        "node",
    )
    w = Window.partitionBy("component").orderBy(F.desc("_q"), F.asc("node"))
    return (
        members.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .select(F.col("node").alias(id_col))
    )


def batch_fingerprint(text_col: str = "text", id_col: str = "doc_id") -> Column:
    """The incremental-dedup fingerprint expression: canonical md5 of the
    text, with a per-id sentinel for null text (see dedup_incremental's
    docstring for why nulls must fingerprint uniquely)."""
    return F.coalesce(
        fingerprint(F.col(text_col)),
        F.concat(F.lit("__null_text__"), F.col(id_col).cast("string")),
    )


def dedup_incremental(
    new_docs: DataFrame,
    seen_fps: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fp_col: str = "fp",
) -> DataFrame:
    """Exact-dedup an INCOMING batch against an already-curated corpus:
    the streaming/append shape of dedup_exact. Keeps one survivor per
    fingerprint within the batch (min id), then anti-joins the corpus's
    fingerprint set — cost ∝ batch size + |seen| join side (broadcastable
    while small; at warehouse scale, persist ``seen_fps`` as an engine
    table with 'write.bloom-columns: fp' and pass only the PRUNED probe —
    streaming/ingest.py stream_dedup_ingest does exactly that: it scans
    the corpus fp column under a PrunePredicate('fp','in',batch_fps) so
    Bloom/bounds eliminate untouched files at the manifest). Returns
    the accepted rows WITH their fingerprint column (named ``fp_col``) so
    the caller can append them to the seen-set table in the same commit.

    Null text cannot fingerprint: md5(null) is null, which would collapse
    every null-text doc in a batch into one group (silent loss of distinct
    docs) AND never match the seen-set anti-join (unbounded re-accept on a
    forced replay). Null-text docs therefore get a per-id sentinel
    fingerprint — each is unique (always accepted once) and persists into
    the seen-set, so replays stay idempotent.

    A ``fp_col`` already present on ``new_docs`` is trusted as-is (the
    streaming ingest path computes it once up front to drive the
    manifest-pruned seen-set probe — recomputing md5 here would double
    the batch's hash work)."""
    if fp_col in new_docs.columns:
        batch = new_docs
    else:
        batch = new_docs.withColumn(fp_col, batch_fingerprint(text_col, id_col))
    keep = batch.groupBy(fp_col).agg(F.min(id_col).alias(id_col))
    # Semi-join on (fp, id), not id alone: with duplicate ids in a batch, an
    # id-only probe would admit any row whose id coincides with SOME
    # fingerprint's winner regardless of that row's own fingerprint.
    batch = batch.join(keep, [fp_col, id_col], "left_semi")
    return batch.join(
        seen_fps.select(F.col(fp_col)).distinct(), [fp_col], "left_anti"
    )


BENCH_BROADCAST_MAX_BYTES = 64 * 1024 * 1024


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    broadcast_max_bytes: int = BENCH_BROADCAST_MAX_BYTES,
) -> DataFrame:
    """Train/eval overlap by shared word n-grams — the pretraining
    DECONTAMINATION op: a training doc sharing >= ``min_hits`` distinct
    n-grams with a benchmark doc is flagged (doc_id, bench_id, n_shared)
    for removal before training, so the model is never evaluated on data
    it memorized.

    Scale shape: the benchmark side is tiny (eval suites are thousands of
    docs) — its exploded n-gram set broadcasts, so the corpus pays one
    scan + one broadcast-join + one partial-agg groupBy, never a shuffle
    of corpus n-grams. The 'benchmark is tiny' assumption is CHECKED, not
    trusted: one cheap aggregation over the (distinct) benchmark n-grams
    estimates their serialized bytes, and above ``broadcast_max_bytes``
    (mirrors DV_BROADCAST_MAX_BYTES) the hint is dropped so a
    million-doc 'benchmark' becomes a plain shuffle join under AQE
    instead of an unbounded per-executor broadcast. n defaults to 8
    (long enough that natural reuse is ~impossible, short enough to
    survive small edits; published pipelines use 8-13)."""
    c = corpus.select(
        F.col(id_col).alias("doc_id"), F.explode(shingles(F.col(text_col), n)).alias("g")
    )
    b = (
        benchmark.select(
            F.col(bench_id_col).alias("bench_id"),
            F.explode(shingles(F.col(bench_text_col), n)).alias("g"),
        )
    ).distinct()
    # Size probe from the RAW benchmark text, not the exploded n-gram set:
    # estimating on `b` itself would run the full explode+distinct as a
    # separate job and then recompute it for the join (doubling the most
    # expensive side exactly when the guard matters). Upper bound: each of
    # a doc's ≤`chars` words appears in ≤n n-grams (n·chars string bytes)
    # and each n-gram row carries ~20 B UnsafeRow+id overhead with ≤1
    # n-gram per word (~chars/5 rows) → bytes ≤ chars·(n+4). Conservative
    # (ignores distinct collapsing); over-estimating only forfeits the
    # broadcast hint, and AQE still converts a small shuffle side at
    # runtime.
    est = benchmark.agg(
        (F.coalesce(F.sum(F.length(bench_text_col)), F.lit(0)) * F.lit(n + 4)).alias("bytes")
    ).first()["bytes"]
    bench = F.broadcast(b) if int(est) <= broadcast_max_bytes else b
    return (
        c.join(bench, "g")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_hits)
    )
