"""Corpus-hygiene ops (functions/scrub.py): repetition signals vs a
pure-Python reference, C4-style segment dedup (rule semantics, order
preservation, broadcast-guard path), and PII redaction parity."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from ocel_ocpn_lakehouse_spark.functions import scrub

DOCS = [
    # (doc_id, text) — newline-separated segments, crafted overlaps
    (0, "the quick brown fox\nshared boilerplate line here\nunique tail zero"),
    (1, "shared boilerplate line here\nanother body sentence one\nsecond body line"),
    (2, "SHARED  boilerplate   line HERE\nunique middle two\nthe quick brown fox"),
    (3, "only unique content\nnothing shared at all\nok bye"),
    (4, "short\nshared boilerplate line here\nshort"),  # short segs exempt
    (5, ""),  # empty doc must survive with empty text
    (6, "a a a a a a b"),  # heavy repetition, single segment
]


def _df(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _canon(seg: str) -> str:
    return re.sub(r"\s+", " ", seg.lower()).strip()


def _py_segment_dedup(rows, min_docs=2, min_words=3):
    """Reference implementation of the C4 rule."""
    from collections import defaultdict

    docs_per_hash = defaultdict(set)
    for did, text in rows:
        for seg in text.split("\n"):
            if len(seg.strip().split()) >= min_words and seg.strip():
                docs_per_hash[_canon(seg)].add(did)
    banned = {h for h, ds in docs_per_hash.items() if len(ds) >= min_docs}
    out = {}
    for did, text in rows:
        segs = text.split("\n")
        kept, removed = [], 0
        for seg in segs:
            elig = len(seg.strip().split()) >= min_words and seg.strip()
            if elig and _canon(seg) in banned:
                removed += 1
            else:
                kept.append(seg)
        out[did] = ("\n".join(kept), len(segs), removed)
    return out


def test_segment_dedup_matches_reference(spark):
    got = {
        r["doc_id"]: (r["text"], r["n_segments"], r["n_removed"])
        for r in scrub.segment_dedup(_df(spark)).collect()
    }
    want = _py_segment_dedup(DOCS)
    assert got == want
    # the rule actually fired: the boilerplate line is gone from docs 0-2, 4
    for did in (0, 1, 2, 4):
        assert "boilerplate" not in got[did][0]
    # "the quick brown fox" appears in docs 0 and 2 → banned too; doc 0
    # keeps only its unique tail (order preservation is asserted at
    # min_docs=3 below, where the fox line survives mid-doc removal)
    assert got[0][0] == "unique tail zero"
    # short segments exempt even when repeated (doc 4 keeps both "short")
    assert got[4][0] == "short\nshort"
    # "the quick brown fox" appears in docs 0 and 2 → banned (min_docs=2)
    assert got[2][2] == 2  # both its shared segs removed
    # empty doc survives
    assert got[5] == ("", 1, 0)


def test_segment_dedup_min_docs_3_and_shuffle_join_path(spark):
    # min_docs=3: "the quick brown fox" (2 docs) survives, boilerplate
    # (4 docs incl. canonicalized variant) still banned
    got = {
        r["doc_id"]: r["text"]
        for r in scrub.segment_dedup(_df(spark), min_docs=3).collect()
    }
    want = {k: v[0] for k, v in _py_segment_dedup(DOCS, min_docs=3).items()}
    assert got == want
    assert "the quick brown fox" in got[0]
    # broadcast guard: force the shuffle-join path, results identical
    got2 = {
        r["doc_id"]: r["text"]
        for r in scrub.segment_dedup(
            _df(spark), min_docs=3, banned_broadcast_max_bytes=0
        ).collect()
    }
    assert got2 == got


def test_repetition_signals_match_reference(spark):
    out = {
        r["doc_id"]: r.asDict()
        for r in scrub.repetition_signals(_df(spark), ngram_sizes=(2,)).collect()
    }
    for did, text in DOCS:
        toks = text.lower().strip().split() if text.strip() else []
        # Spark's split on an empty string yields [""], size 1 — mirror
        # the engine's convention: empty doc => 0.0 via the length filter
        if toks:
            want_dw = (len(toks) - len(set(toks))) / len(toks)
        else:
            want_dw = 0.0
        assert out[did]["dup_word_frac"] == pytest.approx(want_dw), did
        segs = [s.strip() for s in text.split("\n") if s.strip()]
        want_ds = (len(segs) - len(set(segs))) / len(segs) if segs else 0.0
        assert out[did]["dup_segment_frac"] == pytest.approx(want_ds), did
        grams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        want_tg = max(Counter(grams).values()) / len(grams) if grams else 0.0
        assert out[did]["top2gram_share"] == pytest.approx(want_tg), did
    # the degenerate repeated doc is flagged hard
    assert out[6]["dup_word_frac"] > 0.7
    assert out[6]["top2gram_share"] == pytest.approx(5 / 6)
    # doc 4 has a repeated segment ("short" twice)
    assert out[4]["dup_segment_frac"] == pytest.approx(1 / 3)


def test_pii_scrub(spark):
    rows = [
        (0, "mail me at alice.smith+x@example.co.uk or bob@test.io thanks"),
        (1, "call 555-867-5309 or +1 555.867.5309 from 10.0.0.1"),
        (2, "no pii here at all"),
        (3, "edge: 999.999.999.999 still matches the naive ip shape"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in scrub.pii_scrub(df).collect()}
    assert out[0]["n_email"] == 2 and "<EMAIL>" in out[0]["text"]
    assert "alice" not in out[0]["text"] and "bob@" not in out[0]["text"]
    # +1 555.867.5309: the +1 prefix isn't part of the simple pattern but
    # the 555.867.5309 core is
    assert out[1]["n_phone"] == 2 and out[1]["n_ip"] == 1
    assert "<PHONE>" in out[1]["text"] and "<IP>" in out[1]["text"]
    assert out[2]["text"] == "no pii here at all"
    assert out[2]["n_email"] == out[2]["n_phone"] == out[2]["n_ip"] == 0
    assert out[3]["n_ip"] == 1  # documented naive shape


def test_repetition_signals_on_documents_table(spark):
    """Real driver table: signals compute over sf0.001 documents and the
    synthetic word-salad corpus shows the expected heavy word reuse with
    low modal-bigram dominance."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = scrub.repetition_signals(docs, ngram_sizes=(2,))
    assert out.count() == docs.count()
    stats = out.agg(
        F.avg("dup_word_frac").alias("dw"), F.max("top2gram_share").alias("tg")
    ).first()
    assert 0.3 < stats["dw"] < 1.0  # small vocab => heavy word repetition
    assert 0.0 < stats["tg"] <= 1.0


def test_stream_curated_ingest(spark, tmp_path):
    """The curation transform hook on streaming dedup ingest: a batch
    flows quality gate -> PII scrub -> fingerprint dedup, exactly-once,
    and the corpus stores the SCRUBBED canonical text."""
    from pyspark.sql import types as T

    from ocel_ocpn_lakehouse_spark.core import Catalog
    from ocel_ocpn_lakehouse_spark.streaming import stream_dedup_ingest

    src = tmp_path / "drop"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    cat = Catalog(str(tmp_path / "wh"))
    st = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    out_schema = T.StructType(list(st.fields) + [T.StructField("fp", T.StringType())])
    t = cat.create_table("ns.curated", out_schema)

    good = (
        "the quick brown fox jumps over a lazy dog and then it runs away "
        "into the woods to find some питание no just kidding plain food"
    )
    rows = [
        (1, good + " contact me at alice@example.com for details"),
        (2, "a a a a a a a a a a a a"),  # repetition gate
        (3, "x"),  # quality gate (too short)
        (4, good + " contact me at alice@example.com for details"),  # dup of 1
    ]
    spark.createDataFrame(rows, st).write.mode("overwrite").parquet(str(src / "b1"))
    xf = scrub.curation_transform(quality_min=50.0, max_dup_word_frac=0.8)
    stream_dedup_ingest(spark, t, str(src / "*"), st, ckpt, transform=xf)
    t = t.refresh()
    got = {r["doc_id"]: r["text"] for r in t.scan(spark).collect()}
    assert set(got) == {1}
    assert "<EMAIL>" in got[1] and "alice@" not in got[1]

    # second drop: a doc identical to doc 1 AFTER scrubbing (different
    # email) must be rejected — dedup identity is the canonical scrubbed
    # form — while a clean new doc lands scrubbed
    rows2 = [
        (10, good + " contact me at bob@other.net for details"),
        (11, good + " but this tail line differs so it is new content"),
    ]
    spark.createDataFrame(rows2, st).write.mode("overwrite").parquet(str(src / "b2"))
    stream_dedup_ingest(spark, t, str(src / "*"), st, ckpt, transform=xf)
    t = t.refresh()
    got = {r["doc_id"] for r in t.scan(spark).collect()}
    assert got == {1, 11}
    assert int(t.current_snapshot().summary["dedup-accepted"]) == 1


def test_segment_dedup_null_text_and_metachar_sep(spark):
    """A NULL-text doc keeps its output row (empty text), and a regex
    metacharacter separator is treated literally on both the split and
    the reassembly side."""
    rows = [
        (0, "one two three|four five six|one two three tail"),
        (1, "four five six|totally unique segment here"),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in scrub.segment_dedup(df, sep="|", min_docs=2, min_words=3).collect()
    }
    assert set(out) == {0, 1, 2}
    assert out[2]["text"] == "" and out[2]["n_removed"] == 0
    # 'four five six' is in 2 docs -> banned; '|' must not shred tokens
    assert out[0]["text"] == "one two three|one two three tail"
    assert out[1]["text"] == "totally unique segment here"
    assert out[0]["n_removed"] == 1 and out[1]["n_removed"] == 1


def test_top_ngram_share_unigram_empty_doc_scores_zero(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "b b b a")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["top1gram_share"]
        for r in scrub.top_ngram_share(df, n=1).collect()
    }
    assert got[0] == 0.0 and got[1] == 0.0
    assert got[2] == pytest.approx(0.75)


def test_curation_transform_requires_id_for_topgram_gate(spark):
    df = spark.createDataFrame([("en", "hello world")], "lang string, text string")
    xf = scrub.curation_transform(max_topgram_share=0.5)
    with pytest.raises(ValueError, match="doc_id"):
        xf(df)
