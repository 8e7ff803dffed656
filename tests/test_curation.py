"""Unit tests for the corpus-curation operators: benchmark
decontamination (n-gram overlap) and deterministic sequence packing."""

import pytest
from pyspark.sql import functions as F

from openie_backend_spark.operators.curation import (
    contaminated_docs,
    pack_sequences,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


# ------------------------------------------------------ decontamination


def test_contamination_flags_overlap_only(spark):
    corpus = _docs(spark, [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "an entirely different document about spark planning rules"),
        (3, "quick brown fox jumps over us"),  # 5-gram shared with bench
        (4, "tiny"),                            # shorter than n -> no shingles
    ])
    bench = _docs(spark, [(100, "the quick brown fox jumps over a fence")])
    got = {r["doc_id"]: r for r in contaminated_docs(corpus, bench, n=5).collect()}
    # doc 1 shares "the quick brown fox jumps" and "quick brown fox jumps over"
    assert set(got) == {1, 3}
    assert got[1]["n_hits"] == 2 and got[1]["n_shingles"] == 6
    assert got[1]["contamination_bp"] == 3333  # floor(10000*2/6)
    assert got[3]["n_hits"] == 1


def test_contamination_hits_capped_by_shingle_prefix(spark):
    """The per-doc cap bounds BOTH probe fan-out and the hit count: a
    gram outside the sorted prefix cannot match."""
    text = " ".join(f"w{i:03d}" for i in range(40))  # 36 5-gram shingles
    corpus = _docs(spark, [(1, text)])
    bench = corpus.select("text")
    full = contaminated_docs(corpus, bench, n=5, max_shingles=512).collect()[0]
    capped = contaminated_docs(corpus, bench, n=5, max_shingles=10).collect()[0]
    assert full["n_hits"] == 36 and full["contamination_bp"] == 10000
    assert capped["n_shingles"] == 10 and capped["n_hits"] == 10
    assert capped["contamination_bp"] == 10000


def test_contamination_dedups_repeated_grams(spark):
    """A gram repeated in a document counts once (shingle sets are
    distinct), so contamination_bp never exceeds 10000."""
    corpus = _docs(spark, [(1, "a b c d e a b c d e")])
    bench = _docs(spark, [(2, "a b c d e")])
    row = contaminated_docs(corpus, bench, n=5).collect()[0]
    assert row["n_hits"] <= row["n_shingles"]
    assert row["contamination_bp"] <= 10000


# ------------------------------------------------------ sequence packing


def _packed(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    return pack_sequences(df, **kw).collect()


def test_packing_is_exhaustive_and_deterministic(spark):
    rows = [(i, " ".join(["tok"] * (10 + i % 7))) for i in range(60)]
    a = _packed(spark, rows, max_tokens=64, n_buckets=4)
    b = _packed(spark, rows, max_tokens=64, n_buckets=4)
    assert len(a) == 60  # every doc assigned exactly once
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_packing_respects_budget_layout(spark):
    """Within a bucket, pack p starts exactly where the exclusive
    running total crosses p*max_tokens: replaying the md5 order must
    reproduce every pack_id, and a pack overshoots the budget by less
    than one document."""
    rows = [(i, " ".join(["tok"] * (5 + (i * 13) % 30))) for i in range(80)]
    out = _packed(spark, rows, max_tokens=50, n_buckets=2)
    from hashlib import md5
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for bucket, docs in by_bucket.items():
        docs.sort(key=lambda r: (md5(str(r["doc_id"]).encode()).hexdigest(),
                                 r["doc_id"]))
        cum = 0
        for r in docs:
            assert r["pack_id"] == cum // 50, (bucket, r)
            cum += r["n_tokens"]


def test_packing_zero_token_docs_never_advance(spark):
    rows = [(1, ""), (2, "   "), (3, "a b c")]
    out = {r["doc_id"]: r for r in _packed(spark, rows, max_tokens=10,
                                           n_buckets=1)}
    assert out[1]["n_tokens"] == 0 and out[2]["n_tokens"] == 0
    assert sum(r["n_tokens"] for r in out.values()) == 3
    assert all(r["pack_id"] == 0 for r in out.values())


def test_packing_oversized_doc_owns_following_packs(spark):
    """A document longer than max_tokens is assigned whole (disclosed
    semantics); the NEXT document starts in the pack after the giant's
    span, not in pack giant+1."""
    rows = [(i, " ".join(["t"] * n)) for i, n in ((1, 5), (2, 300), (3, 5))]
    out = _packed(spark, rows, max_tokens=50, n_buckets=1)
    from hashlib import md5
    out.sort(key=lambda r: md5(str(r["doc_id"]).encode()).hexdigest())
    cum = 0
    for r in out:
        assert r["pack_id"] == cum // 50
        cum += r["n_tokens"]
    assert max(r["pack_id"] for r in out) >= 300 // 50 - 1
