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


# --------------------------------------------- DSIR importance weights


def test_dsir_scores_target_like_docs_higher(spark):
    from openie_backend_spark.operators.curation import importance_weights

    # target distribution = cooking text; raw corpus = cooking + spam
    cooking = "add the fresh basil and stir the tomato sauce gently"
    spam = "click here buy now cheap pills win money fast casino"
    corpus = _docs(spark, [
        (1, cooking),
        (2, "stir the sauce and add fresh basil to the tomato pan"),
        (3, spam),
        (4, "win money fast casino click here buy cheap pills now"),
    ])
    target = _docs(spark, [(100, cooking)])
    got = {r["doc_id"]: r["score_milli"]
           for r in importance_weights(corpus, target, n=2).collect()}
    # every cooking doc must outscore every spam doc
    assert min(got[1], got[2]) > max(got[3], got[4])


def test_dsir_scores_are_integer_sums(spark):
    """score_milli is a LONG (integer milli-nats): the value hash must
    be immune to aggregation order, so no float column may leak out."""
    from openie_backend_spark.operators.curation import importance_weights

    corpus = _docs(spark, [(1, "a b c"), (2, "c d e")])
    out = importance_weights(corpus, corpus, n=2)
    kinds = dict(out.dtypes)
    assert kinds["score_milli"] == "bigint"
    assert kinds["n_grams"] == "bigint"


def test_dsir_empty_and_short_docs_drop_out(spark):
    from openie_backend_spark.operators.curation import importance_weights

    corpus = _docs(spark, [(1, "solo"), (2, ""), (3, "two words")])
    got = importance_weights(corpus, corpus, n=2).collect()
    assert {r["doc_id"] for r in got} == {3}  # only doc with a bigram


# --------------------------------------------- per-host quota sampling


def _urls(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, url string")


def test_host_quota_caps_every_host(spark):
    from openie_backend_spark.operators.curation import host_quota_sample

    rows = [(i, f"https://big.example.com/p{i}") for i in range(50)]
    rows += [(100 + i, f"https://small.org/p{i}") for i in range(2)]
    out = host_quota_sample(_urls(spark, rows), quota=3, n_salt=4).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r["host_rank"])
    assert sorted(by_host["big.example.com"]) == [1, 2, 3]
    assert sorted(by_host["small.org"]) == [1, 2]


def test_host_quota_salt_invariant(spark):
    """The two-stage salted top-k is EXACT: any n_salt gives the same
    rows as the single-window ideal (n_salt=1)."""
    from openie_backend_spark.operators.curation import host_quota_sample

    rows = [(i, f"http://h{i % 3}.net/page/{i * 7 % 13}") for i in range(60)]
    d = _urls(spark, rows)
    pick = lambda df: sorted(
        (r["doc_id"], r["host"], r["host_rank"]) for r in df.collect()
    )  # noqa: E731
    ideal = pick(host_quota_sample(d, quota=2, n_salt=1))
    assert pick(host_quota_sample(d, quota=2, n_salt=4)) == ideal
    assert pick(host_quota_sample(d, quota=2, n_salt=16)) == ideal
