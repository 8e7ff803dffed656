"""Round-5 additions: IVF ANN, Bloom incremental membership,
temperature-mix sampling, relation type-signature induction."""

from pyspark.sql import functions as F

from openie_backend_spark.operators.curation import temperature_sample
from openie_backend_spark.operators.dedup import bloom_membership
from openie_backend_spark.operators.kg_analytics import relation_type_signature
from openie_backend_spark.operators.similarity import brute_force_topk, ivf_topk


def _embs(spark, n=40, dim=8):
    """Deterministic small embedding table (LCG, no numpy RNG)."""
    rows, state = [], 11
    for i in range(n):
        vec = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            vec.append((state / float(1 << 63)) * 2.0 - 1.0)
        rows.append((i, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_probe_all_equals_bruteforce(spark):
    """nprobe == n_centroids probes every cell -> exact == brute force."""
    corpus = _embs(spark)
    queries = corpus.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(corpus, queries, k=5)
    ivf = ivf_topk(corpus, queries, k=5, n_centroids=4, nprobe=4)
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, ivf.collect()))


def test_ivf_partial_probe_subset_and_ranked(spark):
    """nprobe < n_centroids: results are a subset of the corpus scored
    exactly, ranks contiguous from 1, cosine non-increasing."""
    corpus = _embs(spark)
    queries = corpus.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(corpus, queries, k=5, n_centroids=8, nprobe=2)
    rows = out.collect()
    assert rows, "partial probe returned nothing"
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    exact = {
        (r.query_id, r.vec_id): r.cosine
        for r in brute_force_topk(corpus, queries, k=40).collect()
    }
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        cosines = [r.cosine for r in rs]
        assert cosines == sorted(cosines, reverse=True)
        for r in rs:  # candidate scores are EXACT, only the set is approximate
            assert exact[(q, r.vec_id)] == r.cosine


def test_bloom_no_false_negatives_and_hit_counts(spark):
    hist = spark.createDataFrame(
        [(i, f"history document number {i} padding text") for i in range(50)],
        "doc_id long, text string",
    )
    probe = spark.createDataFrame(
        # 5 exact re-crawls + 5 novel docs
        [(100 + i, f"history document number {i} padding text") for i in range(5)]
        + [(200 + i, f"genuinely novel probe {i}") for i in range(5)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bloom_membership(hist, probe).collect()}
    assert len(out) == 10
    for i in range(5):  # Bloom guarantee: a true member is ALWAYS flagged
        assert out[100 + i].maybe_dup and out[100 + i].n_hits == 3
    for i in range(5):  # deterministic hashes: these don't collide
        assert not out[200 + i].maybe_dup


def test_temperature_sample_rates_and_rare_group_kept(spark):
    rows = (
        [(i, "en") for i in range(64)]
        + [(100 + i, "de") for i in range(16)]
        + [(200 + i, "fr") for i in range(4)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_sample(docs, "lang").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    # rate_ppm = floor(1e6 * sqrt(n_min / n_l))
    assert {r.rate_ppm for r in by_lang["fr"]} == {1000000}
    assert {r.rate_ppm for r in by_lang.get("de", [])} <= {500000}
    assert {r.rate_ppm for r in by_lang.get("en", [])} <= {250000}
    # rarest group keeps every document (rate exactly 1.0)
    assert sorted(r.doc_id for r in by_lang["fr"]) == [200, 201, 202, 203]
    kept_ids = {r.doc_id for r in out}
    assert kept_ids <= {r[0] for r in rows}


def test_relation_type_signature_ranking_and_caps(spark):
    linked = spark.createDataFrame(
        [
            ("acquired", 10, ["/biz/co"], ["/biz/co"]),
            ("acquired", 5, ["/biz/co"], ["/biz/co", "/org/org"]),
            ("acquired", 1, ["/person"], ["/biz/co"]),
            ("born in", 3, ["/person"], ["/loc/city"]),
            ("untyped rel", 9, [], ["/biz/co"]),  # empty side -> no rows
        ],
        "rel_norm string, size long, arg1_types array<string>, "
        "arg2_types array<string>",
    )
    out = relation_type_signature(linked, k=2)
    rows = {(r.rel_norm, r.rank): r for r in out.collect()}
    top = rows[("acquired", 1)]
    assert (top.arg1_type, top.arg2_type, top.support, top.n_groups) == (
        "/biz/co", "/biz/co", 15, 2)
    assert rows[("acquired", 2)].support == 5
    assert ("acquired", 3) not in rows  # k=2 cap
    assert rows[("born in", 1)].arg2_type == "/loc/city"
    assert not [r for r in rows if r[0] == "untyped rel"]
    # side cap: a hundred-type entity contributes at most 8 per side
    fat = spark.createDataFrame(
        [("r", 1, [f"/t/{i:03d}" for i in range(100)], ["/x"])],
        "rel_norm string, size long, arg1_types array<string>, "
        "arg2_types array<string>",
    )
    assert relation_type_signature(fat, k=100).count() <= 8


def test_canonical_docs_survivor_selection(spark):
    from openie_backend_spark.operators.dedup import canonical_docs

    docs = spark.createDataFrame(
        [(1, "short"), (2, "the longest member here"), (3, "medium txt"),
         (4, "same len a"), (5, "same len b"), (6, "a singleton never paired")],
        "doc_id long, text string",
    )
    clusters = spark.createDataFrame(
        # cluster 1 = {1,2,3}; cluster 4 = {4,5} (equal lengths -> id tiebreak)
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)],
        "doc_id long, cluster_id long",
    )
    out = {r.doc_id: r for r in canonical_docs(docs, clusters).collect()}
    assert len(out) == 5 and 6 not in out  # singletons pass through untouched
    assert out[2].keep and not out[1].keep and not out[3].keep
    assert out[2].n_members == 3 and out[2].text_len == 23
    assert out[4].keep and not out[5].keep  # equal length -> lower doc_id
    assert out[4].n_members == 2


def test_entity_aliases_topk_and_sides(spark):
    from openie_backend_spark.operators.kg_analytics import entity_aliases

    linked = spark.createDataFrame(
        [
            # fbid F1 appears as arg1 under two surfaces and as arg2 once
            ("barack obama", "met", "x", 5, ("F1",), (None,)),
            ("obama", "met", "y", 2, ("F1",), (None,)),
            ("z", "praised", "mr obama", 4, (None,), ("F1",)),
            # unlinked group contributes nothing
            ("nobody", "did", "nothing", 9, (None,), (None,)),
        ],
        "arg1_norm string, rel_norm string, arg2_norm string, size long, "
        "arg1_entity struct<fbid:string>, arg2_entity struct<fbid:string>",
    )
    out = {(r.fbid, r.rank): r for r in entity_aliases(linked, k=2).collect()}
    assert len(out) == 2  # k=2 cap drops the third surface
    assert out[("F1", 1)].surface == "barack obama"
    assert out[("F1", 1)].support == 5 and out[("F1", 1)].n_groups == 1
    assert out[("F1", 2)].surface == "mr obama" and out[("F1", 2)].support == 4


def test_duplicate_passages_spans_and_thresholds(spark):
    from openie_backend_spark.operators.dedup import duplicate_passages

    common = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rep8 = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            (1, common + " unique tail aa bb cc"),
            (2, "prefix words here " + common),
            # 8-gram repeated twice WITHIN one doc only -> not flagged
            (3, rep8 + " spacer " + rep8),
            (4, "completely unrelated text with nothing shared at all ok"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in duplicate_passages(docs, ngram=8).collect()}
    # doc1: the 10 shared words occupy words 1..10 -> one merged span
    assert (out[1].span_start, out[1].span_end, out[1].span_words) == (1, 10, 10)
    # doc2: shared passage starts at word 4
    assert (out[2].span_start, out[2].span_end, out[2].span_words) == (4, 13, 10)
    assert 3 not in out and 4 not in out
    # ngram > shared-passage length -> nothing flagged anywhere
    assert duplicate_passages(docs, ngram=11).count() == 0


def test_relation_inverses_converse_and_symmetric(spark):
    from openie_backend_spark.operators.kg_analytics import relation_inverses

    groups = spark.createDataFrame(
        [
            # converse pair: acquired(g,y) <-> was bought by(y,g), 2 witnesses
            ("acquired", "google", "youtube"),
            ("was bought by", "youtube", "google"),
            ("acquired", "meta", "instagram"),
            ("was bought by", "instagram", "meta"),
            # symmetric: borders(f,s) and borders(s,f) -> ONE unordered witness
            ("borders", "france", "spain"),
            ("borders", "spain", "france"),
            # same direction only -> no inverse signal
            ("employs", "acme", "bob"),
            ("hired", "acme", "bob"),
            # self-witness excluded
            ("equals", "x", "x"),
        ],
        "rel_norm string, arg1_norm string, arg2_norm string",
    )
    out = {(r.rel_a, r.rel_b): r.n_shared_pairs
           for r in relation_inverses(groups, min_shared=1).collect()}
    assert out[("acquired", "was bought by")] == 2
    assert out[("borders", "borders")] == 1  # counted once, not twice
    assert ("employs", "hired") not in out
    assert not any("equals" in k for k in out)


def test_hash_split_deterministic_stable_and_proportional(spark):
    import pytest as _pytest

    from openie_backend_spark.operators.curation import hash_split

    docs = spark.createDataFrame(
        [(i, "x") for i in range(2000)], "doc_id long, text string"
    )
    out = {r.doc_id: r.split for r in hash_split(docs).collect()}
    assert len(out) == 2000 and set(out.values()) == {"train", "val", "test"}
    counts = {s: sum(1 for v in out.values() if v == s) for s in set(out.values())}
    assert abs(counts["train"] / 2000 - 0.9) < 0.03
    assert abs(counts["val"] / 2000 - 0.05) < 0.02
    # growth stability: assignments computed on a subset are identical
    sub = {r.doc_id: r.split
           for r in hash_split(docs.filter(F.col("doc_id") < 500)).collect()}
    assert all(out[i] == sub[i] for i in sub)
    # a different salt decorrelates
    other = {r.doc_id: r.split for r in hash_split(docs, salt="s2").collect()}
    assert any(out[i] != other[i] for i in out)
    with _pytest.raises(ValueError):
        hash_split(docs, fractions={"a": 0.5, "b": 0.6})


def test_streaming_ingest_bloom_page_dedup(spark, tmp_path):
    import os

    from openie_backend_spark.streaming.ingest import run_incremental

    landing = tmp_path / "landing"
    groups_dir = str(tmp_path / "groups")
    ckpt = str(tmp_path / "ckpt")
    landing.mkdir()
    schema = "url string, text string, lang string"
    batch1 = spark.createDataFrame(
        [("u1", "Acme Corp acquired Globex Inc. .", "en")], schema)
    batch1.write.parquet(str(landing / "b1"))
    run_incremental(spark, str(landing) + "/*", groups_dir, ckpt,
                    batch1.schema, dedup_pages=True)
    g1 = spark.read.parquet(groups_dir)
    assert g1.filter(F.col("rel_norm") == "acquire").first()["size"] == 1
    assert os.path.isdir(os.path.join(groups_dir, "_seen_bits"))

    # batch 2: u2 re-crawls u1's exact text (must be DROPPED before
    # extraction), u3 is novel (must merge)
    batch2 = spark.createDataFrame(
        [("u2", "Acme Corp acquired Globex Inc. .", "en"),
         ("u3", "Initech was founded by Grace Hopper .", "en")], schema)
    batch2.write.parquet(str(landing / "b2"))
    run_incremental(spark, str(landing) + "/*", groups_dir, ckpt,
                    batch2.schema, dedup_pages=True)
    g2 = spark.read.parquet(groups_dir)
    acq = g2.filter(F.col("rel_norm") == "acquire").first()
    assert acq["size"] == 1, "re-crawled page must not re-extract"
    assert g2.filter(F.col("rel_norm") == "be found by").count() == 1


def test_corpus_profile_exact_values(spark):
    from openie_backend_spark.operators.curation import corpus_profile

    docs = spark.createDataFrame(
        [
            (1, "one two three", "en"),
            (2, "one two three", "en"),   # exact dup of doc 1
            (3, "vier fünf", "de"),
            (4, "alpha beta gamma delta", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {r.metric: r.value for r in corpus_profile(docs).collect()}
    assert out["n_docs"] == 4.0
    assert out["distinct_texts"] == 3.0
    assert out["dup_rate"] == 0.25
    assert out["total_tokens"] == 3 + 3 + 2 + 4
    assert out["mean_tokens"] == 3.0
    assert out["lang_share:en"] == 0.75
    assert out["lang_share:de"] == 0.25
    # quality: every doc here misses the length gate; mean is in [0, 1]
    assert 0.0 <= out["mean_quality"] <= 1.0
    assert out["total_bpe_tokens"] >= out["total_tokens"]


def test_lm_cross_entropy_orders_gibberish_above_typical(spark):
    from openie_backend_spark.operators.curation import lm_cross_entropy

    # 16 distinct common words, each with count >= 20, saturate the
    # 16-slot vocab so every count-1 gibberish token is OOV
    common = ("the quick brown fox jumps over a lazy dog while rain "
              "falls on green hills today")
    docs = spark.createDataFrame(
        [(i, common) for i in range(20)]
        + [(100, "the quick brown fox jumps over a dog")]      # typical
        + [(101, "zxqv wvut kjhg plmo qwer asdf zxcv uiop")],  # gibberish/OOV
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in lm_cross_entropy(docs, vocab_size=16).collect()}
    assert out[100].cross_entropy < out[101].cross_entropy
    # every in-vocab token beats UNK, so gibberish CE equals the UNK
    # log-prob exactly: ce_micro must be n_tokens * (-unk_lp)
    assert out[101].ce_micro % out[101].n_tokens == 0
    # deterministic: a second evaluation is bit-identical
    out2 = {r.doc_id: r for r in lm_cross_entropy(docs, vocab_size=16).collect()}
    assert {k: (v.ce_micro, v.cross_entropy) for k, v in out.items()} == \
           {k: (v.ce_micro, v.cross_entropy) for k, v in out2.items()}


def test_repeated_spans_within_doc_only(spark):
    from openie_backend_spark.operators.dedup import repeated_spans

    rep8 = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            # same 8-gram twice within ONE doc -> two merged spans
            (1, rep8 + " spacer " + rep8),
            # unique text -> nothing
            (2, "totally unique words that never repeat at all here ok"),
            # cross-doc duplication WITHOUT within-doc repeats -> nothing
            (3, "shared passage alpha beta gamma delta epsilon zeta"),
            (4, "shared passage alpha beta gamma delta epsilon zeta"),
        ],
        "doc_id long, text string",
    )
    out = {}
    for r in repeated_spans(docs, ngram=8).collect():
        out.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    # doc 1: words 1-8 and 10-17 (spacer at 9 breaks adjacency)
    assert sorted(out[1]) == [(1, 8), (10, 17)]
    assert 2 not in out and 3 not in out and 4 not in out
