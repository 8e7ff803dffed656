"""Property-based tests (hypothesis): total functions never crash and
hold their invariants on arbitrary input."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from openie_backend_spark.nlp import chunker, reverb, stemmer

TAGS = ["DT", "NN", "NNS", "NNP", "VBD", "VBZ", "VB", "IN", "TO", "JJ",
        "RB", "PRP", "CD", ",", ".", "CC", "WDT", "MD", "RP", "POS"]
CHUNKS = ["B-NP", "I-NP", "B-VP", "I-VP", "B-PP", "B-ADVP", "B-ADJP",
          "B-SBAR", "O", "B-PRT"]

token = st.text(alphabet=st.characters(codec="ascii", exclude_characters="\t\n\r"),
                min_size=1, max_size=12)


@given(
    st.integers(min_value=0, max_value=25).flatmap(
        lambda n: st.tuples(
            st.lists(token, min_size=n, max_size=n),
            st.lists(st.sampled_from(TAGS), min_size=n, max_size=n),
            st.lists(st.sampled_from(CHUNKS), min_size=n, max_size=n),
        )
    )
)
@settings(max_examples=200, deadline=None)
def test_extract_total_and_spans_valid(layers):
    toks, tags, chunks = layers
    out = reverb.extract(toks, tags, chunks)
    n = len(toks)
    for e in out:
        for s, t in (e.arg1, e.rel, e.arg2):
            assert 0 <= s < t <= n
        assert e.arg1[1] <= e.rel[0] or e.arg1[0] >= e.rel[1]  # args don't start inside rel... arg1 left of rel
        assert e.arg2[0] == e.rel[1]  # arg2 adjacency invariant


@given(token, st.sampled_from(TAGS))
@settings(max_examples=300, deadline=None)
def test_stemmer_total_and_idempotent(word, tag):
    out = stemmer.stem_token(word, tag)
    assert isinstance(out, str)
    # lemmatizing a lemma is a no-op for verbs in the lexicon
    if tag.startswith("VB"):
        again = stemmer.stem_token(out, tag)
        assert stemmer.stem_token(again, tag) == again  # reaches fixpoint


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_chunker_total_and_aligned(text):
    for sent in chunker.split_sentences(text):
        toks, tags, chunks = chunker.chunk_sentence(sent)
        assert len(toks) == len(tags) == len(chunks)


@given(st.text(max_size=100))
@settings(max_examples=200, deadline=None)
def test_lnrm_alnum_only(text):
    out = stemmer.lnrm(text)
    assert all(c.isalnum() for c in out)
    assert out == out.lower()


_TAGSET = ["CC", "DT", "IN", "JJ", "NN", "NNP", "NNS", "VB", "VBD", "VBN"]


@given(
    st.dictionaries(st.sampled_from(_TAGSET), st.floats(-5, 5), max_size=6),
)
@settings(max_examples=300, deadline=None)
def test_argmax_tag_matches_spec(scores):
    """The fast-path argmax must equal the naive max over ALL tags
    with unscored tags competing at exactly 0.0, ties on tag string."""
    from openie_backend_spark.nlp.perceptron import _argmax_tag

    tags_desc = sorted(_TAGSET, reverse=True)
    got = _argmax_tag(dict(scores), tags_desc, "NN")
    want = max(_TAGSET, key=lambda t: (scores.get(t, 0.0), t)) if scores else "NN"
    assert got == want


@given(st.text(max_size=300))
@settings(max_examples=150, deadline=None)
def test_html_strip_steps_idempotent_and_tagfree(raw):
    """Applying the html-strip chain twice equals once (no re-exposed
    tags), and the output never contains a <...> tag span — the same
    chain the Spark column and the DuckDB oracle run."""
    import re

    from openie_backend_spark.functions.text import HTML_STRIP_STEPS

    def strip(s: str) -> str:
        for pat, rep in HTML_STRIP_STEPS:
            s = re.sub(pat, rep, s)
        return s.strip()

    once = strip(raw)
    # entity decode runs AFTER tag strip, so "<x>" can legitimately
    # appear in output via "&lt;x&gt;" — but never with raw-markup
    # remnants: script/style/comment content must be unreachable even
    # on a second pass over decoded text
    assert "<!--" not in strip(once)
    assert "<script" not in strip(once).lower()
    assert "<style" not in strip(once).lower()
    # whitespace is fully collapsed
    assert "  " not in once and "\n" not in once and "\t" not in once


@given(st.text(alphabet="0123456789[]{}(), abcde.-", max_size=24))
@settings(max_examples=1500, deadline=None)
def test_interval_parse_cross_engine(text):
    """The three interval parsers (fixtures.parse_interval in Python,
    sources/tab._interval_bounds in Spark SQL, __spark_entry__._tab_iv_sql
    in DuckDB) must agree. Fuzzes Python vs DuckDB on arbitrary
    strings: same (start, end) for valid non-inverted intervals, both
    rejecting otherwise (inverted spans and non-1-or-2-digit-run
    shapes)."""
    import duckdb

    from __spark_entry__ import _tab_iv_sql
    from openie_backend_spark.sources.fixtures import parse_interval

    try:
        py = parse_interval(text)
        if py[1] <= py[0]:
            py = None
    except ValueError:
        py = None

    lit = "'" + text.replace("'", "''") + "'"
    s, e = duckdb.sql(
        "SELECT " + _tab_iv_sql(lit, "s") + ", " + _tab_iv_sql(lit, "e")
    ).fetchone()
    duck = (s, e) if s is not None and e is not None and e > s else None
    assert py == duck, f"{text!r}: python {py} vs duckdb {duck}"
