"""ReVerb-style relation-phrase extraction over pre-chunked sentences.

A from-scratch reimplementation of the ReVerb extraction *semantics*
(Fader, Soderland, Etzioni: "Identifying Relations for Open Information
Extraction", EMNLP 2011) as used by the reference pipeline
(``/root/reference/hadoop/.../ScoobiReVerb.scala:62-107`` calls the
external ``reverb-core`` library's ``ReVerbExtractor.extract``).

The algorithm operates on three aligned token layers (word strings,
Penn-Treebank POS tags, IOB chunk tags):

1. Relation phrases are maximal spans matching ``V | VP | VW*P`` where
   ``V = verb particle? adverb?`` (verb groups chain through
   auxiliaries), ``W = (noun|adj|adv|pron|det)``,
   ``P = (prep|particle|inf-marker)``; adjacent matches merge.
2. The ``V W+ P`` long form is additionally gated by ReVerb's *lexical
   constraint* (paper §3.1.2: the relation phrase must take many
   distinct argument pairs in a large corpus). The original constraint
   is a frequency dictionary computed over 500M web sentences; we
   approximate it with an explicit lexicon of light-verb /
   relational-noun constructions (``lexicon.py``).
3. arg2 = the run of NP-chunk tokens starting exactly at the relation's
   right boundary (a full NP chunk, or the remainder of an NP chunk the
   relation pattern carved into, e.g. "uses a base of | 1981").
4. arg1 = the nearest NP chunk to the left of the relation after
   skipping modifier units: wh/relative-pronoun NPs, prepositional
   objects ("as 100 ,"), comma-delimited appositives, participial
   attachments, adverb chunks and stray punctuation.

All spans are half-open token-index intervals ``(start, end)``.

Pure Python (no Spark imports) so it can be unit tested directly and
wrapped in Arrow-batched pandas UDFs by
``openie_backend_spark.operators.extract``.
"""

from __future__ import annotations

from typing import NamedTuple

from openie_backend_spark.nlp.lexicon import extension_allowed


class Extraction(NamedTuple):
    """One binary extraction: half-open token spans into a sentence."""

    arg1: tuple[int, int]
    rel: tuple[int, int]
    arg2: tuple[int, int]


# Penn Treebank tag classes (paper Figure 1: V / W / P token classes).
VERB_TAGS = frozenset({"VB", "VBD", "VBG", "VBN", "VBP", "VBZ", "MD"})
W_TAGS = frozenset(
    {
        "NN", "NNS", "NNP", "NNPS",  # nouns
        "JJ", "JJR", "JJS",          # adjectives
        "PRP", "PRP$",               # pronouns
        "DT", "CD", "POS", "$",      # determiners / numbers / possessive
    }
)
P_TAGS = frozenset({"IN", "TO", "RP"})
ADVERB_TAGS = frozenset({"RB", "RBR", "RBS"})

# Subordinating conjunctions share the IN tag with prepositions but do
# not end a ReVerb relation phrase (they introduce a clause, not an NP
# argument): "said that ...", "hopeful that ...".
SUBORDINATORS = frozenset({"that", "because", "if", "while", "although", "though", "unless"})

WH_TAGS = frozenset({"WDT", "WP", "WP$", "EX"})
WH_WORDS = frozenset({"which", "that", "who", "whom", "whose", "what"})
REFLEXIVE_PRONOUNS = frozenset(
    {
        "myself", "yourself", "himself", "herself", "itself",
        "ourselves", "yourselves", "themselves",
    }
)


def _is_verb(tag: str) -> bool:
    return tag in VERB_TAGS


def _verb_group_end(pos: list[str], chunks: list[str], start: int, n: int) -> int:
    """Consume ``(verb particle? adverb?)+`` starting at a verb."""
    i = start
    end = start
    while i < n and _is_verb(pos[i]):
        i += 1
        end = i
        # trailing particle / adverb(s) belong to the verb group only
        # while they bridge to another verb or terminate the group
        while i < n and (pos[i] == "RP" or pos[i] in ADVERB_TAGS):
            i += 1
        if i < n and _is_verb(pos[i]):
            end = i  # the RB/RP run connected two verbs ("did not go")
            continue
        # group ends at last verb + immediate RP/RB run
        end = i
        break
    return end


def _consume_p_run(tokens, pos, chunks, i, n):
    """Consume a run of P tokens; returns end (== i if none usable)."""
    j = i
    while j < n and pos[j] in P_TAGS:
        if tokens[j].lower() in SUBORDINATORS:
            break
        j += 1
    return j


def _match_relation_at(
    tokens: list[str], pos: list[str], chunks: list[str], start: int, n: int
) -> int:
    """Longest gated relation match starting at a verb. Returns end.

    State machine over unit types: verb groups chain freely; a P run is
    free directly after a verb group (``V P`` form, merge-adjacent);
    a ``W+ P`` bridge is gated by the lexical constraint.
    """
    if not _is_verb(pos[start]):
        return start
    i = start
    end = start
    after_verb = False
    while i < n:
        if _is_verb(pos[i]):
            i = _verb_group_end(pos, chunks, i, n)
            end = i
            after_verb = True
            continue
        if after_verb and pos[i] in P_TAGS:
            p_end = _consume_p_run(tokens, pos, chunks, i, n)
            if p_end > i:
                # a degree adverb wedged between the P and its NP
                # belongs to the relation ("to nearly | $ 12.4 billion",
                # "as too | low ...")
                while (
                    p_end < n
                    and pos[p_end] in ADVERB_TAGS
                    and p_end + 1 < n
                    and chunks[p_end + 1] in ("B-NP", "I-NP", "B-ADJP")
                ):
                    p_end += 1
                i = p_end
                end = i
                after_verb = False
                continue
        # gated W+ P bridge ("reported a net loss of") — only directly
        # after a verb group; after a P run the NP is arg2 territory
        if not after_verb:
            break
        j = i
        while j < n and (
            pos[j] in W_TAGS
            or pos[j] in ADVERB_TAGS
            or pos[j] in ("VBN", "VBG")  # participial modifiers inside W
            or chunks[j] in ("B-ADJP", "I-ADJP")
        ):
            j += 1
        if j > i and j < n and pos[j] in P_TAGS:
            p_end = _consume_p_run(tokens, pos, chunks, j, n)
            if p_end > j and extension_allowed(tokens, pos, chunks, start, i, j, p_end):
                while (
                    p_end < n
                    and pos[p_end] in ADVERB_TAGS
                    and p_end + 1 < n
                    and chunks[p_end + 1] in ("B-NP", "I-NP", "B-ADJP")
                ):
                    p_end += 1
                i = p_end
                end = i
                after_verb = False
                continue
        break
    return end


def relation_spans(
    tokens: list[str], pos: list[str], chunks: list[str]
) -> list[tuple[int, int]]:
    """All maximal, merged relation-phrase spans for one sentence."""
    n = len(pos)
    spans: list[tuple[int, int]] = []
    i = 0
    while i < n:
        # relations start at a finite verb / modal — a bare participle,
        # gerund, or infinitive complement ("allow X [to cater] to") is
        # a modifier, not a ReVerb relation head
        if pos[i] in ("VBG", "VBN"):
            i += 1
            continue
        if pos[i] == "VB" and i > 0 and pos[i - 1] in ("TO", "VB"):
            i += 1
            continue
        if _is_verb(pos[i]):
            end = _match_relation_at(tokens, pos, chunks, i, n)
            if end > i:
                # leading adverb directly before the first verb is part
                # of V = "adverb? verb ..." ("only play", "even transfer")
                s = i
                if s > 0 and pos[s - 1] in ADVERB_TAGS and tokens[s - 1].lower() != "n't":
                    s -= 1
                spans.append((s, end))
                i = end
                continue
        i += 1
    merged: list[tuple[int, int]] = []
    for s, e in spans:
        if merged and s <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(e, merged[-1][1]))
        else:
            merged.append((s, e))
    return merged


def noun_phrases(chunks: list[str]) -> list[tuple[int, int]]:
    """Half-open spans of NP chunks from IOB tags (B-NP/I-NP)."""
    nps: list[tuple[int, int]] = []
    start = -1
    for i, tag in enumerate(chunks):
        if tag == "B-NP":
            if start >= 0:
                nps.append((start, i))
            start = i
        elif tag == "I-NP":
            if start < 0:  # malformed IOB: treat as start
                start = i
        else:
            if start >= 0:
                nps.append((start, i))
                start = -1
    if start >= 0:
        nps.append((start, len(chunks)))
    return nps


def _find_arg2(
    rel_end: int, tokens: list[str], pos: list[str], chunks: list[str]
) -> tuple[int, int] | None:
    """Run of NP tokens starting exactly at rel_end (chunk or remainder)."""
    n = len(chunks)
    if rel_end >= n:
        return None
    if chunks[rel_end] not in ("B-NP", "I-NP"):
        return None
    if pos[rel_end] in WH_TAGS:
        return None
    e = rel_end + 1
    while e < n and chunks[e] == "I-NP":
        e += 1
    return (rel_end, e)


def _is_wh_np(np: tuple[int, int], tokens: list[str], pos: list[str]) -> bool:
    s, e = np
    w = tokens[s].lower()
    return pos[s] in WH_TAGS or (e - s == 1 and w in WH_WORDS)


_PUNCT = frozenset({"``", "''", "-lrb-", "-rrb-", "(", ")", '"', "--", ";", ":"})
_FINITE_TAGS = frozenset({"VBD", "VBZ", "VBP", "MD", "VB"})
_MONTHS = frozenset(
    "january february march april may june july august september october "
    "november december".split()
)
_TIME_NOUNS = frozenset(
    {"week", "month", "year", "yesterday", "today", "tomorrow", "morning",
     "afternoon", "evening", "night", "quarter", "day", "time", "ago"}
)


def _is_temporal_np(np: tuple[int, int], tokens: list[str]) -> bool:
    """Temporal modifier NPs ("last August", "two years ago") are never
    arguments in ReVerb's heuristics — they modify the clause."""
    s, e = np
    words = [tokens[m].lower() for m in range(s, e)]
    if words[-1] in _MONTHS or words[-1] in _TIME_NOUNS:
        if words[0] in ("last", "this", "next", "early", "late", "each") or words[-1] == "ago":
            return True
        if len(words) == 1 and words[0] in ("yesterday", "today", "tomorrow"):
            return True
    return False


def _find_arg1(
    rel_start: int,
    nps: list[tuple[int, int]],
    tokens: list[str],
    pos: list[str],
    chunks: list[str],
) -> tuple[int, int] | None:
    """Left-walk from the relation to ReVerb's argument-1 NP.

    The walk tracks the *follower*: the type of the unit walked
    immediately to the right of the current position. An NP is taken
    or skipped based on (follower, token-before-NP):

    * follower adjacent / preposition / adverb / crossed-verb /
      wh-pronoun / conjunction-before-NP → take;
    * follower = conjunction introducing a verb (coordinated VP: the
      NP is the previous conjunct's object) → skip;
    * follower = comma → the NP is clause-final material: skip it,
      EXCEPT when the token before the NP marks it as a subject-like
      unit — a finite verb ("said A.P. Green , ... , told"), clause
      start (BOS / SBAR), a quotation attribution (a closing quote was
      walked), a bare-number age (", 73 ,") or an abbreviated state
      name (", Conn . ,"), all of which ReVerb takes.

    wh-NPs, reflexive pronouns and juxtaposed temporal NPs are never
    arguments. Derived empirically against the reference's golden
    fixture (``TestReVerbExtractions.txt``).
    """
    np_by_end = {np[1]: np for np in nps}
    n = len(tokens)
    i = rel_start
    follower = "adjacent"
    quote_seen = False
    dot_seen = False
    while i > 0:
        k = i - 1
        tok = tokens[k]
        low = tok.lower()
        ch = chunks[k]
        if ch not in ("B-NP", "I-NP"):
            if low in ("``", "''", '"', "'"):
                quote_seen = True
                i = k
                continue
            if low == ".":
                dot_seen = True
                i = k
                continue
            if low in _PUNCT:
                i = k
                continue
            if low == ",":
                # a comma directly after a crossed verb group is VP
                # punctuation ("closed higher in Zurich , ... and were")
                # — the walk is still hunting the shared subject
                if follower not in ("wh", "verb"):
                    follower = "comma"
                i = k
                continue
            if ch in ("B-ADVP", "I-ADVP") or pos[k] in ADVERB_TAGS:
                follower = "rb"
                i = k
                continue
            if pos[k] == "CC":
                nxt = k + 1
                while nxt < n and pos[nxt] in ADVERB_TAGS:
                    nxt += 1
                follower = (
                    "cc-verb"
                    if nxt < n
                    and (pos[nxt] in VERB_TAGS or chunks[nxt] in ("B-VP", "I-VP"))
                    else "cc-np"
                )
                i = k
                continue
            if pos[k] in ("IN", "TO", "RP") or ch in ("B-PP", "I-PP", "B-PRT", "B-SBAR", "I-SBAR"):
                follower = "prep"
                i = k
                continue
            if ch in ("B-ADJP", "I-ADJP"):
                follower = "adjp"
                i = k
                continue
            if pos[k] in VERB_TAGS or ch in ("B-VP", "I-VP"):
                v = k
                while v > 0 and (
                    pos[v - 1] in VERB_TAGS
                    or pos[v - 1] in ADVERB_TAGS
                    or chunks[v - 1] in ("B-VP", "I-VP")
                ):
                    v -= 1
                follower = "verb"
                i = v
                continue
            if pos[k] in ("CD", "$", "POS", "SYM", "#"):
                follower = "np"
                i = k
                continue
            return None
        np = np_by_end.get(i)
        if np is None:
            s = k
            while s > 0 and chunks[s] != "B-NP" and chunks[s - 1] in ("B-NP", "I-NP"):
                s -= 1
            np = (s, i)
        s, e = np
        if _is_wh_np(np, tokens, pos):
            i = s
            follower = "wh"
            continue
        if pos[s] == "IN":  # chunker glued a preposition into the NP
            i = s
            follower = "np"
            continue
        skip = False
        if e - s == 1 and tokens[s].lower() in REFLEXIVE_PRONOUNS:
            skip = True
        elif _is_temporal_np(np, tokens) and follower != "adjacent":
            skip = True
        elif follower == "cc-verb":
            skip = True
        elif follower == "comma":
            skip = True
            prev = s - 1
            if prev < 0 or quote_seen:
                skip = False
            elif chunks[prev] in ("B-SBAR", "I-SBAR") or tokens[prev].lower() in SUBORDINATORS:
                # complement-clause subject: "charges that [Better Book] , ... , made"
                skip = False
            elif pos[prev] in VERB_TAGS and pos[prev] != "VBG":
                skip = False
            elif tokens[prev] == ",":
                if all(pos[m] in ("CD", "$") for m in range(s, e)):
                    skip = False  # age aside: ", 73 ,"
                elif e - s <= 3 and all(pos[m] == "NNP" for m in range(s, e)):
                    skip = False  # proper-noun aside: ", Conn . ,", ", British Columbia ,"
        if not skip:
            return np
        i = s
        follower = "np"
        quote_seen = False
        dot_seen = False
    return None


def extract(
    tokens: list[str], pos: list[str], chunks: list[str]
) -> list[Extraction]:
    """ReVerb binary extractions for one chunked sentence."""
    n = len(tokens)
    if not (len(pos) == n and len(chunks) == n) or n == 0:
        return []
    nps = noun_phrases(chunks)
    out: list[Extraction] = []
    for rs, re_ in relation_spans(tokens, pos, chunks):
        # require a non-modal verb somewhere in the relation
        if not any(pos[k] in VERB_TAGS and pos[k] != "MD" for k in range(rs, re_)):
            continue
        arg2 = _find_arg2(re_, tokens, pos, chunks)
        if arg2 is None:
            # fall back: drop a trailing P run and retry (the long form
            # consumed a P with no NP behind it)
            e2 = re_
            while e2 > rs and pos[e2 - 1] in P_TAGS:
                e2 -= 1
            if e2 < re_ and e2 > rs:
                arg2 = _find_arg2(e2, tokens, pos, chunks)
                if arg2 is not None:
                    re_ = e2
        if arg2 is None:
            continue
        arg1 = _find_arg1(rs, nps, tokens, pos, chunks)
        if arg1 is None:
            continue
        out.append(Extraction(arg1, (rs, re_), arg2))
    return out
