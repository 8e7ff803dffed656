"""Hand-labeled n-ary / relnoun / relative-clause goldens (VERDICT r2
#4): P/R of the OpenIE-4-shaped surface (``nlp/nary.py``) against
hand-annotated expectations on fixture-style sentences, reported in
COVERAGE.md. The reference's depth here is srlie's dependency-parse
SRL (``ScoobiOpenIE4.scala:66-137``); these goldens pin the chunk-level
analog: trailing-PP n-ary attachments, the three relnoun patterns, and
relative-clause matrix re-attachment.
"""

from __future__ import annotations

from openie_backend_spark.nlp import chunker, nary

# (sentence, kind, arg1, rel-or-None, arg2s) — texts joined by spaces.
# kind: "T" = n-ary with attachments, "N" = relnoun, "R" = rel-clause.
GOLD = [
    # trailing-PP n-ary attachments
    ("Acme Corp acquired Globex Inc. in 2006 for millions .",
     "T", "Acme Corp", "acquired", ["Globex Inc.", "in 2006", "for millions"]),
    ("Bob Smith moved to Springfield in 1999 .",
     "T", "Bob Smith", "moved to", ["Springfield", "in 1999"]),
    ("Marie Curie won the Nobel Prize in 1911 .",
     "T", "Marie Curie", "won", ["the Nobel Prize", "in 1911"]),
    ("Initech sold the division to Hooli for $ 2 billion in March .",
     "T", "Initech", "sold", ["the division", "to Hooli",
                              "for $ 2 billion", "in March"]),
    # subject-control / infinitival chains (rel spans the chain)
    ("Hooli agreed to acquire Pied Piper for $ 1 billion .",
     "T", "Hooli", "agreed to acquire", ["Pied Piper", "for $ 1 billion"]),
    ("The board refused to approve the merger in April .",
     "T", "The board", "refused to approve", ["the merger", "in April"]),
    # copular complements ride the V W* P relation shape
    ("Alice Brown is the author of the book .",
     "T", "Alice Brown", "is the author of", ["the book"]),
    ("Oscorp is a subsidiary of Initech .",
     "T", "Oscorp", "is a subsidiary of", ["Initech"]),
    # relnoun pattern A (title)
    ("Initech CEO Bob Smith resigned yesterday .",
     "N", "Bob Smith", "be ceo of", ["Initech"]),
    ("Globex founder Jane Doe spoke first .",
     "N", "Jane Doe", "be founder of", ["Globex"]),
    # relnoun pattern B (possessive)
    ("Hooli 's founder , Jane Doe , resigned .",
     "N", "Jane Doe", "be founder of", ["Hooli"]),
    # relnoun pattern C (appositive-of)
    ("Bob Smith , CEO of Initech , resigned yesterday .",
     "N", "Bob Smith", "be ceo of", ["Initech"]),
    ("Jane Doe , the president of Globex , spoke first .",
     "N", "Jane Doe", "be president of", ["Globex"]),
    # relative-clause matrix re-attachment
    ("Marie Curie , who discovered radium , won the Nobel Prize in 1911 .",
     "R", "Marie Curie", "won", ["the Nobel Prize"]),
    ("Acme Corp , which acquired Globex in 2006 , is based in Springfield .",
     "R", "Acme Corp", "is based in", ["Springfield"]),
    ("Bob Smith , who founded Initech , lives in Springfield .",
     "R", "Bob Smith", "lives in", ["Springfield"]),
    # coordinated subjects (conj repair: first conjunct also subject)
    ("Acme Corp and Globex announced a merger in March .",
     "T", "Acme Corp", "announced", ["a merger", "in March"]),
    # shared-subject VP coordination (post-CC verb re-attached)
    ("Acme Corp acquired Globex in 2006 and sold Initech in 2008 .",
     "T", "Acme Corp", "sold", ["Initech", "in 2008"]),
    ("Initech bought the plant in 1999 and closed the office in 2001 .",
     "T", "Initech", "closed", ["the office", "in 2001"]),
    # clausal complements of report verbs
    ("The report said that Acme Corp acquired Globex .",
     "C", "The report", "said", ["that Acme Corp acquired Globex"]),
    ("Globex confirmed that the deal closed in March .",
     "C", "Globex", "confirmed", ["that the deal closed in March"]),
    # agentive-passive active normalization
    ("Globex was acquired by Acme Corp in 2006 .",
     "T", "Acme Corp", "acquired", ["Globex", "in 2006"]),
    ("The factory was built by Initech in 1950 .",
     "T", "Initech", "built", ["The factory", "in 1950"]),
    # --- round-4 depth (VERDICT r3 #5) ---
    # nested clausal complements: inner report clause also extracted
    ("The report said that analysts believe that Acme Corp acquired Globex .",
     "C", "analysts", "believe", ["that Acme Corp acquired Globex"]),
    ("Jane Doe claimed that Bob Smith knew that the deal closed in March .",
     "C", "Bob Smith", "knew", ["that the deal closed in March"]),
    # xcomp: extended relation through a nominal infinitive
    ("Hooli announced plans to acquire Pied Piper for $ 1 billion .",
     "T", "Hooli", "announced plans to acquire",
     ["Pied Piper", "for $ 1 billion"]),
    ("Globex made an offer to buy the factory in June .",
     "T", "Globex", "made an offer to buy", ["the factory", "in June"]),
    # xcomp: object control — matrix object is the infinitive's subject
    ("Acme Corp persuaded Globex to sell the unit in March .",
     "T", "Globex", "sell", ["the unit", "in March"]),
    ("The board ordered Initech to close the plant .",
     "T", "Initech", "close", ["the plant"]),
    ("Regulators asked Hooli to divest the subsidiary in 2020 .",
     "T", "Hooli", "divest", ["the subsidiary", "in 2020"]),
    # appositive copulas
    ("Bob Smith , a veteran lawyer , joined the board in May .",
     "N", "Bob Smith", "be", ["a veteran lawyer"]),
    ("Initech , a software company from Springfield , hired Jane Doe .",
     "N", "Initech", "be", ["a software company from Springfield"]),
    ("Marie Curie , the famous physicist , won two Nobel Prizes .",
     "N", "Marie Curie", "be", ["the famous physicist"]),
    # appositive-bracket matrix re-attachment (the shallow pass had
    # attached the matrix verb to the appositive NP)
    ("Initech , a software company from Springfield , hired Jane Doe .",
     "R", "Initech", "hired", ["Jane Doe"]),
    # when the shallow pass already picked the right subject, the
    # appositive bracket must not be needed (plain T row stands)
    ("Bob Smith , a veteran lawyer , joined the board in May .",
     "T", "Bob Smith", "joined", ["the board", "in May"]),
]


def _predicted(sentence):
    toks, tags, chks = chunker.chunk_sentence(sentence)
    out = set()
    join = lambda a, b: " ".join(toks[a:b])
    base = nary.nary_extract(toks, tags, chks)
    extra = (nary.conj_extract(toks, tags, chks, base)
             + nary.passive_extract(toks, tags, chks, base)
             + nary.xcomp_extract(toks, tags, chks, base))
    for e in base + extra:
        out.add(("T", join(*e.arg1), join(*e.rel),
                 tuple(join(a, b) for a, b in e.arg2s)))
    for c in nary.ccomp_extract(toks, tags, chks):
        out.add(("C", join(*c.arg1), join(*c.rel), (join(*c.arg2),)))
    for r in nary.relnoun_extract(toks, tags, chks):
        out.add(("N", join(*r.arg1), r.rel_text, (join(*r.arg2),)))
    for ap in nary.appos_extract(toks, tags, chks):
        out.add(("N", join(*ap.arg1), ap.rel_text, (join(*ap.arg2),)))
    for rc in nary.relclause_extract(toks, tags, chks):
        out.add(("R", join(*rc.arg1), join(*rc.rel), (join(*rc.arg2),)))
    return out


def test_conj_repair_skips_disjunction():
    """'Acme or Globex announced X' does not assert (Acme, announced,
    X) — the subject-coordination repair must fire only on 'and'."""
    toks, tags, chks = chunker.chunk_sentence(
        "Acme Corp or Globex announced a merger in March .")
    base = nary.nary_extract(toks, tags, chks)
    extra = nary.conj_extract(toks, tags, chks, base)
    arg1s = {" ".join(toks[e.arg1[0]:e.arg1[1]]) for e in extra}
    assert "Acme Corp" not in arg1s


# Explicit known misses (VERDICT r4 #4 "35/35 or explicit xfail"):
# EMPTY as of round 5. The last two misses shared one cause — the
# MATRIX VERB immediately after a relative clause's closing comma was
# mis-tagged (OOV "won" -> DT; noun-biased "lives" -> NNS) because the
# prev-tag context "," has no ", <verb>" resumption evidence in the
# ~80k-token gold corpus. Fixed by two clause-level repairs in
# chunker.pos_tag: the relative-clause splice (tag the
# bracket-stripped sequence and take its tags for the matrix tokens)
# and the finite-verb repair (a matrix clause with no finite verb
# retags a subject-adjacent verb-base NNS as VBZ). Both are
# constraint-driven, not golden-specific; held-out web P/R unchanged
# (0.834/0.839 — no held-out sentence triggers either repair).
KNOWN_MISSES: set[str] = set()


def test_nary_golden_pr():
    tp = fn = 0
    misses = []
    stale_known = []
    n_pred = 0
    for sent, kind, a1, rel, a2s in GOLD:
        preds = _predicted(sent)
        n_pred += len(preds)
        want = (kind, a1, rel, tuple(a2s))
        # n-ary attachment lists may extend beyond the labeled prefix
        hit = any(
            p[0] == kind and p[1] == a1 and p[2] == rel
            and p[3][: len(a2s)] == tuple(a2s)
            for p in preds
        )
        if hit:
            tp += 1
            if sent in KNOWN_MISSES:
                stale_known.append(sent)
        else:
            fn += 1
            if sent not in KNOWN_MISSES:
                misses.append((sent[:50], want, sorted(preds)[:3]))
    recall = tp / (tp + fn)
    print(f"nary golden recall {recall:.3f} ({tp}/{tp+fn}), "
          f"{n_pred} predictions over {len(GOLD)} sentences")
    # strict-xfail semantics: every non-known golden must hit, and a
    # known miss that starts passing must be removed from the list
    assert not misses, f"NEW misses: {misses}"
    assert not stale_known, (
        f"now passing — remove from KNOWN_MISSES: {stale_known}")
    assert recall >= 0.9


# (tokens, pos, chunks) hand-built GOLD layers for constructions the
# raw-path tagger currently fumbles ("signed"->IN, "Prize"->IN,
# "close"->RB): these pin the CONSTRUCTION logic itself, independent
# of tagger quality — srlie consumes gold-quality parses the same way.
GIVEN_LAYER_GOLD = [
    (("Marie Curie won the Nobel Prize in 1911 .".split(),
      ["NNP", "NNP", "VBD", "DT", "NNP", "NNP", "IN", "CD", "."],
      ["B-NP", "I-NP", "B-VP", "B-NP", "I-NP", "I-NP", "B-PP", "B-NP", "O"]),
     "T", "Marie Curie", "won", ["the Nobel Prize", "in 1911"]),
    (("Initech signed an agreement to sell the division in May .".split(),
      ["NNP", "VBD", "DT", "NN", "TO", "VB", "DT", "NN", "IN", "NNP", "."],
      ["B-NP", "B-VP", "B-NP", "I-NP", "B-VP", "I-VP", "B-NP", "I-NP",
       "B-PP", "B-NP", "O"]),
     "T", "Initech", "signed an agreement to sell", ["the division", "in May"]),
    (("Regulators required Hooli to divest the subsidiary .".split(),
      ["NNS", "VBD", "NNP", "TO", "VB", "DT", "NN", "."],
      ["B-NP", "B-VP", "B-NP", "B-VP", "I-VP", "B-NP", "I-NP", "O"]),
     "T", "Hooli", "divest", ["the subsidiary"]),
    (("The board ordered Initech to close the plant .".split(),
      ["DT", "NN", "VBD", "NNP", "TO", "VB", "DT", "NN", "."],
      ["B-NP", "I-NP", "B-VP", "B-NP", "B-VP", "I-VP", "B-NP", "I-NP", "O"]),
     "T", "Initech", "close", ["the plant"]),
    (("The Rolling Stones , a rock band , played Hyde Park .".split(),
      ["DT", "NNP", "NNPS", ",", "DT", "NN", "NN", ",", "VBD", "NNP",
       "NNP", "."],
      ["B-NP", "I-NP", "I-NP", "O", "B-NP", "I-NP", "I-NP", "O", "B-VP",
       "B-NP", "I-NP", "O"]),
     "N", "The Rolling Stones", "be", ["a rock band"]),
]


def test_nary_given_layer_constructions():
    """With gold-quality layers every labeled construction must be
    found — misses here are logic bugs, not tagger noise."""
    for (toks, tags, chks), kind, a1, rel, a2s in GIVEN_LAYER_GOLD:
        assert len(toks) == len(tags) == len(chks), (toks, tags, chks)
        join = lambda a, b: " ".join(toks[a:b])
        preds = set()
        base = nary.nary_extract(toks, tags, chks)
        extra = (nary.conj_extract(toks, tags, chks, base)
                 + nary.passive_extract(toks, tags, chks, base)
                 + nary.xcomp_extract(toks, tags, chks, base))
        for e in base + extra:
            preds.add(("T", join(*e.arg1), join(*e.rel),
                       tuple(join(a, b) for a, b in e.arg2s)))
        for ap in nary.appos_extract(toks, tags, chks):
            preds.add(("N", join(*ap.arg1), ap.rel_text, (join(*ap.arg2),)))
        hit = any(
            p[0] == kind and p[1] == a1 and p[2] == rel
            and p[3][: len(a2s)] == tuple(a2s)
            for p in preds
        )
        assert hit, f"{' '.join(toks)!r}: want {(kind, a1, rel, a2s)}, got {sorted(preds)}"
