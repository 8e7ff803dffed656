"""N-ary and noun-mediated extraction — the OpenIE-4 surface (M3).

The reference's second extractor stack (``hadoop/.../ScoobiOpenIE4.
scala:40-42,66-137``) runs SRL ("srlie") n-ary extraction plus the
Relnoun noun-mediated extractor, tagging outputs ``T`` (triple) vs
``N`` (n-ary) for the splitter (M4, ``ScoobiOpenIE4Splitter.scala:
55-60``). Those are JVM libraries; this module reimplements the two
extraction *shapes* on top of our chunk layers:

* ``nary_extract``: a ReVerb binary extraction extended with trailing
  prepositional attachments — "X acquired Y [in 2006] [for $1B]" →
  arg2s = [Y, (in, 2006), (for, $1B)] (the NaryExtraction model,
  ``models/.../NaryExtraction.scala:24-31``).
* ``relnoun_extract``: noun-mediated relations from title/appositive
  patterns — "Initech CEO Bob Smith said" and "Bob Smith , Initech 's
  CEO , said" → (Bob Smith, be CEO of, Initech).
* ``relclause_extract``: srlie's relative-clause depth (the A1-of-the-
  matrix-verb case ``ScoobiOpenIE4.scala:66-137`` gets from the
  dependency parse): in "Marie Curie , who discovered radium , won the
  Nobel Prize", shallow ReVerb attaches the matrix verb to the nearest
  left NP ("radium won the Nobel Prize"); this pass re-attaches matrix-
  clause extractions whose arg1 fell inside a ", who/which ... ,"
  bracket to the clause's head NP (Marie Curie).
* ``conj_extract``: srlie's coordination depth at chunk level —
  coordinated subjects ("Acme and Globex announced X" also yields the
  first conjunct as subject) and shared-subject VP coordination
  ("Acme acquired Globex ... and sold Initech": the post-CC verb's
  subject is re-attached to the pre-CC extraction's subject when the
  shallow pass grabbed the first verb's object).
* ``ccomp_extract``: clausal complements of report/epistemic verbs —
  "The report said that Acme acquired Globex" → (The report, said,
  [that-clause]) with kind ``C``; the clause-internal triple still
  comes out of the plain pass.
* ``passive_extract``: active-voice normalization of agentive
  passives — "Globex was acquired by Acme Corp" also yields
  (Acme Corp, acquired, Globex).

Pure Python; wrapped by ``operators/nary.py``.
"""

from __future__ import annotations

from typing import NamedTuple

from openie_backend_spark.nlp import chunker, reverb

# relational/title nouns that mediate a relation between two NPs
RELATIONAL_NOUNS = frozenset(
    """ceo cfo coo cto chairman chairwoman president director founder
    cofounder owner head chief manager editor author creator inventor
    spokesman spokeswoman spokesperson capital subsidiary unit division
    parent maker partner rival competitor supplier customer employee
    lawyer attorney professor wife husband son daughter father mother
    brother sister mayor governor senator minister king queen leader""".split()
)


class NaryExtraction(NamedTuple):
    arg1: tuple[int, int]
    rel: tuple[int, int]
    arg2s: list[tuple[int, int]]   # first = core arg2, rest = PP attachments


class RelnounExtraction(NamedTuple):
    arg1: tuple[int, int]          # the entity holding the role
    rel_text: str                  # synthesized: "be <noun> of"
    arg2: tuple[int, int]          # the anchor entity


def nary_extract(tokens, pos, chunks, triples=None) -> list[NaryExtraction]:
    """Binary extractions + trailing (P NP)* attachments. ``triples``
    lets the caller pass precomputed ``reverb.extract`` output so the
    expensive pass runs once per sentence."""
    out = []
    n = len(tokens)
    if triples is None:
        triples = reverb.extract(tokens, pos, chunks)
    for e in triples:
        arg2s = [e.arg2]
        i = e.arg2[1]
        while i < n and pos[i] in ("IN", "TO") and tokens[i].lower() not in reverb.SUBORDINATORS:
            j = i + 1
            if j < n and chunks[j] in ("B-NP", "I-NP"):
                k = j + 1
                while k < n and chunks[k] == "I-NP":
                    k += 1
                arg2s.append((i, k))  # attachment includes its preposition
                i = k
            else:
                break
        out.append(NaryExtraction(e.arg1, e.rel, arg2s))
    return out


def _np_spans(chunks):
    return reverb.noun_phrases(chunks)


class RelClauseExtraction(NamedTuple):
    arg1: tuple[int, int]          # the clause's head NP, re-attached
    rel: tuple[int, int]
    arg2: tuple[int, int]


_WH_WORDS = frozenset({"who", "whom", "which", "whose", "that"})
_APPOS_DETS = frozenset({"a", "an", "the"})


def _comma_brackets(tokens, pos, chunks):
    """(head_np, open_comma, close_comma) for each parenthetical the
    matrix clause skips over: ``NP , who/which … ,`` relative clauses
    AND ``NP , a/an/the … ,`` appositives. Shared by the matrix
    re-attachment pass and the appositive-copula pass."""
    n = len(tokens)
    nps = _np_spans(chunks)
    brackets = []
    for i in range(1, n - 1):
        if tokens[i] != ",":
            continue
        nxt = tokens[i + 1].lower()
        is_rel = nxt in _WH_WORDS
        is_appos = nxt in _APPOS_DETS and pos[i + 1] == "DT"
        if not (is_rel or is_appos):
            continue
        head = next(((s, e) for s, e in nps if e == i), None)
        if head is None:
            continue
        close = next((j for j in range(i + 2, n) if tokens[j] == ","), None)
        if close is None:
            continue
        # clause-internal place-name commas ("born in Sandringham ,
        # England ,") do not close the bracket — same surface rule as
        # the tagger's relclause splice, so both bracket the same span
        close = chunker.skip_appositive_commas(tokens, close)
        # an APPOSITIVE bracket is a verbless NP description; a span
        # containing a verb phrase is a clause ("In March , the company
        # hired Jane Doe , analysts said") — not an appositive, and
        # re-attaching across it would be wrong too. Relative-clause
        # (wh) brackets contain VPs by design.
        if is_appos and any(
            chunks[k] in ("B-VP", "I-VP") for k in range(i + 1, close)
        ):
            continue
        brackets.append((head, i, close))
    return brackets


def relclause_extract(tokens, pos, chunks, triples=None) -> list[RelClauseExtraction]:
    """Matrix-verb re-attachment across ``NP , who/which … ,``
    relative-clause brackets AND ``NP , a/an/the … ,`` appositive
    brackets (see module docstring). In "Initech , a software company
    from Springfield , hired Jane Doe" the shallow pass attaches the
    matrix verb to the appositive NP ("a software company hired Jane
    Doe"); this pass re-attaches it to the bracket's head NP. Emits
    only the CORRECTED matrix extraction — the clause-internal triple
    ("Marie Curie discovered radium") already comes out of the plain
    ReVerb pass."""
    n = len(tokens)
    out = []
    brackets = _comma_brackets(tokens, pos, chunks)
    if not brackets:
        return out
    if triples is None:
        triples = reverb.extract(tokens, pos, chunks)
    for e in triples:
        for head, open_c, close_c in brackets:
            # matrix verb after the bracket, arg1 wrongly inside it
            if (
                e.rel[0] > close_c
                and open_c < e.arg1[0] < close_c
                and e.arg2[0] > close_c
            ):
                out.append(RelClauseExtraction(head, e.rel, e.arg2))
                break
    return out


def appos_extract(tokens, pos, chunks) -> list[RelnounExtraction]:
    """Appositive copulas (the srlie appositive family,
    ``ScoobiOpenIE4.scala:66-137`` via the parse's appos arcs):
    ``NP1 , a/an/the … ,`` asserts (NP1, be, appositive-NP) —
    "Bob Smith , a veteran lawyer , joined the board" → (Bob Smith,
    be, a veteran lawyer). The appositive span runs from the
    determiner to the closing comma, so attached PPs ride along
    ("a software company from Springfield"). The head NP must contain
    a proper noun — list constructions over common nouns don't
    appositive-copy. The role-of shape ("CEO of Initech") stays owned
    by relnoun pattern C, which emits the richer (be ceo of, Org)."""
    out = []
    for head, open_c, close_c in _comma_brackets(tokens, pos, chunks):
        nxt = tokens[open_c + 1].lower()
        if nxt not in _APPOS_DETS:          # wh-bracket = relative clause
            continue
        if not any(pos[k].startswith("NNP") for k in range(head[0], head[1])):
            continue
        # relnoun pattern C owns "(DT)? role of Org" appositives
        j = open_c + 2
        if (
            j < close_c
            and tokens[j].lower() in RELATIONAL_NOUNS
            and j + 1 < close_c
            and tokens[j + 1].lower() == "of"
        ):
            continue
        if close_c - (open_c + 1) < 2:      # a bare determiner is not a claim
            continue
        out.append(RelnounExtraction(head, "be", (open_c + 1, close_c)))
    return out


# object-control verbs: the matrix OBJECT is the understood subject of
# the infinitive ("X persuaded Y to sell Z" -> Y sells Z). Closed class
# keeps chunk-level precision; promise-class subject control excluded.
CONTROL_VERBS = frozenset(
    """persuade persuaded persuades ask asked asks urge urged urges
    order ordered orders convince convinced convinces encourage
    encouraged encourages force forced forces allow allowed allows
    require required requires advise advised advises tell told tells
    invite invited invites pressure pressured pressures""".split()
)


def xcomp_extract(tokens, pos, chunks, base=None) -> list[NaryExtraction]:
    """Infinitival complements after the core object (srlie's xcomp
    depth). For a base extraction (S, V1, O) whose core arg2 is
    immediately followed by a ``to VB…`` verb phrase with its own
    object:

    * extended relation — (S, "V1 O to V2", O2 + attachments):
      "Hooli announced plans to acquire Pied Piper" →
      (Hooli, announced plans to acquire, Pied Piper). ReVerb's
      longest V W* P chain stops at the NP, so this n-ary row is new.
    * object control — when V1 is a control verb, the matrix object is
      the infinitive's subject: "Acme persuaded Globex to sell the
      unit" → (Globex, sell, the unit).
    """
    if base is None:
        base = nary_extract(tokens, pos, chunks)
    n = len(tokens)
    out = []
    for e in base:
        o_end = e.arg2s[0][1]
        # "to" starting a fresh VP right after the object NP
        if not (o_end < n and pos[o_end] == "TO" and chunks[o_end] == "B-VP"):
            continue
        v_end = o_end + 1
        while v_end < n and chunks[v_end] == "I-VP":
            v_end += 1
        # the word after "to" inside a VP chunk is a verb even when the
        # tagger mislabels it (chunker commitment > POS label here)
        if v_end == o_end + 1:
            continue
        # the infinitive's own object NP (+ trailing PP attachments)
        if not (v_end < n and chunks[v_end] == "B-NP"):
            continue
        k = v_end + 1
        while k < n and chunks[k] == "I-NP":
            k += 1
        arg2s = [(v_end, k)]
        i = k
        while i < n and pos[i] in ("IN", "TO") and tokens[i].lower() not in reverb.SUBORDINATORS:
            j = i + 1
            if j < n and chunks[j] in ("B-NP", "I-NP"):
                m = j + 1
                while m < n and chunks[m] == "I-NP":
                    m += 1
                arg2s.append((i, m))
                i = m
            else:
                break
        # extended relation: V1 chain + object + "to V2" as one span
        out.append(NaryExtraction(e.arg1, (e.rel[0], v_end), arg2s))
        # object control: matrix object is the infinitive's subject
        last_verb = next(
            (tokens[i].lower() for i in range(e.rel[1] - 1, e.rel[0] - 1, -1)
             if pos[i].startswith("VB")),
            None,
        )
        if last_verb in CONTROL_VERBS:
            out.append(NaryExtraction(e.arg2s[0], (o_end + 1, v_end), arg2s))
    return out


def conj_extract(tokens, pos, chunks, base=None) -> list[NaryExtraction]:
    """Coordination repairs (chunk-level analog of srlie's conj
    arguments). Emits only EXTRA rows; the base extractions stand.

    * Coordinated subjects — ``NP1 CC NP2 V …``: the shallow pass
      yields only the nearest conjunct (NP2); emit a copy with NP1.
    * Shared-subject VP coordination — ``NP V1 O1 … CC V2 O2``: the
      shallow pass gives V2 the nearest left NP, which may be V1's
      object ("Acme acquired Globex in 2006 and sold Initech" →
      "Globex sold Initech"); when V2's chosen subject sits inside a
      pre-CC extraction's object/attachment region, emit a copy with
      that extraction's subject.
    """
    if base is None:
        base = nary_extract(tokens, pos, chunks)
    nps = _np_spans(chunks)
    out: list[NaryExtraction] = []
    seen = {(e.arg1, e.rel[0], e.rel[1]) for e in base}

    def emit(arg1, e):
        key = (arg1, e.rel[0], e.rel[1])
        if key not in seen:
            seen.add(key)
            out.append(NaryExtraction(arg1, e.rel, e.arg2s))

    for e in base:
        s = e.arg1[0]
        # subject coordination: NP' and [arg1 ... — conjunction only:
        # "Acme or Globex announced X" does not assert (Acme,
        # announced, X), so 'or'/'nor' must not fire this repair
        if s >= 2 and pos[s - 1] == "CC" and tokens[s - 1].lower() == "and":
            np1 = next(((a, b) for a, b in nps if b == s - 1), None)
            if np1 is not None:
                emit(np1, e)
        # VP coordination: CC immediately left of this rel's verb
        # chain; 'and'/'but' share the subject ("acquired X but sold
        # Y"), disjunctions stay out for the same reason as above
        j = e.rel[0] - 1
        if j >= 1 and pos[j] == "CC" and tokens[j].lower() in ("and", "but"):
            donors = [
                d for d in base
                if d.rel[1] <= j and d.arg1[1] <= d.rel[0]
                and any(a <= e.arg1[0] < b for a, b in d.arg2s)
            ]
            if donors:
                donor = max(donors, key=lambda d: d.rel[0])
                emit(donor.arg1, e)
    return out


_BE_FORMS = frozenset({"be", "is", "are", "was", "were", "been", "being"})


def passive_extract(tokens, pos, chunks, base=None) -> list[NaryExtraction]:
    """Active-voice normalization of agentive passives (srlie emits
    the role-normalized form from the parse): a base extraction whose
    relation is ``be-form … VBN … by`` — "Globex was acquired by Acme
    Corp in 2006" → (Globex, was acquired by, Acme Corp) — also yields
    the active triple (Acme Corp, acquired, [Globex, in 2006]).
    Agentless passives (no ``by``) have no recoverable agent and pass
    through untouched."""
    if base is None:
        base = nary_extract(tokens, pos, chunks)
    out = []
    for e in base:
        r0, r1 = e.rel
        if r1 - r0 < 3 or not e.arg2s:
            continue
        if tokens[r0].lower() not in _BE_FORMS:
            continue
        if tokens[r1 - 1].lower() != "by":
            continue
        vbn = next((i for i in range(r0 + 1, r1 - 1) if pos[i] == "VBN"), None)
        if vbn is None:
            continue
        # active rel = the participle span up to (not incl.) "by"
        out.append(NaryExtraction(e.arg2s[0], (vbn, r1 - 1),
                                  [e.arg1] + e.arg2s[1:]))
    return out


class CcompExtraction(NamedTuple):
    arg1: tuple[int, int]          # matrix subject NP
    rel: tuple[int, int]           # matrix verb chain
    arg2: tuple[int, int]          # complement clause, from "that"


# report/epistemic verbs that take that-clause complements (srlie gets
# these from the parse; a closed class keeps chunk-level precision)
CCOMP_VERBS = frozenset(
    """say said says saying announce announced announces report reported
    reports claim claimed claims believe believed believes state stated
    states note noted notes add added adds argue argued argues warn
    warned warns confirm confirmed confirms deny denied denies suggest
    suggested suggests show showed shows shown find found finds think
    thought thinks know knew knows insist insisted insists estimate
    estimated estimates reveal revealed reveals""".split()
)


def ccomp_extract(tokens, pos, chunks) -> list[CcompExtraction]:
    """``NP V[report-class] that S`` → (NP, V, that-clause)."""
    n = len(tokens)
    nps = _np_spans(chunks)
    out = []
    for i in range(n - 2):
        if chunks[i] != "B-VP":
            continue
        k = i + 1
        while k < n and chunks[k] == "I-VP":
            k += 1
        if tokens[k - 1].lower() not in CCOMP_VERBS:
            continue
        if k >= n or tokens[k].lower() != "that":
            continue
        subj = next(((a, b) for a, b in nps if b == i), None)
        if subj is None:
            continue
        end = n
        while end > k and pos[end - 1] in (".", ",", ":"):
            end -= 1
        if end - k < 4:  # complementizer + a real clause
            continue
        out.append(CcompExtraction(subj, (i, k), (k, end)))
    return out


def relnoun_extract(tokens, pos, chunks) -> list[RelnounExtraction]:
    """Noun-mediated relations.

    Pattern A (title):       [Org NNP+] [role-noun] [Person NNP+]
                             within one NP chunk: "Initech CEO Bob Smith"
    Pattern B (possessive):  [Org] 's [role-noun] , [Person] ,
    Pattern C (appositive):  [Person] , [Org] ('s)? [role-noun] , ...
    """
    out = []
    nps = _np_spans(chunks)
    n = len(tokens)
    for s, e in nps:
        # pattern A: inside a single NP — NNP+ role NNP+
        for m in range(s + 1, e - 1):
            if tokens[m].lower() in RELATIONAL_NOUNS and pos[m].startswith("NN"):
                left_ok = all(pos[k] == "NNP" for k in range(s, m))
                right_ok = all(pos[k] == "NNP" for k in range(m + 1, e))
                if left_ok and right_ok and m > s and m + 1 < e:
                    out.append(
                        RelnounExtraction(
                            (m + 1, e), f"be {tokens[m].lower()} of", (s, m)
                        )
                    )
    # pattern B: [NP1] 's [role] (,)? [NP2] — the possessor NP and the
    # role noun usually share one chunk ("Hooli 's founder")
    for i in range(n - 2):
        if tokens[i] == "'s" and pos[i] == "POS":
            if i + 1 < n and tokens[i + 1].lower() in RELATIONAL_NOUNS:
                holder = next(((s, e) for s, e in nps if s <= i < e or e == i), None)
                if holder is None or holder[0] >= i:
                    continue
                left = (holder[0], i)
                j = i + 2
                if j < n and tokens[j] == ",":
                    j += 1
                right = next(((s, e) for s, e in nps if s == j), None)
                if right:
                    out.append(
                        RelnounExtraction(
                            right, f"be {tokens[i + 1].lower()} of", left
                        )
                    )
    # pattern C (appositive-of, relnoun's appositive family):
    # [Person NP] , (DT)? [role] of [Org NP] (,|.)
    # "Bob Smith , CEO of Initech , resigned" →
    # (Bob Smith, be ceo of, Initech)
    for i in range(1, n - 3):
        if tokens[i] != ",":
            continue
        left = next(((s, e) for s, e in nps if e == i), None)
        if left is None:
            continue
        j = i + 1
        if j < n and pos[j] == "DT":
            j += 1
        if not (j < n and tokens[j].lower() in RELATIONAL_NOUNS
                and pos[j].startswith("NN")):
            continue
        if not (j + 1 < n and tokens[j + 1].lower() == "of"):
            continue
        # the org NP either starts after "of", or the chunker merged
        # "role of Org" into one NP (of tagged IN but chunked I-NP)
        right = next(((s, e) for s, e in nps if s == j + 2), None)
        if right is None:
            merged = next(((s, e) for s, e in nps if s <= j and e > j + 2), None)
            if merged is not None:
                right = (j + 2, merged[1])
        if right is None:
            continue
        out.append(
            RelnounExtraction(left, f"be {tokens[j].lower()} of", right)
        )
    return out
