"""POS-keyed English lemmatizer + normalization keys.

Reimplements the *semantics* of the reference's ``TaggedStemmer``
(``models/.../util/TaggedStemmer.scala:33-61``), which wraps the Morpha
lexicon-based stemmer: verbs and plural nouns are lemmatized using the
POS tag; proper nouns pass through (Morpha receives tag "NP" for NNP*,
``TaggedStemmer.scala:36-40``) except NNPS, whose plural is stripped by
an explicit rule (``:52-57``). Morpha's 300k-entry lexicon is not
public; we use the same irregular-form tables every English morphology
module shares plus standard suffix rules, which agree with Morpha on
the regular vocabulary.

Also provides the reference's grouping keys:

* index key (``ReVerbExtraction.scala:56-69,117``): drop determiners
  {a, an, the, these, those, this, that, which, what}, stem each token
  by POS, lowercase, space-join;
* frontend key (``:71-74,119-121``): additionally strip modifier POS
  {JJ, JJR, JJS, RB, RBR, RBS, VBG, PRP$, WDT, WP} unless the token is
  in the keep-list;
* head key (``:76-91``): determiner+modifier strip, no stemming;
* lnrm (``linker/.../util/CrosswikisHandler.java:23-29``): NFD →
  strip combining marks → lowercase → strip non-alphanumerics.

Pure Python; wrapped in Arrow-batched pandas UDFs by
``openie_backend_spark.functions.norm``.
"""

from __future__ import annotations

import unicodedata

STRIPPED_DETERMINERS = frozenset(
    {"a", "an", "the", "these", "those", "this", "that", "which", "what"}
)
MODIFIER_TAGS_TO_STRIP = frozenset(
    {"JJ", "JJR", "JJS", "RB", "RBR", "RBS", "VBG", "PRP$", "WDT", "WP"}
)
MODIFIERS_TO_KEEP = frozenset(
    {"n't", "not", "no", "as", "rarely", "never", "none", "ought",
     "would", "could", "should", "all"}
)

# Irregular verb past/participle → lemma (the high-frequency closed set).
_IRREG_VERBS = {
    "was": "be", "were": "be", "been": "be", "is": "be", "are": "be",
    "am": "be", "'s": "be", "'re": "be", "'m": "be",
    "had": "have", "has": "have", "'ve": "have", "'d": "have",
    "did": "do", "does": "do", "done": "do",
    "said": "say", "made": "make", "went": "go", "gone": "go",
    "took": "take", "taken": "take", "came": "come", "got": "get",
    "gotten": "get", "gave": "give", "given": "give", "found": "find",
    "thought": "think", "told": "tell", "became": "become",
    "showed": "show", "shown": "show", "left": "leave", "felt": "feel",
    "put": "put", "brought": "bring", "began": "begin", "begun": "begin",
    "kept": "keep", "held": "hold", "wrote": "write", "written": "write",
    "stood": "stand", "heard": "hear", "let": "let", "meant": "mean",
    "set": "set", "met": "meet", "ran": "run", "paid": "pay",
    "sat": "sit", "spoke": "speak", "spoken": "speak", "lay": "lie",
    "led": "lead", "read": "read", "grew": "grow", "grown": "grow",
    "lost": "lose", "fell": "fall", "fallen": "fall", "sent": "send",
    "built": "build", "understood": "understand", "drew": "draw",
    "drawn": "draw", "broke": "break", "broken": "break",
    "spent": "spend", "cut": "cut", "rose": "rise", "risen": "rise",
    "drove": "drive", "driven": "drive", "bought": "buy", "wore": "wear",
    "worn": "wear", "chose": "choose", "chosen": "choose",
    "sought": "seek", "threw": "throw", "thrown": "throw",
    "caught": "catch", "dealt": "deal", "won": "win", "forgot": "forget",
    "forgotten": "forget", "laid": "lay", "flew": "fly", "flown": "fly",
    "sold": "sell", "struck": "strike", "swore": "swear", "sworn": "swear",
    "taught": "teach", "tore": "tear", "torn": "tear", "woke": "wake",
    "bore": "bear", "borne": "bear", "bound": "bind", "bit": "bite",
    "bitten": "bite", "blew": "blow", "blown": "blow", "bred": "breed",
    "burst": "burst", "cast": "cast", "cost": "cost", "crept": "creep",
    "dug": "dig", "fed": "feed", "fought": "fight", "froze": "freeze",
    "frozen": "freeze", "hid": "hide", "hidden": "hide", "hit": "hit",
    "hurt": "hurt", "knew": "know", "known": "know", "lent": "lend",
    "lit": "light", "quit": "quit", "rode": "ride", "ridden": "ride",
    "rang": "ring", "rung": "ring", "sang": "sing", "sung": "sing",
    "sank": "sink", "sunk": "sink", "slept": "sleep", "slid": "slide",
    "spun": "spin", "split": "split", "spread": "spread",
    "sprang": "spring", "sprung": "spring", "stole": "steal",
    "stolen": "steal", "stuck": "stick", "stung": "sting",
    "swam": "swim", "swum": "swim", "swept": "sweep", "swung": "swing",
    "wound": "wind", "shook": "shake", "shaken": "shake", "shot": "shoot",
    "shut": "shut", "saw": "see", "seen": "see", "ate": "eat",
    "eaten": "eat", "beat": "beat", "beaten": "beat", "became": "become",
    "arose": "arise", "arisen": "arise", "awoke": "awake",
    "fled": "flee", "clung": "cling", "sped": "speed", "wept": "weep",
    "strove": "strive", "striven": "strive", "shone": "shine",
    "slew": "slay", "slain": "slay", "trod": "tread", "spat": "spit",
    "shed": "shed", "hung": "hang", "hanged": "hang", "sprung": "spring",
    "underwent": "undergo", "undergone": "undergo", "undertook": "undertake",
    "undertaken": "undertake", "withdrew": "withdraw", "withdrawn": "withdraw",
    "overcame": "overcome", "oversaw": "oversee", "overseen": "oversee",
    "outgrew": "outgrow", "foresaw": "foresee", "foreseen": "foresee",
    "pleaded": "plead", "pled": "plead", "rebuilt": "rebuild",
    "repaid": "repay", "reread": "reread", "resold": "resell",
    "rethought": "rethink", "retook": "retake", "rewrote": "rewrite",
    "rewritten": "rewrite", "upheld": "uphold", "misled": "mislead",
}

_IRREG_PLURALS = {
    "men": "man", "women": "woman", "children": "child", "people": "person",
    "feet": "foot", "teeth": "tooth", "geese": "goose", "mice": "mouse",
    "lives": "life", "wives": "wife", "knives": "knife", "leaves": "leaf",
    "halves": "half", "shelves": "shelf", "selves": "self",
    "wolves": "wolf", "loaves": "loaf", "thieves": "thief",
    "calves": "calf", "scarves": "scarf", "indices": "index",
    "analyses": "analysis", "bases": "basis", "crises": "crisis",
    "theses": "thesis", "hypotheses": "hypothesis", "media": "medium",
    "data": "datum", "criteria": "criterion", "phenomena": "phenomenon",
    "oxen": "ox", "axes": "axis", "matrices": "matrix",
    "appendices": "appendix", "vertices": "vertex",
}

# -s forms that are not plurals/3sg (keep as-is)
_S_EXCEPTIONS = frozenset(
    {"is", "was", "has", "its", "this", "as", "us", "his", "hers",
     "theirs", "ours", "yours", "series", "species", "news", "means",
     "physics", "economics", "politics", "athletics", "mathematics",
     "gas", "bus", "plus", "minus", "census", "campus", "status",
     "bonus", "virus", "crisis", "basis", "analysis", "canvas",
     "christmas", "atlas", "bias", "lens", "yes", "less", "unless",
     "perhaps", "always", "besides", "thus", "various", "previous"}
)

_VOWELS = "aeiou"

_DOUBLED = frozenset(
    {"bb", "dd", "gg", "ll", "mm", "nn", "pp", "rr", "tt", "zz"}
)

# Common verb lemmas used to disambiguate e-restoration after suffix
# stripping (the role Morpha's lexicon plays). Candidates generated by
# the rules are checked against this set; rules decide only for
# out-of-lexicon words.
_VERB_LEMMAS = frozenset(
    """be have do say make go take come see get know think look want give
    use find tell ask work seem feel try leave call need become mean keep
    let begin help talk turn start show hear play run move like live
    believe hold bring happen write provide sit stand lose pay meet
    include continue set learn change lead understand watch follow stop
    create speak read allow add spend grow open walk win offer remember
    love consider appear buy wait serve die send expect build stay fall
    cut reach kill remain suggest raise pass sell require report decide
    pull return explain hope develop carry break receive agree support
    hit produce eat cover catch draw choose cause point listen realize
    place close involve increase decrease form name base note state acquire
    announce complete elect found launch establish discover invent
    publish direct compose design manage operate border locate sign
    join visit study employ represent contain supply own marry reduce
    calculate use seek argue prove wear teach train plan claim enjoy
    describe drive occur apply push share thank accept admit affect
    attack avoid beat blame burn charge check compare complain concern
    confirm connect consist count cross dance deliver demand deny
    depend destroy disappear discuss divide dress drop earn emerge
    enable encourage enter examine exist expand experience express
    extend face fail fit fix fly focus force forget gain generate
    handle hang hate head hide hurt identify ignore imagine improve
    indicate influence inform intend introduce invest invite issue
    jump knock laugh lay lie lift limit link love maintain mark
    matter measure mention mind miss mix notice obtain order
    organize pack paint perform pick prefer prepare present press
    prevent promise promote protect publish pursue put raise rate
    record refer reflect refuse regard relate release rely remove
    repeat replace reply respond rest result retire reveal ring rise
    roll save score seat secure select settle shake shift shoot shout
    sing sleep slip smile sort sound spread spring stare stick
    strike succeed suffer suit survive switch talk tend test throw
    touch travel treat trust undergo undertake vote warn wash
    welcome wish wonder worry merge pump tout insert oversee strip
    redeem convert underwrite reflect transfer appeal condemn mount
    collect adopt disrupt reject blame post ease overwhelm clear
    hold control succeed describe drop replace put order read rise
    grow decline fell fall tighten push keep stamp code rely welcome
    supply defend avoid justify approve oppose ask fill declare""".split()
)


def _strip_plural(w: str) -> str:
    """Singularize a regular plural noun (lowercase input)."""
    if w in _IRREG_PLURALS:
        return _IRREG_PLURALS[w]
    if w in _S_EXCEPTIONS or len(w) < 3 or not w.endswith("s"):
        return w
    if w.endswith("ss") or w.endswith("us") or w.endswith("is"):
        return w
    if w.endswith("ies") and len(w) > 4 and w[-4] not in _VOWELS:
        return w[:-3] + "y"
    if w.endswith(("ches", "shes", "xes", "zes", "sses")):
        return w[:-2]
    if w.endswith("oes") and len(w) > 4:
        return w[:-2]
    if w.endswith("ves") and w[:-3] + "f" in ("leaf", "loaf"):  # rare; irregulars cover most
        return w[:-3] + "f"
    return w[:-1]


def _resolve(cands: list[str], fallback: str) -> str:
    for c in cands:
        if c in _VERB_LEMMAS or c in _IRREG_VERBS.values():
            return c
    return fallback


def _stem_verb(w: str) -> str:
    """Lemmatize a verb form (lowercase input). Candidates from the
    standard orthographic rules are checked against the lemma lexicon;
    out-of-lexicon words fall back to the most conservative rule."""
    if w in _IRREG_VERBS:
        return _IRREG_VERBS[w]
    if w in _VERB_LEMMAS:
        return w
    n = len(w)
    if w.endswith("ies") and n > 4:
        return w[:-3] + "y"
    if w.endswith(("ches", "shes", "sses", "xes", "zes", "oes")) and n > 4:
        return _resolve([w[:-2], w[:-1]], w[:-2])
    if w.endswith("es") and n > 3:
        return _resolve([w[:-1], w[:-2]], w[:-1])
    if w.endswith("s") and not w.endswith("ss") and n > 3:
        return w[:-1]
    if w.endswith("ied") and n > 4:
        return _resolve([w[:-3] + "y", w[:-1], w[:-2]], w[:-3] + "y")
    if w.endswith("eed") and n > 4:
        return w[:-1]  # agreed → agree
    if w.endswith("ed") and n > 3:
        stem = w[:-2]
        cands = [stem, stem + "e"]
        if stem[-2:] in _DOUBLED and len(stem) > 3:
            cands.insert(0, stem[:-1]) if stem[:-1] in _VERB_LEMMAS else cands.append(stem[:-1])
        return _resolve(cands, stem)
    if w.endswith("ing") and n > 4:
        stem = w[:-3]
        cands = [stem, stem + "e"]
        if stem[-2:] in _DOUBLED and len(stem) > 3:
            cands.insert(0, stem[:-1]) if stem[:-1] in _VERB_LEMMAS else cands.append(stem[:-1])
        return _resolve(cands, stem)
    return w


def stem_token(word: str, tag: str) -> str:
    """Stem one token given its Penn Treebank POS tag.

    Mirrors ``TaggedStemmer.stem``: NNP passes through unchanged
    (mapped to Morpha tag "NP"), NNPS gets the explicit plural strip
    (``TaggedStemmer.scala:52-57``); verbs and common plurals
    lemmatize; everything else passes through.
    """
    w = word.lower()
    if tag == "NNPS":
        # reference post-fix: strip -es / -s from the (unchanged) form
        if w.endswith("es") and len(w) > 2:
            return word[: len(word) - 2]
        if w.endswith("s"):
            return word[: len(word) - 1]
        return word
    if tag.startswith("NNP"):
        return word
    if tag.startswith("VB") or tag == "MD":
        return _stem_verb(w)
    if tag == "NNS":
        return _strip_plural(w)
    return word


def index_key_part(tokens: list[str], tags: list[str]) -> str:
    """Normalized key for one of arg1/rel/arg2 (index grouping key)."""
    out = []
    for w, t in zip(tokens, tags):
        if w.lower() in STRIPPED_DETERMINERS:
            continue
        out.append(stem_token(w, t).lower())
    return " ".join(out)


def frontend_key_part(tokens: list[str], tags: list[str]) -> str:
    """Frontend grouping key: index key + modifier strip."""
    out = []
    for w, t in zip(tokens, tags):
        lw = w.lower()
        if lw in STRIPPED_DETERMINERS:
            continue
        if t in MODIFIER_TAGS_TO_STRIP and lw not in MODIFIERS_TO_KEEP:
            continue
        out.append(stem_token(w, t).lower())
    return " ".join(out)


def head_phrase(tokens: list[str], tags: list[str]) -> str:
    """Determiner+modifier strip, no stemming (``getHead``)."""
    out = []
    for w, t in zip(tokens, tags):
        lw = w.lower()
        if lw in STRIPPED_DETERMINERS:
            continue
        if t in MODIFIER_TAGS_TO_STRIP and lw not in MODIFIERS_TO_KEEP:
            continue
        out.append(w)
    return " ".join(out)


def lnrm(text: str) -> str:
    """CrossWikis anchor normalization: NFD, strip diacritics,
    lowercase, keep only alphanumerics."""
    decomposed = unicodedata.normalize("NFD", text)
    return "".join(
        c.lower()
        for c in decomposed
        if not unicodedata.combining(c) and c.isalnum()
    )
