"""Train the averaged-perceptron POS tagger for the raw-text path and
report the round-3 'done' gates (VERDICT r2 #1):

* POS accuracy on HELD-OUT web sentences (never seen in training,
  drawn from test-groups.txt — NOT TestReVerbExtractions.txt);
* raw-path triple P/R on those held-out sentences, measured against
  the given-layer path (our extractor over the reference's gold
  POS/chunk layers, itself parity-gated at P=0.963/R=0.984 vs the
  reference's own extractions).

Training data = the tagged sentence layers the reference ships:
``test-groups.txt`` instance blocks (~3.8k distinct web sentences with
OpenNLP POS+chunk layers) and ``TestReVerbExtractions.txt`` (WSJ-style;
all of it trains — the parity harness reads gold layers, so no
leakage into any raw-path gate). The held-out split is deterministic:
md5 of the joined tokens, first hex char in {0,1} (≈1/8).

Writes ``openie_backend_spark/nlp/tagger_model.json.gz``.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openie_backend_spark.nlp.perceptron import (
    CHUNKER_MODEL_PATH,
    MODEL_PATH,
    PerceptronChunker,
    PerceptronTagger,
)

GROUPS = (
    "/root/reference/models/src/main/resources/edu/knowitall/openie/models/"
    "test-groups.txt"
)
REVERB = (
    "/root/reference/models/src/main/resources/edu/knowitall/openie/models/"
    "TestReVerbExtractions.txt"
)


def parse_group_sentences(path: str) -> dict[tuple[str, ...], tuple[list[str], list[str]]]:
    """Distinct (tokens) → (pos, chunks) from every instance block."""
    sents: dict[tuple[str, ...], tuple[list[str], list[str]]] = {}
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            c = line.rstrip("\n").split("\t")
            if len(c) < 16:
                continue
            i = 7
            while i + 9 <= len(c):
                toks = c[i + 3].split(" ")
                pos = c[i + 4].split(" ")
                chk = c[i + 5].split(" ")
                if len(toks) == len(pos) == len(chk) and len(toks) > 3:
                    sents[tuple(toks)] = (pos, chk)
                i += 9
    return sents


def parse_reverb_sentences(path: str) -> dict[tuple[str, ...], tuple[list[str], list[str]]]:
    sents: dict[tuple[str, ...], tuple[list[str], list[str]]] = {}
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            c = line.rstrip("\n").split("\t")
            if len(c) < 6:
                continue
            toks, pos, chk = c[3].split(" "), c[4].split(" "), c[5].split(" ")
            if len(toks) == len(pos) == len(chk) and len(toks) > 3:
                sents[tuple(toks)] = (pos, chk)
    return sents


def is_heldout(toks: tuple[str, ...]) -> bool:
    return hashlib.md5(" ".join(toks).encode()).hexdigest()[0] in "01"


# Anchor tokens whose tag is essentially deterministic; a sentence
# whose anchors mostly disagree has SHIFTED gold layers (a handful of
# test-groups rows are corrupt this way — e.g. the 'UC users only The/``'
# row where every tag is offset by 3). Those rows poison training and
# the held-out metric alike, so both sides drop them.
_ANCHOR_TAGS = {
    ".": {"."}, ",": {","}, "the": {"DT"}, "a": {"DT"},
    "of": {"IN"}, "and": {"CC"}, "to": {"TO", "IN"},
}


def layer_quality(toks, pos) -> float:
    n = ok = 0
    for w, t in zip(toks, pos):
        exp = _ANCHOR_TAGS.get(w if w in (".", ",") else w.lower())
        if exp:
            n += 1
            ok += t in exp
    return ok / n if n >= 3 else 1.0


def drop_corrupt(sents):
    return {k: v for k, v in sents.items() if layer_quality(k, v[0]) >= 0.75}


def triple_prf(
    tagger: PerceptronTagger, chunker_model: PerceptronChunker, heldout
) -> tuple[float, float, int, int]:
    """Raw-path vs given-layer extraction agreement on held-out
    sentences: P = |raw ∩ given|/|raw|, R = .../|given| over
    (arg1, rel, arg2) span triples."""
    from openie_backend_spark.nlp import reverb

    tp = fp = fn = 0
    for toks_t, (gold_pos, gold_chk) in heldout.items():
        toks = list(toks_t)
        given = {
            (e.arg1, e.rel, e.arg2)
            for e in reverb.extract(toks, gold_pos, gold_chk)
        }
        pred_pos = tagger.tag(toks)
        pred_chk = chunker_model.chunk(toks, pred_pos)
        raw = {
            (e.arg1, e.rel, e.arg2)
            for e in reverb.extract(toks, pred_pos, pred_chk)
        }
        tp += len(raw & given)
        fp += len(raw - given)
        fn += len(given - raw)
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    return p, r, tp + fp, tp + fn


def main() -> None:
    web_all = parse_group_sentences(GROUPS)
    web = drop_corrupt(web_all)
    wsj = drop_corrupt(parse_reverb_sentences(REVERB))
    print(f"dropped {len(web_all) - len(web)} corrupt-layer sentences")
    heldout = {k: v for k, v in web.items() if is_heldout(k)}
    train_web = {k: v for k, v in web.items() if not is_heldout(k)}
    train = [(list(k), v[0]) for k, v in train_web.items()]
    train += [(list(k), v[0]) for k, v in wsj.items()]
    print(f"train sentences: {len(train)} (web {len(train_web)}, wsj {len(wsj)}); "
          f"held-out web: {len(heldout)}")

    history = os.environ.get("HISTORY", "gold")
    tagger = PerceptronTagger()
    tagger.train(train, epochs=int(os.environ.get("EPOCHS", "8")),
                 history=history)

    # POS accuracy on held-out web sentences
    ok = tot = 0
    for toks_t, (gold_pos, _) in heldout.items():
        pred = tagger.tag(list(toks_t))
        ok += sum(1 for a, b in zip(pred, gold_pos) if a == b)
        tot += len(gold_pos)
    acc = ok / tot
    print(f"held-out POS accuracy: {acc:.4f} ({ok}/{tot})")

    # Chunker training uses JACKKNIFED predicted POS (4-fold: each
    # fold's tags predicted by a tagger trained on the other folds) so
    # the chunker sees the same tag-error distribution at train time
    # that it will see at inference — plus the gold-POS view, which
    # anchors the clean-tag behavior.
    all_train = [(list(k), v[0], v[1]) for k, v in train_web.items()]
    all_train += [(list(k), v[0], v[1]) for k, v in wsj.items()]
    folds = 4
    jack: list[tuple[list[str], list[str], list[str]]] = []
    for f in range(folds):
        fold_train = [
            (t, p) for i, (t, p, _) in enumerate(all_train) if i % folds != f
        ]
        ft = PerceptronTagger()
        ft.train(fold_train, epochs=max(4, int(os.environ.get("EPOCHS", "8")) // 2),
                 history=history)
        for i, (t, _, chk) in enumerate(all_train):
            if i % folds == f:
                jack.append((t, ft.tag(t), chk))
    chk_train = [(t, p, c) for t, p, c in all_train] + jack
    chunker_model = PerceptronChunker()
    chunker_model.train(chk_train, epochs=int(os.environ.get("EPOCHS", "8")),
                        history=history)

    cok = ctot = 0
    for toks_t, (gold_pos, gold_chk) in heldout.items():
        pred = chunker_model.chunk(list(toks_t), gold_pos)
        cok += sum(1 for a, b in zip(pred, gold_chk) if a == b)
        ctot += len(gold_chk)
    print(f"held-out chunk accuracy (gold POS): {cok/ctot:.4f} ({cok}/{ctot})")

    p, r, n_raw, n_given = triple_prf(tagger, chunker_model, heldout)
    print(f"held-out raw-vs-given triple P={p:.4f} R={r:.4f} "
          f"(raw {n_raw}, given {n_given})")

    if os.environ.get("SAVE", "1") != "0":
        tagger.save(MODEL_PATH)
        chunker_model.save(CHUNKER_MODEL_PATH)
    else:
        print("SAVE=0: models NOT written")
        return
    print(f"models written: {MODEL_PATH} "
          f"({os.path.getsize(MODEL_PATH) / 1024:.0f} KiB, "
          f"{len(tagger.weights)} features, "
          f"{len(tagger.single_tag)} single-tag words); "
          f"{CHUNKER_MODEL_PATH} "
          f"({os.path.getsize(CHUNKER_MODEL_PATH) / 1024:.0f} KiB)")


if __name__ == "__main__":
    main()
